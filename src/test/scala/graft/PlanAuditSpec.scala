package graft

/** The plan-hygiene GATE, in `sbt test` so a scale-killer turns red
  * before the driver ever runs a query: every declared query's plan must
  * be free of CartesianProducts, condition-less joins between two
  * non-single-row sides, and single-partition windows outside
  * [[PlanAudit.globalWindowAllowlist]]. Plus pinned window budgets for
  * the flagship clean/assemble family — the round-6 regression was a
  * PARTITIONED corpus-wide window sneaking into `Corpus.clean`
  * (`min().over(partitionBy(fp))`), which no global-window check sees;
  * pinning the total WindowExec count per query makes that class of
  * reintroduction fail loudly here. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Total-WindowExec budgets for the clean/assemble compositions. A
    * bump above budget means someone added a window to a pipeline whose
    * dedup stages are deliberately groupBy+flag-back — raise only with a
    * written scale argument (SCALE.md). */
  private val windowBudget: Map[String, Int] = Map(
    "q49_corpus_clean" -> 0,
    "q68_incremental_clean" -> 0,
    "q84_clean_repetition" -> 0,
    "q73_assemble" -> 1,      // tokenBudgetSample's per-partition prefix-sum window
    "q76_assemble_decon" -> 1 // same
  )

  test("every declared query passes the structural plan gate") {
    // audit the STATIC plan: under AQE collect() sees only the adaptive
    // placeholder (PlanAudit.inspect's contract)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val violations = scala.collection.mutable.ArrayBuffer.empty[String]
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val stats =
          try PlanAudit.inspect(fn(spark, sf))
          catch { case e: Throwable =>
            fail(s"$name failed to plan: ${e.getMessage.take(200)}")
          }
        violations ++= PlanAudit.violations(name, stats)
        windowBudget.get(name).foreach { budget =>
          if (stats.windows > budget)
            violations += s"$name: ${stats.windows} WindowExec > pinned budget $budget"
        }
      }
      assert(violations.isEmpty, s"\n${violations.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
