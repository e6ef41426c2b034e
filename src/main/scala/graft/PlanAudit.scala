package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan hygiene audit: for each query, report scan pushdown (PushedFilters
  * / ReadSchema), join strategies, exchange count, and codegen coverage —
  * the checklist from the build plan ("explain until it's the plan you'd
  * want"). Run: `sbt "runMain graft.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // audit the STATIC plan: under AQE the formatted explain prints the
      // un-executed adaptive placeholder, which carries no codegen ids and
      // hides the join strategy picked at runtime
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct
        val schemas = "ReadSchema: struct<[^>]*".r.findAllIn(plan)
          .map(_.take(90)).toSeq.distinct
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }
        val exchanges = "\\bExchange\\b".r.findAllIn(plan).size
        // formatted mode tags operators with "[codegen id : N]" — distinct
        // ids = whole-stage spans ("WholeStageCodegen" only appears in the
        // simple mode tree and always counted 0 here)
        val codegen = "codegen id : (\\d+)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        // single-partition windows (no partitionBy) funnel the whole input
        // through ONE task — a straggler at scale. Expected only where the
        // semantics are inherently global and the input is pre-shrunk
        // (q57's budget-bounded survivor set); anywhere else it's a defect.
        val globalWindows = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }.size
        println(s"== $name")
        println(s"   joins=${joins.mkString(",")} exchanges=$exchanges " +
          s"codegenSpans=$codegen globalWindows=$globalWindows")
        pushed.foreach(p => println(s"   $p"))
        schemas.foreach(s => println(s"   $s"))
      } catch { case e: Throwable => println(s"== $name FAILED: ${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
