package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: time a LIST of queries (min of N reps, round-major, Bench's
  * session config + warmup) in ONE JVM so targets and drift CONTROLS
  * share a measurement window — the r17 adjudication discipline for this
  * host's ±30-80% drift. Measurement tooling only, never part of the
  * driver contract.
  *
  * Usage: runMain graft.BenchSome <sfDir> <reps> <name> [more...]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "1m"))
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(n => try run(n, warm) catch { case _: Throwable => () })
    val best = scala.collection.mutable.Map[String, Double]()
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        val s = run(n, sfDir)
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
      }
    }
    names.foreach(n => println(f"SOME $n sec=${best(n)}%.3f"))
    spark.stop()
  }
}
