package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // see Bench: CPU-dense kernels need parallelism-first coalescing
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "1m"))
      // InferFiltersFromGenerate re-inlines generator expressions into a
      // pushed-down filter, re-evaluating interpreted HOF lambdas per row
      // (O(n^2) for shingles) - semantics-neutral to exclude.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // Same materialization as Bench: noop sink evaluates every column.
    val warm = sys.env.get("SPARK_GRAFT_WARMUP_DIR")
    warm.foreach(d => try fn(spark, d).write.mode("overwrite").format("noop").save()
                      catch { case _: Throwable => () })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    println(s"RESULT $name sec=${(System.nanoTime()-t0)/1e9}")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
