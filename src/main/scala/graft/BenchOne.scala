package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // InferFiltersFromGenerate re-inlines generator expressions into a
      // pushed-down filter, re-evaluating interpreted HOF lambdas per row
      // (O(n^2) for shingles) - semantics-neutral to exclude.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(s"RESULT $name rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
