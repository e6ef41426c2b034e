package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only profiler: runs ONE query under the Bench session config and
  * prints per-Spark-job wall time (with job descriptions) plus per-stage
  * task-time totals, so multi-job queries (iterative CC, checkpointed
  * pipelines) can be attributed stage by stage. Measurement tooling for
  * the optimization rounds — never part of the driver contract.
  *
  * Usage: runMain graft.BenchProf <name> <sfDir> [reps]
  */
object BenchProf {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
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

    final case class Job(id: Int, desc: String, start: Long,
                         var end: Long = 0L, var nStages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageMs = mutable.LinkedHashMap[Int, (String, Long, Int)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, d, e.time, nStages = e.stageInfos.size)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        stageMs.synchronized {
          stageMs(si.stageId) = (si.name.takeWhile(_ != '\n').take(90), ms, si.numTasks)
        }
      }
    }

    val fn = SparkEntry.queries(name)
    // warm exactly like Bench: full run at the warmup SF + one at target SF
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    try fn(spark, warm).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    spark.sparkContext.addSparkListener(listener)
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      jobs.clear(); stageMs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
      println(f"RUN $name sec=$sec%.3f jobs=${jobs.size} stages=${stageMs.size}")
    }
    spark.sparkContext.removeSparkListener(listener)
    println("== jobs (last run) ==")
    var gap = 0L; var prevEnd = 0L
    jobs.values.foreach { j =>
      if (prevEnd > 0 && j.start > prevEnd) gap += j.start - prevEnd
      prevEnd = math.max(prevEnd, j.end)
      println(f"job ${j.id}%3d ${(j.end - j.start)}%6d ms  stages=${j.nStages}%2d  ${j.desc.take(80)}")
    }
    println(f"driver gaps between jobs: $gap%d ms")
    println("== stages by wall ms (last run) ==")
    stageMs.toSeq.sortBy(-_._2._2).take(25).foreach { case (id, (nm, ms, nt)) =>
      println(f"stage $id%4d $ms%6d ms tasks=$nt%3d  $nm")
    }
    println(f"BEST $name sec=$best%.3f")
    spark.stop()
  }
}
