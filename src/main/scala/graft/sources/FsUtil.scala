package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.IOUtils
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession

/** K7/S8 — Hadoop-filesystem utility layer (reference:
  * utils/package.scala:176-214 — hadoopExists/hadoopDelete/hadoopRead/
  * writeTextFile). Small driver-side side-channel I/O (markers, manifests,
  * model blobs) that goes through the Hadoop FS API so the same code hits
  * local disk, HDFS, or an object store depending on the path scheme.
  *
  * Compression is resolved from the file extension via Hadoop's
  * `CompressionCodecFactory` (.gz, .bz2, .snappy, …) instead of the
  * reference's caller-supplied codec — the extension already names the
  * codec, and mismatches were only ever bugs. */
object FsUtil {

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  def exists(spark: SparkSession, pathString: String): Boolean = {
    val p = new Path(pathString)
    p.getFileSystem(conf(spark)).exists(p)
  }

  def delete(spark: SparkSession, pathString: String, recursive: Boolean = false): Boolean = {
    val p = new Path(pathString)
    p.getFileSystem(conf(spark)).delete(p, recursive)
  }

  /** Whole-file read with extension-driven decompression (S8's
    * `hadoopRead`). Driver-side only — for datasets use `spark.read`,
    * which decompresses the same way per split. */
  def read(spark: SparkSession, pathString: String): String = {
    val c = conf(spark)
    val p = new Path(pathString)
    val raw = p.getFileSystem(c).open(p)
    val in = try {
      Option(new CompressionCodecFactory(c).getCodec(p))
        .map(_.createInputStream(raw)).getOrElse(raw)
    } catch { case t: Throwable => IOUtils.closeStream(raw); throw t }
    try {
      val body = new String(in.readAllBytes(), StandardCharsets.UTF_8)
      in.close() // propagate decompressor/stream failures
      body
    } catch { case t: Throwable => IOUtils.closeStream(in); throw t }
  }

  /** Whole-file write with extension-driven compression (`writeTextFile`).
    * `close()` is called on the success path and its failure PROPAGATES:
    * for compressed output nearly all bytes (deflate flush + trailer) are
    * emitted at close, and HDFS finalizes the block pipeline there — a
    * swallowed close would report a truncated file as persisted. */
  def write(spark: SparkSession, pathString: String, body: String): Unit = {
    val c = conf(spark)
    val p = new Path(pathString)
    val raw = p.getFileSystem(c).create(p, true)
    val out = try {
      Option(new CompressionCodecFactory(c).getCodec(p))
        .map(_.createOutputStream(raw)).getOrElse(raw)
    } catch { case t: Throwable => IOUtils.closeStream(raw); throw t }
    try {
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.close()
    } catch { case t: Throwable => IOUtils.closeStream(out); throw t }
  }
}
