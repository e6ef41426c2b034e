package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batched decode/feature
  * plumbing.
  *
  * The Spark-side machinery (schema, partition-sized batching, iterator
  * contract, metadata struct) is real and tested; the codec itself is a
  * deterministic STUB (`stubDecode`) because no image/audio libraries ship
  * in this environment — swap `stubDecode` for a real decoder (JavaCV,
  * TwelveMonkeys, ffmpeg-cli per partition) without touching the plumbing.
  *
  * Scale notes: decode runs via `mapPartitions` so a codec is initialized
  * once per partition (not per row) — the same batching rationale as
  * Python's `mapInPandas` — and binary payloads never pass through a
  * shuffle here; repartition BEFORE attaching features if size skew needs
  * rebalancing (`repartitionByPayloadSize`).
  */
object BinaryOps {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Deterministic fake decode: derives pseudo width/height/frames from the
    * payload's md5 (stable across runs and engines). STUB — replace with a
    * real codec. */
  def stubDecode(bytes: Array[Byte]): (String, Int, Int, Int) = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = digest.take(4).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex, 16)
    val fmt = Seq("png", "jpeg", "webp")((h % 3).toInt)
    (fmt, (h % 1920).toInt + 1, (h % 1080).toInt + 1, (h % 240).toInt + 1)
  }

  /** Attach a decoded-metadata struct column via per-partition batching.
    * Input must carry (`idCol`: long, `binCol`: binary). */
  def withMediaMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("media_meta", mediaMetaType))
    val enc = ExpressionEncoder(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // codec init happens HERE, once per partition, in a real decoder
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else {
          val (fmt, w, h, f) = stubDecode(bytes)
          Row(bytes.length.toLong, fmt, w, h, f)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Deterministic every-k frame sampling over a (stub-)decoded frame
    * count: emits one row per sampled frame index. */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("media_meta.n_frames") - 1, lit(everyK))))

  /** Rebalance partitions by cumulative payload size before expensive
    * decode — avoids one task decoding all the large payloads. */
  def repartitionByPayloadSize(df: DataFrame, binCol: String, targetPartitions: Int): DataFrame =
    df.repartitionByRange(targetPartitions, length(col(binCol)), rand(42))
}
