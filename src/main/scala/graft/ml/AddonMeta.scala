package graft.ml

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{PagedHttp, PageFetcher}

/** Addon-metadata provider over the paginated AMO-style API (S7 consumer;
  * reference: ml/AMODatabase.scala + AddonRecommender.scala:189-266).
  *
  * The reference materializes the whole addon database as a driver-side
  * `Map[String, AMOAddonInfo]` and does per-row map lookups while building
  * recommendations. Here the database is a DataFrame: enrichment is a
  * `broadcast` hash join (same memory envelope as the reference's map — the
  * table is small — but the lookup runs codegen'd on executors, and the
  * plan degrades gracefully to a shuffle join if the catalog ever outgrows
  * the broadcast threshold).
  */
object AddonMeta {

  /** Fields the reference extracts per addon (AMODatabase.scala:19-31);
    * everything else in the API response is pruned at parse time. */
  val addonType: StructType = StructType(Seq(
    StructField("guid", StringType),
    StructField("default_locale", StringType),
    StructField("name", MapType(StringType, StringType)),
    StructField("summary", MapType(StringType, StringType)),
    StructField("ratings", MapType(StringType, DoubleType)),
    StructField("tags", ArrayType(StringType)),
    StructField("weekly_downloads", LongType),
    StructField("current_version", StructType(Seq(
      StructField("files", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("platform", StringType),
        StructField("status", StringType),
        StructField("is_webextension", BooleanType))))))))))

  /** Fetch (or cache-hit) the addon catalog as a DataFrame keyed by guid. */
  def load(spark: SparkSession, fetcher: PageFetcher, apiUri: String,
           cachePath: Option[Path] = None): DataFrame =
    PagedHttp.load(spark, fetcher, apiUri, addonType,
      resultsField = "results", keyField = "guid", cachePath = cachePath)

  /** Name in the addon's own default locale — the reference's
    * `getAddonNameById` (AMODatabase.scala:124-133). */
  def displayName: Column = element_at(col("name"), col("default_locale"))

  /** The reference's `isWebextension` (AMODatabase.scala:141-154): the
    * current version carries at least one public webextension file. */
  def isWebextension: Column =
    exists(col("current_version.files"), f =>
      f.getField("is_webextension") && lower(f.getField("status")) === "public")

  /** Enrich a frame carrying `addonCol` guids with display name and
    * webextension flag — broadcast join in place of the reference's
    * driver-side map lookups (AddonRecommender.scala:264-266). Unknown
    * guids keep null name / null flag (the reference logs-and-skips). */
  def enrich(df: DataFrame, addonCol: String, catalog: DataFrame): DataFrame = {
    val meta = catalog.select(col("guid"),
      displayName.as("addon_name"), isWebextension.as("is_webextension"))
    // drop via the catalog-side reference: drop("guid") by NAME would also
    // remove the caller's column when addonCol itself is named "guid"
    df.join(broadcast(meta), df(addonCol) === meta("guid"), "left")
      .drop(meta("guid"))
  }
}
