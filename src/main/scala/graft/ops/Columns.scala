package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-set helpers: the enum-style projection DSL (P9) and observable
  * pipeline metrics (A11).
  */
object Columns {

  /** P9 — a named projection catalog: each entry is a named `Column` with
    * an optional defining expression (`expr.alias(name)`), yielding
    * names/cols/exprs for programmatic select lists.
    * Reference: src/main/scala/com/mozilla/telemetry/utils/ColumnEnumeration.scala:20-54. */
  final case class NamedColumns(entries: Seq[(String, Option[Column])]) {
    def names: Seq[String] = entries.map(_._1)
    def cols: Seq[Column] = entries.map { case (n, _) => col(n) }
    def exprs: Seq[Column] = entries.map {
      case (n, Some(e)) => e.alias(n)
      case (n, None)    => col(n)
    }
    def select(df: DataFrame): DataFrame = df.select(exprs: _*)
    def ++(other: NamedColumns): NamedColumns = NamedColumns(entries ++ other.entries)
  }

  object NamedColumns {
    def apply(names: String*)(implicit d: DummyImplicit): NamedColumns =
      NamedColumns(names.map(_ -> None))
    def derived(pairs: (String, Column)*): NamedColumns =
      NamedColumns(pairs.map { case (n, e) => n -> Some(e) })
  }

  /** A11 — processing metrics without a second action: the reference
    * increments accumulators inside flatMap (SyncView.scala:49-83); the
    * DataFrame-native form is `observe`, collected from the completed
    * query's observed metrics. */
  def withProcessingMetrics(df: DataFrame, name: String, idCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("processed"),
      count(when(col(idCol).isNull, 1)).as("missing_id"))
}
