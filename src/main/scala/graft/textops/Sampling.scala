package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * No RNG anywhere (SURVEY §7 hard part (d)): the sampling decision
  * is a pure function of the row id — md5-derived, so the same rows
  * are selected on any cluster size, partitioning, or engine (the
  * DuckDB oracle replays the identical hash). A pure projection:
  * no shuffle, pushes down as a scan filter, scales linearly.
  */
object Sampling {

  /** Per-row keep decision: hash60("<salt>#<id>") % 100 < pct. */
  def keepPct(idCol: Column, pct: Column, salt: String): Column =
    Dedup.hash60(concat(lit(salt + "#"), idCol.cast("string"))) % 100 < pct

  /** Stratified downsampling: each stratum keeps `rates(stratum)` %
    * of its rows (`defaultPct` for unlisted strata). The per-stratum
    * rate is the standard lever for rebalancing a multilingual /
    * multi-source corpus — downsample the dominant stratum, keep the
    * tail intact.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Int],
      defaultPct: Int = 100,
      salt: String = "sample"): DataFrame = {
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, p).otherwise(acc)
    }
    df.filter(keepPct(col(idCol), pct, salt))
  }
}
