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

  /** Temperature-scaled domain mixture weights (the multilingual-LM
    * alpha-sampling rule: w_i ∝ p_i^alpha with p_i = domain i's token
    * share; alpha<1 upweights tail domains, alpha=1 keeps natural
    * proportions). Output per domain: token count, natural share,
    * mixture weight (sums to 1).
    *
    * Scale shape: token counting is one hash aggregation with
    * map-side combine; the domain relation that follows is tiny
    * (#domains rows), so the normalization runs on a broadcast-sized
    * frame. Cross-engine parity: pow() is quantized to
    * DECIMAL(27,18) per domain, the normalizing sum is decimal-exact,
    * and the final divide runs in doubles rounded to 6dp.
    */
  def domainMixWeights(
      df: DataFrame,
      domainCol: String,
      textCol: String,
      alpha: Double): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val byDomain = df
      .select(col(domainCol), size(toks).cast("long").as("n_tok"))
      .groupBy(col(domainCol))
      .agg(sum(col("n_tok")).as("domain_tok"))
    val total = byDomain.agg(sum(col("domain_tok")).as("total_tok"))
    val powD = pow(col("domain_tok").cast("double") / col("total_tok"), lit(alpha))
      .cast("decimal(27,18)")
    val withPow = byDomain
      .crossJoin(broadcast(total))
      .withColumn("p_alpha", powD)
    val z = withPow.agg(sum(col("p_alpha")).as("z"))
    withPow
      .crossJoin(broadcast(z))
      .select(
        col(domainCol),
        col("domain_tok"),
        round(col("domain_tok").cast("double") / col("total_tok"), 6).as("share"),
        // divide in doubles (decimal/decimal quotient scale rules
        // differ across engines); decimal->double casts are
        // correctly-rounded in both
        round(col("p_alpha").cast("double") / col("z").cast("double"), 6).as("weight"))
  }
}
