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

  /** Deterministic shard assignment for training-data layout: shard =
    * md5-hash of the id mod `nShards`, in-shard position = rank of
    * the (salted) hash — a content-addressed global shuffle with no
    * RNG, so any engine lays out byte-identical shards. This is the
    * "randomize document order before training" step done the only
    * way that's reproducible at 100 TB: the order is a pure function
    * of ids, the window shuffles once on the shard key, and writers
    * can `partitionBy(shard)` straight from it.
    *
    * Output: (id..., shard INT, pos INT).
    */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Dedup.hash60(concat(lit(salt + "#"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Shard balance audit — the writer-side health card for
    * [[shardAssign]]: per shard, doc and token load plus the load
    * relative to the mean (rel_load 1.0 = perfectly balanced; the
    * number an operator alerts on before a skewed shard slows every
    * downstream epoch). One hash aggregation to nShards rows; the
    * mean is a window over those nShards rows, not the corpus.
    *
    * Output: (shard, n_docs, n_tokens, rel_load).
    */
  def shardBalance(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Dedup.hash60(concat(lit(salt + "#"), col(idCol).cast("string")))
    val loads = df
      .select(
        (h % nShards).cast("int").as("shard"),
        size(filter(split(col(textCol), " "), t => length(t) > 0)).cast("long").as("n_tok"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_tok")).cast("bigint").as("n_tokens"))
    // outer-join against the full 0..nShards-1 spine: a shard with
    // ZERO load is the worst imbalance this card exists to surface,
    // and groupBy alone would silently omit it (and shrink the mean's
    // denominator)
    df.sparkSession.range(nShards)
      .select(col("id").cast("int").as("shard"))
      .join(loads, Seq("shard"), "left")
      .select(
        col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn(
        "rel_load",
        round(col("n_tokens") / (sum(col("n_tokens")).over(Window.partitionBy()) /
          count(lit(1)).over(Window.partitionBy())), 6))
  }

  /** Materialize a temperature-scaled domain mixture under a token
    * budget: each domain gets quota_i = round(weight_i × budget)
    * tokens (weights from [[domainMixWeights]]), then docs are taken
    * in deterministic md5 order until the RUNNING token total within
    * the domain exceeds the quota (the overshooting doc is excluded;
    * every domain with a positive quota keeps at least its first doc
    * if that doc alone fits). The realized per-domain report is what
    * a pretraining run's data card states.
    *
    * One window shuffle keyed by domain for the running sum; the
    * quota table is #domains rows, broadcast.
    *
    * Output per domain: (domain, quota_tok, n_docs_kept, n_tok_kept).
    */
  def mixRealize(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      textCol: String,
      alpha: Double,
      budgetTokens: Long,
      salt: String = "mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = domainMixWeights(df, domainCol, textCol, alpha)
      .select(col(domainCol), round(col("weight") * budgetTokens, 0).cast("long").as("quota_tok"))
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val h    = Dedup.hash60(concat(lit(salt + "#"), col(idCol).cast("string")))
    val w = Window
      .partitionBy(col(domainCol))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(domainCol), col(idCol), size(toks).cast("long").as("n_tok"), h.as("h"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .join(broadcast(quotas), Seq(domainCol))
      .filter(col("cum_tok") <= col("quota_tok"))
      .groupBy(col(domainCol), col("quota_tok"))
      .agg(
        count(lit(1)).cast("int").as("n_docs_kept"),
        sum(col("n_tok")).as("n_tok_kept"))
      .select(col(domainCol), col("quota_tok"), col("n_docs_kept"), col("n_tok_kept"))
  }

  /** Curriculum buckets: per stratum, ntile over a deterministic
    * difficulty order (orderCol desc, id asc — e.g. length or a
    * quality score) → bucket 1 = "hardest"/longest quartile. The
    * data-layout step of curriculum training: a scheduler then walks
    * buckets easiest-first (or mixes rates per bucket). One window
    * shuffle keyed by the stratum; ntile's quotient/remainder split
    * is engine-exact, so the assignment replays in SQL.
    *
    * Output: every input row with (stratum, id, orderCol, bucket).
    */
  def curriculumBuckets(
      df: DataFrame,
      strataCol: String,
      orderCol: String,
      idCol: String,
      nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol)).orderBy(desc(orderCol), col(idCol))
    df.select(col(strataCol), col(idCol), col(orderCol))
      .withColumn("bucket", ntile(nBuckets).over(w))
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis & Spirakis 2006): each row gets key = u^(1/w) with
    * u a hash-derived uniform in (0, 1]; the k largest keys are a
    * weighted sample without replacement — exactly the distribution
    * of sequential draws proportional to w, but computed as one
    * stateless projection + top-k. Ranked via the monotone-equivalent
    * log form skey = ln(u)/w (u^(1/w) compresses against 1.0 for
    * large weights — the log key keeps 6-decimal spread). No RNG: u
    * replays from md5(salt#id) on any engine, so the sample is
    * stable across cluster sizes and re-runs (and the DuckDB
    * oracle).
    *
    * Scale shape: per-row key is a pure projection; the top-k is a
    * TakeOrdered (per-partition heaps, no global sort). Non-positive
    * weights are excluded (their draw probability is 0).
    *
    * Output: the k sampled rows as (id, weight, skey), best first.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "wsample"): DataFrame = {
    // u in (0, 1]: (hash60 + 1) / 2^60 — open at zero so ln(u) and
    // u^(1/w) stay finite
    val u = (Dedup.hash60(concat(lit(salt + "#"), col(idCol).cast("string"))) + 1) /
      lit(1152921504606846976.0)
    df.filter(col(weightCol) > 0)
      .select(
        col(idCol),
        col(weightCol),
        round(log(u) / col(weightCol).cast("double"), 6).as("skey"))
      .orderBy(desc("skey"), col(idCol))
      .limit(k)
  }

  /** One DoReMi-style mixture-reweighting step (Xie et al. 2023,
    * linearized): each domain's weight moves multiplicatively with
    * its non-negative excess hardness over the corpus mean,
    * w'_d ∝ w_ref_d · (1 + η·excess_d), then renormalizes. The
    * published recipe exponentiates per-domain excess loss from a
    * proxy model; the hardness column here is pluggable — this
    * default uses mean token length (a deterministic, engine-exact
    * stand-in), and the update is the LINEARIZED multiplicative-
    * weights form (1 + ηx instead of e^ηx) so the card stays free of
    * libm transcendentals the oracle could disagree on.
    *
    * Scale shape: ONE corpus aggregation (map-side combined) to the
    * |domains|-row relation; everything after runs on that tiny
    * relation with 1-row broadcast totals. The normalizing sum runs
    * in DECIMAL(27,18) so it is exact regardless of partition order.
    *
    * Output per domain: (domain, n_tok, w_ref, excess, w_new).
    */
  def mixUpdate(
      df: DataFrame,
      domainCol: String,
      textCol: String,
      eta: Double = 1.0): DataFrame = {
    val t = filter(split(col(textCol), " "), x => length(x) > 0)
    val byDomain = df
      .select(
        col(domainCol),
        size(t).cast("long").as("n_tok"),
        aggregate(transform(t, x => length(x).cast("long")), lit(0L), (a, b) => a + b)
          .as("n_len"))
      .groupBy(col(domainCol))
      .agg(sum(col("n_tok")).as("n_tok"), sum(col("n_len")).as("n_len"))
    val total = byDomain.agg(
      sum(col("n_tok")).as("tot_tok"), sum(col("n_len")).as("tot_len"))
    // hardness ratio (len_d·N)/(tok_d·L): multiply in doubles BEFORE
    // dividing (exact long products overflow at corpus scale)
    val hard = (col("n_len").cast("double") * col("tot_tok").cast("double")) /
      (col("n_tok").cast("double") * col("tot_len").cast("double"))
    val withRaw = byDomain
      .crossJoin(broadcast(total))
      // a domain whose every doc tokenizes empty has n_tok = 0: the
      // hardness ratio is 0/0 = NaN, and greatest() would propagate
      // it (NaN sorts greatest) — such a domain reads excess 0
      .withColumn(
        "excess",
        when(col("n_tok") > 0, greatest(lit(0.0), hard - 1)).otherwise(lit(0.0)))
      .withColumn("w_ref", col("n_tok").cast("double") / col("tot_tok"))
      .withColumn(
        "w_raw",
        (col("w_ref") * (lit(1.0) + lit(eta) * col("excess"))).cast("decimal(27,18)"))
    val z = withRaw.agg(sum(col("w_raw")).as("z"))
    withRaw
      .crossJoin(broadcast(z))
      .select(
        col(domainCol),
        col("n_tok"),
        round(col("w_ref"), 6).as("w_ref"),
        round(col("excess"), 6).as("excess"),
        round(col("w_raw").cast("double") / col("z").cast("double"), 6).as("w_new"))
  }
}
