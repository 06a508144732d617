package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extraction scoring (`evaluate_profiler.py`).
  *
  * The SQuAD-style token F1 (`text_f1`, `evaluate_profiler.py:81-153`)
  * is a pure per-row column expression built from array higher-order
  * functions — no UDF, no shuffle, stays in codegen. Corpus metrics
  * (average + exact median) are one hash aggregation over it.
  */
object Score {

  /** Whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Multiset-intersection size of two token arrays:
    * Σ_t min(count_pred(t), count_gold(t)) over distinct pred tokens.
    */
  private def numSame(tp: Column, tg: Column): Column =
    aggregate(
      array_distinct(tp),
      lit(0),
      (acc, t) =>
        acc + least(
          size(filter(tp, x => x === t)),
          size(filter(tg, x => x === t))))

  /** Per-pair SQuAD token F1 (`evaluate_profiler.py:118-147`):
    * either side empty → 1.0 iff both empty else 0.0; no overlap → 0;
    * else harmonic mean of token precision/recall.
    */
  def tokenF1(pred: Column, gold: Column): Column = {
    val tp   = tokens(pred)
    val tg   = tokens(gold)
    val np   = size(tp)
    val ng   = size(tg)
    val same = numSame(tp, tg).cast("double")
    val p    = same / np
    val r    = same / ng
    when(np === 0 || ng === 0, when(np === ng, 1.0).otherwise(0.0))
      .when(same === 0.0, 0.0)
      .otherwise(litTwo * p * r / (p + r))
  }
  private val litTwo = lit(2.0)

  /** Extraction fraction (`evaluate_profiler.py:203-208`): share of
    * rows whose value is non-null, non-empty and not "none".
    */
  def extracted(value: Column): Column =
    when(value.isNotNull && length(trim(value)) > 0 && lower(trim(value)) =!= "none", 1.0)
      .otherwise(0.0)

  def extractionFraction(df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(avg(extracted(col(valueCol))).as("extraction_fraction"))

  /** Corpus metrics per extractor (D7): average F1, exact median F1,
    * extraction fraction. The extraction fraction is measured over
    * the GOLD values (`evaluate_profiler.py:203-209` counts
    * non-empty, non-"none" golds — the same denominator for every
    * extractor, which is why `combine_extractions` reads it off any
    * metrics row). With `useAbstention` and a high gold fraction,
    * empty predictions are dropped before scoring
    * (`evaluate_profiler.py:98-107`).
    * Input: (groupCols..., pred, gold).
    */
  def f1Metrics(
      scored: DataFrame,
      groupCols: Seq[String],
      predCol: String = "pred",
      goldCol: String = "gold",
      useAbstention: Boolean = false,
      extractionFractionThresh: Double = 0.8): DataFrame = {
    val keys = groupCols.map(col)
    // native codegen expression (bit-identical to tokenF1; the HOF
    // form is O(d²) interpreted per row — see graft.expressions)
    val base = scored.withColumn(
      "__f1",
      graft.expressions.TokenF1.tokenF1(scored.sparkSession, col(predCol), col(goldCol)))
    val withFrac = base
      .withColumn("__frac", avg(extracted(col(goldCol))).over(Window.partitionBy(keys: _*)))
    val kept =
      if (useAbstention)
        // `if pred:` in the reference — any non-empty string survives
        withFrac.filter(
          col("__frac") < extractionFractionThresh ||
            length(coalesce(col(predCol), lit(""))) > 0)
      else withFrac
    kept
      .groupBy(keys: _*)
      .agg(
        avg(col("__f1")).as("avg_f1"),
        percentile(col("__f1"), lit(0.5)).as("med_f1"),
        // pre-filter window value: the reference reports the fraction
        // over ALL golds even when abstention dropped rows from F1
        max(col("__frac")).as("extraction_fraction"))
  }

  /** Top-k extractor selection (`get_topk_scripts_per_field`,
    * `evaluate_profiler.py:233-304`). metrics: (extractor, avg_f1,
    * med_f1); `goldKey` rows are excluded from candidacy.
    *
    * Returns the selected rows with their rank. Deterministic
    * tie-break: (avg_f1, med_f1) desc, extractor asc. The metrics
    * relation is tiny (#extractors ≈ k·prompts); everything here is
    * window math over a broadcast-size frame.
    */
  def topkScripts(
      metrics: DataFrame,
      k: Int = 10,
      goldKey: String = "gold",
      keepThresh: Double = 0.5,
      costThresh: Double = 1.0,
      doEndToEnd: Boolean = false): DataFrame = {
    // Fully relational — one plan, no driver actions, so the metrics
    // pipeline feeding this runs exactly once. The windows are global
    // but the frame is the tiny extractor-metrics relation (m rows).
    // (WindowExec's unpartitioned-window warning for this intentional
    // m-row frame is silenced in log4j2.properties; a constant
    // partition key would be stripped by EliminateWindowPartitions)
    val wRank = Window.orderBy(desc("avg_f1"), desc("med_f1"), asc("extractor"))
    val wAll  = Window.partitionBy() // whole-frame window (tiny m-row relation)

    val ranked = metrics
      .filter(col("extractor") =!= goldKey)
      .withColumn("rank", row_number().over(wRank))
      .withColumn(
        "best_value",
        max(when(col("rank") === 1, greatest(col("avg_f1"), col("med_f1")))).over(wAll))

    val qualifies = col("extractor").contains("function") &&
      (col("avg_f1") >= keepThresh || col("med_f1") >= keepThresh) &&
      abs(greatest(col("avg_f1"), col("med_f1")) - col("best_value")) < costThresh

    val flagged = ranked
      .withColumn("is_qual_fn", qualifies)
      .withColumn("num_fns", sum(when(qualifies, 1).otherwise(0)).over(wAll))
      .withColumn(
        "is_sel",
        col("is_qual_fn") && col("rank") <= least(lit(k), col("num_fns")) && col("rank") <= k)
      .withColumn("n_sel", sum(when(col("is_sel"), 1).otherwise(0)).over(wAll))

    // no qualifying function → empty in BOTH modes (profiler returns []);
    // OpenIE kill-switch: best overall under keep threshold → empty;
    // ClosedIE fallback: selection empty → single best overall.
    flagged
      .filter(col("num_fns") > 0)
      .filter(if (doEndToEnd) col("best_value") >= keepThresh else lit(true))
      .filter(
        col("is_sel") ||
          (lit(!doEndToEnd) && col("n_sel") === 0 && col("rank") === 1))
      .select(col("extractor"), col("rank"))
  }

  /** Calibration of a [0,1] confidence against a boolean label:
    * equal-width bins, per-bin mean confidence vs empirical accuracy,
    * Expected Calibration Error Σ (n_b/N)·|acc_b − conf̄_b| and
    * Maximum Calibration Error max_b |acc_b − conf̄_b| — the
    * reliability audit a quality classifier ships with before its
    * keep-threshold is trusted at corpus scale.
    *
    * Scale shape: ONE hash aggregation to the nBins-row relation
    * (map-side combined), then scalar math on it. Per-bin confidence
    * sums and the cross-bin weighted-gap sum run in DECIMAL(27,18),
    * so results are exact regardless of partition order; the
    * divisions are single correctly-rounded double ops.
    *
    * Output: one row (ece, mce, n_bins_used, n).
    */
  /** Decile lift / cumulative-gain table of a ranking score against a
    * boolean label — the model-eval card behind "does the classifier
    * concentrate positives in its top buckets".
    *
    * Exact SQL-NTILE semantics WITHOUT a single-partition window: the
    * global row number decomposes into (two-phase range-partitioned
    * prefix over the DISTINCT-score relation —
    * [[graft.relops.Stats.prefixBefore]], no single-partition state
    * even for an unquantized score) + (intra-score rank by id — a
    * PARTITIONED window, parallel). The tile comes from the
    * FRONT-LOADED NTILE identity: with q = N div k and r = N mod k,
    * SQL NTILE gives the first r tiles q+1 rows and the rest q, so
    *   tile(rn) = (rn−1) div (q+1) + 1             if rn ≤ r·(q+1)
    *            = r + (rn − r·(q+1) − 1) div q + 1  otherwise.
    * (floor((rn−1)·k/N)+1 spreads the oversized tiles evenly and is
    * NOT NTILE whenever 2 ≤ N mod k ≤ k−1 — r13 ADVICE.) For N < k
    * the first branch degenerates to tile = rn, which is exactly
    * NTILE's consecutive numbering, so no special case.
    *
    * Output per tile: (decile, n, n_pos, rate, lift, cum_gain).
    */
  def decileLift(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      labelCol: String,
      nTiles: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // complete-case over SCORED rows: a NULL score has no rank (and
    // prefixBefore's range bucketing is undefined on NULL keys —
    // r14 review finding); every gated wiring scores are non-null by
    // construction, so gate hashes are untouched
    val base = df
      .filter(col(scoreCol).isNotNull)
      .select(
        col(scoreCol).as("_s"), col(idCol).as("_id"),
        when(col(labelCol), 1L).otherwise(0L).as("_pos"))
    val byScore = base.groupBy(col("_s")).agg(count(lit(1)).as("_cnt"))
    val offsets = graft.relops.Stats
      .prefixBefore(byScore, "_s", "_cnt", "_before", descending = true)
      .select(col("_s"), col("_before"))
    val intra = Window.partitionBy(col("_s")).orderBy(col("_id"))
    val total = base.agg(count(lit(1)).as("_n"))
    // Front-loaded NTILE identity (integral `div` end to end — no FP
    // quotient): q = N div k, r = N mod k; the first r tiles carry
    // q+1 rows. For N < k, q = 0 and r = N so every row takes the
    // first branch and tile = rn (NTILE's consecutive numbering); the
    // greatest() guard only protects the never-taken q = 0 divisor.
    val tiled = base
      .join(broadcast(offsets), Seq("_s"))
      .withColumn("_rn", col("_before") + row_number().over(intra))
      .crossJoin(broadcast(total))
      .withColumn("_q", expr(s"_n div ${nTiles.toLong}L"))
      .withColumn("_r", col("_n") % nTiles)
      .withColumn("_big", col("_r") * (col("_q") + lit(1L)))
      .select(
        when(
          col("_rn") <= col("_big"),
          expr("(_rn - 1) div (_q + 1L) + 1L"))
          .otherwise(expr("_r + (_rn - _big - 1) div greatest(_q, 1L) + 1L"))
          .cast("int").as("decile"),
        col("_pos"))
    val agg = tiled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("_pos")).as("n_pos"))
    val tot = agg.agg(
      sum(col("n")).cast("double").as("_nn"), sum(col("n_pos")).cast("double").as("_np"))
    val cum = Window.orderBy(col("decile")).rowsBetween(Window.unboundedPreceding, 0)
    agg.crossJoin(broadcast(tot))
      .withColumn("_cum_pos", sum(col("n_pos")).over(cum))
      .select(
        col("decile"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("rate"),
        round((col("n_pos").cast("double") / col("n")) / (col("_np") / col("_nn")), 6).as("lift"),
        round(col("_cum_pos").cast("double") / col("_np"), 6).as("cum_gain"))
      .orderBy(col("decile"))
  }

  /** Exact ROC AUC of a ranking score against a boolean label, via
    * the rank-sum identity AUC = U₁ / (n₊·n₋) with average-rank tie
    * handling — ties contribute 0.5, the textbook definition. The
    * score is quantized to 6 dp (its own output grain) so the rank
    * table runs in exact integers on the DISTINCT-score relation;
    * the corpus sees one aggregation. Output: (n_pos, n_neg, auc,
    * gini = 2·AUC − 1).
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    graft.relops.Stats
      .mannWhitneyU(
        df.select(
          when(col(labelCol), "pos").otherwise("neg").as("_g"),
          round(col(scoreCol) * 1e6).cast("long").as("_v")),
        "_g", "pos", "neg", "_v")
      .select(col("n1"), col("n2"), col("u1"))
      .withColumn(
        // one-class input flows NULL through the guarded divisor
        // (ANSI DIVIDE_BY_ZERO otherwise), matching the siblings;
        // bound ONCE so auc and gini can never drift apart
        "_aucRaw",
        col("u1") / when(col("n1") > 0 && col("n2") > 0,
          col("n1").cast("double") * col("n2")))
      .select(
        col("n1").as("n_pos"),
        col("n2").as("n_neg"),
        round(col("_aucRaw"), 6).as("auc"),
        round(lit(2.0) * col("_aucRaw") - 1, 6).as("gini"))

  def calibrationEce(
      df: DataFrame,
      confCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    val bin = least(floor(col(confCol) * nBins), lit(nBins - 1)).cast("int")
    val bins = df
      .select(
        bin.as("bin"),
        col(confCol).cast("decimal(27,18)").as("conf"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("conf")).as("sum_conf"), sum(col("pos")).as("n_pos"))
      .withColumn("acc", col("n_pos").cast("double") / col("n_b"))
      .withColumn("mean_conf", col("sum_conf").cast("double") / col("n_b"))
      .withColumn("gap", abs(col("acc") - col("mean_conf")))
    bins
      .agg(
        sum((col("gap") * col("n_b")).cast("decimal(27,18)")).as("wgap"),
        max(col("gap")).as("mce_raw"),
        count(lit(1)).as("n_bins_used"),
        sum(col("n_b")).as("n"))
      .select(
        round(col("wgap").cast("double") / col("n"), 6).as("ece"),
        round(col("mce_raw"), 6).as("mce"),
        col("n_bins_used"),
        col("n"))
  }
}
