package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity (reference: contriever retrieval,
  * `retrieval.py:5-36`) and the ANN operators a training-data
  * pipeline needs.
  *
  * Design for scale: the brute-force paths are per-row expressions
  * against a broadcast query vector (no shuffle, no cross join); the
  * pair paths block on a coarse bucket (label here; IVF centroid id
  * in a real deployment) so the self-join shuffles only within-bucket
  * partitions — the 100 TB pattern is identical, just with learned
  * centroids as the bucketer.
  */
object Similarity {

  /** Cosine similarity between an ARRAY<FLOAT/DOUBLE> column and a
    * literal query vector — sequential fold, pure expression.
    */
  def cosineToQuery(vec: Column, query: Seq[Double]): Column = {
    val q  = typedLit(query)
    val v  = transform(vec, x => x.cast("double"))
    cosine(v, q)
  }

  /** Dot product of two ARRAY<DOUBLE> columns: the codegen'd
    * expression (graft.expressions.DotProduct), bit-identical to the
    * `aggregate(zip_with(a, b, *), 0.0, +)` fold it replaced but one
    * fused primitive loop instead of per-element interpreted lambdas.
    */
  def dot(x: Column, y: Column): Column =
    graft.expressions.DotProduct.dotD(x, y)

  /** Cosine of two double-array columns. */
  def cosine(a: Column, b: Column): Column = {
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** Brute-force top-k by cosine to a query vector, deterministic
    * ordering on (rounded cosine desc, id asc). The baseline ANN
    * path: one scan + a k-row sort (Spark TakeOrdered, no shuffle).
    */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String, query: Seq[Double], k: Int): DataFrame = {
    val scored = embeddings
      .select(col(idCol), round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
    scored.withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** Global rank window over an already-limited k-row frame: a
    * single partition by construction (k rows). WindowExec's
    * unpartitioned-window warning for these intentional tiny-frame
    * windows is silenced in log4j2.properties (a constant partition
    * key would NOT help — Spark's EliminateWindowPartitions strips
    * foldable keys before planning).
    */
  private def rankWindow(idCol: String) =
    Window.orderBy(desc("cos"), col(idCol))

  /** Retrieval top-1 per group (`retrieval.py:31-36`,
    * `main.py:66-70` as a rank join): best row by cosine within each
    * bucket.
    */
  def retrievalTop1(embeddings: DataFrame, groupCol: String, idCol: String, vecCol: String, query: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(desc("cos"), col(idCol))
    embeddings
      .select(col(groupCol), col(idCol), round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Retrieval from RAW TEXT (`get_most_similarity`,
    * `retrieval.py:31-36`, which encodes both sides before the cosine
    * argmax): runs the [[graft.extract.Encode]] mapPartitions
    * embedding stage over the text column, encodes the query string
    * once on the driver, and reuses [[retrievalTop1]] unchanged. The
    * embedding pass is shuffle-free; everything downstream is the
    * same plan as the precomputed-embeddings path.
    */
  def retrievalTop1FromText(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      queryText: String,
      client: graft.extract.EncoderClient): DataFrame = {
    val embedded = graft.extract.Encode.embed(docs, textCol, client, "emb_vec")
    val q        = client.encode(Iterator.single(queryText)).next().map(_.toDouble).toSeq
    retrievalTop1(embedded, groupCol, idCol, "emb_vec", q)
  }

  /** Brute-force top-k from raw text — [[cosineTopK]] behind the
    * encoder seam.
    */
  def cosineTopKFromText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryText: String,
      k: Int,
      client: graft.extract.EncoderClient): DataFrame = {
    val embedded = graft.extract.Encode.embed(docs, textCol, client, "emb_vec")
    val q        = client.encode(Iterator.single(queryText)).next().map(_.toDouble).toSeq
    cosineTopK(embedded, idCol, "emb_vec", q, k)
  }

  /** First-nCentroids deterministic seed centroids (id asc) unless
    * learned ones are passed — THE shared fit seam: index (ivf/
    * ivf-pq), prune ([[prototypePrune]]) and dedup ([[semDedup]])
    * consumers all draw centroids here, so a row lands in the same
    * cluster in every path and the oracle's `c` CTE replays one
    * definition.
    */
  private def seedOrLearned(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      learned: Option[Seq[(Int, Seq[Double])]]): Seq[(Int, Seq[Double])] =
    learned.getOrElse(
      embeddings
        .orderBy(col(idCol))
        .limit(nCentroids)
        .select(col(vecCol))
        .collect()
        .toSeq
        .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue))
        .zipWithIndex
        .map { case (v, i) => (i, v) })

  /** THE nearest-centroid assignment expression, shared by every
    * centroid consumer: a (cos, -cid) struct per centroid over the
    * BOUND `v`/`nrm` columns (callers must bind
    * v = cast-to-double vector, nrm = dot(v,v) — HOF lambdas
    * re-evaluate captured subtrees per reference, so the vector is
    * hoisted once); `array_max` of the result is the assignment —
    * max cosine, ties to the smallest centroid id. Each value is the
    * exact cosineToQuery expression shape, so assignments are
    * bit-identical across index/prune/dedup paths and the oracle's
    * `asg` CTE.
    */
  private def centroidCands(centroids: Seq[(Int, Seq[Double])]): Column =
    array(centroids.map { case (i, c) =>
      val cn = c.map(x => x * x).sum
      val cos = when(col("nrm") === 0.0 || lit(cn) === 0.0, 0.0)
        .otherwise(dot(col("v"), typedLit(c)) / (sqrt(col("nrm")) * lit(math.sqrt(cn))))
      struct(cos.as("cos"), lit(-i).as("ncid"))
    }: _*)

  /** IVF-style approximate top-k: partition vectors by nearest of
    * `nCentroids` deterministic seed centroids (the first vectors by
    * id — a real deployment plugs in k-means centroids), then search
    * only the `nProbe` buckets nearest to the query.
    *
    * Scale shape: centroid assignment is one scan against a broadcast
    * centroid list; the probe filters the scan to a bucket subset, so
    * query cost is (nProbe / nCentroids) of brute force, and the
    * assignment column can be persisted/bucketed for repeated queries.
    */
  def ivfTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val centroids = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    val assigned = withV
      .withColumn("centroid_id", -array_max(centroidCands(centroids)).getField("ncid"))
      .drop("v", "nrm")

    // probe list: centroids nearest to the query (driver-side, tiny)
    val probes = centroids
      .map { case (i, c) =>
        val dot  = c.zip(query).map { case (x, y) => x * y }.sum
        val na   = math.sqrt(c.map(x => x * x).sum)
        val nb   = math.sqrt(query.map(x => x * x).sum)
        val cos  = if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
        (i, cos)
      }
      .sortBy { case (i, c) => (-c, i) }
      .take(nProbe)
      .map(_._1)

    val scored = assigned
      .filter(col("centroid_id").isin(probes: _*))
      .select(col(idCol), round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
    scored.withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** Product-quantization codebooks (Jégou/Douze/Schmid, TPAMI 2011 —
    * public method, reimplemented from the formulation): the vector
    * is split into `m` contiguous subvectors and each subvector space
    * gets its own `k`-entry codebook fit by Lloyd iterations under
    * squared-L2. Seeds = the first k vectors' slices in id order (the
    * deterministic no-RNG convention kmeansCentroids set), assignment
    * argmin uses the reduced score cw·cw − 2·sub·cw (the sub·sub term
    * is constant per row), ties to the smallest code id, and the mean
    * update sums decimal(27,18) per element so partial-sum order
    * can't flip low bits — a SQL oracle replays the fit bit-for-bit.
    *
    * Scale: ALL m subvector fits share one scan per iteration (the
    * slice rows posexplode off the same pass) and one (s, cid)
    * aggregation; only the m×k×(dim/m) codebook matrix reaches the
    * driver.
    *
    * @return ((subvector s, code cid) -> codeword)
    */
  def pqCodebooks(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int,
      dim: Int = 64): Map[(Int, Int), Seq[Double]] = {
    val subDim = dim / m
    require(m * subDim == dim, s"m ($m) must divide dim ($dim)")
    val seedRows = embeddings
      .orderBy(col(idCol)).limit(k).select(col(vecCol)).collect().toSeq
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue))
    require(
      seedRows.length == k,
      s"pqCodebooks: k=$k codewords need k seed vectors but the corpus has only ${seedRows.length} rows")
    var books: Map[(Int, Int), Seq[Double]] =
      (for { s <- 0 until m; c <- 0 until k }
        yield (s, c) -> seedRows(c).slice(s * subDim, (s + 1) * subDim).toSeq).toMap
    if (iters > 0) {
      // one row per (vector, subvector): all m fits share this scan
      val subs = embeddings
        .withColumn("v", transform(col(vecCol), x => x.cast("double")))
        .select(
          col(idCol),
          posexplode(array((0 until m).map(s => slice(col("v"), s * subDim + 1, subDim)): _*))
            .as(Seq("s", "sub")))
      (0 until iters).foreach { _ =>
        val cands = array((0 until k).map { c =>
          // codeword for THIS row's subvector: m-way chain on s
          val cw = (0 until m).foldLeft(lit(null).cast("array<double>")) { (acc, s) =>
            when(col("s") === s, typedLit(books((s, c)))).otherwise(acc)
          }
          val cwDot = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
            when(col("s") === s, lit(books((s, c)).map(x => x * x).sum)).otherwise(acc)
          }
          struct((cwDot - lit(2.0) * dot(col("sub"), cw)).as("score"), lit(c).as("cid"))
        }: _*)
        val means = subs
          .withColumn("cid", array_min(cands).getField("cid"))
          .groupBy(col("s"), col("cid"))
          .agg(
            count(lit(1)).as("n"),
            (0 until subDim).map(d =>
              (sum(element_at(col("sub"), d + 1).cast("decimal(27,18)")).cast("double") / count(lit(1)))
                .as(s"m$d")): _*)
          .collect()
          .map(r => (r.getAs[Int]("s"), r.getAs[Int]("cid")) ->
            (0 until subDim).map(d => r.getAs[Double](s"m$d")).toSeq)
          .toMap
        books = books.map { case (key, prev) => key -> means.getOrElse(key, prev) }
      }
    }
    books
  }

  /** PQ-ADC top-k (the billion-scale ANN memory path: 64 floats →
    * m bytes per vector): encode every vector as m code ids against
    * [[pqCodebooks]], estimate its distance to the query as the sum
    * of per-subvector ||q_s − codeword||² looked up from an m×k
    * driver table (asymmetric distance computation), keep the
    * `rerank` best estimates, then exact-cosine rerank to the final
    * k. The scan never touches more than the m argmin expressions
    * per row; candidate selection is TakeOrdered (no global sort);
    * only `rerank` rows get the full-dimension cosine.
    *
    * Deterministic end-to-end: codebook fit (decimal sums), argmin
    * ties to smallest code, ADC sum in fixed subvector order,
    * candidate ties to smallest id — a SQL oracle reproduces the
    * exact output.
    */
  def pqTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      m: Int = 4,
      codeK: Int = 16,
      iters: Int = 1,
      rerank: Int = 40,
      dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val books  = pqCodebooks(embeddings, idCol, vecCol, m, codeK, iters, dim)
    // ADC lookup: (s, cid) -> ||q_s − cw||², elementwise accumulation
    // in dimension order (the oracle replays the same fold)
    val lut: Map[(Int, Int), Double] = books.map { case ((s, c), cw) =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      (s, c) -> qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val withV = embeddings.withColumn("v", transform(col(vecCol), x => x.cast("double")))
    // per-subvector code + its ADC contribution, fixed s order
    val est = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
      val sub = slice(col("v"), s * subDim + 1, subDim)
      val cands = array((0 until codeK).map { c =>
        val cw = books((s, c))
        struct(
          (lit(cw.map(x => x * x).sum) - lit(2.0) * dot(sub, typedLit(cw))).as("score"),
          lit(c).as("cid"))
      }: _*)
      val code = array_min(cands).getField("cid")
      acc + element_at(typedLit((0 until codeK).map(c => lut((s, c)))), code + 1)
    }
    val cand = withV
      .select(col(idCol), col(vecCol), est.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(rerank)
    cand
      .select(col(idCol), round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** PQ encoding as a persistable column: each vector → m code ids
    * (the 4-byte-per-vector artifact a production pipeline writes
    * next to the id, like [[graft.textops.Dedup.bandIndex]] persists
    * band keys). Codes use the same argmin/tie rules as the fit, so
    * encode(fit corpus) reproduces the fit's assignments.
    */
  def pqEncode(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      books: Map[(Int, Int), Seq[Double]],
      m: Int = 4,
      codeK: Int = 16,
      dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val withV  = embeddings.withColumn("v", transform(col(vecCol), x => x.cast("double")))
    val codes = array((0 until m).map { s =>
      val sub = slice(col("v"), s * subDim + 1, subDim)
      val cands = array((0 until codeK).map { c =>
        val cw = books((s, c))
        struct(
          (lit(cw.map(x => x * x).sum) - lit(2.0) * dot(sub, typedLit(cw))).as("score"),
          lit(c).as("cid"))
      }: _*)
      array_min(cands).getField("cid")
    }: _*)
    withV.select(col(idCol), codes.as("pq_codes"))
  }

  /** PQ-ADC top-k served from a PRECOMPUTED codes column: the hot
    * query path of a deployed index — the scan reads m bytes + an id
    * per vector (never the float vectors), estimates distance by m
    * lookups into the broadcast ADC table, TakeOrdereds `rerank`
    * candidate ids, and only those join back to the embedding table
    * for the exact-cosine rerank. At 100 TB this is the difference
    * between scanning 25 TB of floats and ~1.6 TB of codes per
    * query batch.
    */
  def pqTopKFromCodes(
      codes: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      books: Map[(Int, Int), Seq[Double]],
      k: Int,
      m: Int = 4,
      codeK: Int = 16,
      rerank: Int = 40,
      dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val lut: Map[(Int, Int), Double] = books.map { case ((s, c), cw) =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      (s, c) -> qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val est = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
      acc + element_at(typedLit((0 until codeK).map(c => lut((s, c)))), element_at(col("pq_codes"), s + 1) + 1)
    }
    val cand = codes
      .select(col(idCol), est.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(rerank)
    cand
      .join(embeddings.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** BATCH PQ-ADC from precomputed codes: top-k for a whole SET of
    * queries in ONE pass over the codes relation — the serve-side
    * twin of [[ivfPqTopKBatch]] for a flat (non-IVF) PQ index. Each
    * code row fans out once per query via a broadcast qid list; ADC
    * reads the query's flat m×codeK lookup table from a broadcast
    * map; candidate and final cuts are per-qid rank windows
    * (WindowGroupLimit pushes the limit map-side), and only
    * qid×rerank rows ever join back to the float vectors. Plan size
    * is CONSTANT in the number of queries (one scan, one broadcast),
    * unlike a per-query `pqTopKFromCodes` union whose analysis and
    * scan cost grow linearly with |queries| — the same rework
    * retrieval_e2e got in round 9.
    *
    * Same ADC fold order, argmin/tie rules and rounding as
    * [[pqTopKFromCodes]]: per-qid output rows are identical to the
    * single-query path (spec-asserted).
    */
  def pqTopKFromCodesBatch(
      codes: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      books: Map[(Int, Int), Seq[Double]],
      k: Int,
      m: Int = 4,
      codeK: Int = 16,
      rerank: Int = 40,
      dim: Int = 64): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "pqTopKFromCodesBatch needs at least one query")
    // the broadcast LUT is a qid-keyed MAP: a duplicate qid would
    // silently serve ONE of the two vectors for both rows (the
    // per-query loop this replaced answered each separately) —
    // refuse loudly instead of changing semantics under the caller
    require(
      queries.map(_._1).distinct.size == queries.size,
      "pqTopKFromCodesBatch requires distinct qids per batch")
    val subDim = dim / m
    // per-query flat ADC table, indexed s*codeK + code_s (the same
    // layout ivfPqTopKBatch broadcasts)
    val lutByQid: Map[Long, Seq[Double]] = queries.map { case (qid, q) =>
      qid -> (0 until m).flatMap { s =>
        val qs = q.slice(s * subDim, (s + 1) * subDim)
        (0 until codeK).map { c =>
          qs.zip(books((s, c))).map { case (a, b) => (a - b) * (a - b) }.sum
        }
      }
    }.toMap
    val qids   = queries.map(_._1).toDF("qid")
    val qVecs  = queries.toDF("qid", "qvec")
    val lutCol = element_at(typedLit(lutByQid), col("qid"))
    val est = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
      acc + element_at(lutCol, lit(s * codeK) + element_at(col("pq_codes"), s + 1) + 1)
    }
    val wCand = Window.partitionBy(col("qid")).orderBy(col("adc"), col(idCol))
    val wFin  = Window.partitionBy(col("qid")).orderBy(desc("cos"), col(idCol))
    codes
      .crossJoin(broadcast(qids))
      .select(col("qid"), col(idCol), est.as("adc"))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= rerank)
      .join(embeddings.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qVecs), Seq("qid"))
      .select(
        col("qid"),
        col(idCol),
        round(cosine(transform(col(vecCol), x => x.cast("double")), col("qvec")), 6).as("cos"))
      .withColumn("rank", row_number().over(wFin))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rank"))
  }

  /** Batched brute-force cosine top-k: exact answers for a whole SET
    * of queries in ONE scan of the embeddings relation — the
    * exact-side twin of [[pqTopKFromCodesBatch]] (same broadcast
    * query fan-out × per-qid rank-window cut; WindowGroupLimit keeps
    * the cut map-side). Per-qid rows are identical to [[cosineTopK]]
    * on the same vector (same rounding and (cos desc, id asc) tie
    * rule). Output (qid, id, cos, rank).
    */
  def bruteTopKBatch(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "bruteTopKBatch needs at least one query")
    require(
      queries.map(_._1).distinct.size == queries.size,
      "bruteTopKBatch requires distinct qids per batch")
    val qVecs = queries.toDF("qid", "qvec")
    val wFin  = Window.partitionBy(col("qid")).orderBy(desc("cos"), col(idCol))
    embeddings
      .crossJoin(broadcast(qVecs))
      .select(
        col("qid"),
        col(idCol),
        round(cosine(transform(col(vecCol), x => x.cast("double")), col("qvec")), 6).as("cos"))
      .withColumn("rank", row_number().over(wFin))
      .filter(col("rank") <= k)
  }

  /** Index-maintenance RECALL-DRIFT gauge (r16 VERDICT #7): as
    * [[graft.streaming.StreamingExtract.pqEncodeStream]] appends
    * codes for a corpus that walks away from the FROZEN codebooks,
    * nothing else measures when the static fit stops serving well.
    * This is the periodic monitoring twin: a deterministic sample of
    * `probeN` corpus vectors (xxhash64-ranked — replayable, no RNG)
    * is answered BOTH ways, PQ-ADC over the accumulated codes
    * ([[pqTopKFromCodesBatch]], one scan) and exact brute force
    * ([[bruteTopKBatch]], one scan), and per-probe recall@k
    * aggregates to one row (n_probes, mean_recall, min_recall). Run
    * it on a schedule against the serving tables the stream's sink
    * maintains; a declining mean_recall is the re-fit/re-encode
    * trigger the pqEncodeStream contract names. Driver state is the
    * probeN sampled vectors — bounded by the parameter, the same
    * documented consumer split as the `*OfSnapshot` gauges;
    * everything else is two corpus scans with broadcast-only joins.
    */
  def pqRecallGauge(
      codes: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      books: Map[(Int, Int), Seq[Double]],
      k: Int,
      m: Int = 4,
      codeK: Int = 16,
      rerank: Int = 40,
      dim: Int = 64,
      probeN: Int = 8,
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(probeN > 0, s"probeN must be positive (got $probeN)")
    val probes = embeddings
      .select(col(idCol), col(vecCol), xxhash64(col(idCol), lit(seed)).as("_h"))
      .orderBy(col("_h"), col(idCol))
      .limit(probeN)
      .collect()
      .map { r =>
        (r.getAs[Number](0).longValue,
          r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toSeq)
      }
      .toSeq
    val pq    = pqTopKFromCodesBatch(codes, embeddings, idCol, vecCol, probes, books, k, m, codeK, rerank, dim)
    val exact = bruteTopKBatch(embeddings, idCol, vecCol, probes, k)
    val overlap = exact
      .select(col("qid"), col(idCol))
      .join(pq.select(col("qid"), col(idCol)), Seq("qid", idCol), "left_semi")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_overlap"))
    // a probe whose lists are fully disjoint drops out of the join:
    // restore it as recall 0 rather than silently shrinking the mean
    probes.map(_._1).toDF("qid")
      .join(overlap, Seq("qid"), "left")
      .select(coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .agg(
        count(lit(1)).cast("int").as("n_probes"),
        round(avg(col("n_overlap").cast("double") / k), 6).as("mean_recall"),
        round(min(col("n_overlap").cast("double") / k), 6).as("min_recall"))
  }

  /** IVF-PQ: the composed production index (Faiss's workhorse
    * layout, from the same TPAMI'11 paper) — a coarse IVF probe
    * prunes the corpus to `nProbe` buckets, PQ-ADC scores only the
    * survivors, exact cosine reranks the top `rerank`. Both halves
    * are the operators verified independently above (same seed
    * conventions, same tie rules); the composition multiplies their
    * prunings: at 100 TB the query touches nProbe/nCentroids of the
    * corpus, reading m bytes per touched vector, and full floats
    * only for `rerank` rows.
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      codeK: Int = 16,
      iters: Int = 1,
      rerank: Int = 40,
      dim: Int = 64): DataFrame = {
    val centroids: Seq[(Int, Seq[Double])] = embeddings
      .orderBy(col(idCol)).limit(nCentroids).select(col(vecCol)).collect().toSeq
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue))
      .zipWithIndex.map { case (v, i) => (i, v) }
    require(
      centroids.length == nCentroids,
      s"nCentroids=$nCentroids coarse cells need that many seed vectors but the corpus has only ${centroids.length} rows")
    val books  = pqCodebooks(embeddings, idCol, vecCol, m, codeK, iters, dim)
    val subDim = dim / m
    val lut: Map[(Int, Int), Double] = books.map { case ((s, c), cw) =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      (s, c) -> qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val probes = centroids
      .map { case (i, c) =>
        val d  = c.zip(query).map { case (x, y) => x * y }.sum
        val na = math.sqrt(c.map(x => x * x).sum)
        val nb = math.sqrt(query.map(x => x * x).sum)
        (i, if (na == 0 || nb == 0) 0.0 else d / (na * nb))
      }
      .sortBy { case (i, c) => (-c, i) }.take(nProbe).map(_._1)
    val withV = embeddings.withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    val coarse = centroidCands(centroids)
    val est = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
      val sub = slice(col("v"), s * subDim + 1, subDim)
      val cands = array((0 until codeK).map { c =>
        val cw = books((s, c))
        struct(
          (lit(cw.map(x => x * x).sum) - lit(2.0) * dot(sub, typedLit(cw))).as("score"),
          lit(c).as("cid"))
      }: _*)
      acc + element_at(
        typedLit((0 until codeK).map(c => lut((s, c)))),
        array_min(cands).getField("cid") + 1)
    }
    withV
      .withColumn("centroid_id", -array_max(coarse).getField("ncid"))
      .filter(col("centroid_id").isin(probes: _*))
      .select(col(idCol), col(vecCol), est.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(rerank)
      .select(col(idCol), round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** BATCH IVF-PQ: top-k for a whole TABLE of queries in one corpus
    * scan — the shape a retrieval pipeline actually runs (thousands
    * of eval queries against the lake), where looping per-query
    * plans (retrieval_e2e's union) stops scaling. Corpus rows pair
    * ONLY with queries probing their coarse bucket (broadcast
    * (qid → probe buckets) join), so the pair stream is
    * n × Q·nProbe/nCentroids, not n × Q; ADC comes from a broadcast
    * per-query lookup map; per-query candidate and final cuts are
    * rank windows (WindowGroupLimit pushes the limit map-side).
    *
    * Queries are passed as (qid, vector) rows and must be a
    * driver-collectable batch (they broadcast twice: probe lists and
    * ADC tables). Same seeds/codebooks/tie rules as [[ivfPqTopK]] —
    * the spec asserts per-query equality with the single-query path.
    */
  def ivfPqTopKBatch(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      codeK: Int = 16,
      iters: Int = 1,
      rerank: Int = 40,
      dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroids: Seq[(Int, Seq[Double])] = embeddings
      .orderBy(col(idCol)).limit(nCentroids).select(col(vecCol)).collect().toSeq
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue))
      .zipWithIndex.map { case (v, i) => (i, v) }
    require(
      centroids.length == nCentroids,
      s"nCentroids=$nCentroids coarse cells need that many seed vectors but the corpus has only ${centroids.length} rows")
    val books  = pqCodebooks(embeddings, idCol, vecCol, m, codeK, iters, dim)
    val subDim = dim / m
    // per-query: probe buckets + flat ADC table (m×codeK doubles)
    def probesFor(q: Seq[Double]): Seq[Int] = centroids
      .map { case (i, c) =>
        val d  = c.zip(q).map { case (x, y) => x * y }.sum
        val na = math.sqrt(c.map(x => x * x).sum)
        val nb = math.sqrt(q.map(x => x * x).sum)
        (i, if (na == 0 || nb == 0) 0.0 else d / (na * nb))
      }
      .sortBy { case (i, c) => (-c, i) }.take(nProbe).map(_._1)
    val lutByQid: Map[Long, Seq[Double]] = queries.map { case (qid, q) =>
      qid -> (0 until m).flatMap { s =>
        val qs = q.slice(s * subDim, (s + 1) * subDim)
        (0 until codeK).map { c =>
          qs.zip(books((s, c))).map { case (a, b) => (a - b) * (a - b) }.sum
        }
      }
    }.toMap
    val probePairs = queries
      .flatMap { case (qid, q) => probesFor(q).map(b => (qid, b)) }
      .toDF("qid", "centroid_id")
    val qVecs = queries.map { case (qid, q) => (qid, q) }.toDF("qid", "qvec")

    // v AND its self-norm bound once — the previous inline form
    // recomputed dot(v,v) per centroid candidate (nCentroids x per
    // row); the shared helper reads the bound nrm column
    val withV = embeddings.withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    val coarse = centroidCands(centroids)
    val codes = array((0 until m).map { s =>
      val sub = slice(col("v"), s * subDim + 1, subDim)
      val cands = array((0 until codeK).map { c =>
        val cw = books((s, c))
        struct(
          (lit(cw.map(x => x * x).sum) - lit(2.0) * dot(sub, typedLit(cw))).as("score"),
          lit(c).as("cid"))
      }: _*)
      array_min(cands).getField("cid")
    }: _*)
    // ADC from the row's codes against THIS pair's query: flat LUT
    // indexed s*codeK + code_s
    val lutCol = element_at(typedLit(lutByQid), col("qid"))
    val est = (0 until m).foldLeft(lit(0.0)) { (acc, s) =>
      acc + element_at(lutCol, lit(s * codeK) + element_at(col("codes"), s + 1) + 1)
    }
    val wCand = Window.partitionBy(col("qid")).orderBy(col("adc"), col(idCol))
    val wFin  = Window.partitionBy(col("qid")).orderBy(desc("cos"), col(idCol))
    withV
      .withColumn("centroid_id", -array_max(coarse).getField("ncid"))
      .withColumn("codes", codes)
      .join(broadcast(probePairs), Seq("centroid_id"))
      .select(col("qid"), col(idCol), col("v"), est.as("adc"))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= rerank)
      .join(broadcast(qVecs), Seq("qid"))
      .select(col("qid"), col(idCol), round(cosine(col("v"), col("qvec")), 6).as("cos"))
      .withColumn("rank", row_number().over(wFin))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rank"))
  }

  /** Deterministic spherical k-means for the IVF bucketer: seed
    * centroids = first k vectors by id (content-determined, no RNG —
    * SURVEY §7 hard part (d)), then `iters` Lloyd rounds: assign each
    * vector to its max-cosine centroid (broadcast k×d doubles inside
    * the plan), recompute centroids as per-dimension means. Each
    * round is ONE scan + one k-group aggregation; only the k×d
    * centroid matrix ever reaches the driver. Empty clusters keep
    * their previous centroid (deterministic, no resampling).
    */
  def kmeansCentroids(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      dim: Int = 64): Seq[(Int, Seq[Double])] = {
    var centroids: Seq[(Int, Seq[Double])] = embeddings
      .orderBy(col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .toSeq
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue))
      .zipWithIndex
      .map { case (v, i) => (i, v) }
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    (0 until iters).foreach { _ =>
      val cands = array(centroids.map { case (i, c) =>
        val cn = math.sqrt(c.map(x => x * x).sum)
        val cos = when(col("nrm") === 0.0 || lit(cn) === 0.0, 0.0)
          .otherwise(dot(col("v"), typedLit(c)) / (col("nrm") * lit(cn)))
        struct(cos.as("cos"), lit(-i).as("ncid"))
      }: _*)
      // decimal sums, not double avg: decimal addition is
      // order-independent, so the recomputed centroids are
      // bit-stable across partitionings/cluster sizes (double
      // partial sums would drift in the low bits and could flip
      // assignment for near-tied vectors). The decimal(27,18)
      // quantization of each element is itself deterministic, and
      // the mean divides the exact sum AS A DOUBLE (not decimal
      // division) so a SQL oracle replays it bit-for-bit.
      val means = withV
        .withColumn("cid", -array_max(cands).getField("ncid"))
        .groupBy(col("cid"))
        .agg(
          count(lit(1)).as("n"),
          (0 until dim).map(d =>
            (sum(element_at(col("v"), d + 1).cast("decimal(27,18)")).cast("double") / count(lit(1)))
              .as(s"m$d")): _*)
        .collect()
        .map(r => r.getAs[Int]("cid") -> (0 until dim).map(d => r.getAs[Double](s"m$d")))
        .toMap
      centroids = centroids.map { case (i, prev) => (i, means.getOrElse(i, prev).toSeq) }
    }
    centroids
  }

  /** Cluster label purity (embedding-quality / label-noise card):
    * assign every vector to its nearest centroid (the shared
    * [[centroidCands]] assignment, so clusters agree bit-for-bit
    * with the IVF/semdedup/prune paths), then per cluster report the
    * majority label and its share — low purity flags clusters where
    * the embedding geometry disagrees with the labels (noisy labels
    * or an embedder blind to the class boundary). Majority ties
    * break to the smallest label.
    *
    * Scale shape: one scan with the broadcast k×d candidate
    * expression (shuffle-free assignment), a (cluster, label) hash
    * aggregation, then a cluster-keyed fold over the ≤ k×|labels|
    * result — nothing downstream of the first agg scales with rows.
    *
    * Output: (centroid_id, n_vecs, top_label, n_top, purity).
    */
  def clusterLabelPurity(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      nCentroids: Int,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val cents = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    val assigned = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
      .withColumn("centroid_id", -array_max(centroidCands(cents)).getField("ncid"))
    assigned
      .groupBy(col("centroid_id"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("centroid_id"))
      .agg(
        sum(col("c")).as("n_vecs"),
        max(struct(col("c").as("c"), (-col("label")).as("nl"))).as("m"))
      .select(
        col("centroid_id"),
        col("n_vecs").cast("bigint").as("n_vecs"),
        (-col("m.nl")).as("top_label"),
        col("m.c").cast("bigint").as("n_top"),
        round(col("m.c").cast("double") / col("n_vecs"), 6).as("purity"))
      .orderBy(col("centroid_id"))
  }

  /** Simplified silhouette per cluster (Rousseeuw 1987, centroid
    * approximation): with cosine distance d(x, c) = 1 − cos(x, c),
    * a = distance to the OWN centroid, b = distance to the nearest
    * OTHER centroid, s = (b − a)/max(a, b) — the geometry-quality
    * companion to [[clusterLabelPurity]]'s label purity (s near 1 =
    * tight well-separated cluster, near 0 = boundary mush). The
    * centroid form is the one that scales: true silhouette is
    * O(N²) pairwise, this is O(N·k) against the same broadcast
    * centroid list every other centroid consumer uses, bit-identical
    * assignments included.
    *
    * Per-row silhouettes round to 6dp, then average through exact
    * decimal sums (order-independent — a float fold would expose
    * partition order). Output: (centroid_id, n_vecs, mean_sil).
    */
  def clusterSilhouette(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val cents = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    // with one centroid there is no "nearest other": the filtered
    // candidate array is empty, array_max yields NULL and every
    // silhouette silently comes back NULL — fail fast instead
    require(cents.length >= 2, s"clusterSilhouette needs >= 2 centroids, got ${cents.length}")
    val scored = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
      .withColumn("cands", centroidCands(cents))
      .withColumn("best", array_max(col("cands")))
      .withColumn(
        "second",
        array_max(filter(col("cands"), c => c.getField("ncid") =!= col("best").getField("ncid"))))
      .select(
        (-col("best").getField("ncid")).as("centroid_id"),
        (lit(1.0) - col("best").getField("cos")).as("a"),
        (lit(1.0) - col("second").getField("cos")).as("b"))
      .withColumn(
        "sil",
        round(
          when(greatest(col("a"), col("b")) > 0,
            (col("b") - col("a")) / greatest(col("a"), col("b"))).otherwise(lit(0.0)),
          6))
    scored
      .groupBy(col("centroid_id"))
      .agg(
        count(lit(1)).cast("bigint").as("n_vecs"),
        round(
          sum(col("sil").cast("decimal(27,18)")).cast("double") / count(lit(1)),
          6).as("mean_sil"))
      .orderBy(col("centroid_id"))
  }

  /** MMR diversified top-k (Carbonell & Goldstein 1998): greedily
    * pick the document maximizing
    * λ·cos(q, d) − (1−λ)·max_{s∈selected} cos(d, s), so near-copies
    * of an already-picked hit are pushed down — the de-duplicated
    * serving answer brute-force/IVF top-k cannot give.
    *
    * Scale split: relevance scoring is the distributed part — one
    * scan + a `candN`-row TakeOrdered (the same plan as
    * [[cosineTopK]], candN ≈ 5–10× k). The greedy loop is inherently
    * sequential (selection i depends on 1..i−1), so it runs on the
    * DRIVER over only the candN collected candidates — k·candN
    * cosines of driver math, invariant in corpus size (the same
    * bounded-driver split as [[kmeansCentroids]]). Cosines round to
    * 6 dp before comparison, ties to the smaller id — deterministic
    * across partitionings.
    *
    * Output: (id, cos, mmr, rank) in selection order.
    */
  def mmrRerank(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      candN: Int = 100,
      lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && candN >= k, s"need candN >= k >= 1, got k=$k candN=$candN")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = embeddings.sparkSession
    import spark.implicits._

    val cands = embeddings
      .select(
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"),
        round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col("id"))
      .limit(candN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      // duplicate ids would desync the loop bound from the remaining
      // set (each pick removes ALL rows of its id) and alias one
      // maxSim slot — keep the best-ranked row per id
      .distinctBy(_._1)

    def cosD(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

    // incremental greedy: maxSim to the selected set needs only an
    // update against the LAST pick — k·candN cosines total
    val selected  = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Int)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    val maxSim    = scala.collection.mutable.Map(cands.map(c => c._1 -> 0.0): _*)
    while (selected.size < math.min(k, cands.length)) {
      val best = remaining
        .map { case (id, _, cosQ) => (id, cosQ, r6(lambda * cosQ - (1 - lambda) * maxSim(id))) }
        .maxBy { case (id, _, mmr) => (mmr, -id) }
      selected += ((best._1, best._2, best._3, selected.size + 1))
      val bestVec = remaining.find(_._1 == best._1).get._2
      remaining.filterInPlace(_._1 != best._1)
      remaining.foreach { case (id, v, _) =>
        maxSim(id) = math.max(maxSim(id), r6(cosD(v, bestVec)))
      }
    }
    selected.toSeq.toDF("id", "cos", "mmr", "rank")
      .select(col("id").as(idCol), col("cos"), col("mmr"), col("rank"))
  }

  /** PCA whitening of an embedding column (the retrieval-quality
    * fix for anisotropic encoders — Su et al. 2021 "Whitening
    * Sentence Representations"): x ↦ Λ^(−1/2)·Vᵀ·(x − μ) with
    * (V, Λ) the eigensystem of the corpus covariance, so whitened
    * coordinates have identity covariance.
    *
    * Scale split: the covariance needs only Σx and Σxxᵀ — ONE
    * distributed treeAggregate with dim+dim² doubles of state per
    * partition (the classic bounded-moment accumulation; a dim²
    * column aggregation would bloat codegen at dim=64). The
    * eigendecomposition is cyclic Jacobi on the driver's dim×dim
    * matrix — corpus-size invariant, the same driver-side split as
    * [[kmeansCentroids]]. The whitening APPLY is shuffle-free:
    * dim codegen'd [[dot]] expressions against broadcast rows of the
    * whitening matrix.
    *
    * Output: input columns with `outCol` = whitened ARRAY<DOUBLE>.
    */
  def pcaWhiten(
      embeddings: DataFrame,
      vecCol: String,
      outCol: String,
      dim: Int,
      eps: Double = 1e-9): DataFrame = {
    val (n, sums, gram) = embeddings
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .rdd
      .map(_.getSeq[Double](0).toArray)
      .treeAggregate((0L, new Array[Double](dim), new Array[Double](dim * dim)))(
        seqOp = { case ((cnt, s, g), v) =>
          var i = 0
          while (i < dim) {
            s(i) += v(i)
            var j = 0
            while (j < dim) { g(i * dim + j) += v(i) * v(j); j += 1 }
            i += 1
          }
          (cnt + 1, s, g)
        },
        combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
          var i = 0
          while (i < dim) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < dim * dim) { g1(i) += g2(i); i += 1 }
          (c1 + c2, s1, g1)
        })
    require(n > 1, s"pcaWhiten needs at least 2 vectors, got $n")
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) => gram(i * dim + j) / n - mean(i) * mean(j))
    val (eigVals, eigVecs) = jacobiEigen(cov, dim)
    // rows of W: scaled eigenvectors λ^(-1/2)·vᵀ, eigenvalue floor eps
    val w = Array.tabulate(dim) { d =>
      val s = 1.0 / math.sqrt(math.max(eigVals(d), eps))
      (0 until dim).map(i => eigVecs(i)(d) * s).toArray
    }
    val vSub = zip_with(
      transform(col(vecCol), x => x.cast("double")),
      typedLit(mean.toSeq),
      (a, b) => a - b)
    val whitened = array(w.map(row => dot(col("__centered"), typedLit(row.toSeq))).toIndexedSeq: _*)
    embeddings
      .withColumn("__centered", vSub)
      .withColumn(outCol, whitened)
      .drop("__centered")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic sweep order, converges quadratically; returns
    * (eigenvalues desc-sorted, column-eigenvector matrix in the same
    * order). Driver-side dim×dim math only.
    */
  private def jacobiEigen(m: Array[Array[Double]], dim: Int): (Array[Double], Array[Array[Double]]) = {
    val a = Array.tabulate(dim, dim)((i, j) => m(i)(j))
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < dim) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < dim) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until dim).sortBy(d => -a(d)(d))
    val vals  = order.map(d => a(d)(d)).toArray
    val vecs  = Array.tabulate(dim, dim)((i, d) => v(i)(order(d)))
    (vals, vecs)
  }

  /** Bucketed near-duplicate pairs by embedding cosine: candidate
    * pairs only within the same bucket (IVF/LSH-style blocking), so
    * the join is an equi-join on the bucket key — shuffle scales with
    * bucket sizes, never n².
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      bucketCol: String,
      idCol: String,
      vecCol: String): DataFrame = {
    // precompute per-row norms once; the pair stage computes only the
    // cross dot product (3× fewer flops than re-deriving norms per
    // pair). Expression form beats a Scala UDF here: the UDF pays
    // UnsafeArrayData→Seq boxing per pair, while the codegen'd dot
    // expression reads the arrays in place.
    val withNorm = embeddings.select(
      col(bucketCol),
      col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", dot(col("v"), col("v")))
    val a = withNorm.select(col(bucketCol), col(idCol).as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col(bucketCol), col(idCol).as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq(bucketCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "cos",
        when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
          .otherwise(dot(col("va"), col("vb")) / (sqrt(col("na")) * sqrt(col("nb")))))
      .select(col(bucketCol), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Mean-pooled embedding per group (contriever mean pooling,
    * `retrieval.py:5-36`, lifted from token→doc to doc→group):
    * element-wise mean over every vector in the group, long form
    * (group, dim, mean, n_vecs) — one posexplode + one hash
    * aggregation keyed (group, dim), partial map-side combine for
    * free, no wide rows. Decimal sums make the means bit-stable
    * across partitionings (same argument as kmeansCentroids); the
    * mean divides the exact sum AS A DOUBLE so a SQL oracle replays
    * it bit-for-bit.
    */
  def meanPool(embeddings: DataFrame, groupCol: String, vecCol: String): DataFrame =
    embeddings
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col(groupCol), (col("d") + 1).cast("int").as("dim"))
      .agg(
        count(lit(1)).cast("int").as("n_vecs"),
        round(
          sum(col("x").cast("double").cast("decimal(27,18)")).cast("double") / count(lit(1)),
          6).as("mean"))

  /** Pairwise cosine between per-label MEAN embeddings — the
    * class-separability / source-drift card (two labels whose
    * centroids cosine ≈ 1 are indistinguishable to the embedder;
    * a mixer reads this before trusting label-blocked semdedup).
    * Means use the [[kmeansCentroids]] decimal-sum recipe, so they
    * are bit-stable across partitionings and an SQL oracle replays
    * them exactly.
    *
    * Scale split: ONE grouped aggregation carrying dim decimal sums
    * per label (the corpus-scale part); the |labels|×dim means
    * collect to the driver (the kmeansCentroids k×dim split) and the
    * ≤ |labels|² pairwise cosines are driver math.
    *
    * `groupCol` must be an INTEGER label column (it is read as Int
    * at the driver and ordered numerically for the a < b pairing);
    * string groups belong to the per-group text cards, not this one.
    *
    * Output: (label_a, label_b, cos) for label_a < label_b.
    */
  def labelCentroidSim(
      embeddings: DataFrame,
      groupCol: String,
      vecCol: String,
      dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .groupBy(col(groupCol).as("g"))
      .agg(
        count(lit(1)).as("n"),
        (0 until dim).map(d =>
          (sum(element_at(col("v"), d + 1).cast("decimal(27,18)")).cast("double") / count(lit(1)))
            .as(s"m$d")): _*)
      .collect()
    val means = rows
      .map(r => r.getAs[Int]("g") -> (0 until dim).map(d => r.getAs[Double](s"m$d")).toArray)
      .sortBy(_._1)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = for {
      (ga, va) <- means
      (gb, vb) <- means
      if ga < gb
    } yield {
      var ab = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < dim) { ab += va(d) * vb(d); na += va(d) * va(d); nb += vb(d) * vb(d); d += 1 }
      val c = if (na == 0.0 || nb == 0.0) 0.0 else ab / (math.sqrt(na) * math.sqrt(nb))
      (ga, gb, r6(c))
    }
    out.toSeq.toDF("label_a", "label_b", "cos")
  }

  /** Per-label embedding L2-norm statistics — the calibration card
    * for int8/PQ quantization (a label whose norms spread wide needs
    * per-row scales; see [[int8TopK]]). Mean uses the decimal-sum
    * recipe (order-free, oracle-replayable); min/max are exact.
    * One scan, one grouped aggregation.
    */
  def normStats(embeddings: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    embeddings
      .select(col(groupCol), sqrt(dot(v, v)).as("nrm"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_vecs"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(sum(col("nrm").cast("decimal(27,18)")).cast("double") / count(lit(1)), 6).as("mean_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
  }

  /** Recall@k of an approximate top-k against the exact top-k — the
    * quality gauge every production ANN deployment tracks next to its
    * latency. Inputs are the two ranked frames (only the first k rows
    * of each are considered); output is one row (n_overlap, recall).
    */
  /** Matryoshka truncation gauge (Kusupati et al. 2022's
    * matryoshka-representation intuition, measured the engine's way):
    * recall@k of brute-force cosine retrieval using only the FIRST d
    * dimensions of each embedding, per candidate prefix d — the
    * decay curve a storage planner reads before deciding how many
    * dims the serving tier can drop. Truncation is a pure `slice`
    * projection (no re-encode); the full-dim top-k computes ONCE
    * (k rows, checkpointed) and each prefix is one scan + TakeOrdered
    * — the cosineTopK shape, no shuffle.
    *
    * Output: (d_prefix, n_overlap, recall), one row per dim.
    */
  def matryoshkaRecall(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), s"dims must be positive (got $dims)")
    val full = cosineTopK(embeddings, idCol, vecCol, query, k)
      .select(col(idCol))
      .localCheckpoint(eager = true) // k rows; reused by every prefix gauge
    dims.map { d =>
      val trunc  = embeddings.select(col(idCol), slice(col(vecCol), 1, d).as("_mrv"))
      val approx = cosineTopK(trunc, idCol, "_mrv", query.take(d), k)
      recallAtK(full, approx, idCol, k)
        .select(lit(d).as("d_prefix"), col("n_overlap"), col("recall"))
    }.reduce(_ unionByName _)
  }

  def recallAtK(exact: DataFrame, approx: DataFrame, idCol: String, k: Int): DataFrame =
    exact
      .limit(k)
      .select(col(idCol))
      .join(approx.limit(k).select(col(idCol)), Seq(idCol), "left_semi")
      .agg(count(lit(1)).cast("int").as("n_overlap"))
      .select(
        col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("recall"))

  /** Full ranking-quality report of an approximate retriever against
    * the exact top-k (the IR-evaluation triple every ANN index ships
    * with next to recall): precision@k (= recall here, both lists
    * are length k), MRR (reciprocal rank of the FIRST exact-set
    * member in the approximate list — the "how fast does a user see
    * a true neighbor" number), and binary-relevance NDCG@k (DCG of
    * exact-set members at their approximate ranks over the ideal
    * DCG — position-weighted overlap, the metric that separates
    * "right set, scrambled order" from "right order").
    *
    * BOTH inputs must carry the 1-based `rank` column the top-k
    * operators emit — rows are taken by `rank <= k`, never by a bare
    * limit (an unordered Limit keeps an ARBITRARY subset of a longer
    * ranked list). Ideal DCG is computed from the exact side's own
    * ranks, so an exact list shorter than k yields the correctly
    * smaller denominator instead of a silently deflated NDCG.
    * Engine-exact: each DCG term 1/log2(rank+1) is ln of small
    * integers quantized to DECIMAL(27,18) before the (order-free)
    * sums on both sides of the division; one rounded double per
    * metric at the end. Scale shape: both inputs are ≤k-row
    * relations — the semi-join and the single-row aggregates are
    * broadcast-trivial next to the index scans that produced them.
    */
  def rankMetricsAtK(exact: DataFrame, approx: DataFrame, idCol: String, k: Int): DataFrame = {
    def dcgTerm(rank: Column): Column =
      (lit(1.0) / (log(rank.cast("double") + 1.0) / log(lit(2.0)))).cast("decimal(27,18)")
    val ex = exact.filter(col("rank") <= k)
    val rel = approx
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"))
      .join(ex.select(col(idCol)), Seq(idCol), "left_semi")
    val ideal = ex.agg(sum(dcgTerm(col("rank"))).as("idcg"))
    rel
      .agg(
        count(lit(1)).cast("int").as("n_overlap"),
        min(col("rank")).as("first_rel"),
        sum(dcgTerm(col("rank"))).as("dcg"))
      .crossJoin(broadcast(ideal))
      .select(
        col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 6).as("p_at_k"),
        round(when(col("first_rel").isNull, 0.0).otherwise(lit(1.0) / col("first_rel")), 6).as("mrr"),
        round(
          when(col("idcg").isNull || col("idcg") === 0, 0.0)
            .otherwise(coalesce(col("dcg").cast("double"), lit(0.0)) / col("idcg").cast("double")),
          6).as("ndcg"))
  }

  /** Prototypicality pruning (the SemDeDup-family curation step from
    * the DataComp/SSL-prototypes line: Sorscher et al. 2022 "Beyond
    * neural scaling laws" — keep examples by distance to their
    * cluster prototype): assign every embedding to its nearest
    * centroid, rank within the cluster by cosine-to-centroid, and
    * KEEP the top ceil(keepNum/keepDen · |cluster|) rows — the
    * most prototypical examples; the far tail (likely noise/outliers
    * at pretraining scale) is dropped. The keep fraction is a
    * RATIONAL (default 4/5) so the cut index is integer-exact and
    * engine-replayable — no float-boundary flakes at cluster sizes
    * where 0.8·n lands on an integer.
    *
    * Scale shape: assignment is a per-row argmax over broadcast
    * centroids (bound-column double vector, one codegen'd dot per
    * centroid — the ivfTopK pattern); the rank and cluster size come
    * from ONE window shuffle keyed on centroid_id. At 100 TB
    * nCentroids grows (√N, kmeans-learned via [[kmeansCentroids]])
    * so clusters stay executor-sized; pass `learnedCentroids` for
    * that path — the gate runs the deterministic first-k seeds.
    */
  def prototypePrune(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int = 16,
      keepNum: Int = 4,
      keepDen: Int = 5,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum, s"keep fraction $keepNum/$keepDen not in (0,1]")
    val centroids = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    // shared [[centroidCands]] argmax — a row lands in the same
    // cluster whether it is being indexed, pruned, or deduped
    val assigned = withV
      .withColumn("best", array_max(centroidCands(centroids)))
      .select(
        col(idCol),
        (-col("best.ncid")).as("centroid_id"),
        round(col("best.cos"), 6).as("cos_centroid"))
    val w = Window.partitionBy(col("centroid_id"))
    assigned
      .withColumn("rank_in_cluster",
        row_number().over(w.orderBy(desc("cos_centroid"), col(idCol))))
      .withColumn("n_in_cluster", count(lit(1)).over(w).cast("int"))
      // rank ≤ ceil(keepNum·n/keepDen) via integer arithmetic:
      // (rank−1)·keepDen < keepNum·n  ⟺  rank ≤ ceil(keepNum·n/keepDen)
      .filter((col("rank_in_cluster") - 1) * keepDen < col("n_in_cluster") * keepNum)
      .select(col(idCol), col("centroid_id"), col("cos_centroid"),
        col("rank_in_cluster"), col("n_in_cluster"))
  }

  /** Deterministic random-hyperplane value: md5-derived uniform in
    * [-1, 1] (same hash60 construction the dedup signatures use —
    * engine-portable, no RNG). Plane b, dimension d (1-based d, to
    * match SQL list indexing).
    */
  def lshPlaneValue(b: Int, d: Int): Double = {
    val md  = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"lsh:$b:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) / 1152921504606846976.0) * 2 - 1
  }

  /** LSH-bucketed ANN top-k: random-hyperplane (SimHash-for-cosine)
    * signatures with multi-probe — candidates are rows whose nBits-bit
    * signature is within `maxHamming` of the query's, ranked by exact
    * cosine. The scale path next to IVF: signatures are per-row
    * expressions (nBits codegen'd dot products, no shuffle), the
    * Hamming filter prunes the lake scan to a few buckets, and the
    * top-k is a TakeOrdered over survivors — at 100 TB the signature
    * becomes a partition column so probing touches only
    * 2^maxHamming-choose-style partitions instead of scanning.
    * Deterministic end-to-end: hyperplanes are md5-derived constants.
    */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nBits: Int = 6,
      maxHamming: Int = 2): DataFrame = {
    val dim    = query.length
    val planes = (0 until nBits).map(b => (1 to dim).map(d => lshPlaneValue(b, d)))
    // query signature: same sequential fold the row side uses
    val qSig = planes.zipWithIndex.map { case (p, b) =>
      val dp = query.zip(p).foldLeft(0.0) { case (acc, (a, c)) => acc + a * c }
      if (dp > 0) 1L << b else 0L
    }.sum
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    val sig = planes.zipWithIndex
      .map { case (p, b) => when(dot(col("v"), typedLit(p)) > 0, 1L << b).otherwise(0L) }
      .reduce(_ + _)
    val qn = math.sqrt(query.foldLeft(0.0)((acc, a) => acc + a * a))
    val cos = when(col("nrm") === 0.0 || lit(qn) === 0.0, 0.0)
      .otherwise(dot(col("v"), typedLit(query)) / (sqrt(col("nrm")) * lit(qn)))
    val scored = withV
      .withColumn("sig", sig)
      .filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= maxHamming)
      .select(col(idCol), col("sig"), round(cos, 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
    scored.withColumn("rank", row_number().over(Window.orderBy(desc("cos"), col(idCol))))
  }

  /** Reciprocal-rank fusion of independently ranked candidate lists
    * (hybrid retrieval: lexical BM25 + dense cosine is the canonical
    * pair). Each input carries (id, rank); fused score per id is
    * Σ 1/(k0 + rank) over the lists that ranked it, k0 = 60 from the
    * original RRF formulation (Cormack et al., SIGIR'09 — public
    * method, reimplemented from the formula).
    *
    * Scale shape: the inputs are already top-N frames (tiny); the
    * fusion is a union + one hash aggregation on id + a k-row
    * TakeOrdered. At 100 TB the per-list retrieval does the heavy
    * lifting (each with its own index path); fusion cost stays
    * O(lists × N) regardless of corpus size.
    */
  def rrfFusion(ranked: Seq[DataFrame], idCol: String, k: Int, k0: Int = 60): DataFrame = {
    val contrib = ranked
      .map(df => df.select(col(idCol), (lit(1.0) / (lit(k0) + col("rank"))).as("c")))
      .reduce(_.unionByName(_))
    contrib
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_lists"), round(sum(col("c")), 6).as("rrf"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(desc("rrf"), col(idCol))))
  }

  /** Symmetric per-vector int8 scalar quantization + quantized top-k
    * (the memory-bound ANN path: 4 bytes/dim → 1 byte/dim means a
    * 100 TB float corpus scans as 25 TB; the asymmetric-distance
    * reconstruction below is how FAISS-style SQ8 indexes score).
    *
    * Quantization: scale = 127 / max|v| per vector (scale 0 for the
    * zero vector), q_i = floor(v_i·scale + 0.5) — explicit floor
    * formula, not `round`, so both engines agree on halfway cases for
    * negative values. Approximate score reconstructs the dot product
    * as dot(q_v, q_query) / (scale_v · scale_query); int products are
    * ≤ 64·127² so the double arithmetic is exact and the SQL oracle
    * replays bit-for-bit. Ranking: approx score desc (rounded 6dp),
    * id asc. The exact cosine of each survivor is attached as the
    * rerank column a production pipeline would sort by after fetching
    * the float vectors of just these k rows.
    */
  def int8TopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val qAmax  = query.map(math.abs).max
    val qScale = if (qAmax == 0) 0.0 else 127.0 / qAmax
    val qQ     = query.map(x => math.floor(x * qScale + 0.5))
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale", when(col("amax") === 0.0, 0.0).otherwise(lit(127.0) / col("amax")))
      // Spark floor() yields LONG — cast back so dotD sees doubles
      // (values are integral either way; DuckDB floor stays DOUBLE)
      .withColumn("qv", transform(col("v"), x => floor(x * col("scale") + lit(0.5)).cast("double")))
    val qdot = dot(col("qv"), typedLit(qQ))
    val approx = when(col("scale") === 0.0 || lit(qScale) === 0.0, 0.0)
      .otherwise(qdot / (col("scale") * lit(qScale)))
    withV
      .select(
        col(idCol),
        round(approx, 6).as("score_q8"),
        round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("score_q8"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(desc("score_q8"), col(idCol))))
  }

  /** Binary (1-bit) quantization ANN — the most compressed serving
    * tier after int8 ([[int8TopK]]) and PQ: each vector collapses to
    * its sign pattern (bit i set iff v[i] > 0 — hyperplane LSH with
    * axis-aligned planes), packed into two 32-bit words per 64 dims,
    * candidate ranking by Hamming distance to the query's pattern
    * (monotone in angular distance in expectation), exact cosine
    * rerank of the `rerank` closest patterns. 8 bytes/vector: at
    * 100 TB of fp32 embeddings the sign index is ~3% of the corpus
    * and the Hamming scan is two xor+popcount per row — the
    * cheapest first-stage filter there is.
    *
    * Packing is two 32-bit words (not one 64-bit) so the bit sums
    * stay in exact-integer DOUBLE range on any engine — the whole
    * pipeline (pack, xor, popcount, rerank) replays bit-for-bit in
    * the oracle. Ranking: (hamming asc, id) for candidates, then
    * (cos desc, id) for the final k.
    */
  def binaryTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      rerank: Int = 40,
      dim: Int = 64): DataFrame = {
    require(dim == 64, "binaryTopK packs exactly 64 dims into two 32-bit words")
    // runtime guard: a shorter vector would silently pack missing
    // dims as 0-bits (element_at past the end is NULL → non-positive)
    val lenOk = assert_true(
      size(col(vecCol)) === dim,
      lit(s"binaryTopK: embedding length != $dim"))
    def packWord(vec: Column, lo: Int): Column =
      aggregate(
        sequence(lit(lo), lit(lo + 31)),
        lit(0L),
        (acc, i) =>
          acc + when(
            element_at(vec, (i + 1).cast("int")) > 0.0,
            pow(lit(2.0), (i - lit(lo)).cast("double")).cast("long")).otherwise(lit(0L)))
    def packQ(lo: Int): Long =
      (0 until 32).map(j => if (query(lo + j) > 0.0) 1L << j else 0L).sum
    val (q0, q1) = (packQ(0), packQ(32))
    val cand = embeddings
      .withColumn("v", when(lenOk.isNull, transform(col(vecCol), x => x.cast("double"))))
      .select(
        col(idCol),
        col(vecCol),
        (bit_count(packWord(col("v"), 0).bitwiseXOR(lit(q0))) +
          bit_count(packWord(col("v"), 32).bitwiseXOR(lit(q1)))).cast("int").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(rerank)
    cand
      .select(
        col(idCol),
        col("hamming"),
        round(cosineToQuery(col(vecCol), query), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public method, reimplemented from the paper's
    * formulation): cluster the embeddings, then prune within each
    * cluster any vector that is τ-cosine-similar to a *preceding*
    * vector in centroid-distance order. Per the paper the survivor of
    * a similar set is the one FARTHEST from its centroid ("keep
    * outliers"), and similarity is evaluated against all predecessors
    * (upper-triangular matrix), not greedily chained.
    *
    * Output: (id, cluster_id, cos_c, is_kept) — every input row, with
    * its cluster, rounded cosine-to-centroid, and the keep verdict.
    *
    * Scale shape: this is THE point of SemDeDup — clustering bounds
    * the O(n²) pair space to Σ|cluster|², so the pair stage is an
    * equi-join on cluster_id (shuffle scales with cluster sizes,
    * never corpus²). Assignment is one scan against broadcast
    * centroid literals (codegen'd dot products, no shuffle); at
    * 100 TB, nCentroids grows to keep clusters bounded (the paper
    * uses 50k clusters for LAION) and the assignment column becomes
    * the partition key. Centroids: deterministic first-k seeds (plug
    * kmeansCentroids output in for learned ones); ordering ties
    * break on id, so the verdict is engine-replayable bit-for-bit.
    */
  def semDedup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      nCentroids: Int = 16,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val centroids = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    val asg = withV
      .withColumn("best", array_max(centroidCands(centroids)))
      .select(
        col(idCol),
        (-col("best").getField("ncid")).as("cluster_id"),
        round(col("best").getField("cos"), 6).as("cos_c"),
        col("v"),
        col("nrm"))
    // mega-cluster cap ([[withBucketSalt]]): once a cluster exceeds
    // maxBucket the predecessor relation runs within deterministic
    // sub-clusters — strictly fewer predecessors seen, so the capped
    // tier keeps MORE rows (conservative for dedup), and the paper's
    // fix (grow nCentroids until clusters fit) restores exactness
    val salted = withBucketSalt(asg, "cluster_id", idCol, maxBucket)
    // predecessors = lower rounded cos_c (farther from centroid wins),
    // ties on id — the rounded value is what both engines order by
    val a = salted.select(
      col("cluster_id"), col("_salt"),
      col(idCol).as("id_a"), col("cos_c").as("ca"), col("v").as("va"), col("nrm").as("na"))
    val b = salted.select(
      col("cluster_id"), col("_salt"),
      col(idCol).as("id_b"), col("cos_c").as("cb"), col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a
      .join(b, Seq("cluster_id", "_salt"))
      .filter(col("ca") < col("cb") || (col("ca") === col("cb") && col("id_a") < col("id_b")))
      .filter(
        round(
          when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
            .otherwise(dot(col("va"), col("vb")) / (sqrt(col("na")) * sqrt(col("nb")))),
          6) >= tau)
      .select(col("id_b").as(idCol))
      .distinct()
      .withColumn("__dropped", lit(true))
    asg
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"), col("cos_c"), col("__dropped").isNull.as("is_kept"))
      .orderBy(col(idCol))
  }

  /** Mega-bucket fan-out cap shared by every centroid-bucketed pair
    * emitter ([[bucketEpsPairs]], [[knnGraph]], [[semDedup]]): any
    * bucket holding more than `maxBucket` vectors is split into
    * ceil(n / maxBucket) deterministic sub-buckets by xxhash64(id),
    * and pairs are then sought within a sub-bucket only. Per-bucket
    * pair emission drops from n² to ≤ n·maxBucket and the largest
    * join group stays ~maxBucket regardless of centroid skew — the
    * one pair-space path that could still go quadratic on a skewed
    * bucket at lake scale (r13 VERDICT #1).
    *
    * Semantics are SPLIT, not the dedup df-cap's drop-whole: an
    * oversized centroid bucket still carries real similarity signal
    * (unlike a boilerplate shingle), so every row keeps a bounded
    * candidate set; the price is extra boundary misses across
    * sub-bucket seams — the same approximation currency every
    * bucket-bounded op here already spends, and it vanishes as
    * nCentroids grows to keep buckets under the cap. The salt is a
    * pure function of (id, exact bucket count), so both self-join
    * sides and any replay derive the identical split. Default
    * Int.MaxValue adds a constant 0 salt (no sizes aggregation, no
    * behavior change).
    */
  private def withBucketSalt(
      asg: DataFrame,
      bucketCol: String,
      idCol: String,
      maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) asg.withColumn("_salt", lit(0))
    else {
      require(maxBucket > 0, s"maxBucket must be positive (got $maxBucket)")
      val sizes = asg.groupBy(col(bucketCol)).agg(count(lit(1)).as("_bn"))
      asg
        .join(broadcast(sizes), Seq(bucketCol))
        .withColumn("_nsub", expr(s"(_bn + ${maxBucket.toLong}L - 1L) div ${maxBucket.toLong}L"))
        .withColumn(
          "_salt",
          when(col("_bn") <= maxBucket, lit(0L))
            .otherwise(pmod(xxhash64(col(idCol)), col("_nsub")))
            .cast("int"))
        .drop("_bn", "_nsub")
    }

  /** Bucket-bounded eps-neighbor pairs — the shared graph builder
    * under [[dbscanClusters]] and [[labelPropagation]]: cosine ≥
    * `eps` (rounded 6dp) pairs sought only WITHIN a coarse centroid
    * bucket, so the pair space is Σ|bucket|², never N² (the SemDeDup
    * bound; boundary-straddling pairs are the documented miss), and
    * within a (bucket, sub-bucket) once a bucket exceeds `maxBucket`
    * ([[withBucketSalt]] — caps the worst bucket's fan-out at
    * n·maxBucket). The assignment scan is persisted — it feeds the
    * sizes aggregation and both self-join sides (unpersisted: 3
    * corpus scans; a production pipeline writes the bucket column
    * once and bucket-partitions on it). Returns the persisted
    * (id_a, id_b) pair frame, id_a < id_b.
    */
  private def bucketEpsPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double,
      nCentroids: Int,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]],
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val centroids = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    val asg = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
      .withColumn("bucket", -array_max(centroidCands(centroids)).getField("ncid"))
      .select(col(idCol), col("bucket"), col("v"), col("nrm"))
      .persist()
    val salted = withBucketSalt(asg, "bucket", idCol, maxBucket)
    val a = salted.select(
      col("bucket"), col("_salt"), col(idCol).as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = salted.select(
      col("bucket"), col("_salt"), col(idCol).as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a
      .join(b, Seq("bucket", "_salt"))
      .filter(col("id_a") < col("id_b"))
      .filter(
        round(
          when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
            .otherwise(dot(col("va"), col("vb")) / (sqrt(col("na")) * sqrt(col("nb")))),
          6) >= eps)
      .select(col("id_a"), col("id_b"))
      .persist()
    pairs.count() // materialize so the asg cache can drop now
    asg.unpersist()
    pairs
  }

  /** DBSCAN-style density clustering in embedding space (Ester et
    * al. 1996), with the SemDeDup pair-space bound: eps-neighbors
    * (cosine ≥ `eps`, rounded 6dp so both engines agree) are sought
    * only WITHIN a vector's coarse centroid bucket, so the pair
    * space is Σ|bucket|², never N². Roles follow the published
    * definitions — core: ≥ `minPts` eps-neighbors; border: non-core
    * with ≥ 1 CORE eps-neighbor; noise: the rest. Clusters are
    * connected components over core–core edges (min-core-id label,
    * [[graft.textops.Dedup.connectedComponents]]); border points
    * attach to the smallest cluster id among their core neighbors
    * (deterministic, engine-replayable).
    *
    * The bucket bound makes this approximate exactly the way
    * SemDeDup is: eps-pairs straddling a bucket boundary are missed.
    * That is the documented trade that keeps density clustering
    * feasible at lake scale.
    *
    * Output: (id, n_neighbors, role, cluster_id — NULL for noise).
    */
  def dbscanClusters(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double,
      minPts: Int,
      nCentroids: Int = 16,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val pairs =
      bucketEpsPairs(embeddings, idCol, vecCol, eps, nCentroids, learnedCentroids, maxBucket)
    val deg = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("nb_id"))
      .groupBy(col("nb_id"))
      .agg(count(lit(1)).cast("int").as("n_neighbors"))
    val roles = embeddings
      .select(col(idCol))
      .join(deg, col(idCol) === col("nb_id"), "left")
      .select(col(idCol), coalesce(col("n_neighbors"), lit(0)).as("n_neighbors"))
      .withColumn("is_core", col("n_neighbors") >= minPts)
      .persist()
    val coreIds = roles.filter(col("is_core")).select(col(idCol))
    val coreEdges = pairs
      .join(coreIds.select(col(idCol).as("id_a")), Seq("id_a"), "left_semi")
      .join(coreIds.select(col(idCol).as("id_b")), Seq("id_b"), "left_semi")
    val coreClusters = Dedup
      .connectedComponents(coreIds, idCol, coreEdges)
      .withColumnRenamed("cluster_id", "core_cluster")
    // border attachment: smallest cluster id among CORE neighbors
    val coreNbr = pairs
      .select(explode(array(
        struct(col("id_a").as("nb_self"), col("id_b").as("nb_other")),
        struct(col("id_b").as("nb_self"), col("id_a").as("nb_other")))).as("e"))
      .select(col("e.nb_self"), col("e.nb_other"))
      .join(coreClusters.select(col(idCol).as("nb_other"), col("core_cluster")), Seq("nb_other"))
      .groupBy(col("nb_self"))
      .agg(min(col("core_cluster")).as("nbr_cluster"))
    val out = roles
      .join(coreClusters.select(col(idCol), col("core_cluster")), Seq(idCol), "left")
      .join(coreNbr.select(col("nb_self").as(idCol), col("nbr_cluster")), Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_neighbors"),
        when(col("is_core"), "core")
          .when(col("nbr_cluster").isNotNull, "border")
          .otherwise("noise").as("role"),
        when(col("is_core"), col("core_cluster"))
          .when(col("nbr_cluster").isNotNull, col("nbr_cluster"))
          .otherwise(lit(null).cast("long")).as("cluster_id"))
    // pairs/roles stay persisted while `out` is unconsumed (same
    // convention as connectedComponents' returned labels — small
    // relative to the corpus, evictable, callers may unpersist)
    out
  }

  /** Bucket-bounded kNN graph — the substrate op under modern
    * clustering/agglomeration (and the HNSW/UMAP neighbor lists):
    * for every vector, its `k` highest-cosine neighbors WITHIN its
    * coarse centroid bucket. Within-bucket brute force is the
    * standard IVF-style graph build: pair space Σ|bucket|², never
    * N², and the per-node top-k is a rank window Spark executes as
    * WindowGroupLimit (per-partition heaps bound the sort).
    * Boundary-straddling true neighbors are the same documented
    * miss every bucket-bounded op here accepts.
    *
    * Output: (id, nbr_rank, nbr_id, cos), rank 1..k by
    * (cos desc, nbr_id asc).
    */
  def knnGraph(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val centroids = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    // persisted: feeds BOTH self-join sides (unpersisted: two corpus
    // scans each re-running the O(rows × nCentroids) assignment);
    // same caller-may-unpersist convention as the other centroid
    // consumers — the returned plan reads through this cache
    val asg = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
      .withColumn("bucket", -array_max(centroidCands(centroids)).getField("ncid"))
      .select(col(idCol), col("bucket"), col("v"), col("nrm"))
      .persist()
    // mega-bucket cap: neighbors sought within the sub-bucket only —
    // a skewed centroid can no longer make one join group quadratic
    val salted = withBucketSalt(asg, "bucket", idCol, maxBucket)
    val a = salted.select(
      col("bucket"), col("_salt"), col(idCol).as("knn_id"), col("v").as("va"), col("nrm").as("na"))
    val b = salted.select(
      col("bucket"), col("_salt"), col(idCol).as("nbr_id"), col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("knn_id")).orderBy(desc("cos"), col("nbr_id"))
    a.join(b, Seq("bucket", "_salt"))
      .filter(col("knn_id") =!= col("nbr_id"))
      .select(
        col("knn_id"),
        col("nbr_id"),
        round(
          when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
            .otherwise(dot(col("va"), col("vb")) / (sqrt(col("na")) * sqrt(col("nb")))),
          6).as("cos"))
      .withColumn("nbr_rank", row_number().over(w))
      .filter(col("nbr_rank") <= k)
      .select(col("knn_id").as(idCol), col("nbr_rank"), col("nbr_id"), col("cos"))
  }

  /** Graph-ANN serving tier over the bucket-bounded [[knnGraph]] —
    * the HNSW-layer-0 shape (Malkov & Yashunin 2016, restricted to
    * the base layer with fixed deterministic entries) completing the
    * serving ladder binary → int8 → PQ → IVF-PQ → graph: beam search
    * from one ENTRY POINT per coarse bucket (the node most central
    * to its bucket — max cosine to its own centroid, ties to the
    * smaller id; per-bucket entries are REQUIRED because the
    * bucket-bounded build yields no cross-bucket edges), `hops`
    * fixed expansion rounds — each joins the frontier to the
    * neighbor lists, rescores candidates by EXACT cosine to the
    * query (rounded 6dp), and keeps the best `ef` by (cos desc, id)
    * — then the top-`k` of the final beam.
    *
    * Scale shape: after the one-time graph build, a query touches
    * frontier-sized relations only — each hop joins ≤ ef·knnK
    * candidate ids against the id-partitioned graph and vector
    * tables (the tiny side broadcasts; AQE pushes it as a runtime
    * filter into the big-side scan, and an id-bucketed layout makes
    * the lookup partition-pruned). Fixed hops + fixed entries keep
    * the search engine-replayable: the oracle unrolls the same
    * rounds. Recall inherits the bucket-bounded build's boundary
    * misses — [[recallAtK]] vs brute force is the honesty gauge.
    *
    * Output matches [[cosineTopK]]: (id, cos, rank).
    */
  def graphTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      ef: Int = 32,
      hops: Int = 2,
      knnK: Int = 8,
      nCentroids: Int = 16,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    require(ef >= k, s"beam width ef=$ef must be >= k=$k")
    graphBeamSearch(embeddings, idCol, vecCol, query, k, ef, hops, knnK,
      nCentroids, learnedCentroids, materializeLast = true)
  }

  /** Instrumentation face of [[graphTopK]] (PlanDump): identical loop,
    * but the FINAL hop's frame is returned WITHOUT its eager
    * materialization and the assignment cache is left registered, so
    * the per-hop operator plan — one frontier⋈graph join + one
    * rescore join against the cached assignment, zero parquet scans —
    * is explainable. Same leak contract as GraphOps'
    * materialize=false overloads: the caller owns clearCache().
    */
  private[graft] def graphTopKLastHopPlan(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      ef: Int,
      hops: Int,
      knnK: Int,
      nCentroids: Int = 16): DataFrame =
    graphBeamSearch(embeddings, idCol, vecCol, query, k, ef, hops, knnK,
      nCentroids, None, materializeLast = false)

  private def graphBeamSearch(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      ef: Int,
      hops: Int,
      knnK: Int,
      nCentroids: Int,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]],
      materializeLast: Boolean): DataFrame = {
    val (graph, entries, asg) =
      graphAndEntries(embeddings, idCol, vecCol, knnK, nCentroids, learnedCentroids)
    // rescore candidates from the PERSISTED assignment relation, not a
    // fresh corpus scan (r17 VERDICT #4): graphAndEntries already
    // assignment-scanned the corpus once, and asg's `v` IS
    // transform(vecCol → double) — `cosine(v, q)` is bit-identical to
    // the old round(cosineToQuery(vecCol, q), 6) over the raw column.
    // Before this, EVERY hop's rescore re-read the parquet embeddings.
    def rescored(ids: DataFrame): DataFrame =
      ids
        .join(asg.select(col(idCol), col("v")), Seq(idCol))
        .select(col(idCol), round(cosine(col("v"), typedLit(query)), 6).as("cos"))
    // EAGER per-hop beam (ef rows, localCheckpoint): hop h+1 reads the
    // beam TWICE (frontier expansion + candidate union), so a lazy
    // beam re-executed hop h's whole subtree both times — the plan
    // (and the corpus-join count) doubled per hop. Materialized, the
    // final plan holds one corpus-free lineage regardless of hops, and
    // the assignment cache can be released before returning.
    var beam = rescored(entries).orderBy(desc("cos"), col(idCol)).limit(ef)
      .localCheckpoint(eager = true)
    var h = 0
    while (h < hops) {
      val expanded = beam
        .select(col(idCol).as("gs_src"))
        .join(graph, Seq("gs_src"))
        .select(col("gs_nbr").as(idCol))
      val candIds = beam.select(col(idCol)).union(expanded).distinct()
      val next = rescored(candIds).orderBy(desc("cos"), col(idCol)).limit(ef)
      beam =
        if (h == hops - 1 && !materializeLast) next
        else next.localCheckpoint(eager = true)
      h += 1
    }
    if (materializeLast) asg.unpersist()
    beam
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(rankWindow(idCol)))
  }

  /** Shared build for the graph-ANN tier: the persisted (src, nbr)
    * neighbor-list relation, the one-entry-per-bucket relation
    * (max cosine-to-own-centroid, ties to the smaller id — the same
    * assignment expression every centroid consumer shares), and the
    * STILL-PERSISTED assignment relation.
    *
    * The corpus is assignment-scanned ONCE: the (id, bucket, ccos,
    * v, nrm) relation is persisted, BOTH the knnK neighbor lists
    * (identical rank rule to [[knnGraph]], rounded cos desc then
    * nbr id) and the entries derive from it, and the tiny entry set
    * is locally checkpointed. Since r18 the assignment cache is
    * handed BACK to the caller instead of being dropped here: the
    * beam loops rescore candidates from it (zero per-hop corpus
    * re-scans), then release it — ONE resident artifact remains
    * after a search (the graph: the index a serving session
    * deliberately keeps; repeated single-query callers should batch
    * via [[graphTopKBatch]] or clear it when done). The graph is no
    * longer force-counted here — the first hop's expansion fills its
    * cache from the still-live assignment cache anyway, so the
    * dedicated materialization job bought nothing.
    */
  private def graphAndEntries(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      knnK: Int,
      nCentroids: Int,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]]): (DataFrame, DataFrame, DataFrame) = {
    val centroids = seedOrLearned(embeddings, idCol, vecCol, nCentroids, learnedCentroids)
    val asg = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
      .withColumn("best", array_max(centroidCands(centroids)))
      .select(
        col(idCol),
        (-col("best").getField("ncid")).as("bucket"),
        col("best").getField("cos").as("ccos"),
        col("v"), col("nrm"))
      .persist()
    val a = asg.select(col("bucket"), col(idCol).as("gs_src"), col("v").as("va"), col("nrm").as("na"))
    val b = asg.select(col("bucket"), col(idCol).as("gs_nbr"), col("v").as("vb"), col("nrm").as("nb"))
    val wg = Window.partitionBy(col("gs_src")).orderBy(desc("gcos"), col("gs_nbr"))
    val graph = a
      .join(b, Seq("bucket"))
      .filter(col("gs_src") =!= col("gs_nbr"))
      .select(
        col("gs_src"),
        col("gs_nbr"),
        round(
          when(col("na") === 0.0 || col("nb") === 0.0, 0.0)
            .otherwise(dot(col("va"), col("vb")) / (sqrt(col("na")) * sqrt(col("nb")))),
          6).as("gcos"))
      .withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= knnK)
      .select(col("gs_src"), col("gs_nbr"))
      .persist()
    val we = Window.partitionBy(col("bucket")).orderBy(desc("ccos"), col(idCol))
    val entries = asg
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") === 1)
      .select(col(idCol))
      .localCheckpoint() // nCentroids rows, eager
    (graph, entries, asg)
  }

  /** Batch serving face of [[graphTopK]] — a query TABLE beam-searched
    * in ONE composed plan (the [[ivfPqTopKBatch]] shape): the beam is
    * a (qid, id, cos) relation over ALL queries at once, so each hop
    * is one frontier⋈graph join + one rescore join for the whole
    * batch instead of a plan branch per query. Per-query rank windows
    * cut to `ef` (and finally `k`) — WindowGroupLimit bounds the
    * sorts. Selection and cosine arithmetic are bit-identical to the
    * single-query path (A/B spec-asserted).
    *
    * Output: (qid, id, cos, rank), rank 1..k per qid.
    */
  def graphTopKBatch(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      k: Int,
      ef: Int = 32,
      hops: Int = 2,
      knnK: Int = 8,
      nCentroids: Int = 16,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    require(ef >= k, s"beam width ef=$ef must be >= k=$k")
    require(queries.nonEmpty, "graphTopKBatch needs at least one query")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (graph, entries, asg) =
      graphAndEntries(embeddings, idCol, vecCol, knnK, nCentroids, learnedCentroids)
    val qdf  = queries.toDF("qid", "qvec")
    // candidate vectors come from the persisted assignment relation
    // (asg.v IS transform(vecCol → double)) — zero per-hop corpus
    // re-scans, same cut as the single-query path (r17 VERDICT #4)
    val vecs = asg.select(col(idCol), col("v").as("gs_v"))
    val w    = Window.partitionBy(col("qid")).orderBy(desc("cos"), col(idCol))
    def rescored(ids: DataFrame): DataFrame =
      ids
        .join(vecs, Seq(idCol))
        .join(broadcast(qdf), Seq("qid"))
        .select(col("qid"), col(idCol), round(cosine(col("gs_v"), col("qvec")), 6).as("cos"))
    def cut(scored: DataFrame, n: Int): DataFrame =
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
    // per-hop EAGER beam, same rationale as [[graphTopK]]: a lazy beam
    // is read twice by the next hop, doubling the executed subtree per
    // hop; materialized (|queries|×ef rows) the final plan reads one
    // checkpoint and the assignment cache can be released on return
    var beam = cut(rescored(entries.crossJoin(broadcast(qdf.select(col("qid"))))), ef)
      .localCheckpoint(eager = true)
    var h = 0
    while (h < hops) {
      val expanded = beam
        .select(col("qid"), col(idCol).as("gs_src"))
        .join(graph, Seq("gs_src"))
        .select(col("qid"), col("gs_nbr").as(idCol))
      val candIds = beam.select(col("qid"), col(idCol)).union(expanded).distinct()
      beam = cut(rescored(candIds), ef)
        .localCheckpoint(eager = true)
      h += 1
    }
    asg.unpersist()
    beam
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rank"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002) over
    * the bucket-bounded eps-graph: seed vectors carry a one-hot
    * class mass; each of `iters` rounds every node absorbs its
    * neighbors' transition-normalized mass (f(v) ← Σ_{u∈N(v)}
    * f(u)/deg(u)) and the SEEDS are clamped back to their one-hot —
    * the standard fixed-point recipe, truncated at `iters` so the
    * computation is engine-replayable. Prediction = argmax class
    * mass (ties to the smaller label); nodes no mass reaches stay
    * NULL.
    *
    * Determinism: mass/deg is scalar IEEE; per-(node, class) sums
    * quantize to decimal(27,18) before summing (the PageRank
    * recipe). Scale shape: state per round is the (node, class,
    * mass) relation — nodes × reachable classes, never edges²; each
    * round is one edges⋈mass equi-join + one keyed sum, lineage
    * truncated per round.
    *
    * Output: (id, seed_label, pred_label, pred_mass) for every node.
    */
  def labelPropagation(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: DataFrame, // (idCol, label: int)
      eps: Double,
      iters: Int = 3,
      nCentroids: Int = 16,
      learnedCentroids: Option[Seq[(Int, Seq[Double])]] = None,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val pairs =
      bucketEpsPairs(embeddings, idCol, vecCol, eps, nCentroids, learnedCentroids, maxBucket)
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("lp_src"), col("id_b").as("lp_dst")),
        struct(col("id_b").as("lp_src"), col("id_a").as("lp_dst")))).as("e"))
      .select(col("e.lp_src"), col("e.lp_dst"))
      .persist()
    val deg = edges.groupBy(col("lp_src")).agg(count(lit(1)).as("lp_deg")).persist()
    val seedMass = seeds
      .select(col(idCol).as("lp_id"), col("label").cast("int").as("lp_label"))
      .withColumn("mass", lit(1.0))
      .persist()
    var mass = seedMass
    var i    = 0
    while (i < iters) {
      val spread = edges
        .join(mass, edges("lp_src") === mass("lp_id"))
        .join(deg, Seq("lp_src"))
        .select(
          col("lp_dst").as("lp_id"),
          col("lp_label"),
          (col("mass") / col("lp_deg")).cast("decimal(27,18)").as("m"))
        .groupBy(col("lp_id"), col("lp_label"))
        .agg(sum(col("m")).cast("double").as("mass"))
      // clamp: seeds override whatever mass arrived at them
      mass = spread
        .join(seedMass.select(col("lp_id")), Seq("lp_id"), "left_anti")
        .unionByName(seedMass)
        .localCheckpoint()
      i += 1
    }
    val best = mass
      .groupBy(col("lp_id"))
      .agg(max(struct(col("mass"), (-col("lp_label")).as("nl"))).as("b"))
      .select(
        col("lp_id"),
        (-col("b.nl")).as("pred_label"),
        round(col("b.mass"), 6).as("pred_mass"))
    val out = embeddings
      .select(col(idCol))
      .join(seedMass.select(col("lp_id").as(idCol), col("lp_label").as("seed_label")), Seq(idCol), "left")
      .join(best.select(col("lp_id").as(idCol), col("pred_label"), col("pred_mass")), Seq(idCol), "left")
    // the final mass is checkpointed, so EVERYTHING upstream of the
    // loop can release now — including bucketEpsPairs' pair cache
    // (unlike dbscanClusters, nothing in `out` references it)
    edges.unpersist()
    deg.unpersist()
    pairs.unpersist()
    out
  }

  /** Hard-negative mining for contrastive training: for every class,
    * the k out-of-class vectors nearest to the class centroid (the
    * negatives a trainer wants in the batch). Centroids are the
    * 6dp-rounded per-dimension means (meanPool's decimal-exact sums),
    * so the whole operator is deterministic and SQL-replayable.
    *
    * Scale shape: centroids reduce to one (nLabels × dim) matrix that
    * ships back into the plan as broadcast literals; mining is then a
    * single scan computing nLabels cosines per row (codegen'd dot
    * products over a hoisted double vector) + one rank window keyed by
    * the MINED label — the shuffle moves only (label, id, cos) triples,
    * never the vectors.
    */
  def hardNegatives(
      embeddings: DataFrame,
      labelCol: String,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    val centroids: Seq[(Int, Seq[Double])] = meanPool(embeddings, labelCol, vecCol)
      .collect()
      .toSeq
      .groupBy(_.getAs[Int](labelCol))
      .map { case (lbl, rows) =>
        (lbl, rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("mean")).toSeq)
      }
      .toSeq
      .sortBy(_._1)
    require(centroids.forall(_._2.length == dim), "centroid dim mismatch")
    val withV = embeddings
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", dot(col("v"), col("v")))
    val cands = array(centroids.map { case (lbl, c) =>
      val cn = c.map(x => x * x).sum
      val cos = when(col("nrm") === 0.0 || lit(cn) === 0.0, 0.0)
        .otherwise(dot(col("v"), typedLit(c)) / (sqrt(col("nrm")) * lit(math.sqrt(cn))))
      struct(lit(lbl).as("neg_label"), round(cos, 6).as("cos"))
    }: _*)
    val w = Window.partitionBy(col("neg_label")).orderBy(desc("cos"), col(idCol))
    withV
      .select(col(labelCol), col(idCol), explode(cands).as("cand"))
      .select(
        col(labelCol),
        col(idCol),
        col("cand.neg_label").as("neg_label"),
        col("cand.cos").as("cos"))
      .filter(col(labelCol) =!= col("neg_label"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("neg_label"), col("rank"), col(idCol), col(labelCol), col("cos"))
  }
}
