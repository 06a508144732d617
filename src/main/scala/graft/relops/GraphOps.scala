package graft.relops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Item-co-occurrence graph analytics over a (basket, item) relation
  * — the market-basket / co-purchase shape (orders × parts here, but
  * equally doc × shingle-bucket or user × community).
  *
  * Scale design: every pair emitter is bounded by the per-basket item
  * count (a Generate over per-basket sorted item arrays — baskets are
  * small, so the fan-out is Σ C(|basket|,2), never |items|²; one
  * grouping shuffle folds in the (basket, item) dedup, no self-join);
  * triangle counting uses the
  * degree-ordered orientation (each undirected edge directed from its
  * lower (degree, id) endpoint), which bounds every node's out-degree
  * by O(√m) and therefore the wedge join by O(m^{3/2}) — the standard
  * node-iterator bound — instead of the Σ deg² blowup an id-only
  * orientation leaves on skewed (power-law) graphs. All scalars
  * (basket count, wedge totals) ride as 1-row broadcast subqueries,
  * no driver actions inside the plan.
  */
object GraphOps {

  /** Distinct undirected co-occurrence edges (pa < pb) from a
    * (basket, item) relation. One shuffle on the basket key; output
    * bounded by Σ C(|basket|, 2).
    *
    * `maxBasket` is the fan-out cap every pair emitter in this
    * engine carries (the df-cap of the dedup family): ONE
    * pathological basket of 10⁶ items would otherwise emit 5·10¹¹
    * pairs from the self-join and take the stage down. Baskets above
    * the cap are dropped WHOLE (standard market-basket practice —
    * a mega-basket is a crawler artifact, not co-occurrence signal);
    * the default keeps everything.
    */
  /** The capped per-basket SORTED distinct-item arrays every pair
    * emitter here derives from — ONE definition so the exact and
    * sampled tiers can never drift on the mega-basket drop rule.
    *
    * This replaced the r13/r14 items-distinct + basket-key SELF-JOIN
    * emitter: `collect_set` folds the (basket, item) dedup INTO the
    * one grouping shuffle (the standalone distinct exchange is gone),
    * and pair emission becomes a per-row Generate over the array —
    * no join build, no second exchange of the items relation. At
    * sf0.1 that removed ~40% of the edge-derivation cost every graph
    * card pays. Baskets above `maxBasket` are dropped WHOLE by a size
    * filter on the aggregated array — the SAME drop rule
    * (distinct-item count > cap) the join-based form enforced, folded
    * into the one pass: a pre-pass that counts distinct items per
    * basket before aggregating is itself a full distinct-shaped
    * aggregation and cost ~40% of the gated census card. The price is
    * that a mega-basket's distinct-item set transiently lives in agg
    * state before the filter drops it — O(8 bytes × distinct items),
    * so a 10⁶-item crawler artifact is an 8 MB fold, not a stage
    * failure; inputs hostile beyond that should be pre-capped at
    * ingest, where the same count is a byproduct of parsing.
    */
  private def basketArrays(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int): DataFrame = {
    val arrays = df
      // complete-case: NULL never co-occurs. The join-based emitter
      // dropped NULL baskets/items implicitly through its equality
      // condition; groupBy would instead collect every NULL-key row
      // into ONE pseudo-basket and emit bogus cross-row pairs on
      // dirty inputs (r15 review finding), so the contract is
      // explicit here
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
    if (maxBasket == Int.MaxValue) arrays
    else arrays.filter(size(col("items")) <= maxBasket)
  }

  /** Canonical pairs (pa < pb) per basket from the sorted arrays —
    * exactly C(|basket|, 2) struct emissions per row (the slice walk
    * never builds the a≥b half the old θ-join emitted and discarded),
    * then ONE Generate; no cross-basket dedup here.
    */
  private def basketPairs(arrays: DataFrame): DataFrame = {
    val pairs = flatten(transform(
      col("items"),
      (x, i) => transform(
        slice(col("items"), i + lit(2), size(col("items"))),
        y => struct(x.as("pa"), y.as("pb")))))
    arrays.select(explode(pairs).as("_p"))
      .select(col("_p.pa").as("pa"), col("_p.pb").as("pb"))
  }

  def coOccurrenceEdges(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int = Int.MaxValue): DataFrame =
    basketPairs(basketArrays(df, basketCol, itemCol, maxBasket)).distinct()

  /** Undirected degree table (v, d) of an edge relation in ONE pass:
    * explode both endpoints, one grouping shuffle. The r16 form —
    * `e.select(pa).unionAll(e.select(pb))` — evaluated the edge
    * SUBTREE twice (the two union branches are separate subplans;
    * exchange reuse does not collapse the scans below them), which
    * doubled the per-round restriction work in [[kCore]] where the
    * edge frame is a join, not a cache (r17 optimization, guide §2.4:
    * remove duplicate passes outright). Same multiset of endpoint
    * rows, bit-identical counts.
    */
  private def degreesOf(e: DataFrame): DataFrame =
    e.select(explode(array(col("pa"), col("pb"))).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("d"))

  /** Persist `df` only when the caller has not already cached it —
    * [[graphCard]] and the bench's graph_e2e hand every card the SAME
    * persisted edge relation; each card re-persisting its projection
    * of that cache tripled storage churn for zero reuse (r17
    * optimization, guide §5: cache only what is reused). Returns the
    * frame plus whether WE own the persist (and must release it).
    */
  private def persistIfUncached(base: DataFrame, df: DataFrame): (DataFrame, Boolean) =
    if (base.storageLevel != StorageLevel.NONE) (df, false)
    else (df.persist(), true)

  /** Exact global triangle census of an undirected edge relation
    * (columns pa < pb): node/edge counts, triangle count via the
    * degree-ordered node-iterator, open-wedge total Σ C(deg, 2), and
    * the global clustering coefficient 3T / W.
    *
    * The orientation key is the (degree, id) STRUCT — a total order,
    * so each triangle owns exactly one wedge (at its order-minimal
    * vertex) and the closing edge is always oriented low→high; no
    * per-triangle dedup pass needed.
    */
  def triangleStats(edges: DataFrame): DataFrame =
    triangleStats(edges, precomputedDegrees = None, materialize = true)

  /** [[triangleStats]] with the shared-relation knobs the composed
    * card needs (r17 optimization): `precomputedDegrees` lets
    * [[graphCard]] hand every constituent the ONE degree table the
    * edge cache yields (census, profile and k-core round 1 each
    * re-aggregated it — three identical corpus-sized shuffles);
    * `materialize = false` skips the eager 1-row checkpoint so
    * instrumentation (PlanDump) can explain the full operator plan —
    * every query path keeps the materializing default.
    *
    * LEAK CONTRACT (r17 ADVICE): on the `materialize = false` path the
    * internally-persisted frames (edge projection, degree table, the
    * directed orientation) stay REGISTERED in the cache manager — the
    * returned plan must keep its InMemoryRelation nodes to be worth
    * explaining. Callers of the non-materializing overload own the
    * cleanup (`spark.catalog.clearCache()`), as PlanDump does after
    * every dump. Same contract on [[degreeProfile]]'s overload.
    */
  private[graft] def triangleStats(
      edges: DataFrame,
      precomputedDegrees: Option[DataFrame],
      materialize: Boolean): DataFrame = {
    val (e, ownE) = persistIfUncached(edges, edges.select(col("pa"), col("pb")))
    // degree table: node-sized, read by BOTH orientation joins AND the
    // node aggregate below — persisted so the aggregation runs once
    // (the r16 plan rebuilt it per consumer; exchange reuse only
    // collapsed the exchange, not the scans feeding it)
    val (deg, ownDeg) = precomputedDegrees match {
      case Some(d) => (d, false)
      case None    => (degreesOf(e).persist(), true)
    }
    // direct each edge from its lower (degree, id) endpoint
    val keyed = e
      .join(deg.select(col("v").as("pa"), col("d").as("da")), Seq("pa"))
      .join(deg.select(col("v").as("pb"), col("d").as("db")), Seq("pb"))
      .select(
        col("pa"), col("pb"),
        struct(col("da").as("d"), col("pa").as("v")).as("ka"),
        struct(col("db").as("d"), col("pb").as("v")).as("kb"))
    val directed = keyed.select(
      when(col("ka") < col("kb"), col("pa")).otherwise(col("pb")).as("src"),
      when(col("ka") < col("kb"), col("pb")).otherwise(col("pa")).as("dst"))
      .persist()
    // adjacency-intersection census: T = Σ over directed edges (a,b)
    // of |N⁺(a) ∩ N⁺(b)| — every triangle a≺b≺c is counted exactly
    // once, at edge (a,b), since c sits in both out-lists. Same
    // O(m^1.5) work bound as the wedge join (out-degree ≤ O(√m)), but
    // the shuffled volume is EDGE rows carrying neighbor arrays, not
    // one row per wedge — at sf0.1 that is 1.2M rows vs 36M, a 5×
    // wall-time cut; the per-row intersection runs in memory
    // neighbor lists sorted once per node (O(d log d)) so the per-edge
    // intersection is the allocation-free codegen'd two-pointer merge
    // (IntersectCount) instead of size(array_intersect(...)), which
    // builds a hash set + result array per edge just to take a length
    // dst cast to long: IntersectCount's merge walk reads ARRAY<LONG>
    val adj = directed.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst").cast("long"))).as("nbrs"))
    val tri = directed
      .join(adj.select(col("src"), col("nbrs").as("na")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nb")), Seq("dst"))
      .select(graft.expressions.IntersectCount.sortedCount(col("na"), col("nb")).as("c"))
      // inner joins drop edges whose dst has no out-list (they close
      // nothing); a triangle-free graph must still read 0, not null
      .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n_triangles"))
    // n_edges is identically Σd/2 over an undirected degree table —
    // folding it into the node aggregate drops the separate edge-count
    // branch AND its broadcast job (at bench SF the census is
    // scheduling-bound, so every saved job is visible wall time)
    val nodes = deg.agg(
      count(lit(1)).as("n_nodes"),
      // Σd is even by construction; shiftright halves it in integer
      // space (a `/ 2` would promote to double)
      coalesce(shiftright(sum(col("d")), 1), lit(0L)).cast("long").as("n_edges"),
      coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0)).cast("long").as("n_wedges"))
    // 1 row: materialize eagerly (lineage cut) so the edge caches can
    // be released before returning — the established localCheckpoint
    // pattern for tiny results over persisted inputs. A wedge-free
    // graph (empty, or a perfect matching) reads clustering 0.0, not
    // null — the 0/0 case is defined downward by convention here.
    val raw = nodes
      .crossJoin(broadcast(tri))
      .select(
        col("n_nodes"), col("n_edges"), col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("global_clustering"))
    if (!materialize) return raw
    val out = raw.localCheckpoint(eager = true)
    if (ownE) e.unpersist()
    if (ownDeg) deg.unpersist()
    directed.unpersist()
    out
  }

  /** DOULION-style sampled triangle census (Tsourakakis, Kang,
    * Miller & Faloutsos, KDD 2009 — public method): sparsify the edge
    * relation by keeping each edge independently with probability
    * ~`p`, run the exact degree-ordered census on the survivor graph,
    * and scale the sampled triangle count by 1/p³ (each triangle
    * survives iff all 3 edges do). The approximate tier the exact
    * O(m^1.5) census needs at lake scale: work drops by ~p^1.5 on the
    * wedge stage and the estimator is unbiased with relative error
    * O(1/√(p³·T)) — negligible on any graph with enough triangles to
    * matter.
    *
    * Sampling is a PURE INTEGER hash of the edge endpoints —
    * (pa·1103515245 + pb·12345 + seed·2654435761) mod 999983 <
    * floor(p·999983) — chosen over xxhash64 because any ANSI-SQL
    * engine computes the
    * identical keep set (the DuckDB oracle replays it bit-for-bit),
    * and it is replay-deterministic by construction. Endpoint ids
    * must stay below ~2^32 so the products fit a long; the modulus is
    * prime so the LCG mix has no common-factor bias. The effective
    * keep probability is floor(p·999983)/999983 — that exact value is
    * what the estimator divides by.
    *
    * Output (1 row): p_keep (the effective probability), sampled
    * n_edges/n_triangles, and n_triangles_est = sampled/p_keep³
    * rounded half-up via floor(x + 0.5) — the same IEEE expression an
    * oracle engine evaluates, no round-half-mode parity surface.
    */
  /** The LCG-mix modulus of the edge sampler — prime, so the mix has
    * no common-factor bias; the effective keep probability is
    * floor(p·M)/M and that exact value is what the estimator divides
    * by.
    */
  private val SampleModulus = 999983L

  /** The deterministic edge keep predicate both sampled tiers share —
    * a pure integer function of the (pa, pb) endpoints (plus the
    * seed, entering via the Fibonacci-hash multiplier so consecutive
    * seeds shift the keep set by ~half the modulus, not by 1). ONE
    * definition so the filter-after and filter-at-emission forms can
    * never pick different keep sets.
    */
  private def edgeKeep(pa: Column, pb: Column, thresh: Long, seed: Long): Column =
    (pa * lit(1103515245L) + pb * lit(12345L)
      + lit(seed * 2654435761L)) % lit(SampleModulus) < lit(thresh)

  private def sampledCensus(sampled: DataFrame, pEff: Double): DataFrame = {
    val pCube = pEff * pEff * pEff
    triangleStats(sampled).select(
      lit(pEff).as("p_keep"),
      col("n_edges").as("n_edges_sampled"),
      col("n_triangles").as("n_triangles_sampled"),
      floor(col("n_triangles") / lit(pCube) + lit(0.5)).cast("long").as("n_triangles_est"))
  }

  def triangleStatsSampled(edges: DataFrame, p: Double, seed: Long = 0L): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"keep probability must be in (0, 1] (got $p)")
    val thresh = math.floor(p * SampleModulus).toLong
    val pEff   = thresh.toDouble / SampleModulus
    sampledCensus(edges.filter(edgeKeep(col("pa"), col("pb"), thresh, seed)), pEff)
  }

  /** [[triangleStatsSampled]] with the sampling pushed INTO the pair
    * emitter: the edge keep predicate runs directly on the Generate's
    * output, BEFORE the pair-dedup exchange — so the edge-dedup
    * shuffle and the whole downstream census shrink by ~p, not just
    * the census (r14 VERDICT: filtering AFTER [[coOccurrenceEdges]]
    * paid the derived-graph shape's dominant stage — pair emission +
    * distinct — in full, so p=0.5 saved only 5%). The keep set is
    * IDENTICAL to filter-after-derive — the predicate is a pure
    * function of the (pa, pb) endpoints, so it commutes with the pair
    * `distinct` — which is what keeps any ANSI oracle's replay
    * (sample the distinct edge relation) bit-for-bit equal.
    *
    * Same output row as [[triangleStatsSampled]]; same DOULION
    * estimator contract (unbiased, relative error O(1/√(p³·T))).
    */
  /** The sampled tier's edge relation, un-checkpointed — exposed at
    * package scope so plan-shape specs assert the PRODUCTION pair
    * plan (keep filter below the dedup exchange) rather than a copy
    * that could silently drift (r15 review finding).
    */
  private[relops] def sampledCoOccurrenceEdges(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      p: Double,
      seed: Long,
      maxBasket: Int): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"keep probability must be in (0, 1] (got $p)")
    val thresh = math.floor(p * SampleModulus).toLong
    basketPairs(basketArrays(df, basketCol, itemCol, maxBasket))
      .filter(edgeKeep(col("pa"), col("pb"), thresh, seed))
      .distinct()
  }

  def triangleStatsSampledFromBaskets(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      p: Double,
      seed: Long = 0L,
      maxBasket: Int = Int.MaxValue): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"keep probability must be in (0, 1] (got $p)")
    val pEff = math.floor(p * SampleModulus) / SampleModulus
    sampledCensus(sampledCoOccurrenceEdges(df, basketCol, itemCol, p, seed, maxBasket), pEff)
  }

  /** k-core of an undirected edge relation (columns pa < pb):
    * iteratively peel nodes of degree < k until fixpoint — the dense
    * nucleus a spam/cluster analyst reads after the triangle census
    * (coreness bounds clustering structure; a crawler's template farm
    * shows up as an unexpectedly deep core).
    *
    * Scale shape: the edge relation is persisted ONCE; each round
    * re-derives the surviving subgraph from that cache with two
    * semi-joins against the current survivor NODE set (node-sized —
    * only IT is localCheckpointed per round, never the edges; AQE
    * picks broadcast vs shuffle for the semi-join, so a billion-node
    * survivor set does not have to fit the driver) and runs one
    * degree aggregation. Survivor sets are MONOTONE-DECREASING, so a
    * round whose keep COUNT equals the previous round's is a fixpoint
    * (count equality on nested sets is set equality) and the loop
    * exits. NOTE the round bound: parallel peeling's round count is
    * NOT bounded by the degeneracy — each round removes only the
    * CURRENT sub-k nodes, so a k=2 peel of an n-node path takes ~n/2
    * rounds (two endpoints per round) even though the path's
    * degeneracy is 1. Real co-occurrence graphs converge in single
    * digits, but long chains are plausible, so exiting at `maxRounds`
    * WITHOUT a fixpoint throws (the kendallTauB refuse-loudly
    * contract) rather than silently returning the non-fixpoint
    * superset the partial peel leaves behind. The per-round driver
    * action is ONE count. (An earlier form eagerly localCheckpointed
    * the SHRUNKEN EDGE relation each round — 6 corpus-sized
    * materializations at sf0.1 made q_kcore the 8.3 s entry;
    * re-deriving from the one cache cut it to the degree-agg cost.)
    *
    * Output: (v, core_deg) — the k-core's nodes with their degree
    * WITHIN the core (≥ k by construction); empty when no k-core.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame =
    kCore(edges, k, maxRounds, precomputedDegrees = None)

  /** [[kCore]] with the shared degree table (r17 optimization, see
    * [[triangleStats]]'s overload): round 1's degree aggregation IS
    * the plain degree table of the full graph — when [[graphCard]]
    * already holds it, the first peel becomes a node-sized filter.
    *
    * Two further r17 cuts, both value-identical: (1) per-round
    * degrees run through [[degreesOf]] — the r16 unionAll form
    * evaluated the (un-cached) two-semi-join restriction subtree
    * TWICE per round, one evaluation per union branch (guide §2.4);
    * (2) after the FIRST peel the surviving subgraph is re-persisted
    * ONCE and later rounds restrict against that shrunken cache
    * instead of re-filtering the full corpus-sized relation every
    * round — round 1 is where a k-core peel drops the bulk of the
    * graph (every node below global degree k), so rounds 2..fixpoint
    * scan |core-candidate| edges, not |E|. This is NOT the r14 form
    * the scaladoc above warns about (an eager localCheckpoint of the
    * edges EVERY round — 6 corpus-sized materializations); it is one
    * lazy persist filled by round 2's own scan, measured against the
    * gated card.
    */
  private[graft] def kCore(
      edges: DataFrame,
      k: Int,
      maxRounds: Int,
      precomputedDegrees: Option[DataFrame]): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    // keep the ownership flag persistIfUncached returns (r17 ADVICE):
    // inferring ownership from storageLevel at release time would
    // unpersist a caller's independently-persisted plan-equal
    // projection
    val (e0, ownE0) = persistIfUncached(edges, edges.select(col("pa"), col("pb")))
    var eCur: DataFrame    = e0       // current restriction basis
    var eShrunk: DataFrame = null     // the one round-1 shrink we own
    def restrict(keep: Option[DataFrame]): DataFrame = keep match {
      case None => eCur
      case Some(kp) =>
        eCur.join(kp.select(col("v").as("pa")), Seq("pa"), "left_semi")
          .join(kp.select(col("v").as("pb")), Seq("pb"), "left_semi")
    }
    def release(): Unit = {
      if (ownE0) e0.unpersist()
      if (eShrunk != null) eShrunk.unpersist()
    }
    var survivors: Option[DataFrame] = None
    var lastKeep: DataFrame = null
    var prevN  = -1L
    var nFull  = -1L // full-graph node count, when knowable for free
    var rounds = 0
    var done   = false
    while (!done && rounds < maxRounds) {
      // keep carries (v, core_deg): at the fixpoint round the keep SET
      // equals the previous survivor set, so restrict(prev) ==
      // restrict(keep) and these degrees ARE the final in-core degrees
      // — the output reads the last checkpoint directly instead of
      // paying one more full restrict+aggregate pass (measured ~1/7 of
      // the gated card's cost)
      val keepRaw = (survivors, precomputedDegrees) match {
        // round 1 over the full graph: its degree aggregation is the
        // graph's degree table — reuse the caller's when provided.
        // ONLY before the shrink exists: the shrink resets survivors
        // to None (the shrunken relation IS the restriction), so the
        // guard on eShrunk keeps later rounds aggregating the CURRENT
        // subgraph, not the round-0 table
        case (None, Some(d)) if eShrunk == null =>
          // one count on the caller's persisted node-sized table: lets
          // the shrink below skip when round 1 drops nothing (r17
          // ADVICE — caching a near-full duplicate of the corpus edge
          // relation buys no reuse). The standalone path keeps the
          // unconditional shrink: knowing n_nodes there would cost an
          // extra corpus-sized pass, worse than the rare wasted cache.
          nFull = d.count()
          d.select(col("v"), col("d").as("core_deg"))
        case _ =>
          degreesOf(restrict(survivors))
            .withColumnRenamed("d", "core_deg")
      }
      val keep = keepRaw
        .filter(col("core_deg") >= k)
        .localCheckpoint(eager = true)
      // ALWAYS the fixpoint-round keep: its degrees were computed over
      // restrict(final survivor set) — a previous round's keep has the
      // same vertex set at fixpoint but degrees over the LARGER
      // pre-drop restriction
      lastKeep = keep
      val kn = keep.count()
      if (kn == prevN) done = true
      else { prevN = kn; survivors = Some(keep.select(col("v"))) }
      rounds += 1
      // one-time shrink: later rounds peel within the round-1
      // candidate subgraph (both endpoints had global degree ≥ k) —
      // monotone survivor sets make restriction from the shrunken
      // relation identical to restriction from the full one
      if (rounds == 1 && !done && survivors.isDefined && (nFull < 0 || prevN < nFull)) {
        eShrunk = restrict(survivors).persist()
        eCur = eShrunk
        survivors = None // the shrink IS the round-1 restriction
      }
    }
    if (!done) {
      release()
      throw new IllegalStateException(
        s"kCore(k=$k) did not reach a fixpoint within $maxRounds rounds — " +
          "the surviving set is still shrinking (long-chain graphs peel one " +
          "layer per round); raise maxRounds rather than reading a partial peel")
    }
    release()
    // an immediately-empty peel (round 1 keeps nothing, round 2
    // confirms 0 == 0) leaves lastKeep at the empty round-1 result
    if (lastKeep == null)
      throw new IllegalStateException("kCore fixpoint loop exited without a round") // unreachable
    lastKeep
  }

  /** Graph health card: node/edge counts, degree spread, density,
    * and DEGREE ASSORTATIVITY (Newman 2002 — the Pearson correlation
    * of endpoint degrees over edges; negative = hubs attach to
    * leaves, the disassortative shape crawl/co-purchase graphs
    * usually show). Everything reduces to moment sums over the
    * edge⋈degree join: Σdu, Σdv, Σdu·dv, Σdu², Σdv² per DIRECTED
    * pair (each undirected edge contributes both orientations, the
    * standard symmetrization) — products in DECIMAL(38,0), doubles
    * only in the closed form. Two shuffles total (degree agg + the
    * joins back), no windows, no driver actions.
    *
    * Output: one row (n_nodes, n_edges, avg_degree, max_degree,
    * density, assortativity) — assortativity NULL when degrees are
    * constant (zero variance).
    */
  def degreeProfile(edges: DataFrame): DataFrame =
    degreeProfile(edges, precomputedDegrees = None, materialize = true)

  /** [[degreeProfile]] with the shared-relation knobs (r17
    * optimization, see [[triangleStats]]'s overload).
    *
    * Two plan cuts vs r16, both value-identical: (1) the moment sums
    * are computed over UNDIRECTED edge rows and symmetrized in the
    * closed form — over directed pairs m = 2·|E|, Σx = Σy = Σ(da+db),
    * Σxy = 2·Σ(da·db), Σx² = Σy² = Σ(da²+db²), all exact DECIMAL
    * folds, so the explode that doubled the aggregation input (and
    * its Generate) is gone (guide §2.3: shuffle/aggregate fewer
    * rows); (2) n_edges reads Σd/2 off the degree table (shiftright,
    * exact — Σd is even by construction), dropping the separate
    * edge-count scan + broadcast branch the r16 plan paid.
    */
  private[graft] def degreeProfile(
      edges: DataFrame,
      precomputedDegrees: Option[DataFrame],
      materialize: Boolean): DataFrame = {
    val (e, ownE) = persistIfUncached(edges, edges.select(col("pa"), col("pb")))
    val (deg, ownDeg) = precomputedDegrees match {
      case Some(d) => (d, false)
      case None    => (degreesOf(e).persist(), true)
    }
    // NOTE: Σd over an undirected edge list is identically 2·|E| —
    // n_edges and avg_degree both derive from the degree table
    val nodeAgg = deg.agg(
      count(lit(1)).as("n_nodes"),
      max(col("d")).as("max_degree"),
      coalesce(shiftright(sum(col("d")), 1), lit(0L)).cast("long").as("n_edges"))
    // endpoint-degree moments per UNDIRECTED edge; the directed
    // symmetrization happens in the closed form below
    val dd = e
      .join(deg.select(col("v").as("pa"), col("d").as("da")), Seq("pa"))
      .join(deg.select(col("v").as("pb"), col("d").as("db")), Seq("pb"))
      .select(col("da").cast("decimal(19,0)").as("da"), col("db").cast("decimal(19,0)").as("db"))
    val momE = dd.agg(
      count(lit(1)).as("m_und"),
      sum(col("da") + col("db")).as("sxy_sum"),
      sum(col("da") * col("db")).as("sprod"),
      sum(col("da") * col("da") + col("db") * col("db")).as("ssq"))
    // directed-pair moments, exactly the r16 exploded aggregation's
    // values: every undirected edge contributed both orientations
    val mom = momE.select(
      (col("m_und") * 2).as("m"),
      col("sxy_sum").as("sx"),
      col("sxy_sum").as("sy"),
      (col("sprod") * 2).as("sxy"),
      col("ssq").as("sxx"),
      col("ssq").as("syy"))
    val mD  = col("m").cast("double")
    val num = mD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val denx = mD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val deny = mD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    val nN  = col("n_nodes").cast("double")
    val raw = nodeAgg
      .crossJoin(broadcast(mom))
      .select(
        col("n_nodes").cast("bigint").as("n_nodes"),
        col("n_edges").cast("bigint").as("n_edges"),
        // empty edge relation: 0/0 is NaN in Spark but NULL in an
        // ANSI oracle — NULL-guard like density/assortativity below
        when(col("n_nodes") > 0, round(lit(2.0) * col("n_edges") / nN, 6))
          .otherwise(lit(null).cast("double")).as("avg_degree"),
        col("max_degree").cast("bigint").as("max_degree"),
        when(col("n_nodes") > 1,
          round(lit(2.0) * col("n_edges") / (nN * (nN - 1)), 6))
          .otherwise(lit(null).cast("double")).as("density"),
        when(denx > 0.0 && deny > 0.0, round(num / sqrt(denx * deny), 6))
          .otherwise(lit(null).cast("double")).as("assortativity"))
    if (!materialize) return raw
    val out = raw.localCheckpoint(eager = true)
    if (ownE) e.unpersist()
    if (ownDeg) deg.unpersist()
    out
  }

  /** HITS hubs & authorities (Kleinberg 1999) on a DIRECTED edge
    * relation — the bipartite companion to PageRank: who are the
    * heavy buyers (hubs) and the parts heavy buyers concentrate on
    * (authorities)? Fixed `iters` mutual-reinforcement rounds with
    * L1 normalization: a = norm(Eᵀ h), h = norm(E a).
    *
    * Scale shape: each half-step is one join + one keyed aggregation
    * (the PageRank contribution shape); per-node sums accumulate in
    * DECIMAL(27,18) (exact, order-free — the cross-engine float-fold
    * rule) and the L1 normalizer rides as a 1-row broadcast, never a
    * driver action; each round localCheckpoints to cut lineage.
    *
    * Output: (role 'hub'|'authority', id, score) — scores rounded to
    * 6 dp, each role summing to ~1.
    */
  /** One HITS mutual-reinforcement round: a = norm(Eᵀ h), h' =
    * norm(E a) — each half-step is one join + one keyed aggregation
    * with the L1 normalizer riding as a 1-row broadcast; both outputs
    * localCheckpoint to cut lineage across rounds.
    */
  private[graft] def hitsRound(e: DataFrame, h: Option[DataFrame]): (DataFrame, DataFrame) = {
    // normalize raw scores: PERSIST the raw node-sized relation first
    // (r17 optimization) — the normalizer is a broadcast subtree over
    // the same frame, so without the cache every half-step executed
    // its edge join + aggregation TWICE (once under BroadcastExchange,
    // once on the main branch); guide §5, cache exactly what two
    // branches of one plan share. The cache is released as soon as the
    // eagerly-checkpointed normalized vector exists.
    def normalize(rawDf: DataFrame, key: String): DataFrame = {
      val raw = rawDf.persist()
      val n = raw.agg(
        sum(col("raw").cast("decimal(27,18)")).cast("double").as("nrm"))
      val out = raw.crossJoin(broadcast(n))
        .select(col(key), (col("raw") / col("nrm")).as("score"))
        .localCheckpoint()
      raw.unpersist()
      out
    }
    // round 1's hub vector is identically 1.0 on every src (the
    // uniform init) — Σ over in-edges of 1.0 ≡ the in-degree, folded
    // as the SAME decimal-one sum the joined form produced, so the
    // warm-up join against the all-ones vector (and the distinct that
    // built it) is gone (r17 optimization, algebraic identity)
    val araw = h match {
      case Some(hdf) =>
        e.join(hdf, Seq("src"))
          .select(col("dst"), col("score").cast("decimal(27,18)").as("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).cast("double").as("raw"))
      case None =>
        e.select(col("dst"), lit(1.0).cast("decimal(27,18)").as("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).cast("double").as("raw"))
    }
    val a = normalize(araw, "dst")
    val hraw = e.join(a, Seq("dst"))
      .select(col("src"), col("score").cast("decimal(27,18)").as("c"))
      .groupBy(col("src"))
      .agg(sum(col("c")).cast("double").as("raw"))
    val hNew = normalize(hraw, "src")
    (a, hNew)
  }

  private def hitsAssemble(e: DataFrame, h: DataFrame, a: DataFrame): DataFrame = {
    // h and a are already eagerly checkpointed by the last round, so
    // the union below no longer references e — safe to release it
    e.unpersist()
    h.select(lit("hub").as("role"), col("src").as("id"), round(col("score"), 6).as("score"))
      .unionByName(
        a.select(lit("authority").as("role"), col("dst").as("id"), round(col("score"), 6).as("score")))
  }

  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct().persist()
    var h: Option[DataFrame] = None // round 1 reads the uniform init algebraically
    var a: DataFrame = null
    var i = 0
    while (i < iters) {
      val (aN, hN) = hitsRound(e, h)
      a = aN; h = Some(hN)
      i += 1
    }
    hitsAssemble(e, h.get, a)
  }

  /** [[hits]] run to a FIXPOINT instead of a fixed round count (r14
    * VERDICT #4): iterate until the L1 delta of the authority vector
    * between successive rounds drops below `tol` — power iteration on
    * EᵀE converges linearly, so real graphs land in single-digit
    * rounds. The per-round driver action is ONE 1-row delta
    * aggregation (the kCore count shape); both score vectors are
    * node-sized checkpoints, never the edges. Exiting at `maxRounds`
    * with the delta still above `tol` throws — the same refuse-loudly
    * contract as [[kCore]]; a truncated power iteration is a
    * different (and unlabeled) statistic, not an approximation the
    * caller agreed to.
    *
    * The gated q_hits card keeps the fixed iters=2 contract (a
    * deterministic cross-engine artifact); this mode exists for
    * monitoring uses where "converged scores" is the requirement and
    * the round count is the graph's business, documented by
    * KCoreHitsSpec's convergence fixture.
    */
  def hitsConverged(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      tol: Double,
      maxRounds: Int = 32): DataFrame = {
    require(tol > 0.0, s"tol must be > 0 (got $tol)")
    require(maxRounds >= 2, s"need at least 2 rounds to measure a delta (got $maxRounds)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct().persist()
    var h: Option[DataFrame] = None // round 1 reads the uniform init algebraically
    var a: DataFrame = null
    var rounds    = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val (aN, hN) = hitsRound(e, h)
      if (a != null) {
        // authorities cover every dst node each round (every dst has
        // an in-edge by construction), so the delta join is 1:1; the
        // full join + coalesce guards the degenerate empty-graph case
        val delta = aN.as("n")
          .join(a.as("p"), col("n.dst") === col("p.dst"), "full")
          .select(abs(
            coalesce(col("n.score"), lit(0.0)) - coalesce(col("p.score"), lit(0.0))).as("d"))
          .agg(coalesce(sum(col("d")), lit(0.0)).as("s"))
          .first().getDouble(0)
        if (delta < tol) converged = true
      }
      a = aN; h = Some(hN)
      rounds += 1
    }
    if (!converged) {
      e.unpersist()
      throw new IllegalStateException(
        s"hitsConverged did not reach an L1 authority delta < $tol within " +
          s"$maxRounds rounds; raise maxRounds or loosen tol rather than " +
          "reading a truncated power iteration")
    }
    hitsAssemble(e, h.get, a)
  }

  /** The COMPOSED graph data card: derive the co-occurrence edge
    * relation ONCE (persisted), then fold the exact triangle census,
    * the degree/assortativity profile, and the k-core summary into
    * one long-format (metric, value) table — the correctness-gated
    * twin of the bench's graph_e2e composition (r15): a production
    * pipeline materializes the edges once and reads every card from
    * them, so the GATE should exercise exactly that sharing, not
    * three independent derivations. Constituent cards keep their own
    * eager-checkpoint contracts (each returns a tiny materialized
    * result), so the edge cache is released before assembly.
    *
    * Output: (metric, value) rows, value DOUBLE (counts widened;
    * kcore_min_deg NULL when the core is empty).
    */
  def graphCard(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      k: Int,
      maxBasket: Int = Int.MaxValue): DataFrame = {
    val edges = coOccurrenceEdges(df, basketCol, itemCol, maxBasket).persist()
    // ONE degree table for all three cards (r17 optimization): census,
    // profile, and k-core round 1 each aggregated the same endpoint
    // degrees from the same cache — three identical corpus-sized
    // shuffles for one node-sized relation (guide §2.4)
    val deg   = degreesOf(edges).persist()
    val tri   = triangleStats(edges, Some(deg), materialize = true)
    val prof  = degreeProfile(edges, Some(deg), materialize = true)
    val core  = kCore(edges, k, maxRounds = 64, Some(deg))
    deg.unpersist()
    edges.unpersist()
    def kv(name: String, c: Column): Column =
      struct(lit(name).as("metric"), c.cast("double").as("value"))
    val triM = tri.select(explode(array(
      kv("n_nodes", col("n_nodes")),
      kv("n_edges", col("n_edges")),
      kv("n_triangles", col("n_triangles")),
      kv("n_wedges", col("n_wedges")),
      kv("global_clustering", col("global_clustering")))).as("p"))
    val profM = prof.select(explode(array(
      kv("avg_degree", col("avg_degree")),
      kv("max_degree", col("max_degree")),
      kv("density", col("density")),
      kv("assortativity", col("assortativity")))).as("p"))
    val coreM = core
      .agg(count(lit(1)).as("n"), min(col("core_deg")).as("md"))
      .select(explode(array(
        kv("kcore_nodes", col("n")),
        kv("kcore_min_deg", col("md")))).as("p"))
    triM.unionByName(profM).unionByName(coreM)
      .select(col("p.metric").as("metric"), col("p.value").as("value"))
      .orderBy(col("metric"))
  }

  /** Association-rule mining on item pairs: for pairs co-occurring in
    * at least `minSupport` baskets, lift = N·c(a,b) / (c(a)·c(b)) and
    * confidence = c(a,b) / c(a); top `k` by lift (ties → pa, pb).
    * Integer counts throughout — the one double division is correctly
    * rounded, so cross-engine deterministic. The basket total rides
    * as a 1-row broadcast, not a driver action.
    */
  def basketLift(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      k: Int,
      maxBasket: Int = Int.MaxValue): DataFrame = {
    // same mega-basket fan-out cap and shared array emitter as
    // coOccurrenceEdges — the pair space below is Σ|basket|²; pair,
    // item, and basket counts all read off the ONE persisted
    // per-basket array relation (each basket contributes each
    // distinct pair/item once, the set semantics the old
    // items-distinct self-join had)
    val arrays = basketArrays(df, basketCol, itemCol, maxBasket).persist()
    val n  = arrays.agg(count(lit(1)).as("n_orders"))
    val ic = arrays.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val pc = basketPairs(arrays)
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupport)
    val out = pc
      .join(ic.select(col("item").as("pa"), col("cnt").as("ca")), Seq("pa"))
      .join(ic.select(col("item").as("pb"), col("cnt").as("cb")), Seq("pb"))
      .crossJoin(broadcast(n))
      .select(
        col("pa"), col("pb"), col("pair_cnt"),
        round(
          (col("pair_cnt").cast("double") * col("n_orders").cast("double")) /
            (col("ca").cast("double") * col("cb").cast("double")), 6).as("lift"),
        round(col("pair_cnt").cast("double") / col("ca").cast("double"), 6).as("confidence"))
      .orderBy(desc("lift"), col("pa"), col("pb"))
      .limit(k)
      .localCheckpoint(eager = true) // ≤ k rows; lets the arrays cache go
    arrays.unpersist()
    out
  }
}
