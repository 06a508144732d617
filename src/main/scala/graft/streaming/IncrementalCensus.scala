package graft.streaming

import scala.collection.mutable

/** Incremental triangle/wedge census over a
  * [[StreamingExtract.coOccurrenceStream]] patch feed (r15 VERDICT
  * #7): the census consumer that does NOT re-derive from the patched
  * edge set per read. Each add/retract patch updates the counts in
  * O(min(deg u, deg v)) — new triangles on edge (u,v) are exactly
  * |N(u) ∩ N(v)| at patch time, the wedge total moves by the
  * endpoints' degrees — so a monitoring read is O(1) off the
  * maintained state instead of the batch census's O(m^1.5) pass.
  *
  * Edge multiplicity is tracked per canonical pair: the SAME item
  * pair can co-occur in many baskets, and the graph edge lives while
  * ANY basket supports it — a cap retraction of one basket must not
  * delete an edge another basket still witnesses (the exact net-edge
  * rule [[StreamingExtract.edgesOfPatches]] applies declaratively).
  *
  * Same consumer-side contract as `quantilesOfSnapshot` /
  * `liftOfSnapshot`: plain Scala on the collected patch feed,
  * bounded by the LIVE graph size (adjacency sets + one counter per
  * distinct live pair), not the stream length. Snapshot parity with
  * the batch census ([[graft.relops.GraphOps.triangleStats]]) after
  * every trigger is spec-asserted, including across retraction
  * triggers.
  *
  * `maxLiveEdges` is the refuse-loudly bound on that state (r16
  * VERDICT #1, mirroring kCore's non-fixpoint exit and CC's maxIter
  * contract): the live co-occurrence graph of a 100 TB lake with an
  * uncapped basket stream can outgrow the single JVM this consumer
  * runs on, and a silent OOM of the monitoring path is worse than a
  * loud stop. Crossing the bound throws and names the batch census
  * as the fallback. The default (10M live pairs ≈ hundreds of MB of
  * boxed state) is sized for a monitoring consumer, not a corpus —
  * raise it deliberately if the deployment JVM is provisioned for
  * more.
  */
final class IncrementalCensus(maxLiveEdges: Long = 10000000L) {
  require(maxLiveEdges > 0, s"maxLiveEdges must be positive (got $maxLiveEdges)")
  private val adj     = mutable.Map.empty[Long, mutable.Set[Long]]
  private val support = mutable.Map.empty[(Long, Long), Int]
  private var tri     = 0L
  private var wedges  = 0L

  private def degOf(v: Long): Long = adj.get(v).map(_.size.toLong).getOrElse(0L)

  /** |N(u) ∩ N(v)| walking the smaller set — the two-pointer-merge
    * bound the batch census gets from IntersectCount.
    */
  private def commonNeighbors(u: Long, v: Long): Long =
    (adj.get(u), adj.get(v)) match {
      case (Some(a), Some(b)) =>
        val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
        small.count(large.contains).toLong
      case _ => 0L
    }

  private def addEdge(u: Long, v: Long): Unit = {
    tri += commonNeighbors(u, v)
    wedges += degOf(u) + degOf(v) // C(d+1,2) − C(d,2) = d, per endpoint
    adj.getOrElseUpdate(u, mutable.Set.empty) += v
    adj.getOrElseUpdate(v, mutable.Set.empty) += u
  }

  private def removeEdge(u: Long, v: Long): Unit = {
    tri -= commonNeighbors(u, v)
    wedges -= (degOf(u) - 1) + (degOf(v) - 1) // C(d,2) − C(d−1,2) = d−1
    adj.get(u).foreach { s => s -= v; if (s.isEmpty) adj.remove(u) }
    adj.get(v).foreach { s => s -= u; if (s.isEmpty) adj.remove(v) }
  }

  /** Apply one patch. Canonicalizes the pair; a retract of a pair
    * with zero live support is a patch-feed ordering bug and throws
    * (per basket the add's epoch always precedes its retract's, so an
    * epoch-ordered feed can never trip this).
    */
  def apply(pa: Long, pb: Long, add: Boolean): Unit = {
    // the emitters never produce self-pairs (canonical pa < pb); a
    // self-loop here would corrupt the adjacency/degree invariants
    require(pa != pb, s"self-pair ($pa,$pa) is not a co-occurrence edge")
    val key = if (pa <= pb) (pa, pb) else (pb, pa)
    if (add) {
      val s = support.getOrElse(key, 0)
      if (s == 0 && support.size.toLong >= maxLiveEdges)
        throw new IllegalStateException(
          s"IncrementalCensus live-edge state would exceed maxLiveEdges=$maxLiveEdges — " +
            "the live co-occurrence graph has outgrown this single-JVM monitoring " +
            "consumer; re-derive from the patched edge set with the batch census " +
            "(graft.relops.GraphOps.triangleStats) or raise the bound on a larger JVM")
      support(key) = s + 1
      if (s == 0) addEdge(key._1, key._2)
    } else {
      val s = support.getOrElse(key, 0)
      require(s > 0, s"retract of unsupported pair $key — patch feed out of epoch order")
      if (s == 1) { support.remove(key); removeEdge(key._1, key._2) }
      else support(key) = s - 1
    }
  }

  /** Apply a batch of (basket, pa, pb, add, epoch) patches in epoch
    * order (cross-basket order within an epoch is net-commutative;
    * within a basket epochs strictly order add-before-retract).
    */
  def applyAll(patches: Seq[(Long, Long, Long, Boolean, Long)]): this.type = {
    patches.sortBy(_._5).foreach { case (_, pa, pb, add, _) => apply(pa, pb, add) }
    this
  }

  /** (n_nodes, n_edges, n_triangles, n_wedges, global_clustering) —
    * the batch census row, same 0-by-convention clustering on a
    * wedge-free graph and the same 6-dp HALF_UP rounding.
    */
  def snapshot: (Long, Long, Long, Long, Double) = {
    val clustering =
      if (wedges > 0)
        BigDecimal(3.0 * tri / wedges).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
    (adj.size.toLong, support.size.toLong, tri, wedges, clustering)
  }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The degree-profile card off the SAME maintained state —
    * (n_nodes, n_edges, avg_degree, max_degree, density,
    * assortativity), matching [[graft.relops.GraphOps.degreeProfile]]
    * row-for-row: 6-dp HALF_UP rounding, NULL (None) guards on the
    * empty/degenerate cases, and the batch card's exact-integer
    * moment sums (BigInt here, DECIMAL(19,0) there — both convert to
    * the same doubles) folded through the identical assortativity
    * formula. The moment pass is O(live edges) at snapshot time —
    * a monitoring read over the maintained graph, not a re-shuffle
    * of the corpus.
    */
  def profileSnapshot
      : (Long, Long, Option[Double], Option[Long], Option[Double], Option[Double]) = {
    val n = adj.size.toLong
    val e = support.size.toLong
    val avg     = if (n > 0) Some(r6(2.0 * e / n)) else None
    val maxDeg  = if (adj.isEmpty) None else Some(adj.valuesIterator.map(_.size).max.toLong)
    val density = if (n > 1) Some(r6(2.0 * e / (n.toDouble * (n - 1)))) else None
    var m = 0L
    var sx, sxy, sxx = BigInt(0)
    support.keysIterator.foreach { case (u, v) =>
      val du = BigInt(adj(u).size)
      val dv = BigInt(adj(v).size)
      // symmetrized directed pairs: (du,dv) and (dv,du) — x and y
      // marginals coincide, so one accumulator serves both
      m += 2
      sx += du + dv
      sxy += 2 * du * dv
      sxx += du * du + dv * dv
    }
    val mD   = m.toDouble
    val num  = mD * sxy.toDouble - sx.toDouble * sx.toDouble
    val den  = mD * sxx.toDouble - sx.toDouble * sx.toDouble
    val assort = if (den > 0.0) Some(r6(num / math.sqrt(den * den))) else None
    (n, e, avg, maxDeg, density, assort)
  }
}
