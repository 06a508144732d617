package graft

import java.nio.file.{Files, Paths}

/** Optimization-round instrumentation: writes `explain("formatted")`
  * output for named declared queries to files, so plan-shape claims in
  * OPTIMIZATION_r*.md are auditable without running Spark
  * (`plans/r17/<query>_before.txt` / `_after.txt`).
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]`
  * — each query's plan lands at `<outDir>/<name>_<suffix>.txt`. Queries
  * whose construction is eager (fixpoint loops) still only EXPLAIN the
  * returned frame; their per-round shape is documented by the plan
  * specs. Not part of any query path.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix, only) = args match {
      case Array(s, o, x)    => (s, o, x, None)
      case Array(s, o, x, f) => (s, o, x, Some(f.split(",").toSet))
      case _ =>
        System.err.println("usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]")
        sys.exit(2)
    }
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    // INNER plans for the eager graph cards: their gated frames are
    // localCheckpointed 1-row results (explain = one ExistingRDD scan),
    // so the auditable operator plan is the pre-materialization frame
    // (materialize = false) over the same gated edge derivation.
    val inner: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "graph_census_inner" -> (() =>
        graft.relops.GraphOps.triangleStats(
          graft.relops.GraphOps.coOccurrenceEdges(
            graft.lake.Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey", maxBasket = 50),
          None, materialize = false)),
      "graph_profile_inner" -> (() =>
        graft.relops.GraphOps.degreeProfile(
          graft.relops.GraphOps.coOccurrenceEdges(
            graft.lake.Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey", maxBasket = 50),
          None, materialize = false)),
      // the graph-ANN beam's per-hop plan (r18): hops−1 beams run
      // eagerly, the LAST hop is returned un-checkpointed — the dump
      // shows one frontier⋈graph join + one rescore join against the
      // cached assignment relation and ZERO parquet scans, the
      // hop-count-invariant shape the r18 change claims
      "ann_graph_lasthop_inner" -> (() =>
        graft.textops.Similarity.graphTopKLastHopPlan(
          graft.lake.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
          SparkEntry.queryVec(spark, sfDir), k = 20, ef = 32, hops = 2, knnK = 8)))
    inner
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, mk) =>
        try {
          val plan = mk().queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df   = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
