package graft.expressions

import graft.SparkSpec
import graft.textops.TextStats
import org.apache.spark.sql.functions._

import scala.util.Random

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish synthetic stream: vocabulary (2000) far exceeds the
  // sketch capacity (64), a handful of planted heavy tokens dominate.
  private lazy val zipf: Seq[String] = {
    val rnd   = new Random(42)
    val heavy = Seq.fill(3000)("alpha") ++ Seq.fill(2000)("beta") ++ Seq.fill(1200)("gamma")
    val tail  = Seq.fill(8000)(s"w${rnd.nextInt(2000)}")
    rnd.shuffle(heavy ++ tail)
  }

  test("mg_sketch keeps every true heavy hitter with lower-bound estimates") {
    val df  = zipf.toDF("token").repartition(8)
    val n   = zipf.size.toLong
    val cap = 64
    val got = df.agg(FreqSketch.mgSketch(col("token"), cap)).head().getMap[String, Long](0)
    assert(got.size <= cap)
    val exact = zipf.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // recall: every token with count > N/(cap+1) must survive
    val mustKeep = exact.filter(_._2 > n / (cap + 1)).keySet
    assert(mustKeep.nonEmpty && mustKeep.subsetOf(got.keySet.toSet))
    // estimates are lower bounds within the MG error band
    got.foreach { case (k, est) =>
      val c = exact(k)
      assert(est <= c, s"$k: est $est exceeds true count $c")
      assert(est >= c - n / (cap + 1), s"$k: est $est below MG bound for count $c")
    }
  }

  test("partial merges across partitionings keep the recall guarantee") {
    val n   = zipf.size.toLong
    val cap = 64
    val exact    = zipf.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val mustKeep = exact.filter(_._2 > n / (cap + 1)).keySet
    Seq(1, 3, 16).foreach { parts =>
      val got = zipf.toDF("token").repartition(parts)
        .agg(FreqSketch.mgSketch(col("token"), cap)).head().getMap[String, Long](0)
      assert(mustKeep.subsetOf(got.keySet.toSet), s"recall broken at $parts partitions")
    }
  }

  test("heavyHitters is exact and partitioning-independent") {
    val df    = zipf.toDF("text") // one token per "doc" exercises explode trivially
    val n     = zipf.size
    val support = 0.05
    val thr   = math.ceil(support * n).toLong
    val expect = zipf.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .filter(_._2 >= thr).toSeq.sortBy(t => (-t._2, t._1))
    Seq(2, 13).foreach { parts =>
      val got = TextStats.heavyHitters(df.repartition(parts), "text", support, capacity = 64)
        .orderBy(desc("cnt"), col("token")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"mismatch at $parts partitions")
    }
  }

  test("mg_sketch runs as a streaming aggregation across micro-batches") {
    // the buffer must survive serialize/deserialize through the state
    // store between triggers — the streaming heavy-hitter ingest path
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in  = MemoryStream[String]
    val agg = in.toDF().toDF("token").agg(FreqSketch.mgSketch(col("token"), 8).as("mg"))
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("mg_out").start()
    in.addData(Seq.fill(50)("alpha") ++ (1 to 30).map(i => s"x$i"): _*)
    q.processAllAvailable()
    in.addData(Seq.fill(40)("beta") ++ (1 to 30).map(i => s"y$i"): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mg_out").head().getMap[String, Long](0)
    // N=150, cap=8 → anything with count > 150/9 ≈ 16 must survive
    assert(got.contains("alpha") && got.contains("beta"))
    assert(got.size <= 8)
  }

  test("capacity guard rejects a support the sketch cannot guarantee") {
    val df = Seq("a", "b").toDF("text")
    intercept[IllegalArgumentException] {
      TextStats.heavyHitters(df, "text", support = 0.001, capacity = 100)
    }
  }
}
