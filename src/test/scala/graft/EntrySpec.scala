package graft

class EntrySpec extends SparkSpec {

  test("entry: flagship spine returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("doc_id"))
  }

  test("cascadeOn: full profiler cascade extracts the derived field lines at sf0.001") {
    import org.apache.spark.sql.functions._
    val view = SparkEntry.cascadeOn(spark, sf0001)
    val n    = view.count()
    assert(n > 0)
    assert(view.columns.toSet == Set("path", "topic", "source"))
    // the lake embeds "topic: <first word>" per doc — the cascade's
    // synthesized FieldLine specs must recover it on (nearly) all docs
    val extracted = view.filter(col("topic").isNotNull && length(col("topic")) > 0).count()
    assert(extracted >= n * 9 / 10, s"only $extracted/$n docs got a topic")
  }

  test("queries and oracleSql keys are consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query impl: ${o -- q}")
  }

  test("all queries return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
