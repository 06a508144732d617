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

  test("htmlCascadeOn: HTML-lake cascade recovers title and source at sf0.001") {
    import org.apache.spark.sql.functions._
    val view = SparkEntry.htmlCascadeOn(spark, sf0001)
    val n    = view.count()
    assert(n > 0)
    assert(view.columns.toSet == Set("path", "title", "source"))
    val extracted = view.filter(col("title").isNotNull && length(col("title")) > 0).count()
    assert(extracted >= n * 9 / 10, s"only $extracted/$n docs got a title")
    val sourced = view.filter(col("source").isNotNull && length(col("source")) > 0).count()
    assert(sourced >= n * 9 / 10, s"only $sourced/$n docs got a source")
  }

  test("Tables.events normalizes ts to session-tz TIMESTAMP at every SF") {
    // the driver's events.parquet has shipped two physical ts flavors
    // (TIMESTAMP(NANOS), then TIMESTAMP_NTZ) across testdata
    // generations; the loader seam must always surface TimestampType
    // so unix_micros arithmetic resolves — the r7 regression gate
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/events.parquet").exists())
      .foreach { d =>
        val ev = graft.lake.Tables.events(spark, d)
        assert(ev.schema("ts").dataType == TimestampType, s"$d: ${ev.schema("ts").dataType}")
        val n = ev.select(unix_micros(col("ts")).as("um")).filter(col("um").isNotNull).count()
        assert(n > 0, s"$d: unix_micros produced no rows")
      }
  }

  test("no Tables loader surfaces a TIMESTAMP_NTZ column at any SF") {
    // the driver's parquet writer has flipped isAdjustedToUTC across
    // testdata generations (r7 broke six event queries that way);
    // Tables.table normalizes EVERY loader at the seam so a future
    // flavor flip in any table can't reproduce the break
    import org.apache.spark.sql.types.TimestampNTZType
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/orders.parquet").exists())
      .foreach { d =>
        tables.filter(t => new java.io.File(s"$d/$t.parquet").exists()).foreach { name =>
          val t   = graft.lake.Tables.table(spark, d, name)
          val ntz = t.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
          assert(ntz.isEmpty, s"$d/$name: NTZ columns survived the seam: ${ntz.mkString(",")}")
        }
      }
  }

  test("retrievalOn serves 8 queries from one fit+encode, each finding itself first") {
    import org.apache.spark.sql.functions.col
    val got  = SparkEntry.retrievalOn(spark, sf0001)
    val self = got.filter(col("rank") === 1).select("query_id", "vec_id").collect()
    assert(self.length == 8 && self.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("retrievalBatchOn serves the same 8 queries in one scan, each finding itself first") {
    import org.apache.spark.sql.functions.col
    val got  = SparkEntry.retrievalBatchOn(spark, sf0001)
    val self = got.filter(col("rank") === 1).select("qid", "vec_id").collect()
    assert(self.length == 8 && self.forall(r => r.getLong(0) == r.getLong(1)))
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
