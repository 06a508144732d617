package graft.schema

import graft.SparkSpec

class SchemaIdSpec extends SparkSpec {
  import spark.implicits._

  test("fieldCount counts each field once per doc") {
    val f = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a")).toDF("doc_id", "field")
    val got = rows(SchemaId.fieldCount(f, "doc_id").orderBy("field"))
    assert(got == Seq(Seq("a", 2L), Seq("b", 1L)))
  }

  test("rankAttributes orders by count desc then name") {
    val c = Seq(("x", 5L), ("a", 5L), ("z", 9L)).toDF("field", "n_docs")
    val got = rows(SchemaId.rankAttributes(c, 2).orderBy("rank").select("field", "rank"))
    assert(got == Seq(Seq("z", 1), Seq("a", 2)))
  }

  test("rerankMerge applies votes*count / count / count/2") {
    val c = Seq(("a", 10L), ("b", 10L), ("c", 10L)).toDF("field", "n_docs")
    val v = Seq(("a", 3L), ("b", 1L)).toDF("field", "votes")
    val got = rows(SchemaId.rerankMerge(c, v).orderBy("field").select("field", "merged"))
    assert(got == Seq(Seq("a", 30.0), Seq("b", 10.0), Seq("c", 5.0)))
  }

  test("attrDedup drops name-contained attrs with equal metric") {
    val a = Seq(("title", 5L), ("movie title", 5L), ("year", 5L), ("cast", 3L))
      .toDF("attribute", "metric")
    val got = rows(SchemaId.attrDedup(a).orderBy("attribute").select("attribute"))
    assert(got == Seq(Seq("cast"), Seq("movie title"), Seq("year")))
  }

  test("attrValidityAgg flags constant columns") {
    val e = Seq(("a", "x"), ("a", "x"), ("b", "x"), ("b", "y")).toDF("attribute", "value")
    val got = rows(
      SchemaId.attrValidityAgg(e).orderBy("attribute").select("attribute", "n_distinct", "mode_val", "drop_attr"))
    assert(got == Seq(Seq("a", 1L, "x", true), Seq("b", 2L, "x", false)))
  }

  test("attrAliasJoin matches plural and space-stripped aliases") {
    val l = Seq("genre", "run time").toDF("attr_a")
    val r = Seq("genres", "runtime").toDF("attr_b")
    val got = rows(SchemaId.attrAliasJoin(l, r).orderBy("attr_a"))
    assert(got == Seq(Seq("genre", "genres"), Seq("run time", "runtime")))
  }

  test("schemaEvalAtK computes P/R@k") {
    val ranked = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("field", "rank")
    val gold   = Seq("a", "c", "d").toDF("field")
    val got = rows(
      SchemaId.schemaEvalAtK(ranked, gold, Seq(1, 3)).orderBy("k").select("k", "n_hit", "precision"))
    assert(got == Seq(Seq(1, 1L, 1.0), Seq(3, 2L, 2.0 / 3.0)))
  }
}
