package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "Cafe\u0301"  // e + combining acute accent
  private val composed   = "Caf\u00e9"   // precomposed \u00e9

  test("composes decomposed sequences and fixes dedup-breaking mismatches") {
    assert(decomposed != composed)
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii")).toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), NfcNormalize.nfcNormalize(spark, col("text")).as("n"))
      .orderBy("doc_id").collect().map(_.getString(1))
    // both forms normalize to the same bytes → exact dedup now works
    assert(got(0) == composed && got(1) == composed && got(2) == "plain ascii")
  }

  test("already-normalized input returns the same UTF8String, no copy") {
    val s = UTF8String.fromString("already fine")
    assert(NfcNormalize.compute(s) eq s)
    // Hangul decomposed jamo → precomposed syllable (multi-char fold)
    assert(NfcNormalize.compute(UTF8String.fromString("\u1100\u1161")).toString == "\uac00")
  }

  test("registered SQL function and null flow") {
    NfcNormalize.register(spark)
    val got = spark.sql(s"SELECT nfc_normalize('$decomposed') AS n, nfc_normalize(NULL) AS z").head
    assert(got.getString(0) == composed && got.isNullAt(1))
    // survives whole-stage codegen over a real scan
    val n = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(NfcNormalize.nfcNormalize(spark, col("text")).as("n"))
    assert(n.filter(col("n").isNull).count() == 0)
  }
}
