package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-table loading (`get_gold_metadata`/`prerun_profiler`,
  * `run_profiler.py:100-119, 232-246`): a JSON file
  * { path: { attribute: value | [values] } } melted to the long
  * relation (path, attribute, values ARRAY<STRING>), with optional
  * path rebase onto the lake directory.
  *
  * Gold tables are human-labeled and tiny; parsing happens on the
  * driver (like the reference) and the result broadcasts into eval
  * joins.
  */
object GoldTable {

  def load(spark: SparkSession, jsonPath: String, rebaseTo: String = ""): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val src = scala.io.Source.fromFile(jsonPath)
    val parsed =
      try JsonMethods.parse(src.mkString)
      finally src.close()
    val rows = for {
      JObject(files)        <- parsed
      (path, JObject(attrs)) <- files
      (attr, v)             <- attrs
    } yield {
      val values: Seq[String] = v match {
        case JArray(xs) => xs.collect { case JString(s) => s; case JInt(i) => i.toString; case JDouble(d) => d.toString }
        case JString(s) => Seq(s)
        case JInt(i)    => Seq(i.toString)
        case JDouble(d) => Seq(d.toString)
        case JNull      => Seq.empty
        case other      => Seq(JsonMethods.compact(JsonMethods.render(other)))
      }
      (rebase(path, rebaseTo), attr, values)
    }
    import spark.implicits._
    rows.toDF("path", "attribute", "values")
  }

  /** Rebase a gold key's file name onto the lake dir (the reference
    * rewrites gold paths recorded on another machine).
    */
  private def rebase(path: String, dir: String): String =
    if (dir.isEmpty) path
    else dir.stripSuffix("/") + "/" + path.substring(path.lastIndexOf('/') + 1)

  /** Attribute set ranked by non-null frequency — the ClosedIE schema
    * source (`run_profiler.py:108-118`).
    */
  def rankedAttributes(gold: DataFrame): DataFrame =
    graft.schema.SchemaId.goldAttrRank(
      gold.select(col("path"), col("attribute"), concat_ws(", ", col("values")).as("value")))
}
