package graft

/** Dev-only: time selected queries N times each in one JVM to
  * separate first-run (codegen/JIT compile) cost from steady state.
  * Usage: runMain graft.DevTimer <sfDir> <reps> [q1 q2 ...]
  */
object DevTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val spark = Sessions.local(32, "graft-devtimer")
    import org.apache.spark.sql.functions._
    def evalAll(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h")).agg(max("h"), min("h")).head()
      ()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        evalAll(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
