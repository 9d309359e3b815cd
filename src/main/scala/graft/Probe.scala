package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("tokens explode")(docs.select(explode(split($"text", " "))).count())
    time("shingle explode")(docs.select(explode(shingles(tokens($"text"), 3))).count())
    time("shingle+md5")(docs.select(explode(shingles(tokens($"text"), 3)).as("sh"))
      .select(md5($"sh").as("m")).agg(count($"m")).as[Long].head())
    time("shingle+hash64")(docs.select(explode(shingles(tokens($"text"), 3)).as("sh"))
      .select(hash64($"sh").as("h")).agg(sum($"h")).as[Long].head())
    time("full sig agg")(docs.select($"doc_id", explode(shingles(tokens($"text"), 3)).as("sh"))
      .select($"doc_id", hash64($"sh").as("h"))
      .groupBy($"doc_id")
      .agg(min(permHash($"h", 0)), min(permHash($"h", 1)), min(permHash($"h", 2)),
        min(permHash($"h", 3)), min(permHash($"h", 4)), min(permHash($"h", 5)),
        min(permHash($"h", 6)), min(permHash($"h", 7)))
      .count())
    spark.stop()
  }
}
