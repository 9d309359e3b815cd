package graft

/** Plan-audit utility: dump `explain("formatted")` for every query (or a
  * name-prefix subset) to one file per query — the raw material for
  * PLANS.md and for diffing plan shapes across changes.
  *
  *   sbt "runMain graft.ExplainAll target/explains [prefix,...]"
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/explains")
    val prefixes = args.drop(1).headOption.map(_.split(",").toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
          println(s"[explain] $name -> $outDir/$name.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
