package graft

/** Single-query bench/explain utility:
  * `runMain graft.BenchOne <name> [explain] [cold] [nocodegen] [conf:k=v ...]`.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B the whole-stage-codegen path of custom operators (as-of merge)
    if (args.contains("nocodegen"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    // arbitrary session-conf overrides for quick A/B runs
    args.filter(_.startsWith("conf:")).map(_.stripPrefix("conf:")).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(
          s"malformed conf override 'conf:$kv' — expected conf:key=value")
      }
    }
    val fn = SparkEntry.queries(name)
    if (args.length > 1 && args(1) == "explain") fn(spark, sfDir).explain("formatted")
    // "cold" reproduces Bench's per-run conditions (cache + memoized
    // signature frame dropped between runs) instead of BenchOne's default
    // warm-reuse timing.
    val cold = args.length > 1 && args.contains("cold")
    // task-level spill accumulator (Bench's listener rationale: the
    // shuffle-write sorter's spill has no plan-level SQLMetric)
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      })
    (1 to 3).foreach { i =>
      val s0 = spilled.get()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = System.nanoTime() - t0
      Thread.sleep(300) // listener delivery is async (not part of timed run)
      println(f"[benchone] $name run$i: ${dt / 1e9}%.2f s " +
        f"($n rows, spill ${(spilled.get() - s0) / 1e6}%.1f MB)")
      if (cold) {
        spark.catalog.clearCache()
        graft.operators.Dedup.releaseSignatures()
        graft.operators.Relational.releaseCaches()
      }
    }
    spark.stop()
  }
}
