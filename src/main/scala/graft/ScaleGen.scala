package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus scaler for the SCALING.md crossover benchmarks:
  * replicates a driver-generated SF directory `factor`× with key-space
  * offsets, so every at-scale claim argued in comments (OPH vs 16-perm
  * signatures, rank-narrowing vs sort-based percentiles, MG sketch vs
  * exact counts, bucketed as-of, ADC vs raw-vector scans) can be
  * MEASURED where the trade should flip instead of asserted.
  *
  * Scaling rules preserve each table's statistical shape:
  *   - dims (region/nation/part/supplier) copy verbatim — at scale the
  *     dimension tables stay broadcast-sized while facts grow;
  *   - customer/orders/lineitem/events replicate with disjoint key
  *     ranges (id + copy·max), so per-key cardinalities (orders per
  *     customer, events per user, lines per order) are INVARIANT in the
  *     factor — exactly how a growing business generates data;
  *   - documents keep copy 0 verbatim and suffix every token with the
  *     copy index for copies > 0: the within-copy duplicate structure
  *     (what dedup rates depend on) replicates unchanged, while copies
  *     stay vocabulary-disjoint so the LSH pair count grows linearly,
  *     not quadratically;
  *   - embeddings jitter each copied coordinate deterministically
  *     (±6e-3) so copies are near the originals but never exact
  *     duplicates — the ANN benchmarks keep a realistic neighbor
  *     structure.
  *
  * No RNG anywhere: same inputs → byte-identical outputs, so SCALING.md
  * numbers are reproducible. Output directories are gitignored — the
  * generator is the artifact, not the parquet.
  *
  * Usage: runMain graft.ScaleGen <baseSfDir> <outDir> <factor>
  */
object ScaleGen {

  /** Cross-join the rows with copy indices 0..factor-1 as column `copy`. */
  private def replicated(df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(broadcast(
      df.sparkSession.range(factor).toDF("copy")))

  def main(args: Array[String]): Unit = {
    val (base, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def off(df: DataFrame, idCol: String): Long =
      df.agg(max(col(idCol))).head().getLong(0) + 1L

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dims copy verbatim
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(Tables.load(spark, base, t), t)
    }

    val customer = Tables.load(spark, base, "customer")
    val orders = Tables.load(spark, base, "orders")
    val lineitem = Tables.load(spark, base, "lineitem")
    val events = Tables.load(spark, base, "events")
    val documents = Tables.load(spark, base, "documents")
    val embeddings = Tables.load(spark, base, "embeddings")
    val (ckOff, okOff) = (off(customer, "c_custkey"), off(orders, "o_orderkey"))
    val (evOff, uOff) = (off(events, "event_id"), off(events, "user_id"))
    val (docOff, vecOff) = (off(documents, "doc_id"), off(embeddings, "vec_id"))

    write(replicated(customer, factor)
      .withColumn("c_custkey", $"c_custkey" + $"copy" * ckOff)
      .withColumn("c_name", concat($"c_name", lit("#"), $"copy"))
      .drop("copy"), "customer")

    write(replicated(orders, factor)
      .withColumn("o_orderkey", $"o_orderkey" + $"copy" * okOff)
      .withColumn("o_custkey", $"o_custkey" + $"copy" * ckOff)
      .drop("copy"), "orders")

    write(replicated(lineitem, factor)
      .withColumn("l_orderkey", $"l_orderkey" + $"copy" * okOff)
      .drop("copy"), "lineitem")

    write(replicated(events, factor)
      .withColumn("event_id", $"event_id" + $"copy" * evOff)
      .withColumn("user_id", $"user_id" + $"copy" * uOff)
      .drop("copy"), "events")

    // copy 0 verbatim; copies > 0 get a vocabulary-disjoint token space
    // ("tok" → "tok~i") so near-dup structure never crosses copies
    write(replicated(documents, factor)
      .withColumn("doc_id", $"doc_id" + $"copy" * docOff)
      .withColumn("text", when($"copy" === 0, $"text").otherwise(
        regexp_replace($"text", lit("(\\S+)"), concat(lit("$1~"), $"copy"))))
      .withColumn("n_chars", length($"text").cast(LongType))
      .drop("copy"), "documents")

    // deterministic per-coordinate jitter for copies > 0: ±6e-3, a
    // pure function of (vec_id, coordinate, copy)
    write(replicated(embeddings, factor)
      .withColumn("vec_id", $"vec_id" + $"copy" * vecOff)
      .withColumn("embedding", when($"copy" === 0, $"embedding").otherwise(
        expr("transform(embedding, (x, k) -> " +
          "CAST(x + ((vec_id * 31 + k * 7 + 5) % 13 - 6) * 0.001 AS FLOAT))")))
      .drop("copy"), "embeddings")

    Tables.names.foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"[scalegen] $t: $n rows")
    }
    spark.stop()
  }
}
