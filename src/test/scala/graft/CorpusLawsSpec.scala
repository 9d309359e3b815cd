package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline LAWS on scalacheck-generated corpora (SURVEY §7 step 10).
  *
  * PropertySpec checks operators against references on the fixed test
  * corpus; this spec checks algebraic invariants that must hold on ANY
  * corpus — idempotence, partition/permutation laws, growth stability —
  * by generating documents tables (with forced duplicates, shared
  * 13-gram spans, and sub-threshold short docs) and running the REAL
  * `SparkEntry.queries` against them. Growth stability is the law that
  * matters at 100 TB: every membership/order decision derives from a
  * per-row salted hash, so ingesting tomorrow's shard must not reshuffle
  * yesterday's splits, samples, or training order.
  */
class CorpusLawsSpec extends AnyFunSuite with SparkTestBase {

  private val vocab = Vector(
    "the", "a", "join", "hash", "row", "scan", "filter", "sort", "merge",
    "dup", "spark", "query", "data", "fast", "vector", "window", "big",
    "small", "slow", "batch", "table", "key", "order", "group", "line")

  private def docGen(seed: Long, n: Int): Seq[(Long, String, String, String)] = {
    val texts = (0 until n).map { i =>
      val g = for {
        len <- Gen.chooseNum(10, 60)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" ")
      g.apply(Gen.Parameters.default, Seed(seed + i)).get
    }.toArray
    // forced structure: exact duplicates every 7th doc; every 11th doc
    // embeds an earlier doc's full text (shared 13-grams → decontamination
    // has real work); generator already yields sub-30-token docs.
    (1 until n).foreach { i =>
      if (i % 7 == 0) texts(i) = texts(i - 1)
      else if (i % 11 == 0) texts(i) = texts(i / 2) + " tail marker token"
    }
    (0 until n).map { i =>
      (i.toLong, texts(i), Seq("en", "de", "fr", "zh")(i % 4), s"src${i % 5}")
    }
  }

  /** Write a generated corpus as a `documents` table queries can load. */
  private def writeCorpus(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_laws").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val data = rows.map(r => Row(r._1, r._2, r._3, r._4, r._2.length.toLong))
    spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val corpusA = docGen(100L, 300)
  private lazy val corpusB = corpusA ++ docGen(900L, 300).map {
    case (id, t, l, s) => (id + 300L, t, l, s) // growth: new ids, old rows verbatim
  }
  private lazy val dirA = writeCorpus(corpusA)
  private lazy val dirB = writeCorpus(corpusB)

  test("law: p01 splits partition any corpus and are stable under growth") {
    val a = SparkEntry.queries("p01_split_assign")(spark, dirA)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(a.length == corpusA.length && a.map(_._1).distinct.length == a.length,
      "splits must assign every doc exactly once")
    val frac = a.count(_._2 == "train").toDouble / a.length
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac far from 0.8")
    val b = SparkEntry.queries("p01_split_assign")(spark, dirB)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, s) =>
      assert(b(id) == s, s"doc $id split changed ${s}→${b(id)} when the corpus grew")
    }
  }

  test("law: p02 sample is a subset with stable membership under growth") {
    val ids = corpusA.map(_._1).toSet
    val a = SparkEntry.queries("p02_stratified_sample")(spark, dirA)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(ids), "sampled ids not drawn from the corpus")
    assert(a.nonEmpty && a.size < ids.size, "sample neither proper nor nonempty")
    val b = SparkEntry.queries("p02_stratified_sample")(spark, dirB)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((b & ids) == a, "old docs' sample membership changed when the corpus grew")
  }

  test("law: p07 emits a permutation whose within-shard order survives growth") {
    def run(dir: String) = SparkEntry.queries("p07_training_order")(spark, dir)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val a = run(dirA)
    assert(a.map(_._1).distinct.length == corpusA.length, "docs lost or duplicated")
    a.groupBy(_._2).foreach { case (shard, m) =>
      assert(m.map(_._3).sorted.toSeq == (1 to m.length),
        s"shard $shard positions not dense")
    }
    val oldIds = corpusA.map(_._1).toSet
    val b = run(dirB)
    // a doc's (shard, sort_key) derive from its id alone → old docs keep
    // their shard and their relative order; new docs only interleave.
    val orderA = a.groupBy(_._2).view.mapValues(_.sortBy(_._3).map(_._1).toSeq).toMap
    val orderB = b.filter(t => oldIds(t._1)).groupBy(_._2)
      .view.mapValues(_.sortBy(_._3).map(_._1).toSeq).toMap
    assert(orderA == orderB, "within-shard relative order of old docs changed under growth")
  }

  test("law: p08 clean-corpus is idempotent (cleaning the cleaned corpus is identity)") {
    def key(r: Row) = (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4))
    val first = SparkEntry.queries("p08_clean_corpus")(spark, dirA).collect().map(key)
    assert(first.nonEmpty, "generated corpus produced an empty clean corpus")
    assert(first.length < corpusA.length,
      "forced dups/short docs should make cleaning strictly reductive")
    val keptIds = first.map(_._1).toSet
    val dir2 = writeCorpus(corpusA.filter(r => keptIds(r._1)))
    val second = SparkEntry.queries("p08_clean_corpus")(spark, dir2).collect().map(key)
    assert(second.toSet == first.toSet,
      s"p08 not idempotent: ${(first.toSet diff second.toSet).size} dropped, " +
        s"${(second.toSet diff first.toSet).size} added on the second pass")
  }

  test("law: p14 quotas are non-negative and sum exactly to the budget on any corpus") {
    Seq(dirA, dirB, writeCorpus(docGen(7000L, 37))).foreach { dir =>
      val shards = SparkEntry.queries("p14_shard_quota")(spark, dir)
        .select("shards").collect().map(_.getLong(0))
      assert(shards.forall(_ >= 0L), s"negative quota in $dir")
      assert(shards.sum == 1000L, s"quotas sum to ${shards.sum} != 1000 in $dir")
    }
  }

  test("law: d01 dedup matches the set-fingerprint reference and is idempotent") {
    def fp(text: String): String = {
      val canon = text.split(" ").distinct.sorted.mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val want = corpusA.groupBy(r => fp(r._2))
      .map { case (f, g) => (f, g.map(_._1).min, g.size.toLong) }.toSet
    val got = SparkEntry.queries("d01_exact_dedup")(spark, dirA).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "d01 diverges from the driver-side fingerprint reference")
    // idempotence: dedup of the keeper set is the identity partition
    val keep = got.map(_._2)
    val dir2 = writeCorpus(corpusA.filter(r => keep(r._1)))
    val again = SparkEntry.queries("d01_exact_dedup")(spark, dir2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(again.forall(_._2 == 1L), "keeper set still contains duplicates")
    assert(again.map(_._1).toSet == keep, "second dedup changed the keeper set")
  }

  test("law: p19 chunks partition every document's tokens exactly") {
    val chunks = SparkEntry.queries("p19_chunked_pack")(spark, dirA)
      .select("doc_id", "chunk_idx", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = corpusA.map(r => r._1 -> (r._2.split(" ").length.toLong + 2)).toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      assert(cs.map(_._3).sum == want(id),
        s"doc $id: chunk tokens ${cs.map(_._3).sum} != ${want(id)}")
      assert(cs.map(_._2).sorted.toSeq == (0 until cs.length),
        s"doc $id: chunk indices not dense")
      assert(cs.forall(c => c._3 >= 1 && c._3 <= 64), s"doc $id: chunk size out of range")
    }
    assert(chunks.map(_._1).distinct.length == corpusA.length, "docs lost in chunking")
  }

  test("law: p20 is a proper quality-weighted subset with growth-stable membership") {
    def run(dir: String) = SparkEntry.queries("p20_importance_sample")(spark, dir)
      .select("doc_id", "q").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val a = run(dirA)
    val ids = corpusA.map(_._1).toSet
    assert(a.nonEmpty && a.length < corpusA.length,
      s"soft filter degenerate: kept ${a.length} of ${corpusA.length}")
    assert(a.forall(r => ids(r._1)), "sampled ids not drawn from the corpus")
    // E[kept] = Σq; with q ∈ [0,1] and a uniform salted draw the realized
    // rate can't exceed max(q) or undershoot min(q) by construction —
    // bound the rate by the kept rows' own q envelope (loose but
    // generator-independent)
    val rate = a.length.toDouble / corpusA.length
    assert(rate > 0.05 && rate < 0.999, s"keep rate $rate implausible for q∈[0,1]")
    // growth: a doc's draw and score derive from its own row only
    val b = run(dirB).toMap
    a.foreach { case (id, q) =>
      assert(b.get(id).contains(q),
        s"doc $id sample membership/score changed when the corpus grew")
    }
  }

  test("q24 sketch sanity: within_bound is TRUE and the exact arm matches an independent count") {
    import spark.implicits._
    // q24 now carries its own accuracy contract (round 15): the output's
    // within_bound flag asserts |HLL − exact| ≤ 3·rsd·exact and the
    // driver's DuckDB oracle hash-checks it — this probe independently
    // recomputes the exact arm so the flag can't be trivially green.
    val got = SparkEntry.queries("q24_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet, "q24 group keys diverge from exact")
    exact.foreach { case (k, x) =>
      assert(got(k)._1 == x, s"q24[$k]: exact arm ${got(k)._1} != independent $x")
      assert(got(k)._2, s"q24[$k]: HLL estimate outside 3·rsd of exact")
    }
  }

  test("q24 error law holds at sf1: scale evidence for the one oracle-less query") {
    import spark.implicits._
    // The sf0.001 probe and the generated-cardinality law above cover the
    // small and synthetic regimes; this runs the REAL q24 plan against
    // the sf1 corpus (~600k lineitem rows, repo-local generated data) so
    // the only oracle-less query has scale evidence too. Cancels (not
    // fails) when the gitignored corpus has not been generated.
    val sf1 = "testdata-scaled/sf1"
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get(sf1, "lineitem.parquet")),
      s"sf1 corpus not generated (runMain graft.ScaleGen /root/testdata/sf0.1 $sf1 10)")
    val got = SparkEntry.queries("q24_approx_distinct")(spark, sf1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val exact = Tables.load(spark, sf1, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet, "q24@sf1 group keys diverge from exact")
    exact.foreach { case (k, x) =>
      // distinct l_partkey saturates at |part| (~20k at sf1) — the bound
      // pins that this probe runs 10× beyond the sf0.001/sf0.01 regime
      assert(x > 10000, s"q24@sf1[$k]: cardinality $x too small — not scale evidence")
      assert(got(k)._1 == x, s"q24@sf1[$k]: exact arm ${got(k)._1} != independent $x")
      assert(got(k)._2, s"q24@sf1[$k]: HLL estimate outside 3·rsd of exact")
    }
  }

  test("q24 HLL law: rel error ≤ 5σ across scalacheck-varied cardinalities (log-spread)") {
    import spark.implicits._
    // The single-point sf-corpus probe above can't catch an HLL regression
    // that only shows at other scales (sparse→dense representation switch,
    // merge path, large-range correction). Generate true cardinalities
    // log-uniformly across 1..10^5, all groups in ONE job, values spread
    // over 32 partitions so the per-partition sketches actually MERGE.
    val expGen = Gen.chooseNum(0, 50) // n = 10^(e/10): 1 .. 100k log-spread
    val cards = (0 until 28)
      .flatMap(i => expGen.apply(Gen.Parameters.default, Seed(100L + i)))
      .map(e => math.max(1, math.pow(10.0, e / 10.0).toInt))
      .distinct.sorted
    val df = cards.zipWithIndex
      .flatMap { case (n, gid) => (0 until n).map(v => (gid, v.toLong)) }
      .toDF("gid", "v")
      .repartition(32)
    val got = df.groupBy($"gid")
      .agg(approx_count_distinct($"v", 0.02).as("est")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cards.size >= 10 && cards.last >= 10000,
      s"generator degenerated (cards=$cards) — law is vacuous")
    cards.zipWithIndex.foreach { case (n, gid) =>
      val rel = math.abs(got(gid).toDouble - n) / n
      // rsd=0.02 → 5σ = 10%; tiny cardinalities are exact in the sparse
      // representation, so the same bound holds across the whole range
      assert(rel <= 0.10,
        f"HLL at true card $n: est=${got(gid)} rel-err=$rel%.4f > 10%%")
    }
  }

  test("Bloom law: the default geometry saturates at 50k eval grams; bloomBitsFor restores the FP floor") {
    import spark.implicits._
    import graft.operators.Dedup
    // disjoint hash ranges → every bloom hit is a FALSE positive
    val nEval = 50000L
    val evalg = spark.range(nEval).select((col("id") + 1000000000L).as("h"))
    val traing = spark.range(4000)
      .select((col("id") % 400).as("doc_id"), col("id").as("h"))
    def fpRate(bits: Int): Double = {
      val probe = Dedup.bloomProbeFrame(traing,
        Dedup.bloomPositionFrame(evalg, bits), bits)
      val r = probe.agg(sum($"n_bloom_hits"), sum($"n_grams")).first()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val fpDefault = fpRate(Dedup.BloomBits)
    assert(fpDefault > 0.5,
      f"default 2^16 filter should saturate at $nEval grams, FP=$fpDefault%.3f — " +
        "saturation bound in the Scaladoc is wrong")
    val sized = Dedup.bloomBitsFor(nEval)
    assert(sized >= nEval * 14 && Integer.bitCount(sized) == 1,
      s"bloomBitsFor($nEval) = $sized is not the next power of two >= 14 bits/gram")
    val fpSized = fpRate(sized)
    assert(fpSized <= 0.02,
      f"sized filter ($sized bits) should hold FP <= 2%%, got $fpSized%.4f")
  }

  test("law: s14 norm-augmented cosine order IS inner-product order") {
    // the entire point of the Bachrach reduction: on the real embeddings,
    // ranking by the augmented cosine must reproduce ranking by raw dot.
    val rows = SparkEntry.queries("s14_mips_topk")(spark, sf)
      .select("vec_id", "dot", "aug_cos").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byDot = rows.sortBy(t => (-t._2, t._1)).map(_._1).toSeq
    val byCos = rows.sortBy(t => (-t._3, t._1)).map(_._1).toSeq
    assert(byDot == byCos, s"augmented-cosine order diverged from dot order:\n$rows")
  }

  test("law: p21 allocations respect the epoch cap and never exceed the budget") {
    def run(dir: String) = SparkEntry.queries("p21_epoch_plan")(spark, dir)
      .select("source", "tokens", "desired", "alloc", "epochs_milli").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for (dir <- Seq(dirA, dirB)) {
      val rows = run(dir)
      val budget = rows.map(_._2).sum * 3
      assert(rows.map(_._4).sum <= budget,
        s"allocations ${rows.map(_._4).sum} exceed budget $budget")
      rows.foreach { case (src, tokens, _, alloc, epm) =>
        assert(alloc <= tokens * 4, s"$src: alloc $alloc beyond the 4-epoch cap")
        assert(epm <= 4000, s"$src: epochs_milli $epm beyond the cap")
        assert(alloc >= 0 && epm >= 0, s"$src: negative allocation")
      }
    }
  }

  test("law: d17 weighted mass is bounded by raw mass, equal iff no duplicates") {
    // generated corpus: organic exact dups (every 7th doc) + the operator's
    // planted recrawl clones — effective mass must strictly discount.
    val rows = SparkEntry.queries("d17_soft_dedup_weight")(spark, dirA)
      .select("source", "n_docs", "raw_tokens", "effective_utokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == corpusA.length + 2 * corpusA.count(_._1 % 13 == 0),
      "doc count must equal corpus + planted clones")
    rows.foreach { case (src, _, raw, eff) =>
      assert(eff <= raw * 1000000L, s"$src: effective mass exceeds raw")
    }
    assert(rows.exists { case (_, _, raw, eff) => eff < raw * 1000000L },
      "a corpus with dups must show a discount somewhere")
  }

  test("law: t22 buckets partition the corpus") {
    // every doc lands in exactly one perplexity tranche (generator emits
    // ≥10-token docs, so every doc has bigrams and gets scored).
    val rows = SparkEntry.queries("t22_perplexity_bucket")(spark, dirA)
      .select("bucket", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows.map(_._2).sum == corpusA.length,
      s"bucket doc counts ${rows.toSeq} don't partition the ${corpusA.length}-doc corpus")
    assert(rows.map(_._1).toSet.subsetOf(Set("head", "middle", "tail")))
  }

  test("law: e27 flags a planted scheduler and clears a bursty human") {
    // semantics, not just cross-engine agreement: a metronome user (exact
    // 60s gaps, CV = 0) MUST flag; a bursty user (alternating 10s/3600s
    // gaps, CV ≈ 1 of the mean) MUST NOT.
    val dir = java.nio.file.Files.createTempDirectory("graft_bot").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, user: Long, offsetSec: Long): Row =
      Row(id, new java.sql.Timestamp(base + offsetSec * 1000L), user, "click", 1.0)
    val bot = (0 until 40).map(i => ev(i.toLong, 1L, 60L * i))
    val human = (0 until 40).map { i =>
      // cumulative alternating gaps: 10s, 3600s, 10s, ...
      val off = (i / 2) * 3610L + (i % 2) * 10L
      ev(100L + i, 2L, off)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(bot ++ human, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val flags = SparkEntry.queries("e27_bot_regularity")(spark, dir)
      .select("user_id", "is_bot").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(1L), "metronome user not flagged as bot")
    assert(!flags(2L), "bursty human incorrectly flagged")
  }

  test("law: e23 lateness audit is consistent (late ⊆ events, ratio in [0,1])") {
    val rows = SparkEntry.queries("e23_late_event_audit")(spark, sf)
      .select("n_events", "n_late", "late_ratio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = rows.map(_._1).sum
    val nEvents = Tables.load(spark, sf, "events").count()
    assert(total == nEvents, s"audit covers $total of $nEvents events")
    rows.foreach { case (n, late, ratio) =>
      assert(late <= n && ratio >= 0.0 && ratio <= 1.0,
        s"inconsistent lateness row ($n, $late, $ratio)")
    }
  }

  test("d24 law: densified OPH signatures are total and pin exact dups at est 1.0") {
    // identical texts ⇒ identical shingle sets ⇒ identical slot minima ⇒
    // every band collides and est = 16/16 — regardless of how many of
    // the 16 bins are actually occupied. Docs 3/4 have ONE shingle, so
    // all 16 slots come from rotation densification of a single bin:
    // the pair surfacing at 1.0 proves the densified tail, not just the
    // happy path. Doc 5 shares no shingles with anyone — any pairing
    // would need ≥8 random slot collisions of 60-bit minima.
    val dir = writeCorpus(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0"),
      (3L, "tiny doc here", "en", "s0"),
      (4L, "tiny doc here", "en", "s0"),
      (5L, "completely different words in this unrelated document body", "en", "s0")))
    val got = SparkEntry.queries("d24_oph_minhash")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.get((1L, 2L)).contains(1.0), s"exact dup (1,2) not at est 1.0: $got")
    assert(got.get((3L, 4L)).contains(1.0),
      s"one-shingle dup (3,4) must match via densified slots: $got")
    assert(!got.keySet.exists { case (i, j) => i == 5L || j == 5L },
      s"disjoint-shingle doc 5 must not pair: $got")
    // and on the generated corpus (which plants verbatim copies): every
    // identical-text pair with ≥3 tokens (a signature exists) surfaces
    // at 1.0
    val texts = corpusA.map(r => r._1 -> r._2)
      .filter(_._2.split(" ").length >= 3)
    val dupPairs = texts.groupBy(_._2).values.filter(_.length > 1).flatMap { g =>
      val ids = g.map(_._1).sorted.toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    assert(dupPairs.nonEmpty, "no exact-dup ground truth in the generated corpus — vacuous")
    val real = SparkEntry.queries("d24_oph_minhash")(spark, dirA)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    dupPairs.foreach { p =>
      assert(real.get(p).contains(1.0), s"exact dup $p missing or below 1.0")
    }
  }
}
