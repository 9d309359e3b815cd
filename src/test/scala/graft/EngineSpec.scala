package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-component specs (SURVEY.md §2.H): SQL-registered custom
  * expressions, plan quality (pushdown / broadcast / partial agg), and
  * source/sink round-trips.
  */
class EngineSpec extends AnyFunSuite with SparkTestBase {

  test("custom expressions are SQL-callable via SparkSessionExtensions") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS c").head().getDouble(0)
    assert(math.abs(cos - 0.9922778767136677) < 1e-12)
    val sh = spark.sql(
      "SELECT shingles(array('a','b','c','d'), 3) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("custom expressions constant-fold under Catalyst when inputs are literal") {
    // foldable opt-in: a literal cosine_sim call must leave the optimized
    // plan as a Literal (ConstantFolding ran), not a per-row expression.
    val opt = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS c")
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("0.992277876713667"), s"literal cosine did not fold:\n$opt")
    assert(!opt.toLowerCase.contains("cosine_sim"), s"cosine_sim survived folding:\n$opt")
  }

  test("filter and projection push down to the parquet scan (q02)") {
    val plan = SparkEntry.queries("q02_filter_pushdown")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(plan.contains("l_shipdate"), "shipdate predicate not pushed")
    // column pruning: the 11-column lineitem scan must read only what q02 needs
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"),
      s"scan reads pruned columns: $readSchema")
  }

  test("dimension joins broadcast (q03) and big joins shuffle (q04)") {
    val p3 = SparkEntry.queries("q03_broadcast_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), "q03 dims not broadcast")
    val p4 = SparkEntry.queries("q04_shuffle_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p4.contains("Join"), "q04 lost its join")
  }

  test("aggregations are two-phase (map-side partial agg)") {
    val p = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("q49 top-k runs as a partial aggregate — no Window, no per-group sort") {
    val qe = SparkEntry.queries("q49_topk_agg")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // TypedImperativeAggregate → ObjectHashAggregate, in BOTH phases
    // (partial map-side + final), so the shuffle carries ≤ k pairs per
    // (task, group) instead of every row.
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"top_k did not run as a two-phase object aggregate:\n$plan")
    assert(!plan.contains("Window"), s"q49 fell back to a Window:\n$plan")
    // The only Sort allowed is the final presentation orderBy — it must
    // sit ABOVE the aggregate, never under it (a sort-based fallback
    // would re-introduce the per-group global sort the operator exists
    // to avoid).
    val sortIdx = plan.indexOf("Sort ")
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    assert(sortIdx < aggIdx, s"sort below the aggregate:\n$plan")
  }

  test("top_k agg matches a reference sort under random updates and merges") {
    // Heap law: fold any row set through any partition/merge tree ==
    // sort-take-k under the total order (score desc, id asc). Also
    // SQL-callable via the extension registration.
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500)(i => (rnd.nextInt(40).toDouble, i.toLong))
    val want = rows.sortWith { case ((s1, i1), (s2, i2)) =>
      s1 > s2 || (s1 == s2 && i1 < i2)
    }.take(7)
    (1 to 5).foreach { trial =>
      val shuffled = new scala.util.Random(trial).shuffle(rows)
      val nParts = 1 + trial
      val h = shuffled.grouped(math.max(1, shuffled.size / nParts)).map { chunk =>
        val heap = new graft.functions.TopKHeap(7)
        chunk.foreach { case (s, i) => heap.offer(s, i) }
        heap
      }.reduce { (a, b) =>
        var i = 0
        while (i < b.size) { a.offer(b.scores(i), b.ids(i)); i += 1 }
        a
      }
      assert(h.sortedPairs.toSeq == want,
        s"trial $trial: heap fold diverged from sort-take-k")
    }
    import spark.implicits._
    val df = rows.toDF("score", "id")
    df.createOrReplaceTempView("topk_probe")
    val viaSql = spark.sql(
      """SELECT inline(top_k(score, CAST(id AS BIGINT), 7))
         FROM topk_probe""").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(viaSql == want, "SQL-registered top_k diverged from reference")
  }

  test("no unbounded cartesian in the vector pipelines (s05/s06/d06)") {
    // s05 regressed-to-all-pairs was round 1's one scale-killer: pin that
    // every corpus-sized vector join is an EQUALITY join (hash-joinable),
    // with nested-loop joins only against broadcast singletons (the 1-row
    // query / k-row centroid sides, whose build side is O(k)).
    Seq("s05_knn_graph", "s06_ivf_ann", "d06_embed_lsh_dupes").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val nested = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val hashJoins = "HashJoin".r.findAllIn(plan).size
      assert(hashJoins >= 1, s"$name: bucket/cell equality join disappeared:\n$plan")
      val allowedNested = name match {
        case "s05_knn_graph" => 0         // pure bucket equality, no singleton side
        case "d06_embed_lsh_dupes" => 0   // pure bucket equality
        case _ => 3                       // s06: 1-row query (probe + final) and the
                                          // intentional corpus × k-centroid cross
      }
      assert(nested <= allowedNested,
        s"$name: ${nested} nested-loop joins (allowed $allowedNested) — all-pairs regression?\n$plan")
    }
  }

  test("pipeline utilities are shuffle-free scans; d09 joins by equality") {
    // p01/p02 are pure hash-membership scans: the ONLY exchange allowed is
    // the final presentation sort (range partitioning for the oracle's
    // total order) — a hashpartitioning exchange would mean an accidental
    // shuffle in what must stay a 100 TB single-pass scan.
    // (p04 is NOT here: its per-stratum window legitimately shuffles once.)
    Seq("p01_split_assign", "p02_stratified_sample", "p03_source_mix").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"),
        s"$name: unexpected shuffle in a scan-only operator:\n$plan")
      assert(!plan.contains("Join"), s"$name: unexpected join:\n$plan")
    }
    // d09's join-back must stay an equality join (broadcast or shuffled),
    // never a nested-loop over segment pairs.
    // d09's frequency join-back and p05's dedup-keep join-back must stay
    // equality joins (broadcast or shuffled), never a nested loop.
    Seq("d09_segment_dedup", "p05_corpus_pipeline").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$name: non-equality join:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"$name: equality join-back disappeared:\n$plan")
    }
  }

  test("round-3 operators keep their scale shapes (d10/s07/p06/e08/t12)") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // d10: the contamination probe is an equality hash join on the gram
    // hash (eval side broadcast); a nested loop would be train × eval grams.
    val d10 = planOf("d10_decontaminate")
    assert(!d10.contains("BroadcastNestedLoopJoin") && !d10.contains("CartesianProduct"),
      s"d10: non-equality contamination join:\n$d10")
    assert(d10.contains("HashJoin"), s"d10: gram equality join disappeared:\n$d10")
    // s07: coarse stage must be a TakeOrdered (partial top-50 merge, no
    // global sort); nested loops only against the broadcast 1-row query
    // sides (coarse qb + rerank qv).
    val s07 = planOf("s07_quantized_rerank")
    assert(s07.contains("TakeOrderedAndProject"), s"s07: shortlist lost TakeOrdered:\n$s07")
    assert("BroadcastNestedLoopJoin".r.findAllIn(s07).size <= 2,
      s"s07: unexpected non-singleton nested loop:\n$s07")
    // p06: cluster join-back + representative window — equality joins only.
    val p06 = planOf("p06_cluster_representative")
    assert(!p06.contains("BroadcastNestedLoopJoin") && !p06.contains("CartesianProduct"),
      s"p06: non-equality cluster join:\n$p06")
    // e08: one window pass, no self-join.
    val e08 = planOf("e08_sequence_pattern")
    assert(!e08.contains("Join"), s"e08: sequence pattern grew a join:\n$e08")
    assert(e08.contains("Window"), s"e08: lead window disappeared:\n$e08")
    // t12: scan-only — the sole exchange is the presentation sort.
    val t12 = planOf("t12_pii_redaction")
    assert(!t12.contains("hashpartitioning") && !t12.contains("Join"),
      s"t12: unexpected shuffle/join in a scan-only scrub:\n$t12")
    // s08: the candidate join must be an EQUALITY join on the cell id;
    // nested loops only for the two intentional broadcast k-row centroid
    // crosses (corpus-assign + query-probe).
    val s08 = planOf("s08_ivf_knn_join")
    assert(s08.contains("HashJoin") || s08.contains("SortMergeJoin"),
      s"s08: cell equality join disappeared:\n$s08")
    assert("BroadcastNestedLoopJoin".r.findAllIn(s08).size <= 2 &&
      !s08.contains("CartesianProduct"),
      s"s08: non-centroid nested loop — all-pairs regression?\n$s08")
    // m04: the modality sidecar join is equality on the sample id.
    val m04 = planOf("m04_paired_record")
    assert(!m04.contains("BroadcastNestedLoopJoin") && !m04.contains("CartesianProduct"),
      s"m04: non-equality modality join:\n$m04")
    // p07: no join, exactly one ranking window (per-shard position).
    val p07 = planOf("p07_training_order")
    assert(!p07.contains("Join") && p07.contains("Window"),
      s"p07: expected join-free windowed layout plan:\n$p07")
    // p08: five pipeline stages, all equality joins — the dedup keep
    // join-back, the broadcast gram probe, and the anti-join drop; a
    // nested loop anywhere means a stage regressed to pairwise work.
    val p08 = planOf("p08_clean_corpus")
    assert(!p08.contains("BroadcastNestedLoopJoin") && !p08.contains("CartesianProduct"),
      s"p08: non-equality join in the pipeline composition:\n$p08")
    assert(p08.contains("LeftAnti"), s"p08: contamination anti-join disappeared:\n$p08")
    // p09: the dataset-card flags join by equality (ch / gram hash /
    // doc_id) — a nested loop would be a per-doc scan of a flag table.
    val p09 = planOf("p09_dataset_card")
    assert(!p09.contains("BroadcastNestedLoopJoin") && !p09.contains("CartesianProduct"),
      s"p09: non-equality flag join:\n$p09")
    // e10: interval attribution must join by user-id EQUALITY with the
    // containment predicate as a post-join filter, never a nested loop
    // over (event × interval).
    val e10 = planOf("e10_session_attribution")
    assert(!e10.contains("BroadcastNestedLoopJoin") && !e10.contains("CartesianProduct"),
      s"e10: interval join regressed to a nested loop:\n$e10")
    assert(e10.contains("HashJoin") || e10.contains("SortMergeJoin"),
      s"e10: user-id equality join disappeared:\n$e10")
  }

  test("round-4 operators keep their scale shapes") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // q39: ONE Expand (×4 grouping sets) feeding a two-phase aggregate —
    // a second Expand or a missing partial agg means the fact stream is
    // being replayed per grouping set.
    val q39 = planOf("q39_grouping_sets")
    assert("Expand".r.findAllIn(q39).size == 1, s"q39: expected exactly one Expand:\n$q39")
    assert("HashAggregate".r.findAllIn(q39).size >= 2, s"q39: no partial agg:\n$q39")
    // e14: two lead() taps on one window — no self-join; top-10 is a
    // TakeOrdered merge, not a global sort.
    val e14 = planOf("e14_journey_trigrams")
    assert(!e14.contains("Join"), s"e14: trigram mining grew a join:\n$e14")
    assert(e14.contains("TakeOrderedAndProject"), s"e14: top-k lost TakeOrdered:\n$e14")
    // t16/t17: the model/vocab joins must be BROADCAST hash joins — a
    // shuffled join would re-partition the whole token stream against a
    // 12/20-row table.
    Seq("t16_classifier_score", "t17_oov_rate").foreach { name =>
      val p = planOf(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: tiny-table join not broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name: cartesian:\n$p")
    }
    // s10: the only nested loop is the intentional corpus × k-centroid
    // broadcast cross; everything downstream joins by equality.
    val s10 = planOf("s10_kmeans_refine")
    assert("BroadcastNestedLoopJoin".r.findAllIn(s10).size <= 1 &&
      !s10.contains("CartesianProduct"),
      s"s10: non-centroid nested loop — all-pairs regression?\n$s10")
    // d12: candidates and both verify sides join by equality (band key /
    // doc id) — a nested loop would be the cartesian the sketch avoids.
    val d12 = planOf("d12_sketch_error")
    assert(!d12.contains("BroadcastNestedLoopJoin") && !d12.contains("CartesianProduct"),
      s"d12: non-equality join in sketch calibration:\n$d12")
    // e15: funnel attribution joins by user-id equality only.
    val e15 = planOf("e15_cohort_funnel")
    assert(!e15.contains("BroadcastNestedLoopJoin") && !e15.contains("CartesianProduct"),
      s"e15: attribution join regressed to a nested loop:\n$e15")
    // q41: join-free — one window over the nation partition.
    val q41 = planOf("q41_target_encode")
    assert(!q41.contains("Join") && q41.contains("Window"),
      s"q41: expected join-free windowed LOO plan:\n$q41")
    // p12: deterministic sample is a TakeOrdered, never a global sort.
    val p12 = planOf("p12_uniform_sample")
    assert(p12.contains("TakeOrderedAndProject") && !p12.contains("Join"),
      s"p12: sample lost its TakeOrdered shape:\n$p12")
    // m07: frame-frequency join-back is equality on the frame hash.
    val m07 = planOf("m07_frame_boilerplate")
    assert(!m07.contains("BroadcastNestedLoopJoin") && !m07.contains("CartesianProduct"),
      s"m07: non-equality frame join:\n$m07")
    assert(m07.contains("HashJoin") || m07.contains("SortMergeJoin"),
      s"m07: frame-hash equality join disappeared:\n$m07")
  }

  test("round-5 operators keep their scale shapes") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // e21: the range join rides the user_id EQUALITY key — a BETWEEN that
    // becomes the join operator itself is the nested-loop regression this
    // operator exists to avoid.
    val e21 = planOf("e21_interval_join")
    assert(!e21.contains("BroadcastNestedLoopJoin") && !e21.contains("CartesianProduct"),
      s"e21: range join degenerated to a nested loop:\n$e21")
    assert(e21.contains("HashJoin") || e21.contains("SortMergeJoin"),
      s"e21: equality join disappeared:\n$e21")
    // e22: events join the exploded window-bin dim by bin EQUALITY; the
    // only nested loop is the 10-row window frame × 1-row min/max.
    val e22 = planOf("e22_binned_interval_join")
    assert("BroadcastNestedLoopJoin".r.findAllIn(e22).size <= 1 &&
      !e22.contains("CartesianProduct"),
      s"e22: timeline binning lost its equality join:\n$e22")
    assert(e22.contains("HashJoin"), s"e22: bin equi-join disappeared:\n$e22")
    // s12: codebook joins are equality/broadcast; PQ must never go
    // pairwise over the corpus.
    val s12 = planOf("s12_pq_adc_rerank")
    assert(!s12.contains("CartesianProduct"),
      s"s12: PQ pipeline grew a cartesian:\n$s12")
    // q48/p18: window over the counted/staged frame — no join at all.
    Seq("q48_group_mode", "p18_curriculum_order").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("Join") && p.contains("Window"),
        s"$name: expected join-free windowed plan:\n$p")
    }
    // d16: d01's shape — hash groupBy on the uniform prefix fingerprint.
    val d16 = planOf("d16_prefix_dedup")
    assert(!d16.contains("Join") && "HashAggregate".r.findAllIn(d16).size >= 2,
      s"d16: expected join-free two-phase aggregate:\n$d16")
    // ── round-5b additions ──
    // t23: pure per-row scoring — a join or aggregate appearing here means
    // the keyword/symbol signals stopped being single-scan expressions.
    val t23 = planOf("t23_code_detect")
    assert(!t23.contains("Join") && !t23.contains("HashAggregate"),
      s"t23: expected a join-free, aggregate-free scan:\n$t23")
    // d18: canonicalization is a column chain; dedup is d01's two-phase
    // hash aggregate on the canonical key — never a self-join.
    val d18 = planOf("d18_url_dedup")
    assert(!d18.contains("Join") && "HashAggregate".r.findAllIn(d18).size >= 2,
      s"d18: expected join-free two-phase aggregate:\n$d18")
    // s15: the sweep rides d06's bucket-equality candidates; the grid
    // explodes after the join, so no cartesian/nested-loop may appear.
    val s15 = planOf("s15_threshold_sweep")
    assert(!s15.contains("CartesianProduct") && !s15.contains("BroadcastNestedLoopJoin"),
      s"s15: threshold sweep went pairwise:\n$s15")
    assert(s15.contains("HashJoin") || s15.contains("SortMergeJoin"),
      s"s15: bucket equality join disappeared:\n$s15")
    // e26: one lead() window per user + a tiny rollup — no join.
    val e26 = planOf("e26_dwell_time")
    assert(!e26.contains("Join") && e26.contains("Window"),
      s"e26: expected join-free windowed plan:\n$e26")
    // m10/p22: single-scan two-phase aggregates.
    Seq("m10_resolution_profile", "p22_pack_efficiency").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("Join") && "HashAggregate".r.findAllIn(p).size >= 2,
        s"$name: expected join-free two-phase aggregate:\n$p")
    }
    // s16: the query-term table must filter the exploded token stream via
    // a BROADCAST hash join (a shuffled join would re-partition the whole
    // token stream against a 10-row table), and nothing in the retrieval
    // pipeline may go pairwise.
    val s16 = planOf("s16_bm25_topk")
    assert(s16.contains("BroadcastHashJoin"),
      s"s16: query-term filter not a broadcast join:\n$s16")
    assert(!s16.contains("CartesianProduct"),
      s"s16: BM25 pipeline grew a cartesian:\n$s16")
    // s17: candidates must come from the cell EQUALITY join (s08's
    // discipline); the only nested loops are the intentional broadcast
    // crosses against |q|-row / 1-row frames, never a CartesianProduct.
    val s17 = planOf("s17_ivf_probe_sweep")
    assert(s17.contains("BroadcastHashJoin"),
      s"s17: cell equality join disappeared:\n$s17")
    assert(!s17.contains("CartesianProduct"),
      s"s17: probe sweep grew a cartesian:\n$s17")
    // d19: every per-config candidate set comes from the band-equality
    // join (d02's discipline) — a re-banding sweep must never degenerate
    // to a pairwise pass over documents.
    val d19 = planOf("d19_band_tuning")
    assert(!d19.contains("CartesianProduct") && !d19.contains("BroadcastNestedLoopJoin"),
      s"d19: band sweep went pairwise:\n$d19")
    assert(d19.contains("HashJoin") || d19.contains("SortMergeJoin"),
      s"d19: band equality join disappeared:\n$d19")
    // d20: the impact report rides d08's converged labels — after the
    // component frame, only label/size aggregates may appear, never a
    // join and never a re-touch of documents.
    val d20 = planOf("d20_cluster_stats")
    assert(!d20.contains("Join") && "HashAggregate".r.findAllIn(d20).size >= 2,
      s"d20: expected join-free aggregates over the component frame:\n$d20")
  }

  test("round-6 operators keep their scale shapes") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // e28/m12: one lag window + partial-agg rollups — never a join.
    Seq("e28_rate_autocorr", "m12_motion_profile").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("Join") && p.contains("Window"),
        s"$name: expected join-free windowed plan:\n$p")
    }
    // t25: two partial-agg'd groupBys, join-free.
    val t25 = planOf("t25_lexical_diversity")
    assert(!t25.contains("Join") && "HashAggregate".r.findAllIn(t25).size >= 2,
      s"t25: expected join-free two-phase aggregates:\n$t25")
    // m11: candidate pairs come from the 4-chunk EQUALITY join over
    // 8-bit buckets — a cartesian over assets is exactly what the
    // pigeonhole construction exists to avoid.
    val m11 = planOf("m11_phash_neardup")
    assert(!m11.contains("CartesianProduct") && !m11.contains("BroadcastNestedLoopJoin"),
      s"m11: perceptual near-dup went pairwise:\n$m11")
    assert(m11.contains("HashJoin") || m11.contains("SortMergeJoin"),
      s"m11: chunk equality join disappeared:\n$m11")
    // s18: seed graph + 2-hop expansion + rescoring are ALL equality
    // joins on vec ids / buckets; no stage may go pairwise. The query's
    // own output plan reads a localCheckpoint (the loop's round-reuse
    // discipline), so the pin inspects ONE un-checkpointed round.
    val s18 = graft.operators.Similarity
      .nnDescentRounds(spark, sf, maxRounds = 1, checkpoint = false)
      ._2.last.queryExecution.executedPlan.toString
    assert(!s18.contains("CartesianProduct"),
      s"s18: NN-descent grew a cartesian:\n$s18")
    assert(s18.contains("HashJoin") || s18.contains("SortMergeJoin"),
      s"s18: equality joins disappeared:\n$s18")
    // d21: the Bloom probe is a BROADCAST join on the bounded position
    // table — shuffling the train gram stream against a ≤2^16-row set
    // would be the scale regression.
    val d21 = planOf("d21_bloom_decontaminate")
    assert(d21.contains("BroadcastHashJoin"),
      s"d21: position probe not a broadcast join:\n$d21")
    assert(!d21.contains("CartesianProduct"),
      s"d21: bloom probe grew a cartesian:\n$d21")
    // t26: pass 2's top-word filter must hit the token stream MAP-SIDE
    // (broadcast), s16's discipline.
    val t26 = planOf("t26_word_burstiness")
    assert(t26.contains("BroadcastHashJoin"),
      s"t26: top-word filter not a broadcast join:\n$t26")
    // p24: the train-gram membership probe is an equality (semi) join on
    // the uniform hash key.
    val p24 = planOf("p24_split_leakage")
    assert(!p24.contains("CartesianProduct") && !p24.contains("BroadcastNestedLoopJoin"),
      s"p24: leakage probe went pairwise:\n$p24")
    assert(p24.contains("HashJoin") || p24.contains("SortMergeJoin"),
      s"p24: gram equality join disappeared:\n$p24")
    // d22/t27: d09's co-partitioned join-back discipline — equality join
    // on the window/gram hash, never pairwise.
    Seq("d22_substring_dupes", "t27_gram_novelty").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: join-back went pairwise:\n$p")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$name: hash equality join disappeared:\n$p")
    }
    // s19: both arms and the fusion are equality/broadcast joins; the
    // only nested loops allowed are the two intentional tiny-frame
    // broadcasts — the 4-row query-vector frame (s03's shape) and the
    // 1-row BM25 avgdl/N stats cross.
    val s19 = planOf("s19_rrf_fusion")
    assert(!s19.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(s19).size <= 2,
      s"s19: fusion pipeline went pairwise beyond the tiny-frame broadcasts:\n$s19")
    // s20: the MMR recursion must stay on the shortlist — windows, plus
    // at most the one intentional query broadcast.
    val s20 = planOf("s20_mmr_diversify")
    assert(!s20.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(s20).size <= 1,
      s"s20: MMR left the shortlist frame:\n$s20")
    assert(s20.contains("Window"), s"s20: pick windows disappeared:\n$s20")
    // t28: one scan, two-phase aggregate on the tiny source key.
    val t28 = planOf("t28_length_profile")
    assert(!t28.contains("Join") && "HashAggregate".r.findAllIn(t28).size >= 2,
      s"t28: expected join-free two-phase aggregate:\n$t28")
    // e29/p25: user_id-/hash-keyed equality joins plus a window over the
    // tiny aggregate — never pairwise.
    Seq("e29_retention_rate", "p25_dedup_budget").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: went pairwise:\n$p")
      assert(p.contains("Window"), s"$name: normalization window disappeared:\n$p")
    }
    // d23: every PageRank round is an equality join on the edge list —
    // the iteration must never go pairwise over documents.
    val d23 = planOf("d23_central_representative")
    assert(!d23.contains("CartesianProduct") && !d23.contains("BroadcastNestedLoopJoin"),
      s"d23: centrality iteration went pairwise:\n$d23")
    assert(d23.contains("HashJoin") || d23.contains("SortMergeJoin"),
      s"d23: edge equality joins disappeared:\n$d23")
    // e30: everything after the hourly rollup is equality joins over
    // ≤ |types|×24 rows; the only nested loops are the 1-row last-day
    // broadcasts.
    val e30 = planOf("e30_seasonal_backtest")
    assert(!e30.contains("CartesianProduct"),
      s"e30: backtest grew a cartesian:\n$e30")
    assert(e30.contains("HashJoin") || e30.contains("SortMergeJoin"),
      s"e30: forecast equality joins disappeared:\n$e30")
    // e31: must run on the CUSTOM physical operator — a SortMergeJoin,
    // Window, or Union here means the strategy stopped firing and the
    // query silently fell back to a composed plan.
    val e31 = planOf("e31_asof_exec")
    assert(e31.contains("AsOfJoin"), s"e31: AsOfJoinExec not planned:\n$e31")
    assert(!e31.contains("SortMergeJoin") && !e31.contains("Window") &&
      !e31.contains("Union"), s"e31: fell back to a composed plan:\n$e31")
  }

  test("d19 band sweep is monotone: stricter configs only shrink the candidate set") {
    // Containment law: an (n/2, 2r) band key is the concat of two (n, r)
    // keys, so docs sharing a stricter band necessarily share both of its
    // halves — candidates(2,8) ⊆ candidates(4,4) ⊆ candidates(8,2), and
    // n_pairs must be nonincreasing as rows_per_band grows. The theory
    // columns must strictly fall with r at every θ (the S-curve steepens).
    val rows = SparkEntry.queries("d19_band_tuning")(spark, sf)
      .orderBy(col("n_bands").desc).collect()
    assert(rows.length == 3, s"expected 3 configs, got ${rows.length}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) <= a.getLong(2),
        s"candidates grew from (${a.getInt(0)},${a.getInt(1)}) to (${b.getInt(0)},${b.getInt(1)})")
      Seq(4, 5, 6).foreach { c =>
        assert(b.getDouble(c) < a.getDouble(c),
          s"catch probability did not fall with rows_per_band (col $c)")
      }
    }
  }

  test("s17 tuning curve is monotone: recall and scanned fraction rise with nprobe") {
    // The sweep's defining invariant — probing more cells can only add
    // candidates, so recall@3 and scanned fraction are nondecreasing in
    // nprobe (a non-monotone row means the probe grid or the candidate
    // join silently broke). Values themselves are the oracle's job.
    val rows = SparkEntry.queries("s17_ivf_probe_sweep")(spark, sf)
      .orderBy(col("nprobe")).collect()
    assert(rows.length == 4, s"expected 4 nprobe rows, got ${rows.length}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(2) >= a.getDouble(2),
        s"recall fell from nprobe=${a.getInt(0)} to ${b.getInt(0)}")
      assert(b.getDouble(3) > a.getDouble(3),
        s"scanned fraction did not rise from nprobe=${a.getInt(0)} to ${b.getInt(0)}")
    }
  }

  test("graft-registry DataSource V2: reads, matches the in-memory dims, prunes columns") {
    // service-backed registry == the in-memory dimension tables, through
    // the V2 read path (a real registry client swaps in at RegistryData)
    val usages = spark.read.format("graft-registry").option("table", "usages").load()
    assert(usages.count() == 5)
    val dims = graft.registry.Registry.usages(spark)
    assert(usages.exceptAll(dims).isEmpty && dims.exceptAll(usages).isEmpty,
      "V2 registry rows drifted from the in-memory dims")
    // array-typed column round-trips
    val ft = spark.read.format("graft-registry").option("table", "filetypes").load()
    import org.apache.spark.sql.functions.col
    assert(ft.filter(col("filetype_id") === "biologic-mpr")
      .head().getSeq[String](1) == Seq("yadg", "galvani"))
    // column pruning reaches the connector: a 1-column projection scans
    // 1-field rows (the scan description carries the pruned column list)
    val pruned = usages.select(col("extractor_id"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("GraftRegistryScan(table=usages, columns=[extractor_id]"),
      s"projection did not prune at the source:\n$plan")
    assert(pruned.distinct().count() == 4)
  }

  test("graft-registry V2: predicates push into the scan; richer ones stay residual") {
    import org.apache.spark.sql.functions.{col, length}
    val usages = spark.read.format("graft-registry").option("table", "usages").load()
    // equality + IN land in the scan (the registry-service-evaluable set)
    val pushed = usages.filter(col("method") === "cli")
      .filter(col("extractor_id").isin("yadg", "h5grove"))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(method,cli)") && plan.contains("In(extractor_id"),
      s"filters did not reach the scan description (DSv2 PushedFilters analog):\n$plan")
    assert(pushed.collect().map(_.getString(0)).sorted.toSeq == Seq("h5grove", "yadg"),
      "pushed-filter scan returns wrong rows")
    // pushed filters are REMOVED from the post-scan plan (the source is
    // authoritative): no FilterExec survives above this scan
    assert(!plan.contains("Filter ("),
      s"accepted filters were re-applied post-scan:\n$plan")
    // a filter the service can't evaluate stays residual post-scan and
    // never appears in the scan description
    val residual = usages.filter(length(col("command")) > 40)
    val rplan = residual.queryExecution.executedPlan.toString
    assert(!rplan.contains("filters=[Length") && !rplan.contains("GreaterThan(length"),
      s"unsupported filter leaked into the scan:\n$rplan")
    assert(rplan.contains("Filter"), s"residual filter missing post-scan:\n$rplan")
    assert(residual.count() == 4)
  }

  test("sources round-trip: parquet, csv, json, partitioned write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val df = Tables.load(spark, sf, "nation")
    df.write.mode("overwrite").parquet(s"$dir/p")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    df.write.mode("overwrite").json(s"$dir/j")
    df.write.mode("overwrite").partitionBy("n_regionkey").parquet(s"$dir/part")
    assert(spark.read.parquet(s"$dir/p").count() == 25)
    assert(spark.read.option("header", "true").csv(s"$dir/c").count() == 25)
    assert(spark.read.json(s"$dir/j").count() == 25)
    val parted = spark.read.parquet(s"$dir/part")
    assert(parted.count() == 25)
    // partition pruning: reading one region touches one directory
    val pruned = parted.filter(col("n_regionkey") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 5)
    assert(scan.contains("PartitionFilters: [isnotnull(n_regionkey"), s"no partition pruning: $scan")
  }

  test("registry round-trips through JSON with schema-on-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_registry_json").toString
    val ft = graft.registry.Registry.filetypes(spark)
    ft.write.mode("overwrite").json(s"$dir/filetypes")
    // schema-on-read: explicit schema (no inference pass), as a registry
    // sync job would consume the remote API's JSON dump
    val back = spark.read.schema(ft.schema).json(s"$dir/filetypes")
    assert(back.count() == ft.count())
    val diff = back.exceptAll(ft).count() + ft.exceptAll(back).count()
    assert(diff == 0, "registry JSON round-trip changed rows")
  }

  test("salting spreads a generated hot key across reducers (q28 pattern)") {
    import spark.implicits._
    // 60% of rows share one key — the shape where one reducer melts at
    // 100 TB. Deterministic partition-occupancy assertion, not timing.
    val skewed = spark.range(100000).select($"id",
      when($"id" % 5 < 3, "HOT").otherwise(concat(lit("k"), $"id" % 1000)).as("key"),
      ($"id" % 97).cast("double").as("v"))
    def maxPartFrac(df: org.apache.spark.sql.DataFrame): Double = {
      val sizes = df.groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1).toDouble)
      sizes.max / sizes.sum
    }
    val naive = maxPartFrac(skewed.repartition(16, $"key"))
    val salted = maxPartFrac(skewed.repartition(16, $"key", pmod(hash($"id"), lit(8))))
    assert(naive >= 0.6, s"hot key not concentrated under naive hashing: $naive")
    assert(salted <= naive / 3,
      f"salting did not spread the hot key: naive=$naive%.3f salted=$salted%.3f")
    // and the two-stage salted aggregation is value-identical to the
    // one-stage plan it replaces
    val plain = skewed.groupBy($"key").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val twoStage = skewed
      .withColumn("salt", pmod(hash($"id"), lit(8)))
      .groupBy($"key", $"salt").agg(count(lit(1)).as("pn"), sum($"v").as("ps"))
      .groupBy($"key").agg(sum($"pn").as("n"), sum($"ps").as("s"))
    assert(twoStage.exceptAll(plain).isEmpty && plain.exceptAll(twoStage).isEmpty,
      "salted two-stage aggregation drifted from the plain aggregate")
  }

  test("AQE rewrites a skewed sort-merge join into a skew join at runtime") {
    import spark.implicits._
    // The q04-shape failure at 100 TB: one hot join key melts a reducer.
    // The manual salting test above proves the by-hand fix; this pins the
    // RUNTIME fix — AQE detecting the oversized partition and splitting it
    // (skewJoin rewrite) with no query change. Thresholds are lowered so
    // test-scale bytes qualify as "skewed"; detection logic is the real one.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ path
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000).select(
        when($"id" % 10 < 8, 0L).otherwise($"id" % 500).as("key"),
        concat(lit("payload-padding-payload-padding-"), $"id").as("pad"))
      val dim = spark.range(500).select($"id".as("key"), concat(lit("d"), $"id").as("name"))
      val joined = fact.join(dim, "key").groupBy($"name").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join rewrite did not fire; executed plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    import spark.implicits._
    // The other runtime rewrite that matters at 100 TB: a selective dim
    // filter becomes a bloom filter PUSHED INTO the fact scan, so the
    // fact side drops non-joining rows before the shuffle instead of
    // shipping them. Broadcast is disabled (a broadcast join needs no
    // bloom) and the application-side size threshold lowered so
    // test-scale bytes qualify; the injection logic is the real one.
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    spark.range(200000)
      .select(($"id" % 1000).as("k"), concat(lit("pad-pad-pad-"), $"id").as("pad"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(1000)
      .select($"id".as("dk"), ($"id" % 50).as("cat"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 7)  // 2% of keys
      val joined = fact.join(dim, $"k" === $"dk").groupBy($"cat").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"runtime bloom filter not injected into the probe side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("e24's user-written BETWEEN join is rewritten off the nested loop") {
    // e24 declares the theta join a user would write; the cached plan must
    // carry BinnedRangeJoinRule's equi-join, not BroadcastNestedLoopJoin.
    // The 12-row × 1-row window-dim construction keeps its broadcast
    // cross (e22's allowance); the EVENTS join must ride the bin equality.
    val plan = SparkEntry.queries("e24_auto_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1 &&
      !plan.contains("CartesianProduct"),
      s"e24 fact join still plans a nested loop:\n$plan")
    assert(plan.contains("graft_bin"), s"bin rewrite absent from e24 plan:\n$plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    // co-locate fact tables on the join key at write time: at 100 TB this
    // is the difference between a one-off layout cost and re-shuffling
    // both sides on every join
    Tables.load(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.load(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    // merge hint: at test scale Spark would broadcast the small side and
    // skip bucketing entirely; the sort-merge path is the one bucketing
    // optimizes (at 100 TB neither side broadcasts)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join over buckets")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("q50 recursion runs as a bounded UnionLoop, never a materialized cross-step blowup") {
    val qe = SparkEntry.queries("q50_recursive_cte")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("UnionLoop"), s"recursive CTE did not plan as UnionLoop:\n$plan")
    // depth sanity: the longest chain (orders per customer) must sit far
    // below Spark's recursion limit — the property that makes set-based
    // recursion scale-safe at any SF (depth = chain length, not rows)
    import spark.implicits._
    val maxChain = Tables.load(spark, sf, "orders")
      .groupBy($"o_custkey").count().agg(max($"count")).head().getLong(0)
    val limit = spark.conf.get("spark.sql.cteRecursionLevelLimit").toLong
    assert(maxChain < limit / 2,
      s"longest chain $maxChain too close to the recursion limit $limit")
  }

  test("t29 heavy hitters: two-phase MG sketch, broadcast recount, exact answer") {
    import spark.implicits._
    val qe = SparkEntry.queries("t29_heavy_hitters")(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // Phase 1: the MG TypedImperativeAggregate must run as a two-phase
    // object aggregate (partial map-side sketch + merge), so the only
    // vocabulary-wide pass shuffles <=capacity counters per task.
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"heavy_hitters did not run as a two-phase object aggregate:\n$plan")
    // Phase 2: candidates come back as a BROADCAST, never a shuffle of
    // the token stream against the candidate list.
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate recount is not a broadcast join:\n$plan")

    // Exactness: sketch-then-recount == the plain exact computation.
    import graft.functions.TextFunctions.tokens
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(tokens($"text")).as("word"))
    val n = toks.count()
    val want = toks.groupBy($"word").agg(count(lit(1)).as("n"))
      .filter($"n" > lit(n * 0.01)).select($"word", $"n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rows = SparkEntry.queries("t29_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == want, s"sketch-then-recount diverged from exact:\ngot $rows\nwant $want")

    // SQL surface: heavy_hitters is registered through the extension.
    val viaSql = spark.sql(
      """SELECT inline(heavy_hitters(w, 4)) FROM VALUES ('a'),('a'),('a'),('b'),('c') AS t(w)""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.head == ("a", 3L), s"SQL heavy_hitters wrong: ${viaSql.toList}")
  }

  test("q54 sketch quantile: two-phase object aggregate, and the SQL function answers") {
    import spark.implicits._
    // the summary must build as partial map-side sketches + merge — the
    // plan property that keeps the shuffle summary-sized, never
    // value-sized (q54's whole reason to exist next to q44/q53)
    val plan = SparkEntry.queries("q54_sketch_quantile")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"quantile_sketch did not run as a two-phase object aggregate:\n$plan")
    // SQL registration: exact summary on a no-compaction input (k larger
    // than n ⇒ err must be 0 and items must be the raw values)
    val row = spark.sql(
      """SELECT s.err, s.n, s.items FROM
        (SELECT quantile_sketch(v, 64) AS s
         FROM VALUES (5.0D),(1.0D),(3.0D) AS t(v))""").collect().head
    assert(row.getLong(0) == 0L && row.getLong(1) == 3L,
      s"small-input sketch should be exact: $row")
    val vs = row.getSeq[org.apache.spark.sql.Row](2).map(_.getDouble(0))
    assert(vs == Seq(1.0, 3.0, 5.0), s"items not the sorted raw values: $vs")
  }
}
