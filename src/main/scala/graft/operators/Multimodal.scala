package graft.operators

import graft.{GQuery, Tables}
import graft.GQuery._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.G): media as opaque `binary` payloads
  * with typed metadata, processed by deterministic stub "decoders".
  *
  * The container has no image/audio codecs, so the decode itself is a
  * deterministic fake (dimensions derived from byte length; frames =
  * fixed-size byte chunks) — but the Spark-side plumbing is real: binary
  * columns, metadata structs, per-frame explosion, bounded row growth.
  * A production decoder replaces the stub expressions with the
  * `mapPartitions` path in [[graft.registry.Extraction]] — schema and
  * partitioning stay identical.
  */
object Multimodal {

  val all: Seq[GQuery] = Seq(

    // ── m01: binary payload + typed metadata: byte length, checksum, ──
    // stubbed dimensions, rotating content type.
    GQuery("m01_binary_meta",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"doc_id", $"text".cast(BinaryType).as("payload"))
          .select($"doc_id",
            length($"payload").as("n_bytes"),
            md5($"payload").as("checksum"),
            element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
              ($"doc_id" % 3 + 1).cast(IntegerType)).as("content_type"),
            (length($"payload") % 640 + 1).as("fake_width"),
            (length($"payload") % 480 + 1).as("fake_height"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(strlen(text) AS INT) AS n_bytes,
               md5(text) AS checksum,
               (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS content_type,
               CAST(strlen(text) % 640 + 1 AS INT) AS fake_width,
               CAST(strlen(text) % 480 + 1 AS INT) AS fake_height
        FROM documents ORDER BY doc_id""")),

    // ── m02: frame sampling — chunk each payload into 256-byte frames ──
    // (explode bounded by ceil(len/256)); per-frame checksum. The stub for
    // video frame extraction / audio windowing: same schema, same bounded
    // row growth, real decoder drops in at the chunk expression.
    GQuery("m02_chunk_frames",
      (s, d) => {
        import s.implicits._
        // Frame count capped at 2000 on BOTH sides (≈512 KB/payload): the
        // oracle enumerates frames from range(0, 2000), so an uncapped
        // sequence() here would silently diverge on longer payloads.
        Tables.load(s, d, "documents")
          // length > 0 guard: sequence(0, -1) on empty text generates the
          // DESCENDING array [0, -1] (default step -1) — two bogus frames
          // where the oracle's range-filter emits none. Mirrored in SQL.
          .filter($"doc_id" < 100 && length($"text") > 0)
          .select($"doc_id", $"text",
            posexplode(expr("sequence(0L, least((length(text) + 255) DIV 256 - 1, 1999L))")))
          .select($"doc_id", $"pos".cast(IntegerType).as("frame_idx"),
            expr("substring(text, pos * 256 + 1, 256)").as("frame"))
          .select($"doc_id", $"frame_idx",
            length($"frame").as("frame_len"), md5($"frame").as("frame_md5"))
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""
        SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
               CAST(length(substr(text, CAST(f.f AS INT) * 256 + 1, 256)) AS INT) AS frame_len,
               md5(substr(text, CAST(f.f AS INT) * 256 + 1, 256)) AS frame_md5
        FROM documents, (SELECT unnest(range(0, 2000)) AS f) f
        WHERE doc_id < 100 AND f.f <= (length(text) + 255) // 256 - 1
        ORDER BY doc_id, frame_idx"""))
    ,

    // ── m03: frame embedding + pooling — the decode→embed→pool pipeline ──
    // shape: each frame (m02's chunker) maps to an embedding through a
    // deterministic codebook lookup (stub for a real image/audio encoder;
    // the encoder drops in at the key expression), then per-document
    // MAX-pooling over frame vectors. Max is order-independent, so the
    // pooled vector is exact regardless of partitioning — no fp-summation
    // drift (mean-pooling would need the DECIMAL trick). The codebook
    // joins by key (broadcast here; a 100 TB corpus joins against a
    // bucketed codebook table the same way).
    GQuery("m03_frame_embed_pool",
      (s, d) => {
        import s.implicits._
        val frames = Tables.load(s, d, "documents")
          // length > 0 guard: sequence(0, -1) on empty text generates the
          // DESCENDING array [0, -1] (default step -1) — two bogus frames
          // where the oracle's range-filter emits none. Mirrored in SQL.
          .filter($"doc_id" < 100 && length($"text") > 0)
          .select($"doc_id", $"text", posexplode(expr(
            "sequence(0L, least((length(text) + 255) DIV 256 - 1, 1999L))")))
          .select($"doc_id", $"pos".cast(IntegerType).as("frame_idx"),
            expr("substring(text, pos * 256 + 1, 256)").as("frame"))
        val nv = Tables.load(s, d, "embeddings").agg(count(lit(1)).as("nv"))
        val code = Tables.load(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast(ArrayType(DoubleType)).as("v"))
        val fv = frames.join(broadcast(nv))
          .select($"doc_id", $"frame_idx",
            (graft.functions.TextFunctions.hash64($"frame") % $"nv").as("key"))
          .join(broadcast(code), $"key" === $"vec_id")
        val pooled = fv
          .select($"doc_id", posexplode($"v"))
          .groupBy($"doc_id", $"pos")
          .agg(max($"col").as("m"))
          .groupBy($"doc_id")
          .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
          .select($"doc_id",
            roundz(sqrt(aggregate(transform($"pm", x => x.getField("m")),
              lit(0.0), (acc, x) => acc + x * x)), 6).as("pooled_norm"))
        fv.groupBy($"doc_id").agg(count(lit(1)).as("n_frames"))
          .join(pooled, "doc_id")
          .select($"doc_id", $"n_frames", $"pooled_norm")
          .orderBy($"doc_id")
      },
      Some("""
        WITH fr AS (
          SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
                 substr(text, CAST(f.f AS INT) * 256 + 1, 256) AS frame
          FROM documents, (SELECT unnest(range(0, 2000)) AS f) f
          WHERE doc_id < 100 AND length(text) > 0
            AND f.f <= (length(text) + 255) // 256 - 1),
        n AS (SELECT COUNT(*) AS nv FROM embeddings),
        fv AS (SELECT doc_id, frame_idx, CAST(e.embedding AS DOUBLE[]) AS v
               FROM fr CROSS JOIN n
               JOIN embeddings e
                 ON e.vec_id = CAST(('0x' || substr(md5(frame), 1, 15)) AS BIGINT) % n.nv),
        coords AS (SELECT doc_id, p.p AS pos, MAX(v[p.p]) AS m
                   FROM fv, (SELECT unnest(range(1, 65)) AS p) p
                   GROUP BY doc_id, pos),
        pooled AS (SELECT doc_id,
                          (ROUND(sqrt(list_sum(list_transform(list(m ORDER BY pos), x -> x * x))), 6) + 0.0)
                            AS pooled_norm
                   FROM coords GROUP BY doc_id),
        stats AS (SELECT doc_id, COUNT(*) AS n_frames FROM fv GROUP BY doc_id)
        SELECT doc_id, n_frames, pooled_norm
        FROM stats JOIN pooled USING (doc_id) ORDER BY doc_id""")
    ),

    // ── m04: paired multimodal record assembly — text features joined ──
    // with the sample's media embedding into one training record (the
    // interleave step before packing text+vision samples). Equality join
    // documents ⋈ embeddings on the sample id: co-partitioned at scale
    // (both sides keyed by the same id), never pairwise; text stats are
    // codegen'd scan columns and the embedding reduces to its norm. At
    // 100 TB this is the canonical "modality sidecar" join — one shuffle
    // per side or zero when both tables are bucketed by id.
    GQuery("m04_paired_record",
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
          .select($"doc_id", $"lang",
            size(split($"text", " ")).cast(LongType).as("n_tokens"))
        val embr = Tables.load(s, d, "embeddings")
          .select($"vec_id", $"label",
            roundz(sqrt(aggregate($"embedding".cast(ArrayType(DoubleType)),
              lit(0.0), (acc, x) => acc + x * x)), 6).as("emb_norm"))
        docs.join(embr, $"doc_id" === $"vec_id")
          .select($"doc_id", $"lang", $"n_tokens", $"label", $"emb_norm")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT d.doc_id, d.lang,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
               e.label,
               (ROUND(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x))), 6) + 0.0) AS emb_norm
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ORDER BY d.doc_id""")),

    // ── m05: media batch packing — group payloads into transfer shards ──
    // of ≤4 KB per MODALITY (the decode-worker batch layout: a batch
    // mixes only same-type media, and batches cut on a byte budget, not
    // a row count). p04's per-stratum windowed cumsum transplanted to
    // binary metadata: the running byte total partitions BY content
    // type, so modalities pack in parallel and no global order exists.
    // Payload bytes ride as metadata only — the window carries (type,
    // doc_id, n_bytes), never the blob itself.
    GQuery("m05_media_pack",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"content_type").orderBy($"doc_id")
        Tables.load(s, d, "documents")
          .select($"doc_id", $"text".cast(BinaryType).as("payload"))
          .select($"doc_id",
            element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
              ($"doc_id" % 3 + 1).cast(IntegerType)).as("content_type"),
            length($"payload").cast(LongType).as("n_bytes"))
          .withColumn("cum_bytes", sum($"n_bytes").over(w))
          .withColumn("shard", expr("(cum_bytes - n_bytes) div 4096"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS content_type,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(SUM(strlen(text)) OVER (PARTITION BY doc_id % 3
                 ORDER BY doc_id) AS BIGINT) AS cum_bytes,
               CAST((SUM(strlen(text)) OVER (PARTITION BY doc_id % 3 ORDER BY doc_id)
                     - strlen(text)) // 4096 AS BIGINT) AS shard
        FROM documents ORDER BY doc_id""")),

    // ── m06: media asset dedup — near-duplicate binary payloads grouped ──
    // by a perceptual-hash key (CDN-asset dedup: the same image
    // re-crawled, truncated, or re-encoded is stored once). The pHash
    // stub is the checksum of the leading 64-CHARACTER prefix (taken on
    // the string, pre-cast, because DuckDB has no byte-level BLOB substr
    // to mirror a binary slice; md5 over those chars' UTF-8 bytes agrees
    // across engines for any input). Byte COUNTS stay genuinely
    // byte-based: Spark length(BINARY) ↔ DuckDB strlen(VARCHAR). A real
    // perceptual hash drops into the same expression slot with identical
    // plumbing. d01's hash-groupBy discipline on the BINARY column: the
    // 128-bit key is uniform → no skew; the blob itself never shuffles
    // (the groupBy carries the hash + byte count only); keeper = min id;
    // reclaimable_bytes = what dedup to the keeper's copy saves.
    GQuery("m06_asset_dedup",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"doc_id", $"text",
            $"text".cast(BinaryType).as("payload"))
          .select($"doc_id",
            md5(substring($"text", 1, 64)).as("phash"),
            length($"payload").cast(LongType).as("n_bytes"))
          .groupBy($"phash")
          .agg(count(lit(1)).as("n_copies"),
            min($"doc_id").as("keeper"),
            sum($"n_bytes").as("total_bytes"),
            min($"n_bytes").as("min_bytes"))
          .filter($"n_copies" > 1)
          .withColumn("reclaimable_bytes", $"total_bytes" - $"min_bytes")
          .orderBy($"phash")
      },
      Some("""
        SELECT md5(substr(text, 1, 64)) AS phash, COUNT(*) AS n_copies,
               MIN(doc_id) AS keeper,
               CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(MIN(strlen(text)) AS BIGINT) AS min_bytes,
               CAST(SUM(strlen(text)) - MIN(strlen(text)) AS BIGINT) AS reclaimable_bytes
        FROM documents GROUP BY phash HAVING COUNT(*) > 1
        ORDER BY phash""")),

    // ── m07: boilerplate frames — frames (m02's chunker) whose content ──
    // hash appears in MORE THAN ONE document: the intro/outro/watermark
    // detection pass video pipelines run before training (d09's
    // segment-dedup discipline transplanted to media frames). Frame
    // document-frequency is a partial-agg'd groupBy on the uniform
    // 128-bit hash; the join-back is co-partitioned on that hash; blobs
    // never shuffle (hash + counts only). Per doc: frame count,
    // boilerplate count, rate.
    GQuery("m07_frame_boilerplate",
      (s, d) => {
        import s.implicits._
        val frames = Tables.load(s, d, "documents")
          // length > 0 guard: sequence(0, -1) on empty text generates the
          // DESCENDING array [0, -1] (default step -1) — two bogus frames
          // where the oracle's range-filter emits none. Mirrored in SQL.
          .filter($"doc_id" < 100 && length($"text") > 0)
          .select($"doc_id", $"text", posexplode(expr(
            "sequence(0L, least((length(text) + 255) DIV 256 - 1, 1999L))")))
          .select($"doc_id", $"pos".cast(IntegerType).as("frame_idx"),
            md5(expr("substring(text, pos * 256 + 1, 256)")).as("fh"))
        val dfreq = frames.groupBy($"fh").agg(countDistinct($"doc_id").as("df"))
        frames.join(dfreq, "fh")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when($"df" > 1, 1L).otherwise(0L)).as("n_boiler"))
          .withColumn("boiler_rate", roundz($"n_boiler".cast(DoubleType) / $"n_frames", 6))
          .orderBy($"doc_id")
      },
      Some("""
        WITH frames AS (
          SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
                 md5(substr(text, CAST(f.f AS INT) * 256 + 1, 256)) AS fh
          FROM documents, (SELECT unnest(range(0, 2000)) AS f) f
          WHERE doc_id < 100 AND length(text) > 0
            AND f.f <= (length(text) + 255) // 256 - 1),
        dfreq AS (SELECT fh, COUNT(DISTINCT doc_id) AS df FROM frames GROUP BY fh)
        SELECT doc_id, COUNT(*) AS n_frames,
               CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
               (ROUND(CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0) AS boiler_rate
        FROM frames JOIN dfreq USING (fh)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ── m08: scene-cut detection — consecutive-frame perceptual-hash ──
    // hamming distance, the shot-boundary pass video pipelines run to
    // sample one keyframe per scene instead of N near-identical frames.
    // Signature = portable 60-bit hash of the frame bytes (stub for a
    // real pHash — same 64-bit slot); distance = popcount(xor) of
    // ADJACENT frames via a per-document lag window (one doc_id-keyed
    // shuffle; frames never pair beyond their neighbor). Cut iff
    // distance > 40 of 60 bits. Blobs don't ride the window — only the
    // 8-byte signatures shuffle.
    GQuery("m08_scene_cuts",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val frames = Tables.load(s, d, "documents")
          .filter($"doc_id" < 100 && length($"text") > 0)
          .select($"doc_id", $"text", posexplode(expr(
            "sequence(0L, least((length(text) + 255) DIV 256 - 1, 1999L))")))
          .select($"doc_id", $"pos".cast("int").as("frame_idx"),
            graft.functions.TextFunctions.hash64(
              expr("substring(text, pos * 256 + 1, 256)")).as("sig"))
        val w = Window.partitionBy($"doc_id").orderBy($"frame_idx".asc)
        frames
          .withColumn("prev_sig", lag($"sig", 1).over(w))
          .filter($"prev_sig".isNotNull)
          .select($"doc_id", $"frame_idx",
            expr("bit_count(sig ^ prev_sig)").cast("int").as("hamming"))
          .withColumn("is_cut", $"hamming" > 40)
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""
        WITH frames AS (
          SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
                 CAST(('0x' || substr(md5(substr(text, CAST(f.f AS INT) * 256 + 1, 256)), 1, 15)) AS BIGINT) AS sig
          FROM documents, (SELECT unnest(range(0, 2000)) AS f) f
          WHERE doc_id < 100 AND length(text) > 0
            AND f.f <= (length(text) + 255) // 256 - 1),
        lagged AS (
          SELECT doc_id, frame_idx, sig,
                 lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx ASC) AS prev_sig
          FROM frames)
        SELECT doc_id, frame_idx,
               CAST(bit_count(xor(sig, prev_sig)) AS INT) AS hamming,
               bit_count(xor(sig, prev_sig)) > 40 AS is_cut
        FROM lagged WHERE prev_sig IS NOT NULL
        ORDER BY doc_id, frame_idx""")),

    // ── m09: caption–asset alignment filter — the CLIP-score gate every ──
    // paired image/text corpus passes (LAION-style: score each
    // (caption, asset-embedding) pair, drop misaligned pairs, report the
    // per-label survival rate). The text encoder is a deterministic stub
    // — one md5 per caption expanded to 64 dims by the same affine
    // permutation family the minhash pipeline uses (TextFunctions
    // .permHash), centered to [-0.5, 0.5) — a real encoder's vectors
    // drop into the SAME join/score/filter plan via the Extraction seam.
    // Scale: pairs join 1:1 on doc_id=vec_id (co-partitioned ids — at
    // 100 TB both sides bucket on id and the join is exchange-free); the
    // 64-dim stub rides the scan projection (never stored); scoring is
    // the codegen'd CosineSim; rollup = 10 label rows.
    GQuery("m09_caption_alignment",
      (s, d) => {
        import s.implicits._
        import graft.functions.VectorFunctions.{asDouble, cosineSim, cosineSimSql}
        val P1 = graft.functions.TextFunctions.PermP1
        val pairs = Tables.load(s, d, "documents")
          .select($"doc_id",
            graft.functions.TextFunctions.hash64(
              concat(lit("enc:"), $"doc_id")).as("h"))
          .join(Tables.load(s, d, "embeddings"),
            $"doc_id" === $"vec_id")
          .select($"doc_id", $"label",
            transform(sequence(lit(0L), lit(63L)), p =>
              ((((lit(1103515245L) * (p + lit(1L)) + lit(12345L)) % lit(P1))
                * ($"h" % lit(P1))
                + ((lit(694367L) * (p + lit(1L)) + lit(99991L)) % lit(P1))) % lit(P1))
                / lit(P1.toDouble) - lit(0.5)).as("tv"),
            asDouble($"embedding").as("v"))
          .select($"doc_id", $"label",
            roundz(cosineSim($"tv", $"v"), 6).as("score"))
        pairs
          .groupBy($"label")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when($"score" > 0.0, 1L).otherwise(0L)).as("n_kept"),
            roundz(sum($"score".cast(DecimalType(18, 6))).cast(DoubleType)
              / count(lit(1)), 6).as("mean_score"))
          .withColumn("kept_ratio", roundz($"n_kept" / $"n_pairs", 6))
          .select($"label", $"n_pairs", $"n_kept", $"kept_ratio", $"mean_score")
          .orderBy($"label")
      },
      Some(s"""
        WITH cap AS (
          SELECT doc_id, ${hashSql("enc:")} AS h FROM documents),
        pairs AS (
          SELECT cap.doc_id, e.label,
                 list_transform(range(0, 64), p ->
                   ((((1103515245*(p+1)+12345) % 1073741789) * (cap.h % 1073741789)
                     + ((694367*(p+1)+99991) % 1073741789)) % 1073741789)
                     / 1073741789.0 - 0.5) AS tv,
                 CAST(e.embedding AS DOUBLE[]) AS v
          FROM cap JOIN embeddings e ON cap.doc_id = e.vec_id),
        scored AS (
          SELECT doc_id, label,
                 (ROUND(${graft.functions.VectorFunctions.cosineSimSql("pairs.tv", "pairs.v")}, 6) + 0.0) AS score
          FROM pairs)
        SELECT label, COUNT(*) AS n_pairs,
               CAST(SUM(CASE WHEN score > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               (ROUND(CAST(SUM(CASE WHEN score > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(COUNT(*) AS DOUBLE), 6) + 0.0) AS kept_ratio,
               (ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) + 0.0) AS mean_score
        FROM scored GROUP BY label ORDER BY label""")),

    // ── m10: resolution/aspect profile — the asset-inventory report a ──
    // vision-pipeline runs before choosing train-time resize targets:
    // per (content_type, resolution class) counts, widescreen share, and
    // byte mass. Dimensions come from m01's stub decoder (length-derived
    // fake width/height — a real decoder swaps into the same columns);
    // the aspect test is integer cross-multiplied (w*3 >= h*4 ⇔ w/h ≥
    // 4:3) so no float boundary exists. Single scan + one small groupBy;
    // blobs contribute only their byte counts.
    GQuery("m10_resolution_profile",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"doc_id",
            element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
              ($"doc_id" % 3 + 1).cast(IntegerType)).as("content_type"),
            (length($"text") % 640 + 1).cast(LongType).as("w"),
            (length($"text") % 480 + 1).cast(LongType).as("h"),
            length($"text").cast(LongType).as("n_bytes"))
          .withColumn("res_class",
            when($"w" * $"h" >= 200000L, "hi")
              .when($"w" * $"h" >= 50000L, "mid")
              .otherwise("lo"))
          .groupBy($"content_type", $"res_class")
          .agg(count(lit(1)).as("n_assets"),
            sum(when($"w" * 3 >= $"h" * 4, 1L).otherwise(0L)).as("n_wide"),
            sum($"n_bytes").as("total_bytes"))
          .orderBy($"content_type", $"res_class")
      },
      Some("""
        WITH a AS (
          SELECT doc_id,
                 (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS content_type,
                 CAST(strlen(text) % 640 + 1 AS BIGINT) AS w,
                 CAST(strlen(text) % 480 + 1 AS BIGINT) AS h,
                 CAST(strlen(text) AS BIGINT) AS n_bytes
          FROM documents),
        c AS (SELECT content_type,
                     CASE WHEN w * h >= 200000 THEN 'hi'
                          WHEN w * h >= 50000 THEN 'mid'
                          ELSE 'lo' END AS res_class,
                     CASE WHEN w * 3 >= h * 4 THEN 1 ELSE 0 END AS wide, n_bytes
              FROM a)
        SELECT content_type, res_class, COUNT(*) AS n_assets,
               CAST(SUM(wide) AS BIGINT) AS n_wide,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
        FROM c GROUP BY content_type, res_class
        ORDER BY content_type, res_class""")),

    // ── m11: perceptual near-dup — SimHash over FRAME hashes (d03's ──
    // discipline lifted from text shingles to media frames): two assets
    // are near-dups when they share most 256-byte frames (re-muxed /
    // re-tagged copies of the same content — byte-identical fails m06's
    // exact hash, frame-level survives). Per asset: explode m02's frame
    // chunks, one hash per frame, 32-bit majority-vote simhash in a
    // single two-phase aggregate; candidates = pairs sharing one of 4
    // byte-chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), verified
    // by exact bit_count. SCALE KNOB: 8-bit chunks collide at 1/256, so
    // expected random-candidate volume is ~n²/128 — fine to ~10^4
    // assets, quadratic beyond. The growth path is WIDTH, not fewer
    // chunks: a 2×60-bit simhash cut into 4 chunks of 30 bits keeps the
    // same hamming ≤ 3 pigeonhole guarantee at 2^-30 collision
    // (~n²/2^28 — sub-linear to 10^8 assets); chunk count must stay
    // θ+1 = 4 or recall loses its guarantee (measured here: 15-bit
    // chunks at θ=9 catch 2/10 true pairs — don't trade guarantee for
    // width). Candidates stay bounded by chunk-bucket collisions, never
    // pairwise over assets; frame bytes collapse to one 64-bit hash
    // before any shuffle (blobs never move — the §2.G rule). A
    // production decoder swaps the substring chunker for real frame
    // extraction at the same seam as m02.
    GQuery("m11_phash_neardup",
      (s, d) => {
        import s.implicits._
        val frames = Tables.load(s, d, "documents")
          .filter(length($"text") > 0)
          .select($"doc_id",
            explode(expr("sequence(0L, least((length(text) + 255) DIV 256 - 1, 1999L))")).as("fidx"),
            $"text")
          .select($"doc_id",
            graft.functions.TextFunctions.hash64(
              expr("substring(text, fidx * 256 + 1, 256)")).as("h"))
        val votes = (0 until 32).map(b =>
          sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
        val phash = frames.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
          .select($"doc_id",
            (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
              .reduce(_ + _).as("phash"))
        val chunks = phash.select($"doc_id", $"phash",
          posexplode(array((0 until 4).map(c => shiftright($"phash", c * 8).bitwiseAND(255)): _*)))
          .toDF("doc_id", "phash", "chunk", "ckey")
        chunks.as("x").join(chunks.as("y"),
            $"x.chunk" === $"y.chunk" && $"x.ckey" === $"y.ckey" && $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("i"), $"y.doc_id".as("j"),
            expr("bit_count(x.phash ^ y.phash)").as("hamming"))
          .distinct()
          .filter($"hamming" <= 3)
          .orderBy($"i", $"j")
      },
      Some("""
        WITH frames AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(substr(text, CAST(f.f AS INT) * 256 + 1, 256)), 1, 15) AS BIGINT) AS h
          FROM documents, (SELECT unnest(range(0, 2000)) AS f) f
          WHERE length(text) > 0 AND f.f <= (length(text) + 255) // 256 - 1),
        votes AS (SELECT doc_id, b.b AS b,
                         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                  FROM frames, (SELECT unnest(range(32)) AS b) b
                  GROUP BY doc_id, b.b),
        ph AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS phash
               FROM votes GROUP BY doc_id),
        chunks AS (SELECT doc_id, phash, c.c AS chunk, (phash >> (c.c*8)) & 255 AS ckey
                   FROM ph, (SELECT unnest(range(4)) AS c) c),
        pairs AS (SELECT DISTINCT x.doc_id AS i, y.doc_id AS j, x.phash AS pi, y.phash AS pj
                  FROM chunks x JOIN chunks y
                    ON x.chunk = y.chunk AND x.ckey = y.ckey AND x.doc_id < y.doc_id)
        SELECT i, j, CAST(bit_count(xor(pi, pj)) AS INT) AS hamming
        FROM pairs WHERE bit_count(xor(pi, pj)) <= 3
        ORDER BY i, j""")),

    // ── m12: motion profile — per-asset mean/max frame-to-frame ──
    // signature distance (m08's lag signal rolled up to the asset level,
    // at a finer 64-byte frame rate): static slideware scores near 0,
    // high-motion content scores high — the signal that routes video
    // between keyframe-only and dense sampling, and flags stuck/frozen
    // captures. Plan: frames collapse to 64-bit hashes in the scan
    // (blobs never shuffle), ONE per-doc lag window over ≤9 frames per
    // asset, then a per-doc rollup — work ∝ frames, output ∝ assets.
    // Mean divides exact BIGINT sums once; the is_static flag compares
    // integer cross-products so no float boundary can flip it.
    GQuery("m12_motion_profile",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val frames = Tables.load(s, d, "documents")
          .filter(length($"text") >= 128)
          .select($"doc_id", $"text", posexplode(expr(
            "sequence(0L, least((length(text) + 63) DIV 64 - 1, 1999L))")))
          .select($"doc_id", $"pos".cast("int").as("frame_idx"),
            graft.functions.TextFunctions.hash64(
              expr("substring(text, pos * 64 + 1, 64)")).as("sig"))
        val w = Window.partitionBy($"doc_id").orderBy($"frame_idx".asc)
        frames
          .withColumn("prev_sig", lag($"sig", 1).over(w))
          .filter($"prev_sig".isNotNull)
          .select($"doc_id", expr("bit_count(sig ^ prev_sig)").cast(LongType).as("h"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_transitions"),
            sum($"h").as("sh"), max($"h").as("max_hamming"))
          .select($"doc_id", $"n_transitions",
            roundz($"sh".cast(DoubleType) / $"n_transitions", 6).as("mean_hamming"),
            $"max_hamming",
            // mean < 10 without dividing: sh < 10·n — integer algebra
            ($"sh" < $"n_transitions" * 10).as("is_static"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH frames AS (
          SELECT doc_id, CAST(f.f AS INT) AS frame_idx,
                 CAST(('0x' || substr(md5(substr(text, CAST(f.f AS INT) * 64 + 1, 64)), 1, 15)) AS BIGINT) AS sig
          FROM documents, (SELECT unnest(range(0, 2000)) AS f) f
          WHERE length(text) >= 128 AND f.f <= (length(text) + 63) // 64 - 1),
        lagged AS (
          SELECT doc_id, sig,
                 lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx ASC) AS prev_sig
          FROM frames),
        hams AS (SELECT doc_id, CAST(bit_count(xor(sig, prev_sig)) AS BIGINT) AS h
                 FROM lagged WHERE prev_sig IS NOT NULL),
        agg AS (SELECT doc_id, COUNT(*) AS n_transitions,
                       CAST(SUM(h) AS BIGINT) AS sh, CAST(MAX(h) AS BIGINT) AS max_hamming
                FROM hams GROUP BY doc_id)
        SELECT doc_id, n_transitions,
               (ROUND(CAST(sh AS DOUBLE) / n_transitions, 6) + 0.0) AS mean_hamming,
               max_hamming,
               (sh < n_transitions * 10) AS is_static
        FROM agg ORDER BY doc_id""")),

    // ── m13: CONTENT-DEFINED chunk dedup — the storage-dedup/rsync ──
    // answer to m02's fixed frames: a rolling 16-byte Karp–Rabin window
    // (codegen'd CdcBoundsExpr, one O(n) pass in-scan) cuts wherever
    // the hash lands on a zero residue mod 2^6, so boundaries follow
    // CONTENT — insert a byte and fixed frames all shift (zero dedup
    // hits) while CDC boundaries resynchronize within ~window+mask
    // bytes (law-pinned). Per-asset report: chunk count, chunks shared
    // with ≥1 other asset, shared-byte fraction. Scale: boundaries and
    // chunk md5s are computed IN the scan — the payload never shuffles,
    // only ~len/64 16-byte hashes per asset; the share detection is a
    // uniform hash groupBy (d01's shape). Oracle: the identical rolling
    // hash spelled naively in DuckDB (per-position Σ byte·31^j mod 2^31
    // — homomorphic to the rolling form, so boundaries match bitwise),
    // over the same ASCII payload bytes m01 pinned char≡byte for.
    GQuery("m13_cdc_dedup",
      (s, d) => {
        import s.implicits._
        import graft.functions.CdcBoundsExpr.cdcBounds
        val ch = Tables.load(s, d, "documents")
          .filter(length($"text") > 0)
          .select($"doc_id", $"text".cast(BinaryType).as("payload"))
          .select($"doc_id", $"payload",
            explode(cdcBounds($"payload", 6, 256)).as("c"))
          .select($"doc_id", $"c.len".as("ln"),
            md5($"payload".substr($"c.off" + 1, $"c.len")).as("h"))
        val shared = ch.groupBy($"h")
          .agg(countDistinct($"doc_id").as("nd"))
          .filter($"nd" >= 2)
          .select($"h", lit(1).as("is_sh"))
        ch.join(shared, Seq("h"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when($"is_sh".isNotNull, 1L).otherwise(0L)).as("n_shared"),
            roundz(sum(when($"is_sh".isNotNull, $"ln").otherwise(0L)) * lit(1.0)
              / sum($"ln"), 4).as("shared_frac"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH docs AS (SELECT doc_id, substr(text, 1, 256) AS s
                      FROM documents WHERE strlen(text) > 0),
        pos AS (SELECT doc_id, s, unnest(range(16, strlen(s) + 1)) AS i FROM docs),
        hv AS (SELECT doc_id, i,
                 list_sum(list_transform(range(0, 16), j ->
                   CAST(ord(substr(s, CAST(i - j AS INT), 1)) % 256 AS BIGINT) *
                     ([1,31,961,29791,923521,28629151,887503681,1742810335,340029185,1950970143,350532289,129082719,1854080641,1641925023,1507551809,1636949471])[CAST(j + 1 AS INT)]
                 )) % 2147483648 AS h
               FROM pos),
        bnd AS (SELECT doc_id, i FROM hv WHERE h % 64 = 0),
        bl AS (SELECT doc_id, list(i ORDER BY i) AS bs FROM bnd GROUP BY doc_id),
        ends AS (SELECT d.doc_id, d.s,
                   CASE WHEN bl.bs IS NULL THEN [CAST(strlen(d.s) AS BIGINT)]
                        WHEN bs[len(bs)] = strlen(d.s) THEN bs
                        ELSE list_append(bs, CAST(strlen(d.s) AS BIGINT)) END AS es
                 FROM docs d LEFT JOIN bl ON d.doc_id = bl.doc_id),
        chunks AS (SELECT doc_id, s,
                     unnest(list_transform(range(1, len(es) + 1), ci ->
                       struct_pack(
                         off := CASE WHEN ci = 1 THEN 0 ELSE es[CAST(ci AS INT) - 1] END,
                         ln := es[CAST(ci AS INT)] -
                               (CASE WHEN ci = 1 THEN 0 ELSE es[CAST(ci AS INT) - 1] END)
                       ))) AS c
                   FROM ends),
        ch AS (SELECT doc_id, c.ln AS ln,
                      md5(substr(s, CAST(c.off + 1 AS INT), CAST(c.ln AS INT))) AS h
               FROM chunks),
        shared AS (SELECT h, 1 AS is_sh FROM ch GROUP BY h
                   HAVING COUNT(DISTINCT doc_id) >= 2)
        SELECT ch.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN sh.is_sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               (ROUND(SUM(CASE WHEN sh.is_sh IS NOT NULL THEN ln ELSE 0 END) * 1.0 / SUM(ln), 4) + 0.0) AS shared_frac
        FROM ch LEFT JOIN shared sh ON ch.h = sh.h
        GROUP BY ch.doc_id ORDER BY ch.doc_id"""))
  )

  /** DuckDB mirror of hash64(prefix || doc_id) (see TextFunctions.hash64). */
  private def hashSql(prefix: String): String =
    s"CAST('0x' || substr(md5('$prefix' || doc_id), 1, 15) AS BIGINT)"
}
