package graft.operators

import graft.{GQuery, Tables}
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
               CAST(length(text) AS INT) AS n_bytes,
               md5(text) AS checksum,
               (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS content_type,
               CAST(length(text) % 640 + 1 AS INT) AS fake_width,
               CAST(length(text) % 480 + 1 AS INT) AS fake_height
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
          .filter($"doc_id" < 100)
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
  )
}
