package graft.registry

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed extraction runtime (the reference's `MardaExtractor.execute`,
  * `/root/reference/marda_extractors_api/__init__.py:219-399`, re-expressed
  * as a partition-local transformation).
  *
  * The reference shells out per file (venv + subprocess + shared-memory
  * pickle). On a cluster that becomes: per-partition decoder dispatch —
  * executors each process their partition's files, so throughput scales
  * with executor count and no driver round-trips occur. Decoders are plain
  * Scala functions keyed by filetype; the stub decoders here are
  * deterministic (the container ships no scientific codecs) but run through
  * the real mapPartitions path a production decoder would.
  */
object Extraction {

  case class FileTask(doc_id: Long, filetype_id: String, input_path: String, payload: String)
  case class ExtractedMeta(doc_id: Long, filetype_id: String, status: String,
                           n_tokens: Int, n_bytes: Int, checksum: String)

  type Decoder = FileTask => ExtractedMeta

  /** Stub decoder registry: one per supported filetype. A real deployment
    * registers actual format parsers; unknown filetypes degrade to a
    * 'no_decoder' row instead of failing the partition.
    */
  val decoders: Map[String, Decoder] = {
    def basic(status: String): Decoder = t => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ExtractedMeta(t.doc_id, t.filetype_id, status,
        t.payload.split(" ").length, t.payload.length, hex)
    }
    Map(
      "biologic-mpr" -> basic("ok"),
      "example-xy" -> basic("ok"),
      "nexus-hdf5" -> basic("ok"))
  }

  /** Partition-local batch extraction: no shuffle, no driver involvement. */
  def extractAll(tasks: Dataset[FileTask]): Dataset[ExtractedMeta] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.map { t =>
        decoders.get(t.filetype_id) match {
          case Some(dec) => dec(t)
          case None => ExtractedMeta(t.doc_id, t.filetype_id, "no_decoder", 0, 0, "")
        }
      }
    }
  }
}
