package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection (SURVEY §2.D, streaming form).
  *
  * The batch pipeline (operators.Dedup d02) recomputes band buckets per
  * run; on an unbounded corpus the scalable form keeps per-bucket state:
  * each arriving document's minhash signature is compared against the
  * signatures already seen in its band buckets, emitting pairs
  * incrementally. State is sharded by band key — the same bound as batch
  * LSH candidate buckets — so per-key state stays small at any corpus
  * size (and would be expired by timeout/TTL in production).
  *
  * Signatures are computed per-row (array expressions over the codegen'd
  * shingles) rather than via explode+groupBy, because chaining a streaming
  * aggregation into flatMapGroupsWithState is not allowed in append mode —
  * a per-row expression keeps the whole pipeline single-stateful.
  */
object StreamingDedup {

  val NumPerms: Int = MinHashParams.NumPerms
  val NumBands: Int = MinHashParams.NumBands
  val RowsPerBand: Int = MinHashParams.RowsPerBand

  case class BandedDoc(doc_id: Long, band: Int, bkey: String, sig: Seq[Long])
  case class DupPair(i: Long, j: Long, est_jaccard: Double)
  // State class must be PUBLIC: `private case class` emits package-private
  // JVM access flags, and the state encoder's Janino-generated code (in a
  // synthetic package) then can't resolve its accessors. Kept flat
  // (parallel Seqs, sigs strided by NumPerms) for a compact state row.
  case class BucketState(ids: Seq[Long], flatSigs: Seq[Long])

  /** doc_id+text frame → one row per (doc, band) with the full signature.
    *
    * The hashed-shingle array is projected ONCE before the 16 permutation
    * mins reference it — lambda subtrees are excluded from Spark's
    * common-subexpression elimination, so inlining `hs` into each term
    * would re-run tokenize+shingle+md5 16× per row. Docs with fewer than
    * 3 tokens have no shingles and are dropped (array_min of an empty
    * array is null, which would kill the query at Dataset deserialization;
    * the batch pipeline drops them implicitly via explode).
    */
  def bandedSignatures(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    val sig = array((0 until NumPerms).map(p =>
      array_min(transform(col("hs"), h => permHash(h, p)))): _*)
    val bands = array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until RowsPerBand).map(r => element_at(col("sig"), b * RowsPerBand + r + 1)): _*).as("bkey"))
    }: _*)
    docs.select(col("doc_id"),
        transform(shingles(tokens(col("text")), 3), x => hash64(x)).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), col("sig"), explode(bands).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"), col("sig"))
      .as[BandedDoc]
  }

  /** Stateful pair emission: compare each arriving doc against its
    * bucket's remembered signatures. Pairs estimated ≥ minEst are emitted
    * once per bucket (downstream dedups across bands).
    */
  def incrementalPairs(banded: Dataset[BandedDoc], minEst: Double = 0.5): Dataset[DupPair] = {
    import banded.sparkSession.implicits._

    def fn(key: (Int, String), rows: Iterator[BandedDoc],
           state: GroupState[BucketState]): Iterator[DupPair] = {
      val st = state.getOption.getOrElse(BucketState(Seq.empty, Seq.empty))
      var ids = st.ids.toVector
      var sigs = st.flatSigs.toVector
      val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        var k = 0
        while (k < ids.length) {
          if (ids(k) != d.doc_id) {
            var matches = 0
            var p = 0
            while (p < NumPerms) {
              if (sigs(k * NumPerms + p) == d.sig(p)) matches += 1
              p += 1
            }
            val est = matches.toDouble / NumPerms
            if (est >= minEst)
              out += DupPair(math.min(ids(k), d.doc_id), math.max(ids(k), d.doc_id), est)
          }
          k += 1
        }
        ids = ids :+ d.doc_id
        sigs = sigs ++ d.sig
      }
      state.update(BucketState(ids, sigs))
      out.iterator
    }

    banded
      .groupByKey(d => (d.band, d.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
