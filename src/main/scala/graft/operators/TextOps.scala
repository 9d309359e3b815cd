package graft.operators

import graft.{GQuery, Tables}
import graft.GQuery._
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for LLM-training-data pipelines (SURVEY.md §2.C):
  * token counting, language ID, quality scoring, fingerprinting, shingling,
  * corpus statistics. All single-scan, codegen'd, embarrassingly parallel —
  * at 100 TB these are the cheap map-side passes before dedup's shuffles.
  */
object TextOps {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  // Stopword-ish high-frequency function words of the corpus.
  private val stopwords = Seq("the", "a")

  val all: Seq[GQuery] = Seq(

    // ── t01: token counting — whitespace tokens and a regex ("BPE-ish" ──
    // word/punct split) tokenizer; both pure column expressions.
    GQuery("t01_token_count",
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"doc_id",
            size(tokens($"text")).as("n_ws_tokens"),
            size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_re_tokens"),
            length($"text").as("text_len"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_re_tokens,
               CAST(length(text) AS INT) AS text_len
        FROM documents ORDER BY doc_id""")),

    // ── t02: language ID — deterministic marker-word scoring (the classic ──
    // n-gram-profile heuristic, reduced to a codegen'd expression), compared
    // against the labeled lang to give a confusion summary.
    GQuery("t02_langid",
      (s, d) => {
        import s.implicits._
        val toks = tokens($"text")
        val nStop = countIn(toks, stopwords)
        val nTok = size(toks)
        val ratio = nStop.cast(DoubleType) / nTok.cast(DoubleType)
        val pred = when(ratio >= 0.08, lit("en"))
          .when(ratio >= 0.04, lit("mixed"))
          .otherwise(lit("other"))
        docs(s, d)
          .select($"lang", pred.as("pred_lang"))
          .groupBy($"lang", $"pred_lang")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"pred_lang")
      },
      Some("""
        SELECT lang, pred_lang, COUNT(*) AS n FROM (
          SELECT lang,
                 CASE WHEN ratio >= 0.08 THEN 'en'
                      WHEN ratio >= 0.04 THEN 'mixed'
                      ELSE 'other' END AS pred_lang
          FROM (SELECT lang,
                       CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE)
                         / len(string_split(text,' ')) AS ratio
                FROM documents))
        GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")),

    // ── t03: quality scoring — length, stopword-ratio, lexical-diversity ──
    // components combined in a fixed-order double expression (bit-identical
    // across engines).
    // Every reported ratio is a RATIONAL p/q of small integers, so the
    // 6-dp rounding is done in pure integer arithmetic — round-half-up
    // of p/q at 6 dp = (2·p·10⁶ + q) DIV (2·q), then one correctly-
    // rounded divide by 10⁶ — instead of ROUND(double, 6), whose
    // half-way behavior is an engine seam (the sf1 sweep caught one doc
    // whose composite quality sat exactly on a .5·10⁻⁶ boundary: Spark
    // rounds the exact binary via BigDecimal, DuckDB multiplies by 10⁶
    // in floating point first). quality's common denominator is 5000·n:
    // 0.4·min(nc,500)/500 + 0.3·(n−s)/n + 0.3·d/n =
    // (4·min(nc,500)·n + 1500·(n−s) + 1500·d) / (5000·n).
    GQuery("t03_quality_score",
      (s, d) => {
        import s.implicits._
        val toks = tokens($"text")
        docs(s, d)
          .select($"doc_id",
            least($"n_chars", lit(500L)).cast(LongType).as("ncm"),
            size(toks).cast(LongType).as("n"),
            countIn(toks, stopwords).cast(LongType).as("st"),
            size(array_distinct(toks)).cast(LongType).as("dv"))
          .select($"doc_id",
            (expr("CAST((ncm * 2000000 + 500) DIV 1000 AS DOUBLE)") / 1e6).as("len_score"),
            (expr("CAST((st * 2000000 + n) DIV (n * 2) AS DOUBLE)") / 1e6).as("stop_ratio"),
            (expr("CAST((dv * 2000000 + n) DIV (n * 2) AS DOUBLE)") / 1e6).as("diversity"),
            (expr("CAST(((4 * ncm * n + 1500 * (n - st) + 1500 * dv) * 2000000 + 5000 * n) " +
              "DIV (10000 * n) AS DOUBLE)") / 1e6).as("quality"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST((ncm * 2000000 + 500) // 1000 AS DOUBLE) / 1e6 AS len_score,
               CAST((st * 2000000 + n) // (n * 2) AS DOUBLE) / 1e6 AS stop_ratio,
               CAST((dv * 2000000 + n) // (n * 2) AS DOUBLE) / 1e6 AS diversity,
               CAST(((4 * ncm * n + 1500 * (n - st) + 1500 * dv) * 2000000 + 5000 * n)
                 // (10000 * n) AS DOUBLE) / 1e6 AS quality
        FROM (
          SELECT doc_id,
                 CAST(least(n_chars, 500) AS BIGINT) AS ncm,
                 CAST(len(string_split(text,' ')) AS BIGINT) AS n,
                 CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS BIGINT) AS st,
                 CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS dv
          FROM documents)
        ORDER BY doc_id""")),

    // ── t04: document fingerprinting — full-content md5, canonicalized ──
    // (sorted distinct token set) md5, and the portable 64-bit hash used by
    // the dedup/minhash pipeline.
    GQuery("t04_fingerprint",
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"doc_id",
            md5($"text").as("content_md5"),
            setFingerprint(tokens($"text")).as("set_md5"),
            hash64($"text").as("content_h64"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               md5(text) AS content_md5,
               md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS set_md5,
               CAST(('0x' || substr(md5(text),1,15)) AS BIGINT) AS content_h64
        FROM documents ORDER BY doc_id""")),

    // ── t05: 3-token shingles (the minhash input): totals and distinct ──
    // counts per document via higher-order array functions.
    GQuery("t05_shingles",
      (s, d) => {
        import s.implicits._
        val sh = shingles(tokens($"text"), 3)
        docs(s, d)
          .select($"doc_id",
            size(sh).as("n_shingles"),
            size(array_distinct(sh)).as("n_distinct_shingles"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(sh) AS INT) AS n_shingles,
               CAST(len(list_distinct(sh)) AS INT) AS n_distinct_shingles
        FROM (
          SELECT doc_id,
                 list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))
        ORDER BY doc_id""")),

    // ── t06: corpus word frequencies, top-k — partial agg then ──
    // TakeOrdered; the shuffle carries one row per distinct word, not per
    // token occurrence.
    GQuery("t06_word_topk",
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select(explode(tokens($"text")).as("word"))
          .groupBy($"word")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"word".asc)
          .limit(10)
      },
      Some("""
        SELECT word, COUNT(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word ASC LIMIT 10""")),

    // ── t07: TF-IDF — term counts × inverse document frequency, top-3 ──
    // terms per document. Two partial-agg'd passes (term counts, doc
    // freqs) + a broadcast of the tiny df table; ordering on the ROUNDED
    // score so libm ln() ulp noise can't reorder ties across engines.
    GQuery("t07_tfidf",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docsDf = docs(s, d)
        val nDocs = docsDf.agg(count(lit(1)).as("n_docs"))
        val terms = docsDf.filter($"doc_id" < 50)
          .select($"doc_id", explode(tokens($"text")).as("word"))
          .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
        val df = docsDf
          .select($"doc_id", explode(array_distinct(tokens($"text"))).as("word"))
          .groupBy($"word").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"word".asc)
        terms.join(broadcast(df), "word").join(broadcast(nDocs))
          .withColumn("tfidf", roundz($"tf" * log($"n_docs".cast(DoubleType) / $"df"), 6))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"doc_id", $"rn", $"word", $"tf", $"tfidf")
          .orderBy($"doc_id", $"rn")
      },
      Some("""
        WITH terms AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents WHERE doc_id < 50),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM terms GROUP BY doc_id, word),
        dfreq AS (
          SELECT word, COUNT(*) AS df FROM (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents)
          GROUP BY word),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, word, tf,
                 (ROUND(tf * ln(CAST(n.n_docs AS DOUBLE) / df), 6) + 0.0) AS tfidf
          FROM tf JOIN dfreq USING (word), n),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rn
          FROM scored)
        SELECT doc_id, rn, word, tf, tfidf FROM ranked WHERE rn <= 3
        ORDER BY doc_id, rn""")),

    // ── t08: feature extraction — fixed-vocabulary bag-of-words rates ──
    // per document (the text analogue of the multimodal feature-extract
    // stub: fixed-width numeric features from raw content, single scan).
    GQuery("t08_feature_vector",
      (s, d) => {
        import s.implicits._
        val toks = tokens($"text")
        val vocab = Seq("join", "hash", "scan", "filter", "sort", "merge", "the", "dup")
        val feats = vocab.zipWithIndex.map { case (w, i) =>
          roundz(size(filter(toks, t => t === w)).cast(DoubleType) / size(toks), 6).as(s"f_$w")
        }
        docs(s, d).select(($"doc_id" +: feats): _*).orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               ${Seq("join", "hash", "scan", "filter", "sort", "merge", "the", "dup").map(w =>
          s"(ROUND(CAST(len(list_filter(string_split(text,' '), t -> t = '$w')) AS DOUBLE) / len(string_split(text,' ')), 6) + 0.0) AS f_$w").mkString(",\n               ")}
        FROM documents ORDER BY doc_id""")),

    // ── t09: order-sensitive document fingerprint — positional token ──
    // hashes summed under a modulus (t04's set-fingerprint is order-
    // insensitive; this one distinguishes permutations). The modular sum
    // accumulates in DECIMAL(38,0) on the Spark side and HUGEINT in
    // DuckDB — both exact — because a long sum of 2^60-scale terms would
    // wrap silently.
    GQuery("t09_positional_fingerprint",
      (s, d) => {
        import s.implicits._
        val term = hash64(concat_ws(":", $"word", $"pos")) % 1073741789L
        docs(s, d)
          .select($"doc_id", posexplode(tokens($"text")))
          .toDF("doc_id", "pos", "word")
          .select($"doc_id", term.cast(DecimalType(38, 0)).as("term"))
          .groupBy($"doc_id")
          .agg((sum($"term") % 1073741789L).cast(LongType).as("fingerprint"),
            count(lit(1)).as("n_tokens"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(ts) AS word, unnest(range(0, len(ts))) AS pos
          FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
        terms AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(word || ':' || pos), 1, 15)) AS BIGINT) % 1073741789 AS term
          FROM toks)
        SELECT doc_id, CAST(SUM(term) % 1073741789 AS BIGINT) AS fingerprint,
               COUNT(*) AS n_tokens
        FROM terms GROUP BY doc_id ORDER BY doc_id""")),

    // ── t10: repetition signals (the Gopher-style repetition filters): ──
    // top-bigram fraction (share of 2-gram occurrences taken by the most
    // frequent 2-gram) and duplicate-token fraction. Shuffle carries one
    // row per distinct (doc, bigram) after map-side partial agg; both
    // per-doc aggregates then co-partition on doc_id — linear at any
    // corpus size.
    GQuery("t10_repetition",
      (s, d) => {
        import s.implicits._
        val bg = docs(s, d).select($"doc_id", explode(shingles(tokens($"text"), 2)).as("bg"))
        val rep = bg.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("n"))
          .groupBy($"doc_id")
          .agg(max($"n").as("top_n"), sum($"n").cast(LongType).as("n_bigrams"))
        val tok = docs(s, d).select($"doc_id",
          size(tokens($"text")).as("n_tokens"),
          size(array_distinct(tokens($"text"))).as("n_distinct"))
        rep.join(tok, "doc_id")
          .select($"doc_id",
            roundz($"top_n".cast(DoubleType) / $"n_bigrams", 6).as("top_bigram_frac"),
            roundz(lit(1.0) - $"n_distinct".cast(DoubleType) / $"n_tokens", 6).as("dup_token_frac"),
            ($"top_n".cast(DoubleType) / $"n_bigrams" > 0.04).as("repetitive"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bg
               FROM ts),
        counts AS (SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY doc_id, bg),
        rep AS (SELECT doc_id, MAX(n) AS top_n, CAST(SUM(n) AS BIGINT) AS n_bigrams
                FROM counts GROUP BY doc_id),
        tok AS (SELECT doc_id, len(ts) AS n_tokens, len(list_distinct(ts)) AS n_distinct FROM ts)
        SELECT doc_id,
               (ROUND(CAST(top_n AS DOUBLE) / n_bigrams, 6) + 0.0) AS top_bigram_frac,
               (ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) + 0.0) AS dup_token_frac,
               (CAST(top_n AS DOUBLE) / n_bigrams > 0.04) AS repetitive
        FROM rep JOIN tok USING (doc_id) ORDER BY doc_id""")),

    // ── t11: bigram language-model scoring (the perplexity-filter shape): ──
    // corpus bigram model P(w2|w1) = c(w1 w2)/c(w1·), per-doc mean log-
    // likelihood. Model counts are two partial-agg passes (one row per
    // distinct bigram in the shuffle); the scoring join broadcasts the
    // model — at 100 TB a production model keeps the top-K bigrams with a
    // backoff constant, which is exactly what makes it broadcast-able.
    // Per-bigram logp rounds to 6dp then sums in DECIMAL(18,6) (exact,
    // order-free) before the single double division — bit-identical across
    // engines (SURVEY §6).
    GQuery("t11_bigram_lm",
      (s, d) => {
        import s.implicits._
        val bg = docs(s, d).select($"doc_id", explode(shingles(tokens($"text"), 2)).as("bg"))
        val cbg = bg.groupBy($"bg").agg(count(lit(1)).as("c_bg"))
          .withColumn("w1", split($"bg", " ").getItem(0))
        val model = cbg.join(
          cbg.groupBy($"w1").agg(sum($"c_bg").as("c_w1")), "w1")
          .select($"bg", $"c_bg", $"c_w1")
        bg.join(broadcast(model), "bg")
          .select($"doc_id",
            roundz(log($"c_bg".cast(DoubleType) / $"c_w1"), 6).cast(DecimalType(18, 6)).as("logp"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            roundz((sum($"logp").cast(DoubleType) / count(lit(1))), 6).as("avg_logp"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bg
               FROM ts),
        cbg AS (SELECT bg, string_split(bg, ' ')[1] AS w1, COUNT(*) AS c_bg FROM bg GROUP BY bg),
        cw1 AS (SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM cbg GROUP BY w1),
        model AS (SELECT bg, c_bg, c_w1 FROM cbg JOIN cw1 USING (w1)),
        scored AS (
          SELECT doc_id, CAST((ROUND(ln(CAST(c_bg AS DOUBLE) / c_w1), 6) + 0.0) AS DECIMAL(18,6)) AS logp
          FROM bg JOIN model USING (bg))
        SELECT doc_id, COUNT(*) AS n_bigrams,
               (ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6) + 0.0) AS avg_logp
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ── t12: PII detection + redaction — the scrub stage every training ──
    // corpus passes through before tokenization: count and mask email
    // addresses and phone numbers with anchored regexes. The synthetic
    // corpus carries no PII, so the op plants a deterministic PII header
    // (derived from doc_id, identically on both sides) in front of each
    // text — the regex machinery, counts, and replacement order are what
    // is being verified. One codegen'd scan: regexp_extract_all for
    // counts, nested regexp_replace for the redacted text; no shuffle
    // except the presentation sort. Patterns stay in the RE2-compatible
    // subset so Spark (java.util.regex) and the oracle (RE2) agree.
    GQuery("t12_pii_redaction",
      (s, d) => {
        import s.implicits._
        // Case-insensitive with + in the local part, so the scrub catches
        // John.Doe+tag@Example.com shapes — not just the planted lowercase
        // header. (?i) is RE2-compatible, so both engines honor it.
        val emailPat = "(?i)[a-z0-9._+]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phonePat = "\\+1-555-[0-9]{4}"
        val synth = concat(
          lit("contact user"), $"doc_id".cast(StringType),
          lit("@mail"), ($"doc_id" % 10).cast(StringType),
          lit(".com or call +1-555-"),
          lpad(($"doc_id" % 10000).cast(StringType), 4, "0"),
          lit(" "), $"text")
        docs(s, d)
          .select($"doc_id", synth.as("raw"))
          .select($"doc_id",
            size(regexp_extract_all($"raw", lit(emailPat), lit(0))).cast(LongType).as("n_emails"),
            size(regexp_extract_all($"raw", lit(phonePat), lit(0))).cast(LongType).as("n_phones"),
            regexp_replace(regexp_replace($"raw", emailPat, "<EMAIL>"),
              phonePat, "<PHONE>").as("clean"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH raw AS (
          SELECT doc_id,
                 'contact user' || doc_id || '@mail' || (doc_id % 10) ||
                 '.com or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                 ' ' || text AS raw
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(raw, '(?i)[a-z0-9._+]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(raw, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(raw, '(?i)[a-z0-9._+]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                              '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS clean
        FROM raw ORDER BY doc_id""")),

    // ── t13: token-distribution entropy — the gibberish/boilerplate ──
    // signal quality filters threshold on (low entropy = repeated
    // tokens, high = random noise). Per doc: Shannon entropy over the
    // token frequency distribution. Two partial-agg'd passes — (doc,
    // token) counts, then the per-doc reduction; the second groupBy
    // reuses the first shuffle's doc_id partitioning. Per-term
    // -(c/n)·ln(c/n) rounds to 6dp then sums in DECIMAL(18,6) (exact,
    // order-free) — bit-identical across engines (SURVEY §6, t11's
    // pattern).
    GQuery("t13_token_entropy",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val cnt = docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("w"))
          .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
        val withN = cnt.withColumn("n", sum($"c").over(Window.partitionBy($"doc_id")))
        withN
          .select($"doc_id", $"n",
            roundz(($"c".cast(DoubleType) / $"n") * log($"c".cast(DoubleType) / $"n"), 6)
              .cast(DecimalType(18, 6)).as("term"))
          .groupBy($"doc_id")
          .agg(max($"n").as("n_tokens"), count(lit(1)).as("n_types"),
            roundz(-sum($"term").cast(DoubleType), 6).as("entropy"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH cnt AS (
          SELECT doc_id, w, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY doc_id, w),
        withn AS (SELECT doc_id, c, CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM cnt),
        terms AS (
          SELECT doc_id, n,
                 CAST((ROUND((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 6) + 0.0) AS DECIMAL(18,6)) AS term
          FROM withn)
        SELECT doc_id, MAX(n) AS n_tokens, COUNT(*) AS n_types,
               (ROUND(-CAST(SUM(term) AS DOUBLE), 6) + 0.0) AS entropy
        FROM terms GROUP BY doc_id ORDER BY doc_id""")),

    // ── t14: Gopher-style quality rules — the published rule set every ──
    // web corpus gets filtered through (Rae et al. 2021 §A1.1): word
    // count bounds, mean word length in [3,10], duplicate-line-free
    // uniqueness floor, plus the per-metric columns so downstream can
    // re-threshold without a rescan. One codegen'd scan: all metrics are
    // list expressions over the same split; no shuffle but the
    // presentation sort. mean_word_len is a single double division
    // rounded at 6dp on both engines (t03's convention).
    GQuery("t14_gopher_rules",
      (s, d) => {
        import s.implicits._
        val toks = tokens($"text")
        val nWords = size(toks).cast(LongType)
        // Single-space-separated text: Σ word length = chars − separators.
        // Pure arithmetic instead of an interpreted aggregate() lambda.
        val sumLen = length($"text").cast(LongType) - (nWords - 1L)
        val meanLen = roundz(sumLen.cast(DoubleType) / nWords, 6)
        val fracShort = roundz(
          size(filter(toks, t => length(t) <= 2)).cast(DoubleType) / nWords, 6)
        val fracUnique = roundz(
          size(array_distinct(toks)).cast(DoubleType) / nWords, 6)
        docs(s, d)
          .select($"doc_id", nWords.as("n_words"), meanLen.as("mean_word_len"),
            fracShort.as("frac_short_words"), fracUnique.as("frac_unique"))
          .withColumn("pass",
            ($"n_words" >= 20) && ($"n_words" <= 100000) &&
              ($"mean_word_len" >= 3.0) && ($"mean_word_len" <= 10.0) &&
              ($"frac_unique" >= 0.1))
          .orderBy($"doc_id")
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                 (ROUND(CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                       / len(string_split(text, ' ')), 6) + 0.0) AS mean_word_len,
                 (ROUND(CAST(len(list_filter(string_split(text, ' '), t -> len(t) <= 2)) AS DOUBLE)
                       / len(string_split(text, ' ')), 6) + 0.0) AS frac_short_words,
                 (ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')), 6) + 0.0) AS frac_unique
          FROM documents)
        SELECT doc_id, n_words, mean_word_len, frac_short_words, frac_unique,
               (n_words >= 20 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND frac_unique >= 0.1) AS pass
        FROM m ORDER BY doc_id""")),

    // ── t15: URL/domain extraction + blocklist grouping — the C4-style ──
    // provenance stage: pull each document's source URL, roll up per
    // domain, and flag blocklisted domains. The corpus carries no URLs,
    // so (t12's pattern) a deterministic URL header derived from doc_id
    // is planted identically on both engines — the regex extraction,
    // domain rollup, and blocklist semantics are what is verified. The
    // blocklist is a tiny IN-set (at scale: a broadcast join against a
    // blocklist table); the rollup groups on low-cardinality domain.
    GQuery("t15_domain_extract",
      (s, d) => {
        import s.implicits._
        val blocked = Seq("host0.example0.org", "host3.example1.org")
        val raw = concat(lit("see https://host"), ($"doc_id" % 7).cast(StringType),
          lit(".example"), ($"doc_id" % 3).cast(StringType),
          lit(".org/p/"), $"doc_id".cast(StringType), lit(" "), $"text")
        docs(s, d)
          .select($"doc_id", regexp_extract(raw, "https://([a-z0-9.-]+)/", 1).as("domain"))
          .groupBy($"domain")
          .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
          .withColumn("blocked", $"domain".isInCollection(blocked))
          .orderBy($"domain")
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
                 regexp_extract('see https://host' || (doc_id % 7) || '.example' ||
                                (doc_id % 3) || '.org/p/' || doc_id || ' ' || text,
                                'https://([a-z0-9.-]+)/', 1) AS domain
          FROM documents)
        SELECT domain, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc,
               domain IN ('host0.example0.org', 'host3.example1.org') AS blocked
        FROM u GROUP BY domain ORDER BY domain""")),

    // ── t16: linear quality classifier — the fastText-style scorer every ──
    // corpus passes through (CCNet/LLaMA's "looks like a reference page"
    // filter). The model is a tiny (word → weight) table + bias; score =
    // bias + Σ w(token)/n_tokens over occurrences. MODEL BROADCASTS, the
    // corpus never shuffles for scoring: tokens explode map-side, the
    // weight join is a broadcast hash join, and the per-doc reduction is
    // partial-agg'd on doc_id. Weight sums stay DECIMAL-exact (Σ of 2-dp
    // weights); the only float op is one division + one add, then the
    // ROUNDED score drives the keep decision on both engines — a raw
    // double compare at the threshold could flip across engines.
    GQuery("t16_classifier_score",
      (s, d) => {
        import s.implicits._
        val vocab = Seq(
          "spark" -> "1.20", "query" -> "0.80", "data" -> "0.60",
          "fast" -> "0.90", "vector" -> "0.80", "filter" -> "0.70",
          "join" -> "0.50", "window" -> "0.30", "big" -> "0.40",
          "small" -> "-0.30", "slow" -> "-1.10", "dup" -> "-1.50")
        val wdf = vocab.toDF("w_word", "w_raw")
          .select($"w_word", $"w_raw".cast(DecimalType(4, 2)).as("wt"))
        val base = docs(s, d)
          .select($"doc_id", size(tokens($"text")).cast(LongType).as("n_tokens"))
        val dots = docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("tok"))
          .join(broadcast(wdf), $"tok" === $"w_word")
          .groupBy($"doc_id")
          .agg(sum($"wt".cast(DecimalType(14, 2))).as("dot"))
        base.join(dots, Seq("doc_id"), "left")
          .withColumn("score",
            roundz(lit(-0.20) + coalesce($"dot".cast(DoubleType), lit(0.0)) / $"n_tokens", 6))
          .select($"doc_id", $"score", ($"score" > 0.0).as("keep"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH w(w_word, wt) AS (VALUES
          ('spark', CAST(1.20 AS DECIMAL(4,2))), ('query', CAST(0.80 AS DECIMAL(4,2))),
          ('data', CAST(0.60 AS DECIMAL(4,2))), ('fast', CAST(0.90 AS DECIMAL(4,2))),
          ('vector', CAST(0.80 AS DECIMAL(4,2))), ('filter', CAST(0.70 AS DECIMAL(4,2))),
          ('join', CAST(0.50 AS DECIMAL(4,2))), ('window', CAST(0.30 AS DECIMAL(4,2))),
          ('big', CAST(0.40 AS DECIMAL(4,2))), ('small', CAST(-0.30 AS DECIMAL(4,2))),
          ('slow', CAST(-1.10 AS DECIMAL(4,2))), ('dup', CAST(-1.50 AS DECIMAL(4,2)))),
        base AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
        toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        dots AS (SELECT doc_id, SUM(CAST(wt AS DECIMAL(14,2))) AS dot
                 FROM toks JOIN w ON tok = w_word GROUP BY doc_id),
        scored AS (
          SELECT base.doc_id,
                 (ROUND(CAST(-0.20 AS DOUBLE)
                   + COALESCE(CAST(dot AS DOUBLE), 0.0) / n_tokens, 6) + 0.0) AS score
          FROM base LEFT JOIN dots ON base.doc_id = dots.doc_id)
        SELECT doc_id, score, score > 0.0 AS keep
        FROM scored ORDER BY doc_id""")),

    // ── t17: out-of-vocabulary rate — fraction of each document's ──
    // tokens outside the corpus top-20 vocabulary: the tokenizer-prep
    // measurement (vocab coverage vs corpus) and a gibberish signal.
    // Two passes: corpus vocabulary via a 2-stage partial-agg'd word
    // count + TakeOrdered top-k with a total (freq DESC, word ASC)
    // tie-break so both engines pick the identical vocab; then the tiny
    // vocab LEFT-broadcast-joins back onto the exploded token stream —
    // the corpus shuffles once (doc_id partial agg), never for the vocab.
    GQuery("t17_oov_rate",
      (s, d) => {
        import s.implicits._
        val tok = docs(s, d).select($"doc_id", explode(tokens($"text")).as("w"))
        val vocab = tok.groupBy($"w").agg(count(lit(1)).as("f"))
          .orderBy($"f".desc, $"w".asc).limit(20)
          .select($"w".as("vw"))
        tok.join(broadcast(vocab), $"w" === $"vw", "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when($"vw".isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_rate", roundz($"n_oov".cast(DoubleType) / $"n_tokens", 6))
          .orderBy($"doc_id")
      },
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        vocab AS (SELECT w AS vw FROM (
                    SELECT w, COUNT(*) AS f FROM tok GROUP BY w
                    ORDER BY f DESC, w ASC LIMIT 20)),
        flags AS (SELECT doc_id, CASE WHEN vw IS NULL THEN 1 ELSE 0 END AS oov
                  FROM tok LEFT JOIN vocab ON w = vw)
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(oov) AS BIGINT) AS n_oov,
               (ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) + 0.0) AS oov_rate
        FROM flags GROUP BY doc_id ORDER BY doc_id""")),

    // ── t18: source distribution drift — per source, the φ² effect size ──
    // (χ²/N) of its top-20-vocab word distribution against the corpus-
    // wide distribution: the "did this feed shift under me" monitor
    // between corpus snapshots. Deliberately LOG-FREE (χ², not KL/JSD):
    // every term is rational arithmetic on integer counts, so there is
    // no libm in the pipeline — the only cross-engine surface is one
    // 20-term double sum, rounded. Two partial-agg'd count passes (per-
    // source and corpus-wide share one exploded scan), vocab broadcast.
    GQuery("t18_chisq_drift",
      (s, d) => {
        import s.implicits._
        val tok = docs(s, d).select($"source", explode(tokens($"text")).as("w"))
        val counts = tok.groupBy($"source", $"w").agg(count(lit(1)).as("n"))
        val global = counts.groupBy($"w").agg(sum($"n").as("gn"))
        val vocab = global.orderBy($"gn".desc, $"w".asc).limit(20)
        val vc = counts.join(broadcast(vocab.select($"w")), "w")
        val totals = vc.groupBy($"source").agg(sum($"n").as("tot"))
        val gtot = vocab.agg(sum($"gn").as("gtot"))
        vc.join(broadcast(vocab), "w")
          .join(broadcast(totals), "source")
          .join(broadcast(gtot))
          .select($"source",
            ($"n".cast(DoubleType) / $"tot" - $"gn".cast(DoubleType) / $"gtot").as("diff"),
            ($"gn".cast(DoubleType) / $"gtot").as("e"))
          .groupBy($"source")
          .agg(roundz(sum($"diff" * $"diff" / $"e"), 6).as("phi2"))
          .join(totals, "source")
          .select($"source", $"tot".as("n_vocab_tokens"), $"phi2")
          .orderBy($"source")
      },
      Some("""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        counts AS (SELECT source, w, COUNT(*) AS n FROM tok GROUP BY source, w),
        global AS (SELECT w, CAST(SUM(n) AS BIGINT) AS gn FROM counts GROUP BY w),
        vocab AS (SELECT w, gn FROM global ORDER BY gn DESC, w ASC LIMIT 20),
        vc AS (SELECT source, counts.w AS w, n FROM counts JOIN vocab ON counts.w = vocab.w),
        totals AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM vc GROUP BY source),
        gtot AS (SELECT CAST(SUM(gn) AS BIGINT) AS gtot FROM vocab),
        terms AS (
          SELECT source,
                 (CAST(n AS DOUBLE) / tot - CAST(gn AS DOUBLE) / gtot) AS diff,
                 (CAST(gn AS DOUBLE) / gtot) AS e
          FROM vc JOIN vocab ON vc.w = vocab.w
          JOIN totals USING (source), gtot)
        SELECT source, MAX(tot) AS n_vocab_tokens,
               (ROUND(SUM(diff * diff / e), 6) + 0.0) AS phi2
        FROM terms JOIN totals USING (source)
        GROUP BY source ORDER BY source""")),

    // ── t19: winsorized length stats — per language, the mean document ──
    // length before and after clipping at the [p5, p95] bounds: the
    // robust-preprocessing step that stops a handful of giant documents
    // from dominating batch-size / sequence-length decisions. Two
    // passes: per-lang percentile bounds (tiny frame, broadcast back),
    // then one clipped scan — the corpus shuffles once per pass on the
    // low-cardinality lang key, both partial-agg'd map-side. Clipping
    // compares INTEGER lengths against fractional bounds, so a 1-ulp
    // interpolation wobble can never flip a clip decision.
    GQuery("t19_winsorized_stats",
      (s, d) => {
        import s.implicits._
        val bounds = docs(s, d).groupBy($"lang")
          .agg(expr("percentile(n_chars, 0.05)").as("lo"),
            expr("percentile(n_chars, 0.95)").as("hi"))
        docs(s, d).join(broadcast(bounds), "lang")
          .select($"lang", $"n_chars",
            least(greatest($"n_chars".cast(DoubleType), $"lo"), $"hi").as("w"),
            $"lo", $"hi")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            roundz(avg($"n_chars"), 4).as("raw_mean"),
            roundz(avg($"w"), 4).as("winsor_mean"),
            roundz(max($"lo"), 4).as("p5"),
            roundz(max($"hi"), 4).as("p95"))
          .orderBy($"lang")
      },
      Some("""
        WITH bounds AS (
          SELECT lang, quantile_cont(n_chars, 0.05) AS lo,
                 quantile_cont(n_chars, 0.95) AS hi
          FROM documents GROUP BY lang),
        w AS (
          SELECT d.lang, n_chars,
                 LEAST(GREATEST(CAST(n_chars AS DOUBLE), lo), hi) AS w, lo, hi
          FROM documents d JOIN bounds USING (lang))
        SELECT lang, COUNT(*) AS n_docs,
               (ROUND(AVG(n_chars), 4) + 0.0) AS raw_mean,
               (ROUND(AVG(w), 4) + 0.0) AS winsor_mean,
               (ROUND(MAX(lo), 4) + 0.0) AS p5, (ROUND(MAX(hi), 4) + 0.0) AS p95
        FROM w GROUP BY lang ORDER BY lang""")),

    // ── t20: Zipf slope — least-squares fit of log(freq) vs log(rank) ──
    // over the top-100 vocabulary: natural text sits near slope −1, so
    // the corpus-QA dashboards use the fit to flag synthetic/templated
    // corpora. One distributed word count (2-stage partial agg) +
    // TakeOrdered top-100; the regression runs over 100 rows. Float
    // discipline: each log is ROUNDED to 6dp then DECIMAL — the sums and
    // cross-products are exact, and the closed-form slope is a fixed
    // IEEE double expression over those exact values, so both engines
    // compute identical bits (raw libm log drifts at the ulp
    // cross-engine; SURVEY §6).
    GQuery("t20_zipf_slope",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val top = docs(s, d).select(explode(tokens($"text")).as("w"))
          .groupBy($"w").agg(count(lit(1)).as("f"))
          .orderBy($"f".desc, $"w".asc).limit(100)
        // rank window over the 100-row TakeOrdered result — bounded, not
        // a corpus-wide global sort
        val rw = Window.orderBy($"f".desc, $"w".asc)
        top.withColumn("rank", row_number().over(rw))
          .select(
            roundz(log($"rank".cast(DoubleType)), 6).cast(DecimalType(18, 6)).as("x"),
            roundz(log($"f".cast(DoubleType)), 6).cast(DecimalType(18, 6)).as("y"))
          .agg(count(lit(1)).as("n_words"),
            sum($"x").cast(DoubleType).as("sx"), sum($"y").cast(DoubleType).as("sy"),
            sum($"x" * $"y").cast(DoubleType).as("sxy"),
            sum($"x" * $"x").cast(DoubleType).as("sxx"))
          .select($"n_words",
            roundz(($"n_words" * $"sxy" - $"sx" * $"sy") /
              ($"n_words" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
            roundz(($"sy" - ($"n_words" * $"sxy" - $"sx" * $"sy") /
              ($"n_words" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n_words", 6).as("intercept"))
          .orderBy($"n_words")
      },
      Some("""
        WITH top AS (
          SELECT w, COUNT(*) AS f
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w ORDER BY f DESC, w ASC LIMIT 100),
        xy AS (
          SELECT CAST((ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS DOUBLE)), 6) + 0.0) AS DECIMAL(18,6)) AS x,
                 CAST((ROUND(ln(CAST(f AS DOUBLE)), 6) + 0.0) AS DECIMAL(18,6)) AS y
          FROM top),
        sums AS (
          SELECT COUNT(*) AS n_words,
                 CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
          FROM xy)
        SELECT n_words,
               (ROUND((n_words * sxy - sx * sy) / (n_words * sxx - sx * sx), 6) + 0.0) AS slope,
               (ROUND((sy - (n_words * sxy - sx * sy) / (n_words * sxx - sx * sx) * sx) / n_words, 6) + 0.0) AS intercept
        FROM sums ORDER BY n_words""")),

    // ── t21: BPE merge-pair counting — one iteration of byte-pair ──
    // encoding's inner loop: count every adjacent character pair across
    // all token occurrences and rank the top-20 merge candidates. This
    // IS the distributed step of tokenizer training (each BPE round
    // re-counts pairs over the corpus; the merge-table update between
    // rounds is driver-side and k-sized). Pair generation is a bounded
    // Generate (|word|−1 rows per token), the count is a two-stage
    // partial agg on uniform short-string keys, and the top-20 is a
    // TakeOrdered with a total (n DESC, pair ASC) tie order.
    GQuery("t21_bpe_pairs",
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select(explode(tokens($"text")).as("w"))
          .filter(length($"w") >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
          .groupBy($"pair").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"pair".asc)
          .limit(20)
      },
      Some("""
        WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        pairs AS (
          SELECT unnest(list_transform(range(1, length(w)), i -> w[i:i+1])) AS pair
          FROM toks WHERE length(w) >= 2)
        SELECT pair, COUNT(*) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT 20""")),

    // ── t22: LM-perplexity bucketing — the CCNet recipe: score every ──
    // document under a corpus-trained LM and cut the corpus into
    // head/middle/tail quality tranches (head feeds training as-is, tail
    // is dropped or aggressively filtered). The LM is t11's bigram model;
    // the score is per-doc mean log-probability. Buckets cut on LOG
    // perplexity at fixed thresholds (−ln 29, −ln 30.2 for this corpus):
    // exp() differs by ulps across libm implementations, so the
    // monotone-equivalent log-space compare is the cross-engine-safe
    // form — same reason the mean rides a DECIMAL(18,6) sum of the
    // 6-dp-rounded per-doc scores, not a float sum. Scale: model fits in
    // a broadcast (vocab², pruned in production); scoring is one corpus
    // scan; the bucket rollup shuffles 3 rows.
    GQuery("t22_perplexity_bucket",
      (s, d) => {
        import s.implicits._
        val bg = docs(s, d).select($"doc_id", explode(shingles(tokens($"text"), 2)).as("bg"))
        val cbg = bg.groupBy($"bg").agg(count(lit(1)).as("c_bg"))
          .withColumn("w1", split($"bg", " ").getItem(0))
        val model = cbg.join(
          cbg.groupBy($"w1").agg(sum($"c_bg").as("c_w1")), "w1")
          .select($"bg", $"c_bg", $"c_w1")
        val scored = bg.join(broadcast(model), "bg")
          .select($"doc_id",
            roundz(log($"c_bg".cast(DoubleType) / $"c_w1"), 6).cast(DecimalType(18, 6)).as("logp"))
          .groupBy($"doc_id")
          .agg(roundz((sum($"logp").cast(DoubleType) / count(lit(1))), 6)
            .cast(DecimalType(18, 6)).as("log_ppl"))
        docs(s, d)
          .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
          .join(scored, "doc_id")
          .withColumn("bucket",
            when($"log_ppl" > -3.3673, "head")
              .when($"log_ppl" > -3.4078, "middle")
              .otherwise("tail"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("n_tokens"),
            roundz(sum($"log_ppl").cast(DoubleType) / count(lit(1)), 6).as("mean_log_ppl"))
          .orderBy($"bucket")
      },
      Some("""
        WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bg
               FROM ts),
        cbg AS (SELECT bg, string_split(bg, ' ')[1] AS w1, COUNT(*) AS c_bg FROM bg GROUP BY bg),
        cw1 AS (SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM cbg GROUP BY w1),
        model AS (SELECT bg, c_bg, c_w1 FROM cbg JOIN cw1 USING (w1)),
        scored AS (
          SELECT doc_id,
                 CAST((ROUND(CAST(SUM(CAST((ROUND(ln(CAST(c_bg AS DOUBLE) / c_w1), 6) + 0.0) AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) + 0.0) AS DECIMAL(18,6)) AS log_ppl
          FROM bg JOIN model USING (bg) GROUP BY doc_id),
        bucketed AS (
          SELECT d.doc_id,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                 s.log_ppl,
                 CASE WHEN s.log_ppl > -3.3673 THEN 'head'
                      WHEN s.log_ppl > -3.4078 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM documents d JOIN scored s USING (doc_id))
        SELECT bucket, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               (ROUND(CAST(SUM(log_ppl) AS DOUBLE) / COUNT(*), 6) + 0.0) AS mean_log_ppl
        FROM bucketed GROUP BY bucket ORDER BY bucket""")),

    // ── t23: code-vs-prose detection — the routing decision every mixed ──
    // crawl makes before tokenizer/quality settings diverge per modality.
    // Two single-scan signals: symbol density (chars from the code
    // alphabet {}();=<>[] as a fraction of all chars — regexp_replace
    // DELETES them and the length delta counts them, one codegen'd pass,
    // no explode) and keyword rate (tokens from a tiny language-keyword
    // list). The keep/route decision compares in INTEGER cross-multiplied
    // form (n_sym*100 > n_chars*3, not n_sym/n_chars > 0.03) so the
    // boolean can never diverge across engines on a float boundary.
    GQuery("t23_code_detect",
      (s, d) => {
        import s.implicits._
        val kws = Seq("def", "return", "import", "class", "val", "if", "else", "for")
        docs(s, d)
          .select($"doc_id",
            length($"text").cast(LongType).as("n_chars"),
            size(tokens($"text")).cast(LongType).as("n_tokens"),
            (length($"text") -
              length(regexp_replace($"text", "[{}();=<>\\[\\]]", ""))).cast(LongType).as("n_sym"),
            countIn(tokens($"text"), kws).cast(LongType).as("n_kw"))
          .select($"doc_id",
            roundz($"n_sym".cast(DoubleType) / greatest($"n_chars", lit(1L)), 6).as("sym_ratio"),
            roundz($"n_kw".cast(DoubleType) / greatest($"n_tokens", lit(1L)), 6).as("kw_rate"),
            ($"n_sym" * 100 > $"n_chars" * 3 || $"n_kw" * 20 > $"n_tokens").as("is_code"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH f AS (
          SELECT doc_id,
                 CAST(strlen(text) AS BIGINT) AS n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(strlen(text)
                      - strlen(regexp_replace(text, '[{}();=<>\[\]]', '', 'g')) AS BIGINT) AS n_sym,
                 CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ('def','return','import','class','val','if','else','for'))) AS BIGINT) AS n_kw
          FROM documents)
        SELECT doc_id,
               (ROUND(CAST(n_sym AS DOUBLE) / GREATEST(n_chars, 1), 6) + 0.0) AS sym_ratio,
               (ROUND(CAST(n_kw AS DOUBLE) / GREATEST(n_tokens, 1), 6) + 0.0) AS kw_rate,
               (n_sym * 100 > n_chars * 3) OR (n_kw * 20 > n_tokens) AS is_code
        FROM f ORDER BY doc_id""")),

    // ── t24: vocabulary coverage curve — corpus token share covered by ──
    // the top-k word types, for k in {5,10,15,20,25}: the curve tokenizer
    // sizing reads (where does coverage flatten?) and t17's OOV rate
    // generalized from one vocab size to the whole frontier. One word
    // count (two-phase agg), a TakeOrdered top-25 of the type table,
    // then a rank window + running sum over those 25 rows (never the
    // |vocab|-sized table, never the corpus), then 5 threshold rows
    // read off the running curve. Total (freq DESC, word ASC) order makes
    // rank and cumulative sums engine-identical; coverage divides exact
    // BIGINT token counts.
    GQuery("t24_vocab_coverage",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val counts = docs(s, d)
          .select(explode(tokens($"text")).as("w"))
          .groupBy($"w").agg(count(lit(1)).as("f"))
        val wOrd = Window.orderBy($"f".desc, $"w".asc)
        // TakeOrdered the 25 types the curve can reference BEFORE the
        // global window: the single-partition rank/running-sum then runs
        // over 25 rows, never the |vocab|-sized type table
        val curve = counts
          .orderBy($"f".desc, $"w".asc).limit(25)
          .withColumn("rk", row_number().over(wOrd))
          .withColumn("cum_f", sum($"f").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val total = counts.agg(sum($"f").as("total_tokens"))
        curve.filter($"rk" % 5 === 0 && $"rk" <= 25)
          // explicit broadcast like every other 1-row scalar join in the
          // repo (Spark would pick it anyway; uniformity is the point)
          .crossJoin(broadcast(total))
          .select($"rk".cast(LongType).as("vocab_size"), $"cum_f".as("covered_tokens"),
            $"total_tokens",
            roundz($"cum_f".cast(DoubleType) / $"total_tokens", 6).as("coverage"))
          .orderBy($"vocab_size")
      },
      Some("""
        WITH counts AS (
          SELECT w, COUNT(*) AS f
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w),
        curve AS (
          SELECT w, f,
                 ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS rk,
                 CAST(SUM(f) OVER (ORDER BY f DESC, w ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_f
          FROM counts),
        tot AS (SELECT CAST(SUM(f) AS BIGINT) AS total_tokens FROM counts)
        SELECT CAST(rk AS BIGINT) AS vocab_size, cum_f AS covered_tokens, total_tokens,
               (ROUND(CAST(cum_f AS DOUBLE) / total_tokens, 6) + 0.0) AS coverage
        FROM curve, tot WHERE rk % 5 = 0 AND rk <= 25
        ORDER BY vocab_size""")),

    // ── t25: lexical diversity — per-document type-token ratio and ──
    // hapax-legomena fraction, the two standard one-pass diversity
    // signals (low TTR = templated/repetitive text, high hapax = noisy
    // OCR or genuinely rich vocabulary; filters and data-mix dashboards
    // threshold on both). One explode → per-(doc, word) count → per-doc
    // aggregate: two partial-agg'd shuffles on (doc_id, w) then doc_id,
    // never a vocab-wide or corpus-wide stage; the per-doc frame is the
    // output. Ratios divide exact BIGINTs once and are roundz'd.
    GQuery("t25_lexical_diversity",
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("w"))
          .groupBy($"doc_id", $"w").agg(count(lit(1)).as("f"))
          .groupBy($"doc_id")
          .agg(sum($"f").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when($"f" === 1, 1L).otherwise(0L)).as("n_hapax"))
          .select($"doc_id", $"n_tokens", $"n_types",
            roundz($"n_types".cast(DoubleType) / $"n_tokens", 6).as("ttr"),
            roundz($"n_hapax".cast(DoubleType) / $"n_types", 6).as("hapax_frac"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH wf AS (
          SELECT doc_id, w, COUNT(*) AS f
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY doc_id, w),
        agg AS (
          SELECT doc_id, CAST(SUM(f) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_types,
                 CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
          FROM wf GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_types,
               (ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) + 0.0) AS ttr,
               (ROUND(CAST(n_hapax AS DOUBLE) / n_types, 6) + 0.0) AS hapax_frac
        FROM agg ORDER BY doc_id""")),

    // ── t26: word burstiness — variance-to-mean ratio (VMR) of per-doc ──
    // counts across ALL documents for the top-10 corpus words (Church &
    // Gale): VMR ≈ 1 is Poisson scatter (function words / boilerplate
    // vocabulary), VMR ≫ 1 means the word clumps in few docs (content
    // words) — the signal that separates stopword-ish tokens from
    // topical ones when building filter lists. Two-pass plan with s16's
    // discipline: pass 1 = t06's two-phase word count → TakeOrdered
    // top-10 (broadcast-able); pass 2 re-scans the corpus once with the
    // top-word set as a map-side broadcast semi-filter, so the only
    // (doc, word) shuffle carries matched tokens. Zero-count docs enter
    // the moments via N = corpus size (1-row broadcast), not via
    // materialized zeros. VMR = (N·Σc² − (Σc)²)/(N·Σc): exact BIGINT
    // numerator/denominator, ONE double division — bit-stable on both
    // engines, no mean/variance intermediate rounding.
    GQuery("t26_word_burstiness",
      (s, d) => {
        import s.implicits._
        val toks = docs(s, d).select($"doc_id", explode(tokens($"text")).as("w"))
        val top = toks.groupBy($"w").agg(count(lit(1)).as("total_f"))
          .orderBy($"total_f".desc, $"w".asc).limit(10)
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        val perDoc = toks.join(broadcast(top.select($"w")), "w")
          .groupBy($"w", $"doc_id").agg(count(lit(1)).as("c"))
        perDoc.groupBy($"w")
          .agg(count(lit(1)).as("df"),
            sum($"c").as("sc"), sum($"c" * $"c").as("scc"))
          .join(broadcast(top), "w")
          .crossJoin(broadcast(n))
          .select($"w".as("word"), $"total_f", $"df",
            roundz(($"n_docs" * $"scc" - $"sc" * $"sc").cast(DoubleType) /
              ($"n_docs" * $"sc"), 6).as("vmr"))
          .orderBy($"total_f".desc, $"word".asc)
      },
      Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        top AS (SELECT w, COUNT(*) AS total_f FROM toks GROUP BY w
                ORDER BY total_f DESC, w ASC LIMIT 10),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        per AS (SELECT t.w, t.doc_id, COUNT(*) AS c
                FROM toks t JOIN top USING (w) GROUP BY t.w, t.doc_id),
        mom AS (SELECT w, COUNT(*) AS df,
                       CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS scc
                FROM per GROUP BY w)
        SELECT mom.w AS word, top.total_f, mom.df,
               (ROUND(CAST(n_docs * scc - sc * sc AS DOUBLE) / (n_docs * sc), 6) + 0.0) AS vmr
        FROM mom JOIN top USING (w) CROSS JOIN n
        ORDER BY top.total_f DESC, word ASC""")),

    // ── t27: n-gram novelty curve — per document (in doc_id ingestion ──
    // order), the fraction of its distinct 3-gram shingles never seen in
    // any EARLIER document: the marginal-information signal behind "is
    // this feed still adding content or just re-crawling?" and the
    // data-mix diminishing-returns curve. Novelty is defined against
    // first occurrence, so it needs no window over the corpus: gram →
    // min(doc_id) is ONE two-phase agg on the 64-bit gram hash, and the
    // join-back is co-partitioned on the same key (d09's discipline) —
    // a gram is novel for exactly its first doc. Per-doc fraction
    // divides exact BIGINTs once.
    GQuery("t27_gram_novelty",
      (s, d) => {
        import s.implicits._
        val grams = docs(s, d)
          .select($"doc_id", explode(array_distinct(shingles(tokens($"text"), 3))).as("g"))
          .select($"doc_id", hash64($"g").as("h"))
        val first = grams.groupBy($"h").agg(min($"doc_id").as("first_doc"))
        grams.join(first, "h")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
          .select($"doc_id", $"n_grams", $"n_novel",
            roundz($"n_novel".cast(DoubleType) / $"n_grams", 6).as("novelty"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        grams AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(unnest(list_distinct(
                   list_transform(range(1, len(ts) - 1),
                     i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])))), 1, 15) AS BIGINT) AS h
          FROM ts),
        first AS (SELECT h, MIN(doc_id) AS first_doc FROM grams GROUP BY h)
        SELECT g.doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               (ROUND(CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0) AS novelty
        FROM grams g JOIN first f USING (h)
        GROUP BY g.doc_id
        ORDER BY g.doc_id""")),

    // ── t28: per-source length profile — token-length quartiles + ──
    // extremes per source (the packing/padding planner's input: mix
    // design needs to know WHERE the long tails live before p19's
    // chunked packing and t19's winsorized bounds are tuned per feed).
    // One in-scan token count, one two-phase groupBy on the tiny source
    // key; percentile interpolation over BIGINT counts yields at worst
    // binary-exact halves (q42's discipline), rounded 4dp both engines.
    GQuery("t28_length_profile",
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"source", size(tokens($"text")).cast(LongType).as("n"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            min($"n").as("min_tokens"),
            roundz(expr("percentile(n, 0.25)"), 4).as("p25_tokens"),
            roundz(expr("percentile(n, 0.5)"), 4).as("p50_tokens"),
            roundz(expr("percentile(n, 0.75)"), 4).as("p75_tokens"),
            max($"n").as("max_tokens"))
          .orderBy($"source")
      },
      Some("""
        WITH n AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                   FROM documents)
        SELECT source, COUNT(*) AS n_docs,
               CAST(MIN(n) AS BIGINT) AS min_tokens,
               (ROUND(quantile_cont(n, 0.25), 4) + 0.0) AS p25_tokens,
               (ROUND(quantile_cont(n, 0.5), 4) + 0.0) AS p50_tokens,
               (ROUND(quantile_cont(n, 0.75), 4) + 0.0) AS p75_tokens,
               CAST(MAX(n) AS BIGINT) AS max_tokens
        FROM n GROUP BY source ORDER BY source""")),

    // ── t29: exact heavy hitters by sketch-then-recount — which words ──
    // exceed φ=1% of all corpus tokens. Phase 1: a Misra–Gries
    // TypedImperativeAggregate (functions.HeavyHittersAgg, capacity 128)
    // folds every token map-side into a fixed 128-slot sketch, so the
    // only vocabulary-wide pass shuffles ≤128 counters per task — never
    // one row per distinct word (t06's exact two-phase shape, which at
    // 100 TB shuffles a billions-entry vocabulary). The claim is a
    // STATE/SHUFFLE bound, not a wall-clock win on a small vocabulary:
    // SCALING.md §4 measures t06 faster at every test SF because the
    // synthetic vocabulary collapses to ~10 KB of partial-agg shuffle —
    // the regime this operator exists for is web-scale type counts
    // (URLs/numbers/typos), where the exact shuffle is vocabulary-sized
    // and the 128-counter bound is what keeps the job flat. Phase 2: the ≤128
    // candidates broadcast back as a semi-filter and ONLY matching
    // tokens enter an exact groupBy recount, then the φ·n threshold.
    // MG guarantees every word with freq > n/129 is a candidate, and
    // φ=1% > 1/129 — so the final answer is provably EXACT and
    // oracle-checkable even though the sketch itself is approximate.
    GQuery("t29_heavy_hitters",
      (s, d) => {
        import s.implicits._
        import graft.functions.HeavyHittersAgg.heavyHitters
        val toks = docs(s, d).select(explode(tokens($"text")).as("word"))
        val cand = toks
          .select(heavyHitters($"word", 128).as("hh"))
          .select(explode($"hh.word").as("word"))
        val total = toks.agg(count(lit(1)).as("n_tokens"))
        toks.join(broadcast(cand), "word")
          .groupBy($"word")
          .agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(total))
          .filter($"n" > $"n_tokens" * lit(0.01))
          .select($"word", $"n",
            roundz($"n" / $"n_tokens", 5).as("share"))
          .orderBy($"n".desc, $"word".asc)
      },
      Some("""
        WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
             tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks)
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
               (ROUND(COUNT(*) / (SELECT CAST(n_tokens AS DOUBLE) FROM tot), 5) + 0.0) AS share
        FROM toks GROUP BY word
        HAVING CAST(COUNT(*) AS BIGINT) > (SELECT CAST(n_tokens AS DOUBLE) FROM tot) * CAST(0.01 AS DOUBLE)
        ORDER BY n DESC, word ASC"""))
  )
}
