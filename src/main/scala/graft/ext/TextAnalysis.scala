package graft.ext

import graft.Tables
import graft.functions.WordNgrams.word_ngrams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` for a training-data pipeline:
  * language ID (stopword-marker scoring), quality scoring
  * (length / punctuation / stopword ratios), and token counting
  * (whitespace + a BPE-ish regex).
  *
  * All expressions are built-in-function compositions (regexp counts,
  * lengths, splits) — fully codegen'd, no UDFs — and are generated from
  * one marker table so the Spark plan and the DuckDB oracle can never
  * drift. One scan per query; no shuffle except the final orderBy.
  */
object TextAnalysis {

  /** Public-knowledge high-frequency function words per language. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "une", "sur"),
    // ASCII-only markers: \b is ASCII-word-boundary in RE2 but can be
    // unicode-aware in Java regex — non-ASCII words would diverge.
    "pt" -> Seq("o", "os", "do", "da", "em", "para", "com", "uma"))

  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  private def markerRegex(words: Seq[String]): String =
    "\\b(" + words.mkString("|") + ")\\b"

  private def score(lang: String): Column =
    regexp_count(lower(col("text")),
      lit(markerRegex(markers.toMap.apply(lang)))).as(s"score_$lang")

  /** q15 — language ID: argmax of marker-word counts, 'und' when no
    * marker fires; deterministic lexicographic tiebreak. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val scored = docs.select(
      col("doc_id") +: markers.map { case (l, _) => score(l) }: _*)
    // argmax via a sorted struct array: (score desc, lang asc)
    val best = markers.map { case (l, _) =>
      struct(col(s"score_$l").as("s"), lit(l).as("l"))
    }
    scored
      .withColumn("best", sort_array(array(best: _*), asc = false)(0))
      .select(col("doc_id"),
        when(col("best.s") > 0, col("best.l")).otherwise("und")
          .as("predicted_lang"))
      .orderBy("doc_id")
  }

  // NOTE on the argmax tiebreak: sort_array desc on (s, l) puts the
  // HIGHEST score first; among equal scores it takes the lexicographically
  // LARGEST lang. The oracle mirrors with ORDER BY s DESC, l DESC LIMIT 1.
  val langIdSql: String = {
    // DuckDB standard strings do NOT process backslash escapes, so the
    // regex goes in verbatim (single backslashes).
    val scores = markers.map { case (l, ws) =>
      s"len(regexp_extract_all(lower(text), '${markerRegex(ws)}')) AS score_$l"
    }.mkString(",\n       ")
    val unions = markers.map { case (l, _) =>
      s"SELECT doc_id, score_$l AS s, '$l' AS l FROM scored"
    }.mkString(" UNION ALL ")
    s"""WITH scored AS (
       |  SELECT doc_id,
       |       $scores
       |  FROM documents
       |), langs AS ($unions),
       |best AS (
       |  SELECT doc_id, s, l,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, l DESC) AS rn
       |  FROM langs
       |)
       |SELECT doc_id, CASE WHEN s > 0 THEN l ELSE 'und' END AS predicted_lang
       |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** q16 — quality scoring: token stats + punctuation and stopword
    * ratios, the standard cheap filters before LLM training. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = split(lower(col("text")), "\\s+")
    val nTokens = size(toks).cast("long")
    val nChars = length(col("text")).cast("long")
    val nPunct = regexp_count(col("text"), lit("[.,;:!?'\"()-]")).cast("long")
    val nStop = regexp_count(lower(col("text")),
      lit(markerRegex(englishStopwords))).cast("long")
    docs.select(
      col("doc_id"), nChars.as("n_chars_actual"), nTokens.as("n_tokens"),
      (nChars.cast("double") / nTokens.cast("double")).as("avg_token_len"),
      (nPunct.cast("double") / nChars.cast("double")).as("punct_ratio"),
      (nStop.cast("double") / nTokens.cast("double")).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String = {
    val stopRe = markerRegex(englishStopwords)
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars_actual,
       |  CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS DOUBLE) / len(string_split_regex(lower(text), '\\s+')) AS avg_token_len,
       |  CAST(len(regexp_extract_all(text, '[.,;:!?''"()-]')) AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(len(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE)
       |    / len(string_split_regex(lower(text), '\\s+')) AS stopword_ratio
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** q182 — cross-source score calibration (quantile normalization):
    * raw quality scores are not comparable across sources (a web crawl
    * and a books corpus have different stopword-ratio distributions),
    * so mixing pipelines that threshold on a GLOBAL score over- or
    * under-prune whole sources. The standard fix: replace each doc's
    * score with its percentile WITHIN its source, then bucket the
    * calibrated percentile into deciles — the per-source curriculum /
    * filtering knob that survives distribution shift between sources.
    *
    * Scale shape: one scan + one window PARTITIONED BY SOURCE (state
    * bounded per source partition, the q65 argument); ties broken by
    * doc_id so percent_rank is engine-exact, and both engines run the
    * identical (rank−1)/(n−1) → ×10 → floor IEEE sequence. */
  def sourceCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = split(lower(col("text")), "\\s+")
    val score = regexp_count(lower(col("text")),
      lit(markerRegex(englishStopwords))).cast("double") /
      size(toks).cast("double")
    val w = Window.partitionBy("source")
      .orderBy(col("raw_score"), col("doc_id"))
    docs.select(col("doc_id"), col("source"), score.as("raw_score"))
      .withColumn("pct", percent_rank().over(w))
      .select(col("doc_id"), col("source"),
        round(col("raw_score"), 6).as("raw_score"),
        round(col("pct"), 6).as("src_pct"),
        least(floor(col("pct") * 10), lit(9L)).cast("long").as("decile"))
      .orderBy("doc_id")
  }

  val sourceCalibrationSql: String = {
    val stopRe = markerRegex(englishStopwords)
    s"""WITH s AS (
       |  SELECT doc_id, source,
       |         CAST(len(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS raw_score
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, source, raw_score,
       |         percent_rank() OVER (PARTITION BY source
       |           ORDER BY raw_score, doc_id) AS pct
       |  FROM s
       |)
       |SELECT doc_id, source, round(raw_score, 6) AS raw_score,
       |       round(pct, 6) AS src_pct,
       |       CAST(least(floor(pct * 10), 9) AS BIGINT) AS decile
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** q17 — token counting: whitespace tokens vs BPE-ish subword pieces
    * (word fragments of ≤4 chars + standalone punctuation), the cheap
    * proxy for LLM token budgeting. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val ws = size(split(col("text"), "\\s+")).cast("long")
    val bpeish = regexp_count(lower(col("text")),
      lit("[a-z0-9]{1,4}|[^a-z0-9\\s]")).cast("long")
    docs.select(col("doc_id"), ws.as("ws_tokens"), bpeish.as("bpeish_tokens"))
      .orderBy("doc_id")
  }

  /** q26 — the end-to-end corpus-prep pipeline a training-data curator
    * runs, composed from the pieces above: exact dedup survivors →
    * token-count band → English-marker floor. One shot, fully
    * oracle-checked. */
  def corpusPrep(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val nTokens = size(split(lower(col("text")), "\\s+")).cast("long")
    val enRatio = regexp_count(lower(col("text")),
      lit(markerRegex(markers.toMap.apply("en")))).cast("double") /
      nTokens.cast("double")
    docs.select(col("doc_id"), nTokens.as("n_tokens"), enRatio.as("er"))
      .join(keep, Seq("doc_id"), "left_semi")
      .filter(col("n_tokens").between(20, 5000) && col("er") >= 0.01)
      .select(col("doc_id"), col("n_tokens"))
      .orderBy("doc_id")
  }

  val corpusPrepSql: String = {
    val enRe = markerRegex(markers.toMap.apply("en"))
    s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |feat AS (
       |  SELECT doc_id,
       |         len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
       |         CAST(len(regexp_extract_all(lower(text), '$enRe')) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS er
       |  FROM documents)
       |SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens
       |FROM feat f JOIN keep k ON f.doc_id = k.doc_id
       |WHERE f.n_tokens BETWEEN 20 AND 5000 AND f.er >= 0.01
       |ORDER BY f.doc_id""".stripMargin
  }

  val tokenCountsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}|[^a-z0-9\s]')) AS BIGINT) AS bpeish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q34 — repetition scoring (the Gopher-class "duplicate n-gram
    * fraction" quality rule): per document, the share of word-trigram
    * OCCURRENCES that belong to a trigram appearing more than once, plus
    * the hottest trigram's count. High values flag boilerplate/spam. One
    * explode + one (doc_id, ng) shuffle with map-side combine. Trigrams
    * travel as 60-bit md5 fingerprints (the q107/q74 trick — a long per
    * gram instead of a ~25-byte string through the widest shuffle of
    * the suite; the oracle counts by the same fingerprint, so any
    * collision collapses identically on both engines). */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val w = split(lower(col("text")), "\\s+")
    val grams = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(word_ngrams(col("w"), 3)).as("ngs"))
      .select(col("doc_id"),
        conv(substring(md5(col("ngs")), 1, 15), 16, 10).cast("long")
          .as("ng"))
    grams.groupBy("doc_id", "ng").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_ngrams"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_occurrences"),
        max(col("n")).as("top_ngram_count"))
      .select(col("doc_id"), col("n_ngrams"),
        (col("dup_occurrences").cast("double") / col("n_ngrams").cast("double"))
          .as("dup_fraction"),
        col("top_ngram_count"))
      .orderBy("doc_id")
  }

  val repetitionSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         ('0x'||substr(md5(unnest([w[i]||' '||w[i+1]||' '||w[i+2]
      |                 for i in generate_series(1, len(w)-2)])), 1, 15))::BIGINT AS ng
      |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents)
      |  WHERE len(w) >= 3
      |), c AS (
      |  SELECT doc_id, ng, COUNT(*) AS n FROM g GROUP BY 1, 2
      |)
      |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_ngrams,
      |       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
      |         / CAST(SUM(n) AS DOUBLE) AS dup_fraction,
      |       CAST(MAX(n) AS BIGINT) AS top_ngram_count
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q35 — benchmark decontamination: the share of each corpus doc's
    * distinct word 5-grams that also occur in a benchmark set (here the
    * first `BenchDocs` documents — in production, the eval suites).
    * Mirrors the real shape exactly: benchmarks are tiny next to the
    * corpus, so their n-gram set broadcasts and the corpus side is one
    * scan + a map-side semi-join — no corpus shuffle on n-grams. */
  val BenchDocs = 20L
  val ContamN = 5

  private def fiveGrams(docs: DataFrame): DataFrame = {
    val w = split(lower(col("text")), "\\s+")
    docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= ContamN)
      .select(col("doc_id"),
        explode(array_distinct(word_ngrams(col("w"), ContamN)))
        .as("ng"))
  }

  def decontamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val grams = fiveGrams(docs)
    val benchSet = grams.filter(col("doc_id") < BenchDocs)
      .select(col("ng")).distinct()
    val corpus = grams.filter(col("doc_id") >= BenchDocs)
    // mark hits with a broadcast LEFT join so total and contaminated
    // counts come out of ONE aggregation — one corpus explode, one
    // map-side join, one (doc_id)-keyed shuffle with partial combine,
    // instead of separate semi-join and total-count subplans
    corpus
      .join(broadcast(benchSet.withColumn("hit", lit(1L))), Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_grams").cast("double")).as("contamination"))
      .orderBy("doc_id")
  }

  /** q39 — PII-style scrubbing: mask emails (the reference's own email
    * shape, ETL_DAG.py:115-116), long digit runs (phone/SSN-ish), and
    * the English marker words. The fixture text is digit- and @-free,
    * so the email/digit tiers are exercised on poisoned rows in the
    * spec; the marker tier fires on every fixture doc. Pure
    * `regexp_replace`/`regexp_count` projections — codegen'd, one scan,
    * no shuffle, the 100 TB shape of a scrub pass. Patterns are applied
    * in declaration order (replacement text can't re-trigger a later
    * pattern: '[MASK]' is uppercase/punct only). */
  // (?i): the marker tier must catch capitalized stopwords too (other
  // markerRegex call sites lower() the text first; scrub cannot, since
  // it must preserve the original casing of what it keeps)
  val ScrubPatterns: Seq[(String, String)] = Seq(
    "email" -> "[\\w.-]+@[\\w.-]+\\.\\w+",
    "digits" -> "\\d{4,}",
    "marker" -> ("(?i)" + markerRegex(englishStopwords)))
  // SQL-twin safety: these patterns interpolate VERBATIM into
  // single-quoted DuckDB literals (scrubSql, piiMatrixSql). A future
  // pattern containing a quote (or a backslash-escape RE2 lacks) would
  // produce a broken or silently-divergent oracle — reject at load.
  require(ScrubPatterns.forall { case (_, p) => !p.contains("'") },
    "ScrubPatterns must stay single-quote-free: they are interpolated " +
      "into single-quoted SQL literals in the DuckDB twins")

  /** The scrub projection itself, reusable over any text column. */
  def scrubbedCol(c: Column): Column =
    ScrubPatterns.foldLeft(c) { case (acc, (_, p)) =>
      regexp_replace(acc, p, "[MASK]") }

  def scrub(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val counts = ScrubPatterns.map { case (n, p) =>
      regexp_count(col("text"), lit(p)).cast("long").as(s"n_$n") }
    docs.select(col("doc_id") +: counts :+
        md5(scrubbedCol(col("text"))).as("scrubbed_md5"): _*)
      .orderBy("doc_id")
  }

  val scrubSql: String = {
    val counts = ScrubPatterns.map { case (n, p) =>
      s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$n" }
      .mkString(",\n       ")
    val scrubbed = ScrubPatterns.foldLeft("text") { case (c, (_, p)) =>
      s"regexp_replace($c, '$p', '[MASK]', 'g')" }
    s"""SELECT doc_id,
       |       $counts,
       |       md5($scrubbed) AS scrubbed_md5
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** q165 — PII exposure matrix: per (source, pattern-kind), how many
    * documents hit the q39 scrub patterns and how many total spans —
    * the compliance read that decides WHERE scrubbing effort goes
    * (one leaky source vs corpus-wide noise), sharing q39's exact
    * pattern constants so the audit can never drift from the scrub
    * it audits.
    *
    * Scale shape: counts are codegen'd regexp projections on the one
    * corpus scan; `stack` unpivots |patterns| columns to rows BEFORE
    * the (source, kind) agg, so the shuffle carries 3 rows per doc,
    * never text. */
  def piiMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val counts = ScrubPatterns.map { case (n, p) =>
      regexp_count(col("text"), lit(p)).cast("long").as(n) }
    val stackExpr = s"stack(${ScrubPatterns.size}, " +
      ScrubPatterns.map { case (n, _) => s"'$n', $n" }.mkString(", ") +
      ") as (kind, hits)"
    docs.select(col("source") +: counts: _*)
      .select(col("source"), expr(stackExpr))
      .groupBy("source", "kind")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum("hits").as("n_spans"))
      .select(col("source"), col("kind"), col("n_docs_hit"), col("n_spans"),
        round(col("n_docs_hit").cast("double") /
          col("n_docs").cast("double"), 6).as("doc_hit_rate"))
      .orderBy("source", "kind")
  }

  val piiMatrixSql: String = {
    val arms = ScrubPatterns.map { case (n, p) =>
      s"""SELECT source, '$n' AS kind,
         |       CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS hits
         |FROM documents""".stripMargin }
      .mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |$arms
       |)
       |SELECT source, kind,
       |       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_docs_hit,
       |       CAST(SUM(hits) AS BIGINT) AS n_spans,
       |       round(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END)::DOUBLE
       |             / COUNT(*)::DOUBLE, 6) AS doc_hit_rate
       |FROM s GROUP BY 1, 2 ORDER BY source, kind""".stripMargin
  }

  /** q43 — per-language length quantiles, the distribution snapshot a
    * curator reads before setting corpus filters. EXACT `percentile`
    * (not approx) at dyadic fractions (0.25/0.5/0.75) so linear
    * interpolation is FP-exact and engine-portable: quarters of an
    * integer gap are representable, so Spark's `lower + frac*(upper-
    * lower)` and DuckDB's `quantile_cont` agree bit-for-bit. One
    * (lang)-keyed shuffle; at 100 TB swap percentile for
    * approx_percentile and the plan shape holds. */
  def lengthQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        percentile(col("n_chars"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("q"),
        max(col("n_chars")).as("max_chars"))
      .select(col("lang"), col("n_docs"), col("min_chars"),
        col("q")(0).as("p25"), col("q")(1).as("p50"), col("q")(2).as("p75"),
        col("max_chars"))
      .orderBy("lang")
  }

  val lengthQuantilesSql: String =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       MIN(n_chars) AS min_chars,
      |       quantile_cont(n_chars, 0.25) AS p25,
      |       quantile_cont(n_chars, 0.5) AS p50,
      |       quantile_cont(n_chars, 0.75) AS p75,
      |       MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** q45 — distinctive-term extraction: TF-IDF in spirit, but the
    * ranking key is the INTEGER triple (df asc, tf desc, term asc) —
    * rarest-in-corpus first, then most-frequent-in-doc — instead of
    * tf·log(N/df), so no float log can diverge between engines. Plan:
    * one (doc_id, tok) shuffle for tf, a small tok-keyed agg for df
    * that broadcasts back, then min_by per doc — no window over the
    * corpus. At 100 TB the df table is vocabulary-sized (sub-linear);
    * if it outgrows broadcast, the join falls back to shuffle with the
    * same shape. */
  def distinctiveTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // tf feeds both the df rollup and the final argmin — cache it so the
    // corpus is scanned and exploded once, not per consumer
    val tf = graft.Scratch.register(
      toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")).cache())
    val docFreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(docFreq), Seq("tok"))
      .groupBy("doc_id")
      .agg(min_by(struct(col("tok"), col("tf"), col("df")),
        struct(col("df"), (-col("tf")).as("ntf"), col("tok"))).as("best"))
      .select(col("doc_id"), col("best.tok").as("term"),
        col("best.tf").as("tf"), col("best.df").as("df"))
      .orderBy("doc_id")
  }

  val distinctiveTermsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE length(tok) > 0 GROUP BY 1, 2
      |), dfq AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
      |), ranked AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |           ORDER BY dfq.df, tf.tf DESC, tf.tok) AS rn
      |  FROM tf JOIN dfq USING (tok)
      |)
      |SELECT doc_id, tok AS term, CAST(tf AS BIGINT) AS tf,
      |       CAST(df AS BIGINT) AS df
      |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** q48 — out-of-vocabulary rate: the share of each doc's token
    * occurrences outside the corpus's top-`VocabK` tokens — the
    * integer-exact stand-in for LM perplexity filtering (no float log
    * to diverge between engines). The vocab is a tiny orderBy+limit
    * (TakeOrderedAndProject, deterministic (count desc, tok) order)
    * that broadcasts; the corpus side is one scan + a map-side
    * membership join + one (doc_id)-keyed agg. */
  // 20 < the fixture's 31 distinct tokens, so the OOV branch is LIVE on
  // every fixture run (at 100 the vocab would swallow the whole lexicon
  // and oov_rate would be identically zero, leaving the arithmetic
  // untested by the oracle)
  val VocabK = 20

  def oovRate(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(VocabK)
      .select(col("tok"), lit(1L).as("iv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("iv"), lit(0L))).as("in_vocab"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("in_vocab")).cast("double") /
          col("n_tokens").cast("double")).as("oov_rate"))
      .orderBy("doc_id")
  }

  val oovRateSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), t AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
       |vocab AS (
       |  SELECT tok FROM t GROUP BY tok
       |  ORDER BY COUNT(*) DESC, tok LIMIT $VocabK
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(COUNT(*) - COUNT(*) FILTER (tok IN (SELECT tok FROM vocab)) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
       |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q54 — BPE merge candidates: the most frequent adjacent character
    * pairs across the corpus (within words — pairs spanning whitespace
    * are skipped), i.e. the first merge-selection step of
    * byte-pair-encoding tokenizer training. One scan + explode, one
    * (pair)-keyed count with map-side combine, a top-k
    * TakeOrderedAndProject — no full sort. Deterministic (count desc,
    * pair) tie order keeps the cut oracle-stable. */
  val BpeTopK = 20

  def bpeMergeCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // char_pairs is a compiled one-pass kernel (space-filtering
    // in-kernel); the transform+substr HOF formulation it replaced
    // paid the interpreted lambda path per CHARACTER — measured 2.0s
    // → 0.7s at sf0.1 (PLANS.md round 6)
    docs
      .select(explode(
        graft.functions.CharPairs.char_pairs(col("text"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(BpeTopK)
  }

  val bpeMergeCandidatesSql: String =
    s"""WITH p AS (
       |  SELECT unnest([substr(text, i, 2)
       |           for i in generate_series(1, length(text) - 1)]) AS pair
       |  FROM documents
       |)
       |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
       |FROM p WHERE pair NOT LIKE '% %'
       |GROUP BY pair ORDER BY n DESC, pair LIMIT $BpeTopK""".stripMargin

  /** q56 — vocabulary coverage: the top-k corpus words by frequency with
    * each prefix's cumulative share of all tokens — the "how big must the
    * vocab be to cover X% of the corpus" curve every tokenizer design
    * starts from. One scan+explode, one word-keyed count (map-side
    * combine), a TakeOrderedAndProject top-k, and a scalar total
    * broadcast-crossed back in. The running sum is a global window but it
    * runs AFTER the top-k cut, over exactly [[VocabTopK]] rows — bounded,
    * never the big table. Tie order (count desc, word) is total, so the
    * cut and the curve are oracle-stable. */
  val VocabTopK = 200

  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val counts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("word")).limit(VocabTopK)
    val w = Window.orderBy(col("n").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .select(col("word"), col("n"),
        (sum(col("n")).over(w).cast("double") /
          col("total").cast("double")).as("coverage"))
      .orderBy(col("n").desc, col("word"))
  }

  val vocabCoverageSql: String =
    s"""WITH words AS (
       |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
       |  FROM documents
       |), c AS (
       |  SELECT word, COUNT(*) AS n FROM words WHERE len(word) > 0 GROUP BY 1
       |), t AS (SELECT SUM(n) AS total FROM c),
       |top AS (SELECT word, n FROM c ORDER BY n DESC, word LIMIT $VocabTopK)
       |SELECT word, CAST(n AS BIGINT) AS n,
       |       CAST(SUM(n) OVER (ORDER BY n DESC, word ROWS UNBOUNDED PRECEDING)
       |            AS DOUBLE) / CAST(t.total AS DOUBLE) AS coverage
       |FROM top, t ORDER BY n DESC, word""".stripMargin

  val decontaminationSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
       |                 for i in generate_series(1, len(w)-4)])) AS ng
       |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents)
       |  WHERE len(w) >= $ContamN
       |), bench AS (
       |  SELECT DISTINCT ng FROM g WHERE doc_id < $BenchDocs
       |), corpus AS (
       |  SELECT doc_id, ng FROM g WHERE doc_id >= $BenchDocs
       |), hits AS (
       |  SELECT doc_id, COUNT(*) AS n_contaminated
       |  FROM corpus WHERE ng IN (SELECT ng FROM bench) GROUP BY 1
       |)
       |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |       CAST(COALESCE(MAX(h.n_contaminated), 0) AS BIGINT) AS n_contaminated,
       |       CAST(COALESCE(MAX(h.n_contaminated), 0) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS contamination
       |FROM corpus c
       |LEFT JOIN hits h ON h.doc_id = c.doc_id
       |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  /** q67 — positional token index via `posexplode`, the Generator/UDTF
    * surface (SURVEY.md §2.9: the reference has none): per (doc, token)
    * the occurrence count and 1-based first position. The generator runs
    * inside whole-stage codegen and fans out row-local — no shuffle until
    * the (doc_id, tok) aggregation, and first-position is a plain MIN so
    * the map-side combine keeps the fan-out from ever crossing the wire
    * uncombined. Bounded to a doc-id prefix purely to keep the oracle
    * diff small; the plan is identical unbounded. */
  def tokenPositions(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 20)
    docs.select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("n_occurrences"),
        (min(col("pos")) + 1).cast("long").as("first_pos"))
      .orderBy("doc_id", "tok")
  }

  val tokenPositionsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS l
      |  FROM documents WHERE doc_id < 20),
      |e AS (SELECT doc_id, unnest(l) AS tok, l FROM toks)
      |SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |       CAST(MIN(list_position(l, tok)) AS BIGINT) AS first_pos
      |FROM e GROUP BY doc_id, tok ORDER BY doc_id, tok""".stripMargin

  /** q70 — per-document unigram entropy and type-token ratio, the
    * standard repetition/diversity quality signals next to q34's
    * windowed repetition score. Two hash aggregations, both keyed by
    * doc (no global state): tf per (doc, token), then H = log2(N) −
    * Σc·log2(c)/N from the integer counts — the log terms are the only
    * floats, rounded at the output edge. At 100 TB both shuffles
    * partition by doc_id, so the reduce is embarrassingly parallel. */
  def unigramEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val tf = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).cast("double").as("c"))
    tf.groupBy("doc_id")
      .agg(sum("c").as("n"),
        // exact nano-sum (q196 doctrine): the c·log2(c) terms are
        // floats and entropy lands on the round(6) grid
        Exact.sum9(col("c") * log2(col("c"))).as("s9"),
        count(lit(1)).as("n_types"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("n_types"),
        round(log2(col("n")) - col("s9").cast("double") / 1e9 / col("n"), 6)
          .as("entropy"),
        round(col("n_types").cast("double") / col("n"), 6).as("type_token_ratio"))
      .orderBy("doc_id")
  }

  val unigramEntropySql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM (SELECT doc_id,
      |          unnest(string_split_regex(lower(text), '\\s+')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok),
      |a AS (
      |  SELECT doc_id, SUM(c) AS n,
      |         ${Exact.sum9Sql("c * log2(c)")} AS s9,
      |         COUNT(*) AS n_types
      |  FROM tf GROUP BY doc_id)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(n_types AS BIGINT) AS n_types,
      |       ROUND(log2(n) - CAST(s9 AS DOUBLE) / 1e9 / n, 6) AS entropy,
      |       ROUND(CAST(n_types AS DOUBLE) / n, 6) AS type_token_ratio
      |FROM a ORDER BY doc_id""".stripMargin

  /** q86 — contingency independence table over (lang, source): observed
    * vs expected-under-independence cell counts with standardized
    * residuals — the drift detector a curator runs when a source's
    * language mix shifts between crawls (|residual| ≳ 3 flags a cell).
    * Determinism without rounding: counts are exact longs, expected =
    * (rowΣ·colΣ)/N is a fixed two-op double expression, and IEEE
    * requires sqrt to be correctly rounded — so every output value is
    * bit-identical across engines; no order-dependent float sum exists
    * because the chi-square TOTAL is deliberately left to the reader
    * (per-cell evidence is the actionable artifact anyway). Only
    * OBSERVED cells are emitted; a structural zero (a source that
    * never produces a language) is reconstructible from the marginals
    * carried on every row of its lang/source.
    *
    * Scale: one (lang, source) agg; marginals are windows OVER THE
    * CELL TABLE (|langs|·|sources| rows, not the corpus); the grand
    * total is a driver anchor. Marginal products multiply in double to
    * dodge long overflow at 100 TB row counts. */
  def langSourceIndependence(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val grand = docs.count()
    val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val wl = Window.partitionBy("lang")
    val ws = Window.partitionBy("source")
    val e = (col("row_total").cast("double") * col("col_total")) / grand.toDouble
    cells
      .select(col("lang"), col("source"), col("n"),
        sum("n").over(wl).as("row_total"),
        sum("n").over(ws).as("col_total"))
      .select(col("lang"), col("source"), col("n"),
        col("row_total"), col("col_total"),
        e.as("expected"),
        ((col("n") - e) / sqrt(e)).as("std_residual"))
      .orderBy("lang", "source")
  }

  val langSourceIndependenceSql: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2
      |), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS g FROM documents)
      |SELECT c.lang, c.source, c.n,
      |       CAST(rt.t AS BIGINT) AS row_total,
      |       CAST(ct.t AS BIGINT) AS col_total,
      |       CAST(rt.t AS DOUBLE) * ct.t / tot.g AS expected,
      |       (c.n - CAST(rt.t AS DOUBLE) * ct.t / tot.g)
      |         / sqrt(CAST(rt.t AS DOUBLE) * ct.t / tot.g) AS std_residual
      |FROM cells c
      |JOIN (SELECT lang, SUM(n) AS t FROM cells GROUP BY 1) rt USING (lang)
      |JOIN (SELECT source, SUM(n) AS t FROM cells GROUP BY 1) ct USING (source)
      |CROSS JOIN tot
      |ORDER BY lang, source""".stripMargin

  /** q82 — BPE vocabulary TRAINING (Sennrich et al.'s byte-pair
    * encoding, the real merge loop — q54 only mines round-one
    * candidates): [[BpeRounds]] rounds of count-adjacent-pairs →
    * argmax → merge-everywhere over the word-frequency dictionary,
    * emitting the learned merge table.
    *
    * Spark-first trick that also makes the oracle portable: each word
    * is a spaced-symbol string with DOUBLE-space separators
    * ("  l  o  w  "), so applying a merge is the literal
    * `replace(' a  b ', ' ab ')` — it borrows ONE space from each
    * side and the replacement restores both, so the 2-space invariant
    * survives every merge and consecutive pairs in a run still match
    * (" a  a  a " merges to " aa  a", i.e. [a,a,a,a] → [aa,aa] like
    * real BPE; a single-space encoding would eat the shared delimiter
    * and stall runs). Literal replace is leftmost non-overlapping in
    * both engines, and the space guards make prefix/suffix collisions
    * with longer symbols impossible. No UDF, no per-row loop. Pair
    * counting is the only
    * wide op per round: one (a,b)-keyed agg over the word dict (which
    * is corpus-size-independent-ish: DISTINCT words × counts, the
    * classic BPE working set). The per-round argmax is a 1-row
    * driver anchor (the q03 pattern) because the next round's plan
    * needs it as a LITERAL; 2·rounds tiny jobs total, with
    * localCheckpoint pinning each round's dictionary.
    *
    * Oracle: the same rounds unrolled as chained CTEs with scalar
    * subqueries for the argmax, generated from the same constants. */
  val BpeRounds = 8

  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainMerges(spark, sfDir)
      .toDF("merge_rank", "merge_left", "merge_right", "pair_count")
      .orderBy("merge_rank")
  }

  /** The training loop itself, returning the learned merge table as
    * plain data so q97's encoder can fold it into its plan. */
  def trainMerges(spark: SparkSession,
      sfDir: String): Seq[(Long, String, String, Long)] = {
    val docs = Tables.load(spark, sfDir, "documents")
    var words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("s"),
        col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    while (r <= BpeRounds) {
      val t = split(trim(col("s")), " +")
      val top = words
        .select(col("cnt"), t.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) r = BpeRounds + 1
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, c))
        // NO per-round checkpoint: the merge is one literal `replace`
        // over the ~|vocab|-row dict, so letting rounds accumulate as a
        // collapsed Project chain above the pinned w0 costs round k a
        // k-replace re-scan of a tiny frame, while checkpointing cost
        // an EAGER job per round — 8 of the loop's 16 driver round
        // trips, measured ~half the q82/q97/q160 build time (§1.2:
        // remove passes before tuning them)
        words = words
          .select(replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")).as("s"),
            col("cnt"))
        r += 1
      }
    }
    merges.toSeq
  }

  val bpeTrainSql: String = {
    val rounds = (1 to BpeRounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT a, b, SUM(cnt) AS c FROM (
         |    SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b, cnt
         |    FROM (SELECT string_split_regex(trim(s), ' +') AS t, cnt FROM w${k - 1})
         |    WHERE len(t) >= 2
         |  ) GROUP BY 1, 2
         |), m$k AS MATERIALIZED (
         |  SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1
         |), w$k AS MATERIALIZED (
         |  SELECT replace(s,
         |    ' ' || (SELECT a FROM m$k) || '  ' || (SELECT b FROM m$k) || ' ',
         |    ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ') AS s, cnt
         |  FROM w${k - 1}
         |)""".stripMargin
    }.mkString(",\n")
    val out = (1 to BpeRounds).map { k =>
      s"SELECT $k AS merge_rank, a AS merge_left, b AS merge_right, " +
        s"CAST(c AS BIGINT) AS pair_count FROM m$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH wd AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
       |        FROM documents)
       |  WHERE length(w) > 0 GROUP BY w
       |), w0 AS MATERIALIZED (
       |  SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s, cnt FROM wd
       |),
       |$rounds
       |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, merge_left,
       |       merge_right, pair_count
       |FROM ($out)
       |ORDER BY merge_rank""".stripMargin
  }

  /** q97 — BPE ENCODE: apply q82's learned merge table to the corpus
    * and report each document's subword token count and compression
    * (chars per token) — the inference half of the tokenizer loop, the
    * step that actually runs over 100 TB when a corpus is tokenized.
    *
    * The scalable trick: encode the DISTINCT-WORD DICTIONARY, not the
    * corpus — merges apply to each unique word once (the dictionary is
    * corpus-size-independent-ish), and documents then join word →
    * symbol-count through a broadcast. Merges fold into the plan in
    * rank order as literal `replace` steps over the same double-space
    * symbol encoding training used (leftmost non-overlapping in both
    * engines), so encode is exactly inverse-consistent with training.
    * One explode + one broadcast join + one (doc_id) agg. */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainMerges(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    val words = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val dict0 = words.select("w").distinct()
      .select(col("w"),
        concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("s"))
    val dict = merges.foldLeft(dict0) { case (d, (_, a, b, _)) =>
      d.withColumn("s", replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")))
    }.select(col("w"), size(split(trim(col("s")), " +")).cast("long").as("n_sym"))
    words.join(broadcast(dict), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe_tokens"))
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_chars").cast("double") /
          col("n_bpe_tokens").cast("double"), 6).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Oracle: the training CTE chain re-generated with the word key
    * carried through every round, then the same dictionary join. */
  val bpeEncodeSql: String = {
    val rounds = (1 to BpeRounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT a, b, SUM(cnt) AS c FROM (
         |    SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b, cnt
         |    FROM (SELECT string_split_regex(trim(s), ' +') AS t, cnt FROM w${k - 1})
         |    WHERE len(t) >= 2
         |  ) GROUP BY 1, 2
         |), m$k AS MATERIALIZED (
         |  SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1
         |), w$k AS MATERIALIZED (
         |  SELECT w, replace(s,
         |    ' ' || (SELECT a FROM m$k) || '  ' || (SELECT b FROM m$k) || ' ',
         |    ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ') AS s, cnt
         |  FROM w${k - 1}
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH wd AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
       |        FROM documents)
       |  WHERE length(w) > 0 GROUP BY w
       |), w0 AS MATERIALIZED (
       |  SELECT w, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s, cnt
       |  FROM wd
       |),
       |$rounds,
       |enc AS (
       |  SELECT w, CAST(len(string_split_regex(trim(s), ' +')) AS BIGINT)
       |           AS n_sym
       |  FROM w$BpeRounds
       |), occ AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE length(w) > 0
       |), per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |         CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
       |  FROM occ JOIN enc USING (w) GROUP BY doc_id
       |)
       |SELECT p.doc_id, p.n_words, p.n_bpe_tokens,
       |       round(d.n_chars::DOUBLE / p.n_bpe_tokens::DOUBLE, 6)
       |         AS chars_per_token
       |FROM per p JOIN documents d USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }

  /** q160 — tokenizer fertility by language: BPE pieces emitted per
    * whitespace word, per lang — THE comparative tokenizer-quality
    * metric (a lang with fertility ≫ the corpus mean pays more
    * sequence length per word, trains slower, and usually signals an
    * under-trained vocab for that script). Rides the q97 encoder:
    * merges train once, the distinct-word dictionary encodes once and
    * broadcasts back over occurrences, so fertility is a |langs|-row
    * rollup on top of machinery that is already sub-linear in corpus
    * size. */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainMerges(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    val words = docs.select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val dict0 = words.select("w").distinct()
      .select(col("w"),
        concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("s"))
    val dict = merges.foldLeft(dict0) { case (d, (_, a, b, _)) =>
      d.withColumn("s", replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")))
    }.select(col("w"),
      size(split(trim(col("s")), " +")).cast("long").as("n_sym"))
    words.join(broadcast(dict), Seq("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
      .orderBy("lang")
  }

  /** Oracle: q97's training+dictionary CTE chain with the per-doc tail
    * swapped for a per-lang rollup (string-surgery on the shared SQL
    * so the two oracles can never train different merges). */
  val tokenizerFertilitySql: String = {
    val marker = "occ AS ("
    val prefix = bpeEncodeSql.substring(0, bpeEncodeSql.indexOf(marker))
    prefix + """occ AS (
      |  SELECT lang, w FROM (
      |    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS w
      |    FROM documents)
      |  WHERE length(w) > 0
      |)
      |SELECT o.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
      |       CAST(SUM(e.n_sym) AS BIGINT) AS n_bpe_tokens,
      |       round(SUM(e.n_sym)::DOUBLE / COUNT(*)::DOUBLE, 6) AS fertility
      |FROM occ o JOIN enc e USING (w)
      |GROUP BY o.lang ORDER BY o.lang""".stripMargin
  }

  /** q101 — trending terms: the top-3 tokens per DAY by occurrence
    * count with their rank. The rank filter sits directly above the
    * (day, tok) aggregate, so Catalyst plans WindowGroupLimit — each
    * map task keeps only its local top-3 per day BEFORE the window
    * shuffle (PlanSpec pins it). That per-group group-limit is what
    * makes daily leaderboards over a 100 TB token stream cheap: the
    * shuffle carries ≈ 3·|days|·|tasks| rows, not the token counts. */
  val TrendingK = 3

  def trendingTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // deterministic per-doc "day": docs carry no timestamp, so spread
    // them over a synthetic 10-day calendar keyed by doc_id — the
    // operator under test is the per-group limit, not the calendar
    val toks = docs
      .select((col("doc_id") % 10).as("day"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("day", "tok").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("day")
      .orderBy(col("n").desc, col("tok"))
    toks.withColumn("rank", rank().over(w))
      .filter(col("rank") <= TrendingK)
      .select(col("day"), col("rank").cast("long").as("rank"),
        col("tok"), col("n"))
      .orderBy("day", "rank", "tok")
  }

  val trendingTermsSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id % 10 AS day, tok, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |        FROM documents)
       |  WHERE length(tok) > 0 GROUP BY 1, 2
       |), r AS (
       |  SELECT day, tok, n,
       |         rank() OVER (PARTITION BY day ORDER BY n DESC, tok) AS rnk
       |  FROM tf
       |)
       |SELECT day, CAST(rnk AS BIGINT) AS rank, tok, n
       |FROM r WHERE rnk <= $TrendingK ORDER BY day, rank, tok""".stripMargin

  /** q102 — collocation mining: pointwise mutual information over
    * within-document token co-occurrence, top-20 pairs. PMI =
    * ln(N·c(a,b) / (c(a)·c(b))) over DOCUMENT-level counts (distinct
    * tokens per doc), the classic "which words travel together"
    * statistic driving phrase induction and stopword discovery.
    *
    * Scale shape: the co-occurrence self-join runs on the per-doc
    * DISTINCT token list (explode × explode within doc_id, a < b), so
    * its fan-out is Σ k_d² over per-doc vocabulary k — bounded by doc
    * length, never corpus². Unigram doc frequencies broadcast back.
    * All counts integer; the single ln per pair is deterministic. */
  val PmiTopK = 20
  val PmiMinPairDocs = 5L

  def pmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dt = graft.Scratch.register(docs.select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .cache())
    val n = dt.select("doc_id").distinct().count()
    val uni = dt.groupBy("tok").agg(count(lit(1)).as("df"))
    val pairs = dt.as("a")
      .join(dt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= PmiMinPairDocs)
    pairs
      .join(broadcast(uni.select(col("tok").as("tok_a"), col("df").as("df_a"))),
        Seq("tok_a"))
      .join(broadcast(uni.select(col("tok").as("tok_b"), col("df").as("df_b"))),
        Seq("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log(lit(n.toDouble) * col("n_ab").cast("double") /
          (col("df_a") * col("df_b")).cast("double")), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(PmiTopK)
  }

  val pmiCollocationsSql: String =
    s"""WITH dt AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |    FROM documents)
       |  WHERE length(tok) > 0
       |), n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM dt),
       |uni AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok
       |), pairs AS (
       |  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS n_ab
       |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $PmiMinPairDocs
       |)
       |SELECT p.tok_a, p.tok_b, p.n_ab,
       |       round(ln(n.n * p.n_ab::DOUBLE / (ua.df * ub.df)::DOUBLE), 6)
       |         AS pmi
       |FROM pairs p
       |JOIN uni ua ON p.tok_a = ua.tok
       |JOIN uni ub ON p.tok_b = ub.tok, n
       |ORDER BY pmi DESC, p.tok_a, p.tok_b LIMIT $PmiTopK""".stripMargin

  /** Fixed logistic weights for q98 — a stand-in for a published
    * fastText-style quality classifier's head: favors stopword-bearing,
    * moderately long documents. Inference-side semantics are what the
    * operator pins; swap the constants for real trained weights. */
  val LogitW0 = -2.0
  val LogitWLogTokens = 0.35
  val LogitWAvgLen = 0.1
  val LogitWStopword = 6.0

  /** q98 — model scoring at scale: a logistic-regression head over the
    * q16 text features, computed row-local (score = σ(w·x)) with NO
    * cross-row reduction — the embarrassing-parallel inference shape
    * that dominates 100 TB curation runs (classifier filtering). The
    * whole thing is one scan, codegen'd end to end; the only shuffle
    * is the output sort. Weights are plan literals here; a real model
    * would broadcast them identically. */
  /** The q98 head's linear score over the `text` column — shared by
    * q98 (scores) and q252 (rater agreement) so both raters are the
    * SAME IEEE scalar sequence, not a re-derivation that could drift. */
  private[ext] def logitZ: Column = {
    val toks = split(lower(col("text")), "\\s+")
    val nTokens = size(toks).cast("long")
    val nChars = length(col("text")).cast("long")
    val nStop = regexp_count(lower(col("text")),
      lit(markerRegex(englishStopwords))).cast("long")
    lit(LogitW0) +
      lit(LogitWLogTokens) * log(nTokens.cast("double")) +
      lit(LogitWAvgLen) * (nChars.cast("double") / nTokens.cast("double")) +
      lit(LogitWStopword) * (nStop.cast("double") / nTokens.cast("double"))
  }

  /** DuckDB twin of [[logitZ]], interpolated into q98/q252 oracles. */
  private[ext] val logitZSql: String = {
    val stopRe = markerRegex(englishStopwords)
    s"""$LogitW0 + $LogitWLogTokens * ln(len(string_split_regex(lower(text), '\\s+'))::DOUBLE)
       |    + $LogitWAvgLen * (length(text)::DOUBLE / len(string_split_regex(lower(text), '\\s+'))::DOUBLE)
       |    + $LogitWStopword * (len(regexp_extract_all(lower(text), '$stopRe'))::DOUBLE
       |                         / len(string_split_regex(lower(text), '\\s+'))::DOUBLE)""".stripMargin
  }

  def logitQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val z = logitZ
    docs.select(col("doc_id"), round(z, 6).as("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("p_keep"),
        (lit(1.0) / (lit(1.0) + exp(-z)) >= 0.5).as("keep"))
      .orderBy("doc_id")
  }

  val logitQualitySql: String = {
    val z = logitZSql
    s"""SELECT doc_id,
       |  round($z, 6) AS logit,
       |  round(1.0 / (1.0 + exp(-($z))), 6) AS p_keep,
       |  (1.0 / (1.0 + exp(-($z))) >= 0.5) AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** q73 — unigram-LM quality scoring (the CCNet/Gopher "perplexity
    * filter" shape): train a unigram language model on the WHOLE corpus
    * (global token counts), then score every document by its bits per
    * token under that model, −(1/n)·Σ c·log2(gc/T) — algebraically
    * log2(T) − (Σ c·log2 gc)/n, so the floating sum happens once and a
    * single ROUND(…, 6) absorbs order-dependent FP noise (the q70
    * determinism pattern). Low bits-per-token ≈ stereotyped/boilerplate
    * text, high ≈ rare-token noise; curators cut both tails.
    *
    * Scale: token frequencies aggregate with map-side combine (one
    * shuffle keyed by tok); the model joins back to per-doc term
    * frequencies on tok — broadcast here (vocab ≪ corpus), a
    * vocab-keyed shuffle join at 100 TB where vocab outgrows the
    * driver; per-doc reduce is one more keyed shuffle. */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val tf = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).cast("double").as("c"))
    val model = tf.groupBy("tok").agg(sum(col("c")).as("gc"))
    val total = model.agg(sum(col("gc")).as("t"))
    tf.join(broadcast(model), "tok")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"),
        // exact nano-sum (q196 doctrine): float c·log2(gc) terms
        // feeding the round(6) bits-per-token grid
        Exact.sum9(col("c") * log2(col("gc"))).as("sgc9"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        round(log2(col("t")) - col("sgc9").cast("double") / 1e9 / col("n"),
          6).as("bits_per_token"))
      .orderBy("doc_id")
  }

  val lmScoreSql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM (SELECT doc_id,
      |          unnest(string_split_regex(lower(text), '\\s+')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok),
      |model AS (SELECT tok, SUM(c) AS gc FROM tf GROUP BY tok),
      |tot AS (SELECT SUM(gc) AS t FROM model),
      |a AS (
      |  SELECT doc_id, SUM(c) AS n,
      |         ${Exact.sum9Sql("c * log2(gc)")} AS sgc9
      |  FROM tf JOIN model USING (tok) GROUP BY doc_id)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      |       ROUND(log2(t) - CAST(sgc9 AS DOUBLE) / 1e9 / n, 6)
      |         AS bits_per_token
      |FROM a, tot ORDER BY doc_id""".stripMargin

  /** Interpolation weight for q118 — classic Jelinek-Mercer: score
    * under λ·p(w₂|w₁) + (1−λ)·p(w₂). 0.75 on the bigram is the
    * textbook default; exact in binary, so no cross-engine drift. */
  val BigramLambda = 0.75

  /** q118 — interpolated bigram LM scoring: train bigram + unigram
    * models on the whole corpus and score each document by bits per
    * bigram position under the Jelinek-Mercer mixture
    * λ·c₂(w₁,w₂)/c₁(w₁) + (1−λ)·c₁(w₂)/T — the KenLM-style perplexity
    * filter one order up from q73's unigram (context-aware: scrambling
    * the same common words costs strictly more bits — the spec pins
    * it — while a unigram model can't tell). No unseen-key smoothing
    * is needed because the model trains on the corpus it scores: every
    * document bigram exists in c₂ by construction. MLE caveat, by
    * design: a SINGLETON context w₁ gives p(w₂|w₁) = 1 (rare-word runs
    * score cheap) — curators cut both tails, same as q73; a
    * context-count smoother (Witten-Bell) is the upgrade path if the
    * low tail needs separating.
    *
    * Scale: the bigram count table is the big intermediate (bounded by
    * corpus volume, keyed shuffles with map-side combine); scoring
    * joins doc bigrams back on (w₁,w₂) then w₁/w₂ — broadcast here,
    * vocab-keyed shuffle joins at 100 TB. The per-doc floating sum
    * happens once and rounds at the edge (q70 policy); the corpus
    * total is a 1-row driver anchor. */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame =
    bigramLmOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable (doc_id, text) frame (spec plants corpora). */
  def bigramLmOn(docs: DataFrame): DataFrame =
    bigramBits(docs, wittenBell = false)

  /** Shared bigram-scoring pipeline for q118 (fixed λ) and q119
    * (Witten-Bell λ per context); the two differ only in the mixture
    * weight. */
  private def bigramBits(docs: DataFrame, wittenBell: Boolean): DataFrame = {
    val w = split(lower(col("text")), "\\s+")
    val pairs = docs.select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i.cast("int") + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val toks = docs.select(
      explode(split(lower(col("text")), "\\s+")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
    val t = uni.agg(sum("c1")).first().getLong(0).toDouble
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val pBi = col("c2").cast("double") / col("cw1").cast("double")
    val pUni = col("cw2").cast("double") / t
    val lam =
      if (wittenBell)
        col("cw1").cast("double") /
          (col("cw1") + col("d1")).cast("double")
      else lit(BigramLambda)
    val mix = lam * pBi + (lit(1.0) - lam) * pUni
    val joined = pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni.select(col("tok").as("w1"), col("c1").as("cw1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c1").as("cw2")), Seq("w2"))
    val ctxJoined =
      if (wittenBell)
        joined.join(bi.groupBy("w1").agg(count(lit(1)).as("d1")), Seq("w1"))
      else joined
    ctxJoined
      .groupBy("doc_id")
      // exact nano-sum (q196 doctrine): float log2(mix) terms feeding
      // the round(6) bits-per-bigram grid
      .agg(count(lit(1)).as("n_bigrams"), Exact.sum9(log2(mix)).as("s9"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("s9").cast("double") / 1e9) /
          col("n_bigrams").cast("double"), 6)
          .as("bits_per_bigram"))
      .orderBy("doc_id")
  }

  /** q119 — Witten-Bell smoothed bigram LM: the q118 mixture with the
    * interpolation weight LEARNED per context instead of fixed —
    * λ(w₁) = c₁(w₁)/(c₁(w₁) + d(w₁)) where d(w₁) counts distinct
    * continuations of w₁ (Witten-Bell 1991, the "how often does this
    * context surprise me" estimate). This repairs q118's documented
    * MLE degeneracy: a singleton context now mixes half its mass back
    * to the unigram (λ = 1/2), so rare-word runs stop scoring cheap —
    * the spec asserts exactly the ordering the fixed-λ model can't
    * deliver. Same join graph as q118 plus one |vocab|-bounded
    * context-statistics aggregate; identical scale shape. */
  def wittenBellLm(spark: SparkSession, sfDir: String): DataFrame =
    wittenBellLmOn(Tables.load(spark, sfDir, "documents"))

  def wittenBellLmOn(docs: DataFrame): DataFrame =
    bigramBits(docs, wittenBell = true)

  val wittenBellLmSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), pairs AS (
       |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
       |        FROM d WHERE len(w) >= 2)
       |), toks AS (
       |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), uni AS (SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY 1),
       |t AS (SELECT SUM(c1)::DOUBLE AS t FROM uni),
       |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2),
       |ctx AS (SELECT w1, COUNT(*) AS d1 FROM bi GROUP BY 1),
       |scored AS (
       |  SELECT p.doc_id,
       |         (u1.c1::DOUBLE / (u1.c1 + ctx.d1)::DOUBLE)
       |           * (bi.c2::DOUBLE / u1.c1::DOUBLE)
       |         + (1.0 - u1.c1::DOUBLE / (u1.c1 + ctx.d1)::DOUBLE)
       |           * (u2.c1::DOUBLE / t.t) AS mix
       |  FROM pairs p
       |  JOIN bi ON p.w1 = bi.w1 AND p.w2 = bi.w2
       |  JOIN uni u1 ON u1.tok = p.w1
       |  JOIN uni u2 ON u2.tok = p.w2
       |  JOIN ctx ON ctx.w1 = p.w1, t
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |       round(-(CAST(${Exact.sum9Sql("log2(mix)")} AS DOUBLE) / 1e9)
       |             / COUNT(*), 6) AS bits_per_bigram
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val bigramLmSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), pairs AS (
       |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
       |        FROM d WHERE len(w) >= 2)
       |), toks AS (
       |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), uni AS (SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY 1),
       |t AS (SELECT SUM(c1)::DOUBLE AS t FROM uni),
       |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.doc_id,
       |         $BigramLambda * (bi.c2::DOUBLE / u1.c1::DOUBLE)
       |           + ${1 - BigramLambda} * (u2.c1::DOUBLE / t.t) AS mix
       |  FROM pairs p
       |  JOIN bi ON p.w1 = bi.w1 AND p.w2 = bi.w2
       |  JOIN uni u1 ON u1.tok = p.w1
       |  JOIN uni u2 ON u2.tok = p.w2, t
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |       round(-(CAST(${Exact.sum9Sql("log2(mix)")} AS DOUBLE) / 1e9)
       |             / COUNT(*), 6) AS bits_per_bigram
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q74 — cross-document boilerplate detection: the complement of q34
    * (which scores repetition WITHIN a doc) and q35 (contamination vs a
    * benchmark set) — here a 5-gram is boilerplate if it occurs in MORE
    * THAN ONE document (headers, footers, templated spans), and every
    * doc reports what share of its distinct 5-grams is shared. The
    * doc-count per 5-gram is a plain count because each doc contributes
    * its DISTINCT grams exactly once.
    *
    * Scale: one explode + two keyed shuffles (gram, then doc_id); the
    * gram-keyed join is the classic hot-key risk for viral spans — AQE
    * skew join covers it, and the fraction is a single integer division
    * so no FP rounding is needed. Docs shorter than 5 tokens have no
    * 5-grams and drop out on both sides. Grams shuffle as 60-bit md5
    * fingerprints (the q107 trick — bare longs, not ~30-char strings),
    * pinned once for both consumers. */
  def boilerplateNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = fiveGrams(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"),
        conv(substring(md5(col("ng")), 1, 15), 16, 10).cast("long")
          .as("ng"))
      .localCheckpoint()
    val docFreq = grams.groupBy("ng").agg(count(lit(1)).as("ndocs"))
    grams.join(docFreq, "ng")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_grams").cast("double"))
          .as("boiler_fraction"))
      .orderBy("doc_id")
  }

  val boilerplateNgramsSql: String =
    s"""WITH g0 AS (
       |  SELECT doc_id, unnest(list_distinct(
       |           [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
       |            for i in generate_series(1, len(w)-4)])) AS ng
       |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents)
       |  WHERE len(w) >= $ContamN
       |), g AS (
       |  SELECT doc_id, ('0x'||substr(md5(ng), 1, 15))::BIGINT AS ng FROM g0
       |), df AS (
       |  SELECT ng, COUNT(*) AS ndocs FROM g GROUP BY ng
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |       CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |       CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |         / COUNT(*) AS boiler_fraction
       |FROM g JOIN df USING (ng) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Span length for q107 — long enough that a shared token run is
    * verbatim duplication rather than phrasing coincidence (the
    * substring-dedup literature uses ~50 BPE tokens; 10 whitespace
    * words is the fixture-scaled analog). */
  val DupSpanK = 10

  /** q107 — duplicated-span coverage: for every document, the fraction
    * of its TOKEN POSITIONS lying inside some k-token run that appears
    * verbatim in another document. This is the substring-level dedup
    * measure (the signal that drives "remove the repeated span, keep
    * the doc" pipelines) — q74 counts how many distinct grams are
    * shared, this measures how much of the document's body those
    * shared runs actually cover: a doc with one viral 10-gram repeated
    * throughout scores near 1.0 here but low on q74's distinct-gram
    * share.
    *
    * Position coverage is the union of [s, s+k-1] intervals over
    * duplicated start positions, computed exactly by exploding each
    * surviving interval and COUNT(DISTINCT pos) per doc — the k×
    * blowup touches ONLY duplicated spans (bounded by the duplicated
    * content volume, not the corpus), and both the dedup-vs-corpus
    * semi-join and the coverage count shuffle bare (doc_id, ints).
    * Grams travel as 60-bit md5-derived fingerprints (the q59 conv
    * pattern, bit-identical in DuckDB), never as strings — the
    * doc-frequency and semi-join shuffles carry 8-byte longs instead
    * of ~6·k-char text, and a collision needs two of the corpus's
    * distinct grams to share 60 bits (≪ 1 expected below ~10⁸ grams;
    * at larger corpora widen to the full 128-bit pair like q23).
    * Scale shape: one explode over the corpus (same as q74), one
    * distinct-gram doc-frequency aggregate (AQE covers viral-gram
    * skew), one semi-join back, one per-doc count. */
  def dupSpans(spark: SparkSession, sfDir: String): DataFrame =
    dupSpansOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable docs frame (spec plants tiny corpora). */
  def dupSpansOn(docs: DataFrame): DataFrame = {
    val k = DupSpanK
    val w = split(lower(col("text")), "\\s+")
    val base = docs.select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n"))
    val grams = base.filter(col("n") >= k)
      .select(col("doc_id"),
        posexplode(word_ngrams(col("w"), k)).as(Seq("p", "ng")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("s"),
        conv(substring(md5(col("ng")), 1, 15), 16, 10).cast("long")
          .as("gh"))
      // both consumers (doc-frequency, coverage semi-join) read the
      // exploded+fingerprinted grams; pin them once — 3 bare longs per
      // gram — instead of re-running the explode+md5 per consumer
      .localCheckpoint()
    // a gram is a duplicated span iff it occurs in MORE THAN ONE doc;
    // distinct (doc, gram) first so within-doc repeats don't inflate it
    val dup = grams.select("doc_id", "gh").distinct()
      .groupBy("gh").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") > 1).select("gh")
    val covered = grams.join(dup, Seq("gh"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + (k - 1))).as("p"))
      .groupBy("doc_id").agg(countDistinct(col("p")).as("covered_tokens"))
    base.select(col("doc_id"), col("n").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_fraction"))
      .orderBy("doc_id")
  }

  val dupSpansSql: String = {
    val k = DupSpanK
    s"""WITH base AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
       |), starts AS (
       |  SELECT doc_id, w, unnest(generate_series(1, len(w)-${k - 1})) AS s
       |  FROM base WHERE len(w) >= $k
       |), g AS (
       |  SELECT doc_id, s,
       |         ('0x'||substr(md5(array_to_string(w[s:s+${k - 1}], ' ')),
       |                       1, 15))::BIGINT AS gh
       |  FROM starts
       |), dup AS (
       |  SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
       |  GROUP BY gh HAVING COUNT(*) > 1
       |), cov AS (
       |  SELECT doc_id, COUNT(DISTINCT p) AS covered
       |  FROM (SELECT g.doc_id, unnest(generate_series(s, s+${k - 1})) AS p
       |        FROM g JOIN dup USING (gh))
       |  GROUP BY doc_id
       |)
       |SELECT b.doc_id,
       |       CAST(len(b.w) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens,
       |       CAST(COALESCE(c.covered, 0) AS DOUBLE) / len(b.w) AS dup_fraction
       |FROM base b LEFT JOIN cov c USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin
  }

  /** BM25 constants (Robertson/Sparck Jones defaults) and the pinned
    * keyword query the retrieval demo scores. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Query: Seq[String] = Seq("spark", "join", "window")
  val Bm25TopK = 20

  /** q89 — BM25 keyword retrieval: score every document against the
    * pinned query, return the top-20. Extends q45's integer TF-IDF
    * ranking to the real scoring function (idf = ln(1+(N−df+0.5)/
    * (df+0.5)), tf saturation k1, length normalization b).
    *
    * Plan shape: the token explode is filtered to the query terms
    * BEFORE the (doc_id, tok) aggregation — the corpus shuffles only
    * rows mentioning a query term, which is the inverted-index access
    * pattern without materializing an index. Document lengths aggregate
    * once; corpus N and avgdl ride a 1-row broadcast (the q73 scalar
    * pattern). Final top-20 is TakeOrderedAndProject with doc_id
    * tiebreak, never a full sort. */
  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val dl = graft.Scratch.register(
      toks.groupBy("doc_id").agg(count(lit(1)).as("dl")).cache())
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val tf = toks.filter(col("tok").isin(Bm25Query: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))

    val nd = col("n_docs").cast("double")
    val avgdl = col("total_dl").cast("double") / nd
    val idf = log(lit(1.0) +
      (nd - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val termScore = idf * (tfd * lit(Bm25K1 + 1.0)) /
      (tfd + lit(Bm25K1) *
        (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl))

    tf.join(broadcast(docFreq), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), termScore.as("s"))
      .groupBy("doc_id").agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
  }

  val bm25Sql: String = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), dl AS (
       |  SELECT doc_id, COUNT(*) AS dl FROM toks
       |  WHERE length(tok) > 0 GROUP BY 1
       |), stats AS (
       |  SELECT COUNT(*)::DOUBLE AS nd,
       |         SUM(dl)::DOUBLE / COUNT(*)::DOUBLE AS avgdl
       |  FROM dl
       |), tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN ($terms) GROUP BY 1, 2
       |), dfq AS (
       |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id,
       |         SUM(ln(1.0 + (s.nd - dfq.df::DOUBLE + 0.5)
       |                       / (dfq.df::DOUBLE + 0.5))
       |             * (tf.tf::DOUBLE * ${Bm25K1 + 1.0})
       |             / (tf.tf::DOUBLE + $Bm25K1
       |                * (${1.0 - Bm25B} + $Bm25B * dl.dl::DOUBLE / s.avgdl)))
       |           AS score
       |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), stats s
       |  GROUP BY 1
       |)
       |SELECT doc_id, round(score, 6) AS bm25
       |FROM scored ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  /** Batch width for q123 — doc_id ranges stand in for ingest batches
    * (the fixture has no ingest timestamp; any monotone batch key
    * works the same way in production). */
  val GrowthBatchDocs = 50L

  /** q123 — vocabulary growth curve (the Heaps'-law saturation check):
    * for each ingest batch, how many NEVER-SEEN-BEFORE token types it
    * contributed and the cumulative vocabulary size after it — the
    * curve a curator reads to decide whether more of a source still
    * buys new language or just repeats the old (flattening curve =
    * saturated source).
    *
    * Scale shape: "first batch that saw each token" is ONE min-agg
    * keyed by token (map-side combine, no explode survives the
    * shuffle); new-type counts collapse to one row per batch; the
    * cumulative vocabulary rides the q72 two-phase prefix-sum kernel
    * over that table, so even a batch axis that grows with corpus
    * volume never funnels through one window task (no unpartitioned-
    * window exemption needed). All integers, no float policy. */
  def vocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = expr(s"doc_id div $GrowthBatchDocs")
    val firstBatch = docs.select(batch.as("batch"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(min("batch").as("batch"))
    val perBatch = firstBatch.groupBy("batch")
      .agg(count(lit(1)).as("new_types"))
    val docsPerBatch = docs.groupBy(batch.as("batch"))
      .agg(count(lit(1)).as("n_docs"))
    val joined = docsPerBatch.join(perBatch, Seq("batch"), "left")
      .select(col("batch"), col("n_docs"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    Sampling.packOffsetsBy(
        joined.withColumn("n_tokens", col("new_types")), Seq(col("batch")))
      .select(col("batch"), col("n_docs"), col("new_types"),
        (col("start_off") + col("new_types")).as("vocab_size"))
      .orderBy("batch")
  }

  val vocabGrowthSql: String =
    s"""WITH fb AS (
       |  SELECT tok, MIN(batch) AS batch FROM (
       |    SELECT doc_id // $GrowthBatchDocs AS batch,
       |           unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |    FROM documents)
       |  WHERE length(tok) > 0 GROUP BY tok
       |), pb AS (
       |  SELECT batch, COUNT(*) AS new_types FROM fb GROUP BY 1
       |), db AS (
       |  SELECT doc_id // $GrowthBatchDocs AS batch, COUNT(*) AS n_docs
       |  FROM documents GROUP BY 1
       |)
       |SELECT db.batch, CAST(db.n_docs AS BIGINT) AS n_docs,
       |       CAST(COALESCE(pb.new_types, 0) AS BIGINT) AS new_types,
       |       CAST(SUM(COALESCE(pb.new_types, 0)) OVER (ORDER BY db.batch
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS vocab_size
       |FROM db LEFT JOIN pb USING (batch)
       |ORDER BY db.batch""".stripMargin

  /** q124 — length-distribution divergence between source pairs: the
    * two-sample Kolmogorov–Smirnov statistic D = max |CDF_a − CDF_b|
    * over the document token-count support — the structural-drift
    * check that catches a source whose documents suddenly run short
    * (truncation bug) or long (concatenation bug) even when its
    * vocabulary (q113) looks unchanged.
    *
    * Scale shape: lengths collapse to a (source, n) count table; the
    * CDF windows are partitioned by source over the length support
    * (bounded by max document length — a training corpus caps it by
    * construction); the pair comparison joins the CDF grid to itself
    * keyed by support point. Determinism is total: counts are exact,
    * each CDF value is one integer division, and MAX is
    * order-independent — no float-sum policy needed, the 6-dp round
    * is cosmetic. */
  def lengthKs(spark: SparkSession, sfDir: String): DataFrame =
    lengthKsOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable (source, text) frame (spec plants
    * shifted and identical distributions). */
  def lengthKsOn(docs: DataFrame): DataFrame = {
    val lens = docs.select(col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("n"))
    val counts = lens.groupBy("source", "n").agg(count(lit(1)).as("c"))
    val support = lens.select("n").distinct()
    val totals = lens.groupBy("source").agg(count(lit(1)).as("tot"))
    val cum = totals.crossJoin(broadcast(support))
      .join(counts, Seq("source", "n"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("source").orderBy("n")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("source"), col("n"),
        (col("cum").cast("double") / col("tot").cast("double")).as("cdf"))
    cum.as("a").join(cum.as("b"),
        col("a.n") === col("b.n") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(round(max(abs(col("a.cdf") - col("b.cdf"))), 6).as("ks_d"))
      .orderBy("source_a", "source_b")
  }

  val lengthKsSql: String =
    s"""WITH lens AS (
       |  SELECT source,
       |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n
       |  FROM documents
       |), counts AS (
       |  SELECT source, n, COUNT(*) AS c FROM lens GROUP BY 1, 2
       |), support AS (SELECT DISTINCT n FROM lens),
       |totals AS (SELECT source, COUNT(*) AS tot FROM lens GROUP BY 1),
       |cum AS (
       |  SELECT source, n,
       |         SUM(COALESCE(c, 0)) OVER (PARTITION BY source ORDER BY n
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
       |           / tot AS cdf
       |  FROM (SELECT t.source, t.tot, s.n FROM totals t, support s) g
       |  LEFT JOIN counts USING (source, n)
       |)
       |SELECT a.source AS source_a, b.source AS source_b,
       |       round(MAX(abs(a.cdf - b.cdf)), 6) AS ks_d
       |FROM cum a JOIN cum b ON a.n = b.n AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gopher-style repetition/quality rule constants (Rae et al. 2021,
    * "Scaling Language Models", public). Word-count and mean-word-length
    * bounds are the published values; the stopword floor is 1 (canonical
    * 2) because this synthetic corpus tops out at one distinct hit —
    * the RULE is what matters, the constant is tunable. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStop = 1
  val GopherMinAlphaFrac = 0.8
  val GopherMaxSymRatio = 0.1

  /** q112 — the Gopher rule gate: the standard composite pre-training
    * document filter, emitted as per-rule booleans plus the final keep
    * decision so a curator can see WHICH rule rejected a document (the
    * actionable artifact — a bare keep bit hides whether the corpus is
    * failing on length or on symbol noise).
    *
    * Every rule is a single-pass builtin-function composition over the
    * text column — regexp counts, array intersect/filter HOFs — fully
    * codegen'd, zero joins, zero shuffles except the output sort. At
    * 100 TB this runs at scan speed and is embarrassingly parallel. */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame =
    gopherRulesOn(Tables.load(spark, sfDir, "documents")).orderBy("doc_id")

  /** The gate projection itself — stateless, so the SAME Column graph
    * runs batch (q112) and on a document stream (StreamJobs.gopherGate);
    * StreamJobsSpec pins the replay equal to the batch result. */
  def gopherRulesOn(docs: DataFrame, keepText: Boolean = false,
      extra: Seq[Column] = Nil): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val nWords = size(toks).cast("long")
    val nw = nWords.cast("double")
    val meanLen =
      length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nw
    val nStop = size(array_intersect(
      split(lower(col("text")), "\\s+"), typedlit(GopherStop)))
    val alphaFrac =
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nw
    val symRatio =
      regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("double") / nw
    val base = Seq(col("doc_id"), nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      nStop.cast("long").as("n_stop_distinct"),
      round(alphaFrac, 6).as("alpha_frac"),
      round(symRatio, 6).as("sym_ratio"))
    docs.select((base ++ (if (keepText) Seq(col("text")) else Nil)
        ++ extra): _*)
      .withColumn("words_ok",
        col("n_words").between(GopherMinWords, GopherMaxWords))
      .withColumn("mean_len_ok",
        col("mean_word_len").between(GopherMinMeanLen, GopherMaxMeanLen))
      .withColumn("stop_ok", col("n_stop_distinct") >= GopherMinStop)
      .withColumn("alpha_ok", col("alpha_frac") >= GopherMinAlphaFrac)
      .withColumn("sym_ok", col("sym_ratio") <= GopherMaxSymRatio)
      .withColumn("keep", col("words_ok") && col("mean_len_ok") &&
        col("stop_ok") && col("alpha_ok") && col("sym_ok"))
  }

  val gopherRulesSql: String = {
    val stops = GopherStop.map(s => s"'$s'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words,
       |    round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
       |          / len(string_split_regex(text, '\\s+')), 6) AS mean_word_len,
       |    CAST(len(list_intersect(string_split_regex(lower(text), '\\s+'),
       |                            [$stops])) AS BIGINT) AS n_stop_distinct,
       |    round(len(list_filter(string_split_regex(text, '\\s+'),
       |                          w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
       |          / len(string_split_regex(text, '\\s+')), 6) AS alpha_frac,
       |    round(len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE
       |          / len(string_split_regex(text, '\\s+')), 6) AS sym_ratio
       |  FROM documents
       |)
       |SELECT doc_id, n_words, mean_word_len, n_stop_distinct, alpha_frac,
       |       sym_ratio,
       |       n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS words_ok,
       |       mean_word_len BETWEEN $GopherMinMeanLen AND $GopherMaxMeanLen AS mean_len_ok,
       |       n_stop_distinct >= $GopherMinStop AS stop_ok,
       |       alpha_frac >= $GopherMinAlphaFrac AS alpha_ok,
       |       sym_ratio <= $GopherMaxSymRatio AS sym_ok,
       |       (n_words BETWEEN $GopherMinWords AND $GopherMaxWords)
       |         AND (mean_word_len BETWEEN $GopherMinMeanLen AND $GopherMaxMeanLen)
       |         AND n_stop_distinct >= $GopherMinStop
       |         AND alpha_frac >= $GopherMinAlphaFrac
       |         AND sym_ratio <= $GopherMaxSymRatio AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Vocabulary size for q113's drift comparison — constant-bounded, so
    * the grid below is |sources| × 200, never corpus-sized. */
  val DriftVocab = 200

  /** q113 — per-source unigram KL drift: D_KL(source ‖ corpus) over the
    * corpus top-[[DriftVocab]] vocabulary with add-one smoothing — the
    * distribution-shift monitor a curator runs per crawl/source to catch
    * a feed whose content drifted from the corpus mix (q86 tests lang ×
    * source INDEPENDENCE on counts; this measures CONTENT divergence on
    * the token distribution itself).
    *
    * Scale shape: one token-explode pass into a (tok) count, a top-V
    * TakeOrdered (V constant), a broadcast semi-join to keep only vocab
    * tokens in the per-source counts, and a |sources|×V smoothing grid
    * from a broadcast nested-loop whose build side is the CONSTANT
    * 200-row vocab — the q56/q73 bounded-broadcast shape, pinned in
    * PlanSpec. The KL sum rides a 200-term-per-source agg and rounds to
    * 6 dp (same float policy as q70's entropy). */
  def sourceDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokensBySource(Tables.load(spark, sfDir, "documents"))
    val (vocab, gt, vocabN) = driftVocab(toks)
    driftKl(toks, vocab, gt, vocabN)
  }

  /** (source, tok) stream used by both the drift model build and the
    * scoring side. */
  def tokensBySource(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** The drift reference model: the top-[[DriftVocab]] vocabulary with
    * corpus counts, plus its two bounded driver anchors — the vocab
    * token total and the ACTUAL vocab size (smoothing must divide by
    * |vocab|, not the cap, or p stops summing to 1 when the corpus has
    * < V types and KL goes negative). */
  def driftVocab(toks: DataFrame): (DataFrame, Long, Long) = {
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cg"))
      .orderBy(col("cg").desc, col("tok")).limit(DriftVocab)
    val anchor = vocab.agg(sum("cg"), count(lit(1))).first()
    (vocab, anchor.getLong(0), anchor.getLong(1))
  }

  /** Score a (source, tok) frame against a drift reference model — the
    * same kernel serves batch q113 (model == scored corpus) and the
    * streaming monitor (model == static reference, scored per batch). */
  def driftKl(toks: DataFrame, vocab: DataFrame, gt: Long,
      vocabN: Long): DataFrame = {
    val sv = toks.join(broadcast(vocab.select("tok")), "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val st = sv.groupBy("source").agg(sum("cs").as("ns"))
    val v = lit(vocabN.toDouble)
    val p = (coalesce(col("cs"), lit(0L)).cast("double") + 1.0) /
      (col("ns").cast("double") + v)
    val q = (col("cg").cast("double") + 1.0) / (lit(gt.toDouble) + v)
    st.crossJoin(broadcast(vocab))
      .join(sv, Seq("source", "tok"), "left")
      .select(col("source"), col("ns"), (p * log(p / q)).as("term"))
      .groupBy("source", "ns")
      .agg(round(sum("term"), 6).as("kl_divergence"))
      .select(col("source"), col("ns").as("vocab_tokens"),
        col("kl_divergence"))
      .orderBy("source")
  }

  val sourceDriftSql: String =
    s"""WITH toks AS (
       |  SELECT source, tok FROM (
       |    SELECT source,
       |           unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |    FROM documents) WHERE length(tok) > 0
       |), vocab AS (
       |  SELECT tok, COUNT(*) AS cg FROM toks GROUP BY 1
       |  ORDER BY cg DESC, tok LIMIT $DriftVocab
       |), n AS (SELECT SUM(cg)::DOUBLE AS gt, COUNT(*)::DOUBLE AS vn
       |         FROM vocab),
       |sv AS (
       |  SELECT source, t.tok, COUNT(*) AS cs
       |  FROM toks t JOIN vocab v ON t.tok = v.tok GROUP BY 1, 2
       |), st AS (SELECT source, SUM(cs) AS ns FROM sv GROUP BY 1),
       |grid AS (
       |  SELECT st.source, st.ns, v.tok, v.cg FROM st, vocab v
       |), j AS (
       |  SELECT g.source, g.ns, g.cg, COALESCE(sv.cs, 0) AS cs
       |  FROM grid g LEFT JOIN sv ON sv.source = g.source AND sv.tok = g.tok
       |)
       |SELECT source, CAST(ns AS BIGINT) AS vocab_tokens,
       |       round(SUM(((cs::DOUBLE + 1.0) / (ns::DOUBLE + vn))
       |         * ln(((cs::DOUBLE + 1.0) / (ns::DOUBLE + vn))
       |               / ((cg::DOUBLE + 1.0) / (gt + vn)))), 6)
       |         AS kl_divergence
       |FROM j, n GROUP BY source, ns ORDER BY source""".stripMargin

  /** Segment width for q126 — the fixture has no newline structure, so
    * "lines" are non-overlapping 8-token windows: long enough that a
    * repeated segment is templated text, short enough to localize it. */
  val ScrubSegTokens = 8

  /** q126 — duplicated-segment scrub, the CCNet/RefinedWeb paragraph
    * dedup step (Wenzek et al. dedup normalized paragraphs across the
    * whole crawl; reference surface: the §7.5 cleaning family): cut
    * every document into non-overlapping [[ScrubSegTokens]]-token
    * segments, drop each segment whose content hash occurs in MORE
    * THAN ONE document (headers, footers, templated spans), and
    * reconstitute the cleaned text from the survivors in order. Unlike
    * q74 (which only MEASURES the shared-gram share) this emits the
    * scrubbed corpus itself plus per-doc removal counts.
    *
    * Scale shape: one explode over the corpus, a doc-frequency
    * aggregate keyed by the segment hash (map-side combine; AQE covers
    * a viral-segment hot key), one join back, and a per-doc reduce —
    * all shuffles carry (doc_id, idx, 8-byte hash) rows, with segment
    * TEXT carried only on the exploded side that reconstitutes. The
    * segment travels as a 60-bit md5 fingerprint (the q107 trick:
    * bare longs, not strings; collisions need two of the corpus's
    * distinct segments to share 60 bits — widen to the 128-bit pair at
    * ≫10⁸ segments). The exploded frame is pinned once for its two
    * consumers (doc-frequency, reconstruction). Rebuild order rides
    * `array_sort` on (idx, seg) structs per doc — no global sort. */
  def segmentScrub(spark: SparkSession, sfDir: String): DataFrame =
    segmentScrubOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable docs frame (spec plants tiny corpora). */
  def segmentScrubOn(docs: DataFrame): DataFrame = {
    val k = ScrubSegTokens
    val w = split(lower(col("text")), "\\s+")
    val segs = docs
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        ceil(size(col("w")) / lit(k.toDouble)).cast("int").as("nseg"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nseg") - 1),
          i => concat_ws(" ", slice(col("w"), i * k + 1, lit(k)))))
          .as(Seq("idx", "seg")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("seg"),
        conv(substring(md5(col("seg")), 1, 15), 16, 10).cast("long")
          .as("sh"))
      .localCheckpoint()
    val docFreq = segs.groupBy("sh")
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    segs.join(docFreq, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("ndocs") === 1, struct(col("idx"), col("seg"))))),
            s => s.getField("seg"))).as("clean_text"))
      .orderBy("doc_id")
  }

  val segmentScrubSql: String = {
    val k = ScrubSegTokens
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(0,
       |           CAST(ceil(len(w) / $k.0) AS BIGINT) - 1)) AS idx
       |  FROM t
       |), segs AS (
       |  SELECT doc_id, idx,
       |         array_to_string(w[(idx*$k+1):(idx*$k+$k)], ' ') AS seg
       |  FROM s
       |), h AS (
       |  SELECT doc_id, idx, seg,
       |         ('0x'||substr(md5(seg), 1, 15))::BIGINT AS sh
       |  FROM segs
       |), df AS (
       |  SELECT sh, COUNT(DISTINCT doc_id) AS ndocs FROM h GROUP BY 1
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
       |       CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dropped,
       |       COALESCE(string_agg(seg, ' ' ORDER BY idx)
       |         FILTER (WHERE ndocs = 1), '') AS clean_text
       |FROM h JOIN df USING (sh)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Fit window for q128 — top-R most frequent terms per source. The
    * head of the rank-frequency curve is where Zipf is linear; R=200
    * keeps the fit stable at every fixture SF (each source's vocab is
    * far larger). */
  val ZipfTopTerms = 200

  /** q128 — Zipf slope per source: OLS fit of ln(freq) on ln(rank)
    * over each source's top-[[ZipfTopTerms]] terms. A corpus-health
    * probe the q123 Heaps curve doesn't give: natural text sits near
    * slope −1; templated/synthetic sources flatten (machine logs) or
    * steepen (boilerplate) — a per-source fingerprint for mixture
    * audits.
    *
    * Scale shape: term frequency is a map-side-combined (source, tok)
    * count; the top-R cut is a per-source rank window that plans as
    * WindowGroupLimit (each map partition forwards ≤R rows per
    * source), so the regression sees |sources|·R rows — corpus
    * metadata, not corpus volume. Moments then combine per the q93
    * shape. Float policy: x,y are ln() doubles, so sums are
    * order-sensitive in the last bits only (~1e-12 over 200 terms,
    * no cancellation: n·Σx²−(Σx)² ≈ n²·var(x) with var(x)=O(1)) —
    * the 6-dp edge round absorbs it (the q70 rule). */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame =
    zipfSlopeOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable docs frame (spec plants exact power laws). */
  def zipfSlopeOn(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source", "tok").agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("freq").desc, col("tok"))
    val pts = tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ZipfTopTerms)
      .select(col("source"),
        log(col("rk").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    // exact nano-sums (q196 doctrine): the five regression moments are
    // float folds feeding three round(6) outputs
    val m = pts.groupBy("source").agg(
        count(lit(1)).as("n_terms"),
        Exact.sum9(col("x")).as("sx9"),
        Exact.sum9(col("x") * col("x")).as("sxx9"),
        Exact.sum9(col("y")).as("sy9"),
        Exact.sum9(col("y") * col("y")).as("syy9"),
        Exact.sum9(col("x") * col("y")).as("sxy9"))
      .select(col("source"), col("n_terms"),
        (col("sx9").cast("double") / 1e9).as("sx"),
        (col("sxx9").cast("double") / 1e9).as("sxx"),
        (col("sy9").cast("double") / 1e9).as("sy"),
        (col("syy9").cast("double") / 1e9).as("syy"),
        (col("sxy9").cast("double") / 1e9).as("sxy"))
    val n = col("n_terms").cast("double")
    val covn = n * col("sxy") - col("sx") * col("sy")
    val varxn = n * col("sxx") - col("sx") * col("sx")
    val varyn = n * col("syy") - col("sy") * col("sy")
    m.select(col("source"), col("n_terms"),
        round(covn / varxn, 6).as("slope"),
        round((col("sy") - (covn / varxn) * col("sx")) / n, 6)
          .as("intercept"),
        round(covn * covn / (varxn * varyn), 6).as("r2"))
      .orderBy("source")
  }

  val zipfSlopeSql: String =
    s"""WITH tf AS (
       |  SELECT source, tok, COUNT(*) AS freq FROM (
       |    SELECT source,
       |           unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |    FROM documents)
       |  WHERE length(tok) > 0 GROUP BY 1, 2
       |), r AS (
       |  SELECT source, freq, row_number() OVER (
       |           PARTITION BY source ORDER BY freq DESC, tok) AS rk
       |  FROM tf
       |), pts AS (
       |  SELECT source, ln(rk::DOUBLE) AS x, ln(freq::DOUBLE) AS y
       |  FROM r WHERE rk <= $ZipfTopTerms
       |), m AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |         ${Exact.sum9Sql("x")} AS sx9,
       |         ${Exact.sum9Sql("x*x")} AS sxx9,
       |         ${Exact.sum9Sql("y")} AS sy9,
       |         ${Exact.sum9Sql("y*y")} AS syy9,
       |         ${Exact.sum9Sql("x*y")} AS sxy9
       |  FROM pts GROUP BY 1
       |), d AS (
       |  SELECT source, n_terms, n_terms::DOUBLE AS nd,
       |         CAST(sx9 AS DOUBLE) / 1e9 AS sx,
       |         CAST(sxx9 AS DOUBLE) / 1e9 AS sxx,
       |         CAST(sy9 AS DOUBLE) / 1e9 AS sy,
       |         CAST(syy9 AS DOUBLE) / 1e9 AS syy,
       |         CAST(sxy9 AS DOUBLE) / 1e9 AS sxy
       |  FROM m
       |)
       |SELECT source, n_terms,
       |       round((nd*sxy - sx*sy) / (nd*sxx - sx*sx), 6) AS slope,
       |       round((sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx)
       |             / nd, 6) AS intercept,
       |       round((nd*sxy - sx*sy) * (nd*sxy - sx*sy)
       |             / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)), 6) AS r2
       |FROM d ORDER BY source""".stripMargin

  /** χ² feature selection: top terms per source, minimum doc support. */
  val Chi2TopK = 5
  val Chi2MinDocs = 3

  /** q139 — χ² discriminative terms per source: for every (source,
    * term) 2×2 doc-occurrence contingency table (in-source-with-term /
    * elsewhere-with-term / in-source-without / elsewhere-without),
    * rank terms by χ² = N(AD−BC)²/((A+B)(C+D)(A+C)(B+D)) and keep the
    * top 5 with ≥ 3 supporting docs — the classic feature-selection
    * statistic (Yang & Pedersen 1997) and q45's TF-IDF ranking seen
    * through a significance lens instead of a frequency one.
    *
    * Determinism: every table cell is an integer count, so χ² is one
    * identical IEEE sequence on both engines; rank ties break on the
    * term string. Scale shape: distinct (doc, source, term) pairs →
    * vocab-keyed counts with map-side combine; the per-term row
    * totals join back on term (vocab-keyed shuffle at 100 TB, never
    * corpus-keyed); source doc counts broadcast (|sources| rows); the
    * top-k window partitions by source over the already-aggregated
    * (source, term) table and plans as WindowGroupLimit. */
  def chi2Terms(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dt = docs.select(col("doc_id"), col("source"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val st = dt.groupBy("source", "tok").agg(count(lit(1)).as("a"))
    val tokTot = dt.groupBy("tok").agg(count(lit(1)).as("ab"))
    val srcTot = dt.select(col("source"), col("doc_id")).distinct()
      .groupBy("source").agg(count(lit(1)).as("ac"))
    val nTot = docs.count().toDouble
    val (a, b) = (col("a").cast("double"),
      (col("ab") - col("a")).cast("double"))
    val c = (col("ac") - col("a")).cast("double")
    val d = lit(nTot) - a - b - c
    val chi2 = lit(nTot) * (a * d - b * c) * (a * d - b * c) /
      ((a + b) * (c + d) * (a + c) * (b + d))
    val scored = st.filter(col("a") >= Chi2MinDocs)
      .join(tokTot, Seq("tok"))
      .join(broadcast(srcTot), Seq("source"))
      .select(col("source"), col("tok"), col("a"), chi2.as("chi2"))
    val w = Window.partitionBy("source")
      .orderBy(col("chi2").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Chi2TopK)
      .select(col("source"), col("rk"), col("tok"), col("a").as("n_docs"),
        round(col("chi2"), 6).as("chi2"))
      .orderBy("source", "rk")
  }

  val chi2TermsSql: String =
    s"""WITH dt AS (
       |  SELECT DISTINCT doc_id, source, tok
       |  FROM (SELECT doc_id, source,
       |               unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |        FROM documents)
       |  WHERE length(tok) > 0
       |), st AS (
       |  SELECT source, tok, COUNT(*) AS a FROM dt GROUP BY 1, 2
       |), tt AS (
       |  SELECT tok, COUNT(*) AS ab FROM dt GROUP BY 1
       |), sc AS (
       |  SELECT source, COUNT(DISTINCT doc_id) AS ac FROM dt GROUP BY 1
       |), n AS (
       |  SELECT COUNT(*)::DOUBLE AS nt FROM documents
       |), x AS (
       |  SELECT st.source, st.tok, st.a,
       |         st.a::DOUBLE AS ad, (tt.ab - st.a)::DOUBLE AS bd,
       |         (sc.ac - st.a)::DOUBLE AS cd,
       |         nt - st.a::DOUBLE - (tt.ab - st.a)::DOUBLE
       |            - (sc.ac - st.a)::DOUBLE AS dd, nt
       |  FROM st JOIN tt USING (tok) JOIN sc USING (source), n
       |  WHERE st.a >= $Chi2MinDocs
       |), r AS (
       |  SELECT source, tok, a,
       |         nt * (ad*dd - bd*cd) * (ad*dd - bd*cd)
       |           / ((ad+bd) * (cd+dd) * (ad+cd) * (bd+dd)) AS chi2,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY nt * (ad*dd - bd*cd) * (ad*dd - bd*cd)
       |             / ((ad+bd) * (cd+dd) * (ad+cd) * (bd+dd)) DESC,
       |           tok) AS rk
       |  FROM x
       |)
       |SELECT source, CAST(rk AS INT) AS rk, tok,
       |       CAST(a AS BIGINT) AS n_docs, round(chi2, 6) AS chi2
       |FROM r WHERE rk <= $Chi2TopK ORDER BY source, rk""".stripMargin

  /** q142 — CCNet-style perplexity bucketing (Wenzek et al. 2020):
    * split each source's documents into head/middle/tail tertiles of
    * the q73 unigram LM score and report each bucket's volume and
    * score envelope — the shape of the classic "keep the head, drop
    * the tail" web-corpus curation decision, as a per-source report
    * the curator reads before picking cutoffs.
    *
    * Buckets come from ntile(3) over (rounded bits, doc_id) — scores
    * round to 6dp BEFORE ranking, so the bucket boundaries are
    * engine-identical even at equal-score ties. Scale shape: the q73
    * scoring pipeline (vocab-keyed aggs + broadcast model), then ONE
    * window partitioned per source over doc-level rows, then a
    * (source, bucket) agg — nothing global, nothing quadratic. */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val tf = docs
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id", "source", "tok")
      .agg(count(lit(1)).cast("double").as("c"))
    val model = tf.groupBy("tok").agg(sum(col("c")).as("gc"))
    val total = model.agg(sum(col("gc")).as("t"))
    val scored = tf.join(broadcast(model), "tok")
      .groupBy("doc_id", "source")
      .agg(sum(col("c")).as("n"),
        // exact nano-sum (q196 doctrine): float c·log2(gc) terms
        // feeding the per-doc round(6) bits AND the ntile rank order
        Exact.sum9(col("c") * log2(col("gc"))).as("sgc9"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"),
        round(log2(col("t")) - col("sgc9").cast("double") / 1e9 / col("n"),
          6).as("bits"))
    val w = Window.partitionBy("source").orderBy(col("bits"), col("doc_id"))
    // mean over integer micro-bits: summing the 6dp-rounded scores as
    // scaled longs is order-independent, where a double sum could land
    // the mean on a half-ulp round(…,6) knife edge
    scored.withColumn("bucket", ntile(3).over(w))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(min("bits"), 6).as("min_bits"),
        round(max("bits"), 6).as("max_bits"),
        round(sum(round(col("bits") * 1e6, 0).cast("long"))
          .cast("double") / count(lit(1)).cast("double") / 1e6, 6)
          .as("mean_bits"))
      .orderBy("source", "bucket")
  }

  val ccnetBucketsSql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, source, tok, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split_regex(lower(text), '\\s+')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2, 3
      |), model AS (SELECT tok, SUM(c) AS gc FROM tf GROUP BY tok),
      |tot AS (SELECT SUM(gc) AS t FROM model),
      |scored AS (
      |  SELECT doc_id, source,
      |         round(log2(t)
      |               - CAST(${Exact.sum9Sql("c * log2(gc)")} AS DOUBLE)
      |                 / 1e9 / SUM(c), 6) AS bits
      |  FROM tf JOIN model USING (tok), tot
      |  GROUP BY doc_id, source, t
      |), b AS (
      |  SELECT source, bits,
      |         ntile(3) OVER (PARTITION BY source ORDER BY bits, doc_id)
      |           AS bucket
      |  FROM scored
      |)
      |SELECT source, CAST(bucket AS INT) AS bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       round(MIN(bits), 6) AS min_bits,
      |       round(MAX(bits), 6) AS max_bits,
      |       round(SUM(round(bits * 1e6)::BIGINT)::DOUBLE
      |             / COUNT(*)::DOUBLE / 1e6, 6) AS mean_bits
      |FROM b GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin

  /** q197 — entity-resolution fuzzy match via blocking + edit distance:
    * candidate pairs form ONLY within a block key (lang, length bucket,
    * first TWO tokens) — the standard ER blocking that turns an O(n²)
    * corpus compare into bounded within-block compares — then classic
    * Levenshtein over the 48-char lowercase prefix decides a match
    * (≤ [[ErMaxDist]], half the prefix). Both engines implement the
    * same textbook DP, so the distance is integer-exact.
    *
    * The second token joined the key in round 5: with only the first
    * token, within-block candidate growth was quadratic in block size
    * and q197 carried the suite's worst dual-SF ratio (8.5× time for
    * 10× rows). A two-token key is the textbook refinement — near-dup
    * prefixes still collide (Levenshtein ≤ 24 over a 48-char prefix
    * implies a shared prefix vocabulary), but block cardinality drops
    * by roughly the per-position vocabulary factor, so candidate
    * growth stays near-linear in corpus size.
    *
    * Scale shape: one scan to derive block keys, a self equi-join ON
    * the block key (hash join — never a cartesian; block sizes are the
    * tuning knob, and a hot block is an AQE skew-split candidate), and
    * the quadratic edit-distance kernel runs only inside surviving
    * candidate rows.
    */
  val ErMaxDist = 24

  def erBlocking(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    val b = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("lb"),
        element_at(toks, 1).as("ft"),
        coalesce(element_at(toks, 2), lit("")).as("ft2"),
        substring(lower(col("text")), 1, 48).as("p"))
    b.as("a").join(b.as("c"),
        col("a.lang") === col("c.lang") && col("a.lb") === col("c.lb") &&
          col("a.ft") === col("c.ft") && col("a.ft2") === col("c.ft2") &&
          col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"),
        col("a.lang").as("lang"), col("a.lb").as("len_bucket"),
        levenshtein(col("a.p"), col("c.p")).cast("long").as("dist"))
      .filter(col("dist") <= ErMaxDist)
      .orderBy("doc_a", "doc_b")
  }

  val erBlockingSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lang, n_chars // 100 AS lb,
       |         string_split_regex(lower(text), '\\s+')[1] AS ft,
       |         COALESCE(string_split_regex(lower(text), '\\s+')[2], '')
       |           AS ft2,
       |         substr(lower(text), 1, 48) AS p
       |  FROM documents
       |)
       |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |       a.lang AS lang, a.lb AS len_bucket,
       |       levenshtein(a.p, c.p) AS dist
       |FROM b a JOIN b c
       |  ON a.lang = c.lang AND a.lb = c.lb AND a.ft = c.ft
       | AND a.ft2 = c.ft2
       | AND a.doc_id < c.doc_id
       |WHERE levenshtein(a.p, c.p) <= $ErMaxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q223 — cross-source LM transfer matrix: train an add-one-smoothed
    * unigram LM on each source (over the corpus top-[[DriftVocab]]
    * vocabulary), evaluate every OTHER source's token stream under it,
    * and emit the S×S cross-entropy / perplexity grid — the
    * which-sources-transfer-to-which signal behind data-mixture choices
    * (DoReMi-style reweighting starts from exactly this matrix; q113's
    * KL measures each source against the corpus, this measures every
    * source against every other).
    *
    * Float policy: ce(b|a) = ln(n_a + V) − (Σ_w c_b(w)·ln(c_a(w)+1))/n_b
    * — the algebra is arranged so the only floating sum is one
    * Σ c·ln(c+1) per (a, b) cell (the q73 single-round pattern), and
    * tokens absent from the train source contribute ln(0+1) = 0, so the
    * overlap join can stay INNER and sparse. Perplexity exponentiates
    * the unrounded ce and rounds once.
    *
    * Scale shape: tokens collapse to (source, vocab-token) counts —
    * vocab is the CONSTANT top-V list, so state is ≤ S·V rows; the
    * cell sums ride one equi-join on tok (≤ S²·V rows); the S×S base
    * grid is a bounded-aggregate cross (PlanSpec-exempt, q113's bounded
    * shape). Nothing downstream of the one corpus scan is
    * corpus-proportional. */
  def lmTransfer(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokensBySource(Tables.load(spark, sfDir, "documents"))
    val (vocab, _, vocabN) = driftVocab(toks)
    // sv is the whole query's state — ≤ S·V rows. Pin it eagerly so the
    // self-join, the per-source totals, and the grid all read the pinned
    // copy: the corpus is scanned exactly twice (vocab pass + count
    // pass) instead of once per consumer.
    val sv = toks.join(broadcast(vocab.select("tok")), "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val st = sv.groupBy("source").agg(sum("c").as("n"))
    val overlap = sv
      .select(col("source").as("eval_source"), col("tok"),
        col("c").cast("double").as("cb"))
      .join(sv.select(col("source").as("train_source"), col("tok"),
        col("c").cast("double").as("ca")), Seq("tok"))
      .groupBy("eval_source", "train_source")
      // exact nano-sum (q196 doctrine): float cb·ln(ca+1) terms
      // feeding the round(6) cross-entropy grid
      .agg(Exact.sum9(col("cb") * log(col("ca") + 1.0)).as("s9"))
    val base = st
      .select(col("source").as("eval_source"), col("n").as("nb"))
      .crossJoin(broadcast(
        st.select(col("source").as("train_source"), col("n").as("na"))))
    val ce = log(col("na").cast("double") + lit(vocabN.toDouble)) -
      coalesce(col("s9").cast("double") / 1e9, lit(0.0)) /
        col("nb").cast("double")
    base.join(overlap, Seq("eval_source", "train_source"), "left")
      .select(col("train_source"), col("eval_source"),
        round(ce, 6).as("cross_entropy"),
        round(exp(ce), 4).as("perplexity"))
      .orderBy("train_source", "eval_source")
  }

  val lmTransferSql: String =
    s"""WITH toks AS (
       |  SELECT source, tok FROM (
       |    SELECT source,
       |           unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |    FROM documents) WHERE length(tok) > 0
       |), vocab AS (
       |  SELECT tok, COUNT(*) AS cg FROM toks GROUP BY 1
       |  ORDER BY cg DESC, tok LIMIT $DriftVocab
       |), vn AS (SELECT COUNT(*)::DOUBLE AS v FROM vocab),
       |sv AS (
       |  SELECT source, t.tok, COUNT(*) AS c
       |  FROM toks t JOIN vocab v ON t.tok = v.tok GROUP BY 1, 2
       |), st AS (SELECT source, SUM(c) AS n FROM sv GROUP BY 1),
       |ov AS (
       |  SELECT e.source AS eval_source, t.source AS train_source,
       |         ${Exact.sum9Sql("e.c::DOUBLE * ln(t.c::DOUBLE + 1.0)")} AS s9
       |  FROM sv e JOIN sv t ON e.tok = t.tok GROUP BY 1, 2
       |), base AS (
       |  SELECT e.source AS eval_source, e.n AS nb,
       |         t.source AS train_source, t.n AS na
       |  FROM st e CROSS JOIN st t
       |)
       |SELECT train_source, eval_source,
       |       round(ln(na::DOUBLE + vn.v)
       |             - COALESCE(CAST(ov.s9 AS DOUBLE) / 1e9, 0.0)
       |               / nb::DOUBLE, 6) AS cross_entropy,
       |       round(exp(ln(na::DOUBLE + vn.v)
       |                 - COALESCE(CAST(ov.s9 AS DOUBLE) / 1e9, 0.0)
       |                   / nb::DOUBLE), 4) AS perplexity
       |FROM base CROSS JOIN vn
       |LEFT JOIN ov USING (eval_source, train_source)
       |ORDER BY train_source, eval_source""".stripMargin

  /** q224 — classifier-vs-gate calibration: the reliability diagram of
    * q98's logistic p_keep against the q112 Gopher rule gate's verdict,
    * binned by predicted-probability decile — n, mean prediction,
    * empirical gate-pass fraction, and the per-bin calibration gap.
    * This is the audit a curation pipeline runs before replacing an
    * expensive rule gate with a cheap learned classifier at 100 TB: a
    * well-calibrated head lets you pick the score threshold that
    * reproduces the gate's acceptance rate; a badly calibrated one
    * (big gaps) means the threshold must be re-fit per corpus.
    *
    * Scale shape: both inputs are row-local single-scan projections
    * (q98 and q112 are codegen'd scans); one equi-join on doc_id and a
    * ≤10-group aggregate. The join is doc-keyed — at 100 TB both sides
    * partition identically and this is one co-partitioned shuffle. */
  /** The calibration-bin kernel under q224: ONE stateless row-local
    * projection computes BOTH the classifier score and the gate
    * verdict (no join — both are functions of the text column), then a
    * 10-group aggregate. Stateless + bounded, so the SAME Column graph
    * runs batch (q224) and as a streaming monitor
    * (StreamJobs.calibrationBins, state fixed at 10 rows);
    * StreamJobsSpec pins the replay equal to the batch bins. */
  def calibrationBinsOn(docs: DataFrame): DataFrame = {
    val g = gopherRulesOn(docs, keepText = true)
    val toks = split(lower(col("text")), "\\s+")
    val nTokens = size(toks).cast("long")
    val nChars = length(col("text")).cast("long")
    val nStop = regexp_count(lower(col("text")),
      lit(markerRegex(englishStopwords))).cast("long")
    val z = lit(LogitW0) +
      lit(LogitWLogTokens) * log(nTokens.cast("double")) +
      lit(LogitWAvgLen) * (nChars.cast("double") / nTokens.cast("double")) +
      lit(LogitWStopword) * (nStop.cast("double") / nTokens.cast("double"))
    val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    // state is ALL-INTEGER (p_keep is 6-dp, so micro-units are exact
    // longs): sums are order-independent, which is what lets the
    // streaming replay equal the batch bins bit-for-bit
    g.select(least(floor(p * 10), lit(9)).cast("int").as("bin"),
        round(p * 1e6, 0).cast("long").as("p_micro"),
        col("keep").cast("int").as("gold"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("p_micro")).as("sum_p_micro"),
        sum(col("gold")).cast("long").as("n_gate"))
  }

  def qualityCalibration(spark: SparkSession, sfDir: String): DataFrame =
    calibrationBinsOn(Tables.load(spark, sfDir, "documents"))
      .select(col("bin"), col("n_docs"),
        round(col("sum_p_micro").cast("double") / 1e6 /
          col("n_docs").cast("double"), 6).as("mean_p_keep"),
        round(col("n_gate").cast("double") / col("n_docs").cast("double"),
          6).as("gate_keep_frac"))
      .withColumn("abs_gap",
        round(abs(col("mean_p_keep") - col("gate_keep_frac")), 6))
      .orderBy("bin")

  val qualityCalibrationSql: String =
    s"""WITH s AS (SELECT doc_id, p_keep FROM ($logitQualitySql)),
       |g AS (SELECT doc_id, CASE WHEN keep THEN 1 ELSE 0 END AS gold
       |      FROM ($gopherRulesSql)),
       |b AS (
       |  SELECT LEAST(floor(p_keep * 10), 9)::INT AS bin,
       |         CAST(round(p_keep * 1e6) AS BIGINT) AS p_micro, gold
       |  FROM s JOIN g USING (doc_id)
       |), agg AS (
       |  SELECT bin, COUNT(*) AS n_docs,
       |         round(SUM(p_micro)::DOUBLE / 1e6 / COUNT(*)::DOUBLE, 6)
       |           AS mean_p_keep,
       |         round(SUM(gold)::DOUBLE / COUNT(*)::DOUBLE, 6)
       |           AS gate_keep_frac
       |  FROM b GROUP BY bin
       |)
       |SELECT bin, n_docs, mean_p_keep, gate_keep_frac,
       |       round(abs(mean_p_keep - gate_keep_frac), 6) AS abs_gap
       |FROM agg ORDER BY bin""".stripMargin

  /** q243's split-conformal level: 1 − α = [[ConformalNum]]/
    * [[ConformalDen]] (90%), kept as an integer pair so the
    * calibration rank ⌈(n+1)·(1−α)⌉ is exact integer arithmetic in
    * both engines — no 0.9 float ever multiplies a count. */
  val ConformalNum = 9L
  val ConformalDen = 10L

  /** q243 — split-conformal coverage audit of the q98 quality
    * classifier against the q112 Gopher gate (Vovk's inductive
    * conformal recipe): the md5-even half of the corpus calibrates —
    * nonconformity = |gold − p̂| in exact micro units — q̂ is the
    * ⌈(n+1)·0.9⌉-th smallest calibration score (a pure order
    * statistic, no interpolation), and the held-out half reports, per
    * source, how often the true gate label fell inside the ±q̂ band.
    * Marginal coverage ≥ 90% is guaranteed by exchangeability; the
    * PER-SOURCE breakdown is the diagnostic — a source whose coverage
    * sags below the line is where the classifier can't be trusted at
    * its stated confidence, the modern acceptance check before a
    * classifier replaces a rule gate at 100 TB.
    *
    * Determinism: scores live on the 10⁻⁶ grid as exact longs; the
    * order statistic is rank selection over that grid; the only
    * doubles are the final per-source coverage divisions, rounded at
    * the edge.
    *
    * Scale shape: two row-local scoring passes join on doc_id; the
    * calibration histogram groups by nonconformity VALUE (≤ 10⁶+1
    * rows — bounded by the score grid, never the corpus), its cumsum
    * window rides that bounded frame (the q239 bounded-axis argument,
    * PlanSpec-exempt), and q̂/n_cal ride 1-row broadcast anchors
    * (q73's scalar shape). */
  def conformalCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ext.Dedup.hash60
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val p = logitQuality(spark, sfDir).select(col("doc_id"),
      round(col("p_keep") * 1e6, 0).cast("long").as("p_micro"))
    val gold = gopherRulesOn(docs).select(col("doc_id"),
      col("keep").cast("long").as("gold"))
    val j = p.join(gold, Seq("doc_id"))
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"),
        abs(col("gold") * lit(1000000L) - col("p_micro")).as("nc"),
        (pmod(hash60(col("doc_id").cast("string")), lit(2)) === 0)
          .as("cal"))
    val calSet = j.filter(col("cal"))
    val nCal = calSet.agg(count(lit(1)).as("n_cal"))
    val wNc = Window.orderBy("nc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val hist = calSet.groupBy("nc").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wNc))
    val rank = expr(s"($ConformalNum * (n_cal + 1) + $ConformalDen - 1)" +
      s" div $ConformalDen")
    val qhat = hist.crossJoin(broadcast(nCal))
      .filter(col("cum") >= rank)
      .agg(min(col("nc")).as("qraw"))
      .select(coalesce(col("qraw"), lit(1000000L)).as("qhat_micro"))
    val anchor = nCal.crossJoin(broadcast(qhat))
    j.filter(!col("cal"))
      .crossJoin(broadcast(anchor))
      .groupBy("source", "qhat_micro", "n_cal")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nc") <= col("qhat_micro"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("source"), col("n_test"), col("n_covered"),
        round(col("n_covered").cast("double") /
          col("n_test").cast("double"), 6).as("coverage"),
        col("qhat_micro"), col("n_cal"))
      .orderBy("source")
  }

  val conformalCoverageSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, CAST(round(p_keep * 1e6) AS BIGINT) AS p_micro
       |  FROM ($logitQualitySql)
       |), g AS (
       |  SELECT doc_id, CASE WHEN keep THEN 1 ELSE 0 END AS gold
       |  FROM ($gopherRulesSql)
       |), j AS (
       |  SELECT d.source,
       |         abs(g.gold * 1000000 - s.p_micro) AS nc,
       |         ('0x'||substr(md5(CAST(s.doc_id AS VARCHAR)),1,15))::BIGINT
       |           % 2 = 0 AS cal
       |  FROM s JOIN g USING (doc_id)
       |  JOIN documents d ON d.doc_id = s.doc_id
       |), n AS (SELECT COUNT(*) AS n_cal FROM j WHERE cal),
       |r AS (
       |  SELECT nc, row_number() OVER (ORDER BY nc) AS rk
       |  FROM j WHERE cal
       |), q AS (
       |  SELECT COALESCE(MIN(nc), 1000000) AS qhat_micro
       |  FROM r, n
       |  WHERE rk >= ($ConformalNum * (n_cal + 1) + $ConformalDen - 1)
       |              // $ConformalDen
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test,
       |       CAST(SUM(CASE WHEN nc <= qhat_micro THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_covered,
       |       round(SUM(CASE WHEN nc <= qhat_micro THEN 1 ELSE 0 END)::DOUBLE
       |             / COUNT(*)::DOUBLE, 6) AS coverage,
       |       qhat_micro, CAST(n_cal AS BIGINT) AS n_cal
       |FROM j, q, n WHERE NOT cal
       |GROUP BY source, qhat_micro, n_cal
       |ORDER BY source""".stripMargin

  /** q251 — quality-filter inter-rater agreement: treat the Gopher
    * rule gate (q112) and the logistic quality head (q98) as two
    * independent "raters" labeling every document keep/drop and report,
    * per language and pooled, the 2×2 contingency table, raw agreement,
    * and chance-corrected Cohen's κ — the audit a curation team runs
    * before trusting any single filter at 100 TB (do the cheap
    * heuristic and the learned model even agree on what to discard?).
    *
    * Determinism: both keeps are per-row scalar booleans over exact
    * inputs, computed by the SAME shared expressions as the green
    * q112/q98 queries ([[gopherRulesOn]], [[logitZ]]); the contingency
    * counts fold as BIGINTs under one ROLLUP, agreement is integer-ppm
    * floor division, and κ's single division from exact integer
    * cross-products is the only floating op (edge-div class). κ's
    * N-scale products run in DECIMAL(38,0)/HUGEINT so a 10⁹-document
    * language cannot overflow. Degenerate cells (a rater constant
    * within a language ⇒ pe = 1) emit NULL κ in both engines rather
    * than a 0/0 whose NaN semantics could differ.
    *
    * Scale: ONE documents scan computes both raters row-locally (zero
    * joins); the rollup is a partial+final hash aggregate keyed by
    * lang ⊕ ALL carrying five counters per group. */
  def raterKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val scored = gopherRulesOn(docs, keepText = true, extra = Seq(col("lang")))
      .select(col("lang"), col("keep").as("keep_a"),
        (lit(1.0) / (lit(1.0) + exp(-logitZ)) >= 0.5).as("keep_b"))
    def cell(a: Boolean, b: Boolean) =
      sum(when(col("keep_a") === a && col("keep_b") === b, 1L)
        .otherwise(0L))
    val ct = scored.rollup("lang").agg(
      count(lit(1)).as("n_docs"),
      cell(true, true).as("n_both_keep"),
      cell(true, false).as("n_gopher_only"),
      cell(false, true).as("n_logit_only"),
      cell(false, false).as("n_both_drop"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val agree = col("n_both_keep") + col("n_both_drop")
    val pe = (dec(col("n_both_keep")) + dec(col("n_gopher_only"))) *
        (dec(col("n_both_keep")) + dec(col("n_logit_only"))) +
      (dec(col("n_logit_only")) + dec(col("n_both_drop"))) *
        (dec(col("n_gopher_only")) + dec(col("n_both_drop")))
    val num = dec(col("n_docs")) * dec(agree) - pe
    val den = dec(col("n_docs")) * dec(col("n_docs")) - pe
    ct.select(coalesce(col("lang"), lit("ALL")).as("lang"), col("n_docs"),
        col("n_both_keep"), col("n_gopher_only"), col("n_logit_only"),
        col("n_both_drop"),
        expr("(1000000 * (n_both_keep + n_both_drop)) div n_docs")
          .as("agree_ppm"),
        when(den === dec(lit(0)), lit(null).cast("double"))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
          .as("kappa"))
      .orderBy("lang")
  }

  val raterKappaSql: String =
    s"""WITH scored AS (
       |  SELECT d.lang, g.keep AS keep_a,
       |         (1.0 / (1.0 + exp(-($logitZSql))) >= 0.5) AS keep_b
       |  FROM ($gopherRulesSql) g JOIN documents d USING (doc_id)
       |), ct AS (
       |  SELECT COALESCE(lang, 'ALL') AS lang,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_both_keep,
       |         CAST(SUM(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_gopher_only,
       |         CAST(SUM(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_logit_only,
       |         CAST(SUM(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_both_drop
       |  FROM scored GROUP BY ROLLUP(lang)
       |  -- ROLLUP emits the pooled row with lang NULL -> 'ALL'; drop
       |  -- nothing: scored has no NULL langs (fixture invariant)
       |)
       |SELECT lang, n_docs, n_both_keep, n_gopher_only, n_logit_only,
       |       n_both_drop,
       |       (1000000 * (n_both_keep + n_both_drop)) // n_docs
       |         AS agree_ppm,
       |       CASE WHEN n_docs::HUGEINT * n_docs
       |                 - ((n_both_keep::HUGEINT + n_gopher_only)
       |                    * (n_both_keep::HUGEINT + n_logit_only)
       |                    + (n_logit_only::HUGEINT + n_both_drop)
       |                    * (n_gopher_only::HUGEINT + n_both_drop)) = 0
       |            THEN NULL
       |            ELSE round(
       |              (n_docs::HUGEINT * (n_both_keep + n_both_drop)
       |               - ((n_both_keep::HUGEINT + n_gopher_only)
       |                  * (n_both_keep::HUGEINT + n_logit_only)
       |                  + (n_logit_only::HUGEINT + n_both_drop)
       |                  * (n_gopher_only::HUGEINT + n_both_drop)))::DOUBLE
       |              / (n_docs::HUGEINT * n_docs
       |                 - ((n_both_keep::HUGEINT + n_gopher_only)
       |                    * (n_both_keep::HUGEINT + n_logit_only)
       |                    + (n_logit_only::HUGEINT + n_both_drop)
       |                    * (n_gopher_only::HUGEINT + n_both_drop)))::DOUBLE,
       |              6)
       |       END AS kappa
       |FROM ct ORDER BY lang""".stripMargin

  /** q254's repetition gate: flag when repeated trigram STARTS exceed
    * this percent of all trigram starts (integer compare — no float). */
  val AblationRepPctMax = 5

  /** q254 — filter-ablation attribution: run the four standing curation
    * filters (exact-dup non-survivor, Gopher rule gate, logistic
    * quality head, repeated-trigram gate) over one corpus scan and
    * report, per filter and pooled, what each drops, what it drops
    * UNIQUELY (no other filter agrees — the marginal contribution a
    * team weighs before paying that filter's cost at 100 TB), and the
    * token mass lost. The `any` row's unique count is "docs dropped by
    * exactly one filter" — the corpus share whose fate hangs on a
    * single gate.
    *
    * Determinism: every flag is either exact integer/string arithmetic
    * (dup = md5-group min, repeat = distinct-count compare ×100) or the
    * SAME shared IEEE scalar sequence as its green parent query
    * ([[gopherRulesOn]]'s rounded thresholds, [[logitZ]]'s σ ≥ 0.5 —
    * the q98/q251 compare); counts fold as BIGINTs and ppm shares are
    * floor divisions.
    *
    * Scale shape: one documents scan computes gopher/logit/repeat
    * row-locally (the trigram distinct-count is per-row array work,
    * never a shuffle); the dup flag is one md5-keyed window (partition
    * = text hash — the q10 shuffle); the 5-arm explode carries 3 tiny
    * columns per doc into a 5-group aggregate. */
  def filterAblation(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val flags = gopherRulesOn(docs, keepText = true)
      .select(col("doc_id"), col("n_words"), col("keep"), col("text"))
      .withColumn("w", split(lower(col("text")), "\\s+"))
      .withColumn("n_tri",
        when(size(col("w")) >= 3, (size(col("w")) - 2).cast("long"))
          .otherwise(0L))
      .withColumn("n_tri_d",
        size(array_distinct(word_ngrams(col("w"), 3))).cast("long"))
      .withColumn("f_gopher", !col("keep"))
      .withColumn("f_logit", lit(1.0) / (lit(1.0) + exp(-logitZ)) < 0.5)
      .withColumn("f_rep",
        (col("n_tri") - col("n_tri_d")) * 100 >
          col("n_tri") * AblationRepPctMax)
      .withColumn("f_dup", col("doc_id") =!=
        min("doc_id").over(Window.partitionBy(md5(col("text")))))
    val (fd, fg, fl, fr) =
      (col("f_dup"), col("f_gopher"), col("f_logit"), col("f_rep"))
    def uniq(self: Column, others: Seq[Column]) =
      others.foldLeft(self)((acc, o) => acc && !o)
    val exactlyOne =
      (fd.cast("int") + fg.cast("int") + fl.cast("int") + fr.cast("int")) === 1
    val arms = array(
      struct(lit("any").as("f"), (fd || fg || fl || fr).as("d"),
        exactlyOne.as("u")),
      struct(lit("dup").as("f"), fd.as("d"), uniq(fd, Seq(fg, fl, fr)).as("u")),
      struct(lit("gopher").as("f"), fg.as("d"),
        uniq(fg, Seq(fd, fl, fr)).as("u")),
      struct(lit("logit").as("f"), fl.as("d"),
        uniq(fl, Seq(fd, fg, fr)).as("u")),
      struct(lit("repeat").as("f"), fr.as("d"),
        uniq(fr, Seq(fd, fg, fl)).as("u")))
    flags.select(col("n_words"), explode(arms).as("a"))
      .groupBy(col("a.f").as("filter"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("a.d"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("a.u"), 1L).otherwise(0L)).as("n_unique_dropped"),
        sum(when(col("a.d"), col("n_words")).otherwise(0L))
          .as("tokens_dropped"))
      .select(col("filter"), col("n_docs"), col("n_dropped"),
        col("n_unique_dropped"), col("tokens_dropped"),
        expr("n_dropped * 1000000 div n_docs").as("drop_ppm"),
        expr("n_unique_dropped * 1000000 div n_docs").as("unique_ppm"))
      .orderBy("filter")
  }

  val filterAblationSql: String =
    s"""WITH g AS ($gopherRulesSql),
       |base AS (
       |  SELECT doc_id, text,
       |         string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), f AS (
       |  SELECT b.doc_id, g.n_words,
       |         (b.doc_id <> MIN(b.doc_id) OVER (PARTITION BY md5(b.text)))
       |           AS f_dup,
       |         NOT g.keep AS f_gopher,
       |         (1.0 / (1.0 + exp(-($logitZSql))) < 0.5) AS f_logit,
       |         CASE WHEN len(b.w) >= 3 THEN
       |           (len(b.w) - 2
       |            - len(list_distinct([b.w[i]||' '||b.w[i+1]||' '||b.w[i+2]
       |                  for i in generate_series(1, len(b.w)-2)]))) * 100
       |             > (len(b.w) - 2) * $AblationRepPctMax
       |         ELSE FALSE END AS f_rep
       |  FROM base b JOIN g USING (doc_id)
       |), arms AS (
       |  SELECT 'any' AS filter, (f_dup OR f_gopher OR f_logit OR f_rep) AS d,
       |         (f_dup::INT + f_gopher::INT + f_logit::INT + f_rep::INT) = 1
       |           AS u, n_words FROM f
       |  UNION ALL
       |  SELECT 'dup', f_dup, f_dup AND NOT f_gopher AND NOT f_logit
       |         AND NOT f_rep, n_words FROM f
       |  UNION ALL
       |  SELECT 'gopher', f_gopher, f_gopher AND NOT f_dup AND NOT f_logit
       |         AND NOT f_rep, n_words FROM f
       |  UNION ALL
       |  SELECT 'logit', f_logit, f_logit AND NOT f_dup AND NOT f_gopher
       |         AND NOT f_rep, n_words FROM f
       |  UNION ALL
       |  SELECT 'repeat', f_rep, f_rep AND NOT f_dup AND NOT f_gopher
       |         AND NOT f_logit, n_words FROM f
       |)
       |SELECT filter, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN d THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dropped,
       |       CAST(SUM(CASE WHEN u THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_unique_dropped,
       |       CAST(SUM(CASE WHEN d THEN n_words ELSE 0 END) AS BIGINT)
       |         AS tokens_dropped,
       |       CAST(SUM(CASE WHEN d THEN 1 ELSE 0 END) * 1000000
       |            // COUNT(*) AS BIGINT) AS drop_ppm,
       |       CAST(SUM(CASE WHEN u THEN 1 ELSE 0 END) * 1000000
       |            // COUNT(*) AS BIGINT) AS unique_ppm
       |FROM arms GROUP BY filter ORDER BY filter""".stripMargin

  /** q255 — marginal source novelty: scan sources in their (name-
    * ordered, standing in for crawl-priority) order and report, per
    * source, how many of its distinct bigrams are FIRST SEEN there —
    * the submodular-coverage read a curator uses to decide whether the
    * next crawl is worth ingesting (a source whose novelty_ppm rounds
    * to zero adds storage, dedup load, and no new text). Grams travel
    * as 60-bit md5 fingerprints (the q34/q107 trick).
    *
    * Scale shape: one corpus explode to distinct (source, gram), then
    * ONE gram-keyed window (min source) feeding a |sources|-group
    * aggregate — linear, one shuffle on the gram fingerprint, no
    * joins. Counts are exact BIGINTs; novelty is floor-divided ppm. */
  def sourceNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val g = docs.select(col("source"),
        split(lower(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("source"), explode(word_ngrams(col("w"), 2)).as("ng"))
      .select(col("source"),
        conv(substring(md5(col("ng")), 1, 15), 16, 10).cast("long").as("gh"))
      .distinct()
    g.withColumn("first_src", min("source").over(Window.partitionBy("gh")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_src") === col("source"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("source"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000 div n_grams").as("novelty_ppm"))
      .orderBy("source")
  }

  val sourceNoveltySql: String =
    """WITH g AS (
      |  SELECT DISTINCT source, gh FROM (
      |    SELECT source,
      |           ('0x'||substr(md5(unnest([w[i]||' '||w[i+1]
      |                 for i in generate_series(1, len(w)-1)])), 1, 15))::BIGINT
      |             AS gh
      |    FROM (SELECT source, string_split_regex(lower(text), '\s+') AS w
      |          FROM documents)
      |    WHERE len(w) >= 2)
      |), o AS (
      |  SELECT source, MIN(source) OVER (PARTITION BY gh) AS first_src
      |  FROM g
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |       CAST(SUM(CASE WHEN first_src = source THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_novel,
      |       CAST(SUM(CASE WHEN first_src = source THEN 1 ELSE 0 END)
      |            * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
      |FROM o GROUP BY source ORDER BY source""".stripMargin

  /** q256's deterministic "gold label" sample rate, per mille. */
  val PpiSamplePerMille = 250

  /** q256 — prediction-powered keep-rate estimation (PPI): estimate
    * each source's TRUE keep rate under the expensive gold labeler
    * (the logistic head, standing in for an LLM judge) by running the
    * CHEAP rule gate over the whole corpus and the gold labeler over a
    * deterministic 25% sample only — the estimator is
    * gold_on_sample + (cheap_on_full − cheap_on_sample), which stays
    * unbiased for the gold rate regardless of how wrong the cheap
    * gate is, while the full-corpus cheap term soaks up most of the
    * sampling variance. This is THE shape of modern corpus audits:
    * nobody runs the judge model over 100 TB; everybody runs regexes.
    *
    * Determinism: both raters are the shared q112/q98 kernels; the
    * sample is the md5-derived `:ppi` uniform; all five counts fold as
    * BIGINTs and every reported rate is a ppm floor division of exact
    * integers (the PPI sum/difference happens on already-floored ppm
    * terms, identically in both engines). A source with an empty
    * sample reports NULL rather than a 0/0.
    *
    * Scale shape: ONE documents scan, both raters row-local, one
    * |sources|-group aggregate — no joins, no windows. */
  def ppiKeepRate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val inS = Dedup.sampleHit(col("doc_id"), ":ppi", PpiSamplePerMille)
    val gold = lit(1.0) / (lit(1.0) + exp(-logitZ)) >= 0.5
    gopherRulesOn(docs, keepText = true, extra = Seq(col("source")))
      .select(col("source"), col("keep").as("cheap"), gold.as("gold"),
        inS.as("s"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("s"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("cheap"), 1L).otherwise(0L)).as("cheap_keep_full"),
        sum(when(col("s") && col("cheap"), 1L).otherwise(0L))
          .as("cheap_keep_sampled"),
        sum(when(col("s") && col("gold"), 1L).otherwise(0L))
          .as("gold_keep_sampled"))
      .select(col("source"), col("n_docs"), col("n_sampled"),
        col("gold_keep_sampled"), col("cheap_keep_full"),
        col("cheap_keep_sampled"),
        expr("CASE WHEN n_sampled = 0 THEN NULL" +
          " ELSE gold_keep_sampled * 1000000 div n_sampled END")
          .as("naive_ppm"),
        expr("CASE WHEN n_sampled = 0 THEN NULL" +
          " ELSE cheap_keep_full * 1000000 div n_docs" +
          " + gold_keep_sampled * 1000000 div n_sampled" +
          " - cheap_keep_sampled * 1000000 div n_sampled END")
          .as("ppi_ppm"))
      .orderBy("source")
  }

  val ppiKeepRateSql: String =
    s"""WITH g AS ($gopherRulesSql),
       |f AS (
       |  SELECT d.source, g.keep AS cheap,
       |         (1.0 / (1.0 + exp(-($logitZSql))) >= 0.5) AS gold,
       |         ${Dedup.sampleHitSql("d.doc_id::VARCHAR", ":ppi",
                    PpiSamplePerMille)} AS s
       |  FROM documents d JOIN g USING (doc_id)
       |), c AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_sampled,
       |         CAST(SUM(CASE WHEN cheap THEN 1 ELSE 0 END) AS BIGINT)
       |           AS cheap_keep_full,
       |         CAST(SUM(CASE WHEN s AND cheap THEN 1 ELSE 0 END) AS BIGINT)
       |           AS cheap_keep_sampled,
       |         CAST(SUM(CASE WHEN s AND gold THEN 1 ELSE 0 END) AS BIGINT)
       |           AS gold_keep_sampled
       |  FROM f GROUP BY source
       |)
       |SELECT source, n_docs, n_sampled, gold_keep_sampled, cheap_keep_full,
       |       cheap_keep_sampled,
       |       CASE WHEN n_sampled = 0 THEN NULL
       |            ELSE CAST(gold_keep_sampled * 1000000 // n_sampled
       |                      AS BIGINT) END AS naive_ppm,
       |       CASE WHEN n_sampled = 0 THEN NULL
       |            ELSE CAST(cheap_keep_full * 1000000 // n_docs
       |                      + gold_keep_sampled * 1000000 // n_sampled
       |                      - cheap_keep_sampled * 1000000 // n_sampled
       |                      AS BIGINT) END AS ppi_ppm
       |FROM c ORDER BY source""".stripMargin

  /** Token window for q260/q261: 32-token chunks advancing 24 tokens
    * (8-token overlap) — sized so the fixture's 10-99-token docs
    * produce 1-5 chunks each, exercising the partial-tail and
    * multi-chunk paths at every SF. */
  val ChunkToks = 32
  val ChunkStride = 24

  /** q260 — fixed-token-window document chunking: the windowing step
    * that turns variable-length documents into training/RAG chunks —
    * per document, overlapping [[ChunkToks]]-token windows every
    * [[ChunkStride]] tokens, each carrying its 60-bit content hash so
    * chunk identity is joinable downstream without re-reading text.
    * A chunk is emitted only when it EXTENDS coverage — start s = 0
    * always, and s = k·stride only while s + overlap < n — i.e.
    * n_chunks = max(1, ⌈(n − overlap)/stride⌉). The naive "while
    * s < n" rule emits a fully-redundant tail whenever a doc ends
    * inside the overlap (n mod stride ∈ 1..overlap): a 1-8-token
    * window already covered by the previous chunk, whose short hash
    * then floods q261's boilerplate counts with suffix noise (review
    * finding, round 9). The tiling identity still holds: the last
    * emitted chunk always ends exactly at token n.
    *
    * Scale shape: map-only — tokenize, one explode of ceil(n/stride)
    * indices per doc, slice + hash per row; NO shuffle anywhere but
    * the output sort. At 100 TB this is the ideal operator: it
    * parallelizes per-document with zero exchange, and the chunk
    * table partitions however the scan did. Tokenization is the
    * corpus-wide whitespace discipline (split + non-empty filter)
    * shared with q12/q156. */
  def tokenChunks(spark: SparkSession, sfDir: String): DataFrame =
    tokenChunksOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable documents frame (specs plant texts). */
  def tokenChunksOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => length(t) > 0).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("chunk_idx",
        // max(0, ...) matters: for n <= overlap the ceil is <= 0 and
        // an un-clamped sequence(0, -1) DESCENDS in Spark
        explode(sequence(lit(0L),
          greatest(lit(0L),
            expr(s"(n + ${ChunkStride - 1 - (ChunkToks - ChunkStride)})" +
              s" div $ChunkStride") - 1))))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkStride).as("start_tok"),
        least(lit(ChunkToks.toLong),
          col("n").cast("long") - col("chunk_idx") * ChunkStride)
          .as("chunk_toks"),
        Dedup.hash60(concat_ws(" ",
          slice(col("toks"),
            (col("chunk_idx") * ChunkStride + 1).cast("int"),
            lit(ChunkToks)))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** Shared CTE body: the q260 chunk table (unordered). */
  private def chunksCte: String =
    s"""base AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'),
       |                     t -> t <> '') AS toks
       |  FROM documents
       |), sized AS (
       |  SELECT doc_id, toks, len(toks) AS n FROM base WHERE len(toks) > 0
       |), cidx AS (
       |  SELECT doc_id, n, toks,
       |         unnest(generate_series(0, GREATEST(0,
       |           (n + ${ChunkStride - 1 - (ChunkToks - ChunkStride)})
       |             // $ChunkStride - 1))) AS chunk_idx
       |  FROM sized
       |), chunks AS (
       |  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |         CAST(chunk_idx * $ChunkStride AS BIGINT) AS start_tok,
       |         CAST(LEAST($ChunkToks, n - chunk_idx * $ChunkStride)
       |              AS BIGINT) AS chunk_toks,
       |         ${Dedup.hash60Sql(
              s"array_to_string(toks[chunk_idx * $ChunkStride + 1 : " +
                s"chunk_idx * $ChunkStride + $ChunkToks], ' ')")}
       |           AS chunk_hash
       |  FROM cidx
       |)""".stripMargin

  val tokenChunksSql: String =
    s"""WITH $chunksCte
       |SELECT doc_id, chunk_idx, start_tok, chunk_toks, chunk_hash
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  /** q261 — chunk-level boilerplate detector: the q260 windows that
    * occur more than once corpus-wide, with their occurrence and
    * distinct-document counts — the window-granularity complement of
    * the 5-gram boilerplate share (which scores DOCUMENTS; this names
    * the repeated WINDOWS a packing pipeline would drop or
    * deduplicate before they reach a training shard).
    *
    * Scale shape: q260's map-only chunk build, then ONE hash groupBy
    * on chunk_hash (count + distinct-doc count) and a filter to the
    * repeated tail — the same one-exchange shape as every exact-dedup
    * query in the family. */
  def chunkDedup(spark: SparkSession, sfDir: String): DataFrame =
    tokenChunksOn(Tables.load(spark, sfDir, "documents"))
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_chunks") > 1)
      .orderBy(col("n_chunks").desc, col("chunk_hash"))

  val chunkDedupSql: String =
    s"""WITH $chunksCte
       |SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM chunks GROUP BY 1 HAVING COUNT(*) > 1
       |ORDER BY n_chunks DESC, chunk_hash""".stripMargin
}
