package graft.ext

import graft.Tables
import graft.functions.WordNgrams.word_ngrams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB:
  *
  *  - exact dedup: hash-groupBy on md5(text) (one shuffle on the hash);
  *  - MinHash + LSH near-dup: 3-word shingles → K Kirsch-Mitzenmacher
  *    double-hashed minhashes off one md5 → band buckets → self-join
  *    candidates → true-Jaccard verification;
  *  - SimHash: per-token hash bit-voting into a compact signature.
  *
  * Everything is deterministic and engine-portable BY CONSTRUCTION: hashes
  * derive from md5 (identical in Spark and DuckDB), never from RNG or
  * engine-specific hash functions, so even the LSH pipeline is
  * oracle-checkable end to end.
  *
  * Scale notes: the shingle explode is the dominant cost and is a narrow
  * map; signatures aggregate with map-side combine (one shuffle keyed by
  * doc_id); the LSH self-join shuffles by (band, key) — hot buckets are
  * the classic skew risk, mitigated by AQE skew handling and by verifying
  * candidates with true Jaccard afterwards. No driver-side loops anywhere.
  */
object Dedup {

  /** The verified near-dup pair lists (q29's n-gram Jaccard edges, q11's
    * minhash/LSH pairs) are the most expensive subplans in the suite and
    * feed SIX queries (q29/q30/q62/q79/q91 and q11/q80). Each is
    * computed ONCE per (session, sfDir), pinned with an eager
    * `localCheckpoint`, and every consumer reads the pinned copy — one
    * LSH pass instead of five at any scale. The memo key includes the
    * session UUID so test sessions never cross, and the scratch caches
    * inside the build are unpersisted as soon as the checkpoint
    * materializes. Plan-shape tests pin the FRESH builders
    * ([[ngramJaccardPairsFresh]], [[minhashPairsFresh]]), which stay the
    * single source of the pipeline's physical plan. */
  // session memoization + the fresh-twin registry the plan tests pin
  // (graft.Memo). Declarations run at object init, before any use.
  graft.Memo.declare("minhash")(minhashPairsFresh)
  graft.Memo.declare("ngram")(ngramJaccardPairsFresh)
  graft.Memo.declare("docsets")(docsetsFresh)
  graft.Memo.declare("simhash")(simhashPairsFresh)

  private def memoized(spark: SparkSession, sfDir: String, kind: String)(
      build: => (DataFrame, Seq[DataFrame])): DataFrame =
    graft.Memo.memoized(spark, sfDir, kind)(build)

  /** Minhash geometry: K = Bands × RowsPerBand. */
  val K = 16
  val Bands = 4
  val RowsPerBand = 4
  val ShingleWords = 3

  /** 60-bit hash from the first 15 hex digits of md5 — portable across
    * engines and safely inside BIGINT (no ANSI overflow). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[hash60]]; package-wide so every oracle that
    * needs the 60-bit hash (SemDeDup shards, the derived partsupp)
    * interpolates ONE definition — hand-kept copies of the arithmetic
    * are how one engine drifts from the other. */
  private[graft] val hash60Sql: String => String =
    e => s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** THE deterministic per-mille sampling predicate over an id: the
    * md5-derived uniform from 12 hex chars (48 bits, positive, so plain
    * `%` agrees with DuckDB's), salted per use. Every sampled query
    * (q253's `:recall`, q256's `:ppi`) must route through this pair —
    * four hand-kept copies of the arithmetic is how one engine drifts. */
  def sampleHit(id: Column, salt: String, perMille: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 12),
      16, 10).cast("long") % 1000L < perMille

  /** DuckDB twin of [[sampleHit]]; `e` is the id expression text. */
  def sampleHitSql(e: String, salt: String, perMille: Int): String =
    s"('0x'||substr(md5($e||'$salt'),1,12))::BIGINT % 1000 < $perMille"

  /** q10 — exact dedup: one survivor (min doc_id) per identical text. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
      .select("keep_id", "copies")
      .orderBy("keep_id")

  val exactSql: String =
    """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
      |       CAST(COUNT(*) AS BIGINT) AS copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** doc_id → exploded distinct 3-word shingles. */
  def shingles(docs: DataFrame): DataFrame = {
    val t = split(lower(col("text")), "\\s+")
    docs
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= ShingleWords)
      .select(col("doc_id"),
        explode(array_distinct(word_ngrams(col("t"), ShingleWords)))
          .as("sh"))
  }

  /** Largest 32-bit prime, the modulus of the double-hash family. */
  val P32 = 4294967291L

  /** doc_id → K-column minhash signature, one scan + one doc_id shuffle
    * with map-side partial mins.
    *
    * Hash family: Kirsch-Mitzenmacher double hashing — ONE md5 per
    * shingle split into two 32-bit halves h1,h2, then h_k = (h1 + k·h2)
    * mod P32. 16× cheaper than salting md5 per slot (measured 32.7s →
    * see BENCH), overflow-free in 64-bit, and still portable to the
    * DuckDB oracle. */
  def signatures(docs: DataFrame): DataFrame =
    signaturesFromShingles(shingles(docs))

  /** Signature aggregation over an (optionally cached) shingle frame, so
    * pipelines that also need the shingles pay the explode+md5 once. */
  def signaturesFromShingles(sh: DataFrame): DataFrame = {
    val hashed = sh.select(col("doc_id"),
      conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("sh")), 9, 8), 16, 10).cast("long").as("h2"))
    val mins = (0 until K).map(k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % P32).as(s"s$k"))
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** q11 — full near-dup pipeline: LSH candidate pairs with band-collision
    * count, minhash-estimated Jaccard, and exact shingle Jaccard.
    *
    * Shingle identity for the EXACT verification is the 60-bit md5 hash
    * (same derivation in the DuckDB oracle, so any collision is identical
    * on both sides). That lets each doc's shingle set ship as one sorted
    * long array: the verification is two equi-joins on doc id + the
    * two-pointer intersect kernel instead of re-exploding candidate ×
    * shingle rows through two shuffles. The re-attach joins carry NO
    * broadcast hint on purpose: the per-doc payload frame is
    * corpus-proportional, so a forced hint would be a driver OOM at
    * 100 TB — AQE broadcasts it at runtime while it is small and
    * degrades to a shuffle join at scale (PlanSpec pins the no-hint
    * invariant). */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    verifiedMinhashPairs(spark, sfDir).orderBy("doc_a", "doc_b")

  /** Session-memoized, checkpoint-pinned q11 result (unordered). */
  def verifiedMinhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    memoized(spark, sfDir, "minhash")(minhashPairsBuild(spark, sfDir))

  /** Uncached single-pass build (plan-shape tests pin THIS). */
  def minhashPairsFresh(spark: SparkSession, sfDir: String): DataFrame =
    minhashPairsBuild(spark, sfDir)._1.orderBy("doc_a", "doc_b")

  private def minhashPairsBuild(
      spark: SparkSession, sfDir: String): (DataFrame, Seq[DataFrame]) = {
    val docs = Tables.load(spark, sfDir, "documents")
    // one explode; Catalyst's subexpression elimination computes md5(sh)
    // once for the three derived columns
    // no cache: the fused aggregation below is this frame's only
    // consumer, so caching would only pay serialization for nothing
    val hashed = shingles(docs).select(col("doc_id"),
      conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("sh")), 9, 8), 16, 10).cast("long").as("h2"),
      hash60(col("sh")).as("h"))

    // ONE per-doc aggregation carries both the K-slot signature and the
    // sorted shingle-hash set (one shuffle keyed by doc_id, map-side
    // partial mins), then feeds band explosion AND both verification
    // re-attach joins — one payload frame instead of the two the split
    // sig/sets frames cost.
    val mins = (0 until K).map(k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % P32).as(s"s$k"))
    val per = hashed.groupBy("doc_id")
      .agg(mins.head, (mins.tail :+
        sort_array(collect_set(col("h"))).as("hs")): _*)
      .withColumn("n", size(col("hs")).cast("long"))
      .cache()

    val bandStructs = array((0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until RowsPerBand).map(i =>
          col(s"s${b * RowsPerBand + i}").cast("string")): _*).as("key"))
    }: _*)
    val bands = per.select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

    val pairs = bandPairs(bands)

    // minhash-estimated jaccard: fraction of equal signature slots
    val estCol = (0 until K).map(k =>
      when(col(s"sa.s$k") === col(s"sb.s$k"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / lit(K.toDouble)

    val out = pairs
      .join(per.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(per.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared_bands"),
        estCol.as("est_jaccard"),
        graft.functions.SortedIntersectSize.sorted_intersect_size(
          col("sa.hs"), col("sb.hs")).as("shared"),
        col("sa.n").as("na"), col("sb.n").as("nb"))
      .select(col("doc_a"), col("doc_b"), col("shared_bands"), col("est_jaccard"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")).cast("double")).as("jaccard"))
    (out, Seq(per))
  }

  /** LSH candidate pairs from a (doc_id, band, key) frame — the banded
    * self-join that is the classic hot-bucket skew point of every LSH
    * pipeline. Each doc contributes exactly one key per band, so a
    * (doc_a, doc_b) pair collides at most once per band: plain count ==
    * distinct band count, without the Expand plan countDistinct would
    * cost. Hot buckets (a template flooding one band key) are handled
    * by AQE's skew-join split — DedupSpec injects a poisoned band and
    * pins that the split actually fires (`skew=true` in the final
    * plan) with the result unchanged. */
  def bandPairs(bands: DataFrame): DataFrame = bands.as("a")
    .join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
    .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    .agg(count(lit(1)).as("shared_bands"))

  /** DuckDB twin of the whole minhash pipeline, generated from the same
    * constants so geometry can never drift. */
  val minhashPairsSql: String = {
    val sigCols = (0 until K)
      .map(k => s"MIN((h1 + $k * h2) % $P32) AS s$k").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand)
        .map(i => s"s${b * RowsPerBand + i}::VARCHAR").mkString("||','||")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    val est = (0 until K)
      .map(k => s"CASE WHEN sa.s$k = sb.s$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
       |), shg AS (
       |  SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
       |                 for i in generate_series(1, len(t)-2)])) AS sh
       |  FROM toks WHERE len(t) >= $ShingleWords
       |), hashed AS (
       |  SELECT doc_id,
       |         ('0x'||substr(md5(sh),1,8))::BIGINT AS h1,
       |         ('0x'||substr(md5(sh),9,8))::BIGINT AS h2,
       |         ('0x'||substr(md5(sh),1,15))::BIGINT AS h
       |  FROM shg
       |), sig AS (
       |  SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id
       |), hs AS (
       |  SELECT DISTINCT doc_id, h FROM hashed
       |), counts AS (
       |  SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY 1
       |), bands AS ($bandSelects
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(COUNT(DISTINCT a.band) AS BIGINT) AS shared_bands
       |  FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), est AS (
       |  SELECT p.doc_a, p.doc_b, p.shared_bands,
       |         CAST(($est) AS DOUBLE) / $K.0 AS est_jaccard
       |  FROM pairs p
       |  JOIN sig sa ON p.doc_a = sa.doc_id
       |  JOIN sig sb ON p.doc_b = sb.doc_id
       |), shared AS (
       |  SELECT e.doc_a, e.doc_b, COUNT(*) AS shared
       |  FROM est e
       |  JOIN hs a ON a.doc_id = e.doc_a
       |  JOIN hs b ON b.doc_id = e.doc_b AND b.h = a.h
       |  GROUP BY 1, 2
       |)
       |SELECT e.doc_a AS doc_a, e.doc_b AS doc_b, e.shared_bands, e.est_jaccard,
       |       CAST(COALESCE(s.shared, 0) AS DOUBLE) /
       |       CAST(ca.n + cb.n - COALESCE(s.shared, 0) AS DOUBLE) AS jaccard
       |FROM est e
       |LEFT JOIN shared s ON e.doc_a = s.doc_a AND e.doc_b = s.doc_b
       |JOIN counts ca ON e.doc_a = ca.doc_id
       |JOIN counts cb ON e.doc_b = cb.doc_id
       |ORDER BY e.doc_a, e.doc_b""".stripMargin
  }

  /** q12 — 16-bit SimHash from per-token bit voting (distinct tokens,
    * weight 1): compact near-dup signature, one scan + one shuffle. */
  val SimhashBits = 16

  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("th", hash60(col("tok")))
    val votes = (0 until SimhashBits).map(b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b"))
    val bits = (0 until SimhashBits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).cast("long").as("simhash"))
      .orderBy("doc_id")
  }

  /** q29 — exact n-gram (word bigram) Jaccard near-dup at threshold Tau,
    * via the AllPairs/PPJoin prefix filter (Bayardo et al., WWW'07;
    * ref workload: dedup family, ETL_DAG.py:12 faker-dup test data):
    * under a global total order of tokens, any pair with J >= τ must
    * share a token within the first |x| − ⌈τ·|x|⌉ + 1 tokens of BOTH
    * records, so the candidate join touches only prefix tokens instead
    * of every posting. At τ=0.5 that halves the inverted index, and —
    * unlike MinHash — the result is EXACT, no estimation error.
    *
    * Scale: one shuffle to rank tokens per doc (window by doc_id), a
    * prefix-token self-join (the classic hot-token skew risk — AQE skew
    * join handles it; stop-word-like tokens are rare among bigrams), and
    * an intersection count only over surviving candidates.
    *
    * The DuckDB oracle brute-forces ALL token-sharing pairs and applies
    * the same τ — so the oracle independently proves the prefix filter
    * dropped no qualifying pair. */
  val NgramWords = 2
  val Tau = 0.5

  /** doc_id → exploded distinct word bigrams. */
  def wordNgrams(docs: DataFrame): DataFrame = {
    val t = split(lower(col("text")), "\\s+")
    docs
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= NgramWords)
      .select(col("doc_id"),
        explode(array_distinct(word_ngrams(col("t"), NgramWords)))
          .as("ng"))
  }

  /** Intern tokens as dense ints ordered by ASCENDING document frequency
    * (the AllPairs canonical order, Bayardo WWW'07): rarest tokens get
    * the smallest ids, so a doc's prefix is simply the FRONT SLICE of
    * its sorted id array — and every downstream join/intersect runs on
    * ints instead of strings (356s → 104s → 17s at sf0.1/local[4]
    * across these rewrites; ~6s at local[32] with the positional
    * filter). Id assignment is a DISTRIBUTED range-partitioned sort +
    * `zipWithIndex` — no single-partition global window, so the vocab
    * ranking scales with executor count, not one task. Ids only need to
    * respect the (df, ng) total order; density is a bonus. */
  def internVocab(toks: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val sorted = toks.groupBy("ng").agg(count(lit(1)).as("df"))
      .orderBy(col("df"), col("ng")).select(col("ng"))
    val schema = StructType(Seq(StructField("ng", StringType),
      StructField("tid", IntegerType, nullable = false)))
    toks.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row(r.getString(0), (i + 1).toInt) },
      schema)
  }

  def ngramJaccardPairs(spark: SparkSession, sfDir: String): DataFrame =
    verifiedNgramPairs(spark, sfDir).orderBy("doc_a", "doc_b")

  /** Session-memoized, checkpoint-pinned q29 result (unordered) — the
    * edge list q30/q62/q79/q91 consume. */
  def verifiedNgramPairs(spark: SparkSession, sfDir: String): DataFrame =
    memoized(spark, sfDir, "ngram")(
      (pairsFromDocsets(internedDocsets(spark, sfDir)), Nil))

  /** Uncached single-pass build (plan-shape tests pin THIS). */
  def ngramJaccardPairsFresh(spark: SparkSession, sfDir: String): DataFrame =
    pairsFromDocsets(docsetsPlan(spark, sfDir)._1).orderBy("doc_a", "doc_b")

  /** Per-doc interned sorted token-set arrays (doc_id, tids, n) —
    * session-memoized and checkpoint-pinned, because BOTH the q29
    * pipeline and q37's batch-vs-corpus admission consume the same
    * frame: one explode+intern+collect instead of two. */
  def internedDocsets(spark: SparkSession, sfDir: String): DataFrame =
    memoized(spark, sfDir, "docsets")(docsetsPlan(spark, sfDir))

  /** Uncached single-pass docsets build (plan-shape tests pin THIS). */
  def docsetsFresh(spark: SparkSession, sfDir: String): DataFrame =
    docsetsPlan(spark, sfDir)._1

  private def docsetsPlan(
      spark: SparkSession, sfDir: String): (DataFrame, Seq[DataFrame]) = {
    val toks = wordNgrams(Tables.load(spark, sfDir, "documents")).cache()
    // one shuffle keyed by doc_id → per-doc sorted token-set arrays; the
    // verification joins re-attach these by doc id instead of
    // re-exploding candidate×token rows through a shuffle. The vocab
    // intern join is deliberately unhinted: the distinct-n-gram
    // dictionary grows with the corpus (Heaps' law), so AQE picks
    // broadcast while it is small and a shuffle join once it is not.
    val ds = toks.join(internVocab(toks), Seq("ng"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tid"))).as("tids"), count(lit(1)).as("n"))
    (ds, Seq(toks))
  }

  private def pairsFromDocsets(docsets: DataFrame): DataFrame = {
    // prefix length |x| - ceil(τ|x|) + 1 (any shorter could miss pairs);
    // candidate pairs = prefix-token collision + two PPJoin prunes:
    //  - length filter: J >= τ forces τ·|x| <= |y| <= |x|/τ;
    //  - positional filter: a collision at (1-based) positions (i, j) of
    //    the sorted arrays bounds the overlap by 1 + min(na-i, nb-j),
    //    which must reach α = ⌈(na+nb)·τ/(1+τ)⌉ (the overlap J >= τ
    //    implies). Safe because the FIRST shared token of a qualifying
    //    pair sits in both prefixes at the smallest positions, where the
    //    bound is loosest. The 1e-9 slack keeps FP rounding from ever
    //    inflating α (an α one too low only admits an extra candidate).
    val prefix = docsets.select(col("doc_id"), col("n"),
        posexplode(slice(col("tids"), lit(1),
          (col("n") - ceil(col("n") * Tau).cast("long") + 1).cast("int"))))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "tid")
    val alpha = ceil((col("a.n") + col("b.n")) * lit(Tau / (1.0 + Tau)) - 1e-9)
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tid") === col("b.tid") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * Tau <= col("b.n") && col("b.n") * Tau <= col("a.n") &&
          lit(1) + least(col("a.n") - (col("a.i") + 1),
            col("b.n") - (col("b.i") + 1)) >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // no broadcast hints: docsets is corpus-proportional — AQE
    // broadcasts at runtime when small, shuffles on doc id at scale
    val out = candidates
      .join(docsets.select(col("doc_id").as("doc_a"),
        col("tids").as("tids_a"), col("n").as("na")), Seq("doc_a"))
      .join(docsets.select(col("doc_id").as("doc_b"),
        col("tids").as("tids_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        // custom codegen'd two-pointer merge: array_intersect would build
        // a hash set per row — 5× slower on these sorted int sets
        graft.functions.SortedIntersectSize.sorted_intersect_size(
          col("tids_a"), col("tids_b")).as("shared"),
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= Tau)
    out
  }

  val ngramJaccardPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                 for i in generate_series(1, len(t)-1)])) AS ng
       |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents)
       |  WHERE len(t) >= $NgramWords
       |), counts AS (
       |  SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
       |), shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS s
       |  FROM toks a JOIN toks b ON a.ng = b.ng AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, CAST(s AS BIGINT) AS shared,
       |       CAST(s AS DOUBLE) / CAST(ca.n + cb.n - s AS DOUBLE) AS jaccard
       |FROM shared
       |JOIN counts ca ON doc_a = ca.doc_id
       |JOIN counts cb ON doc_b = cb.doc_id
       |WHERE CAST(s AS DOUBLE) / CAST(ca.n + cb.n - s AS DOUBLE) >= $Tau
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q37 — incremental dedup: admit a NEW batch of documents against the
    * standing corpus — the production shape of dedup at 100 TB, where
    * the daily increment is small next to the corpus and must be checked
    * against it, not just against itself. Batch membership is
    * deterministic here (doc_id % 10 == 0 ≙ the increment).
    *
    * A batch doc is rejected if (a) its exact text hash already exists
    * in the corpus (left_anti on md5), or (b) some corpus doc reaches
    * n-gram Jaccard >= Tau against it (prefix-filter candidates between
    * batch and corpus prefixes — same AllPairs machinery as q29, but
    * asymmetric: only batch×corpus pairs are generated, never
    * corpus×corpus, so the join cost scales with the increment).
    * Output: every batch doc with its rejection evidence. */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val isBatch = col("doc_id") % 10 === 0

    // exact tier: batch text-hash already present in the corpus?
    val corpusHashes = docs.filter(!isBatch).select(md5(col("text")).as("h"))
    val exactDup = docs.filter(isBatch)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpusHashes, Seq("h"), "left_semi")
      .select(col("doc_id"), lit(true).as("exact_dup"))

    // near tier: q29's interned prefix filter, restricted to batch×corpus,
    // reading the SAME session-pinned docsets frame as the q29 pipeline
    val docsets = internedDocsets(spark, sfDir)
    val prefix = docsets.select(col("doc_id"), col("n"),
      explode(slice(col("tids"), lit(1),
        (col("n") - ceil(col("n") * Tau).cast("long") + 1).cast("int"))).as("tid"))
    val alpha = ceil((col("b.n") + col("c.n")) * lit(Tau / (1.0 + Tau)) - 1e-9)
    val candidates = prefix.filter(isBatch).as("b")
      .join(prefix.filter(!isBatch).as("c"),
        col("b.tid") === col("c.tid") &&
          col("b.n") * Tau <= col("c.n") && col("c.n") * Tau <= col("b.n"))
      .select(col("b.doc_id").as("doc_id"), col("c.doc_id").as("corpus_id"))
      .distinct()
    val nearDup = candidates
      .join(docsets.select(col("doc_id"),
        col("tids").as("tb"), col("n").as("nb")), Seq("doc_id"))
      .join(docsets.select(col("doc_id").as("corpus_id"),
        col("tids").as("tc"), col("n").as("nc")), Seq("corpus_id"))
      .select(col("doc_id"), col("corpus_id"),
        graft.functions.SortedIntersectSize.sorted_intersect_size(
          col("tb"), col("tc")).as("shared"),
        col("nb"), col("nc"))
      .filter(col("shared").cast("double") /
        (col("nb") + col("nc") - col("shared")).cast("double") >= Tau)
      .groupBy("doc_id").agg(min(col("corpus_id")).as("near_dup_of"))

    docs.filter(isBatch).select(col("doc_id"))
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        col("near_dup_of"),
        (coalesce(col("exact_dup"), lit(false)) || col("near_dup_of").isNotNull)
          .as("rejected"))
      .orderBy("doc_id")
  }

  val incrementalDedupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                 for i in generate_series(1, len(t)-1)])) AS ng
       |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents)
       |  WHERE len(t) >= $NgramWords
       |), counts AS (
       |  SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
       |), near AS (
       |  SELECT p.bid AS doc_id, MIN(p.cid) AS near_dup_of FROM (
       |    SELECT tb.doc_id AS bid, tc.doc_id AS cid, COUNT(*) AS s
       |    FROM toks tb JOIN toks tc ON tb.ng = tc.ng
       |      AND tb.doc_id % 10 = 0 AND tc.doc_id % 10 != 0
       |    GROUP BY 1, 2
       |  ) p
       |  JOIN counts cb ON p.bid = cb.doc_id
       |  JOIN counts cc ON p.cid = cc.doc_id
       |  WHERE CAST(p.s AS DOUBLE) / CAST(cb.n + cc.n - p.s AS DOUBLE) >= $Tau
       |  GROUP BY 1
       |), exact AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM documents b JOIN documents c
       |    ON md5(b.text) = md5(c.text)
       |   AND b.doc_id % 10 = 0 AND c.doc_id % 10 != 0
       |)
       |SELECT d.doc_id,
       |       (e.doc_id IS NOT NULL) AS exact_dup,
       |       n.near_dup_of,
       |       (e.doc_id IS NOT NULL OR n.near_dup_of IS NOT NULL) AS rejected
       |FROM documents d
       |LEFT JOIN exact e ON e.doc_id = d.doc_id
       |LEFT JOIN near n ON n.doc_id = d.doc_id
       |WHERE d.doc_id % 10 = 0
       |ORDER BY d.doc_id""".stripMargin

  /** q30 — duplicate-cluster resolution: connected components over the
    * q29 near-dup edges, so each group of mutually-similar documents
    * collapses to one canonical survivor (the minimum doc_id reachable
    * through any chain of near-dup links — A~B, B~C puts A,B,C in ONE
    * cluster even if A,C were never directly compared).
    *
    * Spark side: alternating large-star/small-star rounds (see
    * [[connectedComponents]]) — O(log n) convergence on any shape,
    * including the pathological long-chain graphs that defeat plain
    * O(diameter) label propagation. Driver-side fixpoint with
    * localCheckpoint per round, same shape as Hierarchy.fixpoint. At
    * 100 TB the same loop holds: both phases shuffle keyed by node id.
    *
    * Oracle: DuckDB WITH RECURSIVE reachability → min reachable id —
    * an independent algorithm arriving at the same clustering. */
  val MaxPropagationRounds = 50

  /** Below this many candidate pairs the component graph is collected
    * and solved with driver-side union-find: the LSH/prefix filters
    * leave a graph orders of magnitude smaller than the corpus, and a
    * million-edge union-find runs in milliseconds where each
    * distributed propagation round costs a full join+agg+checkpoint
    * job. Above it, the O(diameter)-round distributed loop takes over
    * (a 100 TB corpus can still emit billions of candidate pairs). */
  val EdgeCollectThreshold: Long = 1L << 20

  /** Connected components over an undirected pair list, by alternating
    * LARGE-STAR / SMALL-STAR rounds (the published two-phase MapReduce
    * CC algorithm of Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14):
    *
    *  - large-star: every node connects its strictly-LARGER neighbors
    *    to the minimum of its neighborhood (incl. itself);
    *  - small-star: every node re-points its smaller neighbors (and
    *    itself) at the minimum of its smaller neighborhood.
    *
    * Both phases are one groupBy-min plus one join keyed by node id
    * (shuffle-stable), and the alternation converges in O(log n)
    * rounds on ANY graph shape — where plain hash-to-min label
    * propagation needs O(diameter) rounds, i.e. millions on the
    * chain-shaped dup graphs template drift produces (round 2 ran the
    * propagation form; DedupSpec's 2M-edge chain fixture is exactly
    * the shape that overran its round guard). Fixpoint = the edge set
    * is a stable set of stars, each rooted at its component minimum.
    *
    * Returns (id, lbl) with lbl = min reachable node id. Small graphs
    * (≤ collectThreshold pairs) short-circuit to exact driver-side
    * union-find — same labels, no per-round jobs. */
  def connectedComponents(pairs: DataFrame,
      collectThreshold: Long = EdgeCollectThreshold): DataFrame =
    connectedComponentsWithRounds(pairs, collectThreshold)._1

  /** [[connectedComponents]] plus the number of distributed rounds the
    * run took (0 for the union-find short-circuit) — the spec pins the
    * O(log n) bound with it. */
  def connectedComponentsWithRounds(pairs: DataFrame,
      collectThreshold: Long = EdgeCollectThreshold): (DataFrame, Int) = {
    val Seq(a, b) = pairs.columns.toSeq.map(col)
    if (pairs.limit((collectThreshold + 1).toInt).count() <= collectThreshold)
      return (unionFindLocal(pairs), 0)
    val nodes = pairs.select(a.as("id")).union(pairs.select(b.as("id")))
      .distinct().localCheckpoint()
    // canonicalize down-pointing (u > v), drop self-loops
    var edges = pairs.select(greatest(a, b).as("u"), least(a, b).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var round = 0
    var done = edges.isEmpty
    while (!done && round < MaxPropagationRounds) {
      // large-star over the undirected view
      val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = und.groupBy("u")
        .agg(min(least(col("v"), col("u"))).as("m"))
      val ls = und.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star over the down-pointing result
      val ssMin = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(ssMin, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      // strict fixpoint: ss ⊆ edges and same cardinality ⇒ equal sets
      done = ss.count() == edges.count() && ss.except(edges).isEmpty
      edges = ss
      round += 1
    }
    val labels = nodes
      .join(edges.select(col("u").as("id"), col("v").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
    (labels, round)
  }

  /** Exact union-find (path-halving + union-by-smaller-root) over a
    * collected pair list; labels = min node id per component, matching
    * the distributed loop bit for bit (DedupSpec pins the equality). */
  private def unionFindLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    edges.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      // union by smaller root id → the root IS the min of the component
      if (rx < ry) parent(ry) = rx else if (ry < rx) parent(rx) = ry
    }
    import spark.implicits._
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "lbl")
  }

  def clusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedNgramPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val labels = connectedComponents(pairs)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, Seq("lbl"))
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** q62 — canonical-survivor selection: the step that turns q30's
    * clusters into an actual dedup decision. Within each duplicate
    * cluster, keep the LONGEST document (n_chars desc, doc_id
    * tiebreak) — the standard "best representative" heuristic — and
    * flag the rest for removal. Pure integer comparisons, so the
    * choice is engine-exact. The per-cluster window runs over cluster
    * members only (dup clusters are small by construction); the big
    * corpus never enters the window. */
  def dedupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val cl = clusters(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id"))
    cl.join(docs, Seq("doc_id"))
      .withColumn("survivor", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("n_chars"), col("survivor"))
      .orderBy("doc_id")
  }

  /** Reachability closure over the same edge set: cluster_id = min
    * reachable doc_id (UNION, not UNION ALL, so cycles terminate). */
  val clustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    WITH toks AS (
       |      SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                     for i in generate_series(1, len(t)-1)])) AS ng
       |      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents)
       |      WHERE len(t) >= $NgramWords
       |    ), counts AS (
       |      SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
       |    ), shared AS (
       |      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS s
       |      FROM toks a JOIN toks b ON a.ng = b.ng AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2
       |    )
       |    SELECT doc_a, doc_b
       |    FROM shared
       |    JOIN counts ca ON doc_a = ca.doc_id
       |    JOIN counts cb ON doc_b = cb.doc_id
       |    WHERE CAST(s AS DOUBLE) / CAST(ca.n + cb.n - s AS DOUBLE) >= $Tau
       |  )
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |), reach(src, dst) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), comp AS (
       |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
       |), sz AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY 1
       |)
       |SELECT c.doc_id, c.cluster_id, s.cluster_size
       |FROM comp c JOIN sz s USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** Same closure, decorated with the survivor choice (see
    * [[dedupSurvivors]]): derived from clustersSql by swapping the
    * final projection so the two oracles can never drift. */
  val dedupSurvivorsSql: String = clustersSql.replace(
    """SELECT c.doc_id, c.cluster_id, s.cluster_size
      |FROM comp c JOIN sz s USING (cluster_id)
      |ORDER BY doc_id""".stripMargin,
    """SELECT l.doc_id, l.cluster_id, l.cluster_size,
      |       d.n_chars,
      |       (row_number() OVER (PARTITION BY l.cluster_id
      |          ORDER BY d.n_chars DESC, l.doc_id) = 1) AS survivor
      |FROM (SELECT c.doc_id, c.cluster_id, s.cluster_size
      |      FROM comp c JOIN sz s USING (cluster_id)) l
      |JOIN documents d USING (doc_id)
      |ORDER BY doc_id""".stripMargin)

  /** q120 — dedup-then-sample, the canonical curation endpoint: drop
    * every non-survivor of the near-dup clustering (q62's choice — keep
    * the longest doc per cluster), then draw q31's exact per-stratum
    * quota from what remains via the two-pass mega-strata kernel. This
    * is the composition a real pipeline ships — sampling BEFORE dedup
    * over-represents template families (their members fill the quota
    * with near-copies); this order makes the sample's diversity honest.
    *
    * Scale shape: the drop list is bounded by the duplicated volume
    * (cluster members only), anti-joined against the corpus; the
    * selection is the q105 two-pass kernel — no per-stratum
    * serialization, every window bounded. */
  def dedupSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dropped = dedupSurvivors(spark, sfDir)
      .filter(!col("survivor")).select("doc_id")
    val kept = docs.join(dropped, Seq("doc_id"), "left_anti")
    Sampling.twoPassRanked(kept, Seq("lang", "source"),
        t => ceil(t * Sampling.SampleFrac).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("stratum_rank"), col("stratum_size"))
      .orderBy("doc_id")
  }

  /** The oracle composes the q62 survivors CTE with q31's window SQL
    * over the anti-joined remainder — same texts, so none can drift. */
  val dedupSampleSql: String =
    s"""WITH surv AS ($dedupSurvivorsSql),
       |kept AS (
       |  SELECT d.doc_id, d.lang, d.source
       |  FROM documents d LEFT JOIN surv s ON d.doc_id = s.doc_id
       |  WHERE s.doc_id IS NULL OR s.survivor
       |), r AS (
       |  SELECT doc_id, lang, source,
       |         row_number() OVER (PARTITION BY lang, source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR(20))), doc_id) AS rk,
       |         count(*) OVER (PARTITION BY lang, source) AS cnt
       |  FROM kept)
       |SELECT doc_id, lang, source,
       |       CAST(rk AS BIGINT) AS stratum_rank,
       |       CAST(cnt AS BIGINT) AS stratum_size
       |FROM r WHERE rk <= ceil(cnt * ${Sampling.SampleFrac})
       |ORDER BY doc_id""".stripMargin

  /** q125 — train/val/test leakage audit: count verified near-dup
    * pairs whose endpoints land in DIFFERENT splits under q59's
    * hash-based assignment — the contamination check every eval
    * pipeline must pass (a val doc with a train-side near-duplicate
    * leaks the answer; random splitting guarantees some leakage, this
    * measures it). Cells where split_a = split_b are reported too:
    * within-train dup mass is the dedup workload, cross-split mass is
    * the eval hazard.
    *
    * Scale shape: rides the session-pinned verified pair list (the
    * q29 pipeline, computed once), adds two hash-derived split columns
    * (map-only — the split is a pure function of doc_id, no join back
    * to the corpus), and collapses to ≤ 9 cells. */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedNgramPairs(spark, sfDir).select("doc_a", "doc_b")
    pairs
      .select(
        least(Sampling.splitOf(col("doc_a")),
          Sampling.splitOf(col("doc_b"))).as("split_x"),
        greatest(Sampling.splitOf(col("doc_a")),
          Sampling.splitOf(col("doc_b"))).as("split_y"))
      .groupBy("split_x", "split_y")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaks", col("split_x") =!= col("split_y"))
      .orderBy("split_x", "split_y")
  }

  val splitLeakageSql: String = {
    val sa = Sampling.splitOfSql("doc_a")
    val sb = Sampling.splitOfSql("doc_b")
    s"""WITH p AS ($ngramJaccardPairsSql)
       |SELECT least($sa, $sb) AS split_x,
       |       greatest($sa, $sb) AS split_y,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |       least($sa, $sb) != greatest($sa, $sb) AS leaks
       |FROM p
       |GROUP BY 1, 2, 4 ORDER BY 1, 2""".stripMargin
  }

  /** q180 — leakage-PROOF split assignment: q125 MEASURES how many
    * near-dup pairs straddle train/val/test under the per-doc hash
    * split; this op FIXES it by assigning whole near-dup clusters as a
    * unit — every doc inherits its cluster minimum's hash split, so a
    * near-dup family can never straddle an eval boundary (singleton
    * docs hash their own id, identical to q59's assignment). The
    * output is q125's audit matrix recomputed under the cluster-aware
    * assignment: by construction it collapses to the diagonal and
    * `leaks` is false everywhere — the eval-safety property, proven by
    * the same audit that caught the hazard.
    *
    * Scale shape: rides the session-pinned verified pair list and the
    * O(log n)-round CC labels; the split is a pure hash of the cluster
    * root, attached to pair endpoints by equi-joins against the label
    * frame (bounded by dup-graph nodes, far smaller than the corpus,
    * and unhinted regardless). */
  def leakproofSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedNgramPairs(spark, sfDir).select("doc_a", "doc_b")
    val labels = connectedComponents(pairs)
    val la = labels.select(col("id").as("doc_a"), col("lbl").as("root_a"))
    val lb = labels.select(col("id").as("doc_b"), col("lbl").as("root_b"))
    pairs.join(la, Seq("doc_a")).join(lb, Seq("doc_b"))
      .select(
        least(Sampling.splitOf(col("root_a")),
          Sampling.splitOf(col("root_b"))).as("split_x"),
        greatest(Sampling.splitOf(col("root_a")),
          Sampling.splitOf(col("root_b"))).as("split_y"))
      .groupBy("split_x", "split_y")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaks", col("split_x") =!= col("split_y"))
      .orderBy("split_x", "split_y")
  }

  val leakproofSplitSql: String = {
    val sa = Sampling.splitOfSql("ca.cluster_id")
    val sb = Sampling.splitOfSql("cb.cluster_id")
    s"""WITH c AS ($clustersSql),
       |p AS ($ngramJaccardPairsSql)
       |SELECT least($sa, $sb) AS split_x,
       |       greatest($sa, $sb) AS split_y,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |       least($sa, $sb) != greatest($sa, $sb) AS leaks
       |FROM p
       |JOIN c ca ON p.doc_a = ca.doc_id
       |JOIN c cb ON p.doc_b = cb.doc_id
       |GROUP BY 1, 2, 4 ORDER BY 1, 2""".stripMargin
  }

  /** q80 — PageRank over the near-dup similarity graph (the q11 LSH
    * candidate pairs, undirected): rank the "hub" documents whose text
    * radiates through the most duplication chains — the doc a curator
    * inspects first when a template family floods the corpus. Fixed
    * [[PageRankIters]] damped iterations from a uniform start.
    *
    * Spark side: the classic distributed loop — per-iteration join of
    * edges to current ranks (both keyed by node id, shuffle-stable),
    * contribution sum with map-side combine, `localCheckpoint` per
    * round to cut lineage; same scaling story as
    * [[connectedComponents]]. Node count is one scalar count (the only
    * driver value). FP determinism (hardened round 11, q196 doctrine):
    * each iteration's neighbor sum folds round(contribution·1e12)
    * BIGINTs — contributions are ≤ 1, so the pico grid is exact in
    * int64 at any degree — because the previous "~1e-15 perturbations
    * absorbed by round(8)" argument is exactly the one q196 falsified:
    * an unordered float fold is nondeterministic WITHIN each engine,
    * and five damped iterations still land values on rounding
    * boundaries with positive probability.
    *
    * Oracle: the SAME five iterations UNROLLED as chained CTEs —
    * standard SQL forbids aggregation inside a recursive CTE, so the
    * fixed-depth unroll IS the portable formulation, generated from
    * the same constants as the Spark loop. */
  val PageRankIters = 5
  val Damping = 0.85

  def dupPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedMinhashPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count()
    // the (edges ⋈ deg) decoration is loop-INVARIANT — join it once and
    // pin it, instead of re-joining deg inside every iteration (was one
    // extra shuffle join × PageRankIters)
    val contribBase = edges.join(deg, Seq("src")).localCheckpoint()
    var pr = deg.select(col("src").as("id"), lit(1.0 / n).as("pr"))
    (1 to PageRankIters).foreach { _ =>
      val contribs = contribBase
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("pr") / col("deg")).as("c"))
        .groupBy("id")
        .agg(sum(round(col("c") * 1e12, 0).cast("long")).as("in12"))
      // NO per-iteration checkpoint: each pr_k feeds only pr_{k+1}, so
      // the five damped rounds chain into ONE query execution (the
      // final action) instead of five eager checkpoint jobs — the loop
      // was 50 driver round-trips of sub-100ms stages, almost pure
      // scheduling overhead (§1.2/§2.6; the per-round values are the
      // identical integer-grid folds, just fused into one plan). The
      // plan depth is PageRankIters·(join+agg+join) — constant-bounded,
      // far below the analyzer's comfort zone. The node spine is
      // deg's ids directly (pr's id set IS deg's at every round —
      // pr.select("id") here would clone the whole previous level's
      // subtree a second time per round, exponential in iterations).
      pr = deg.select(col("src").as("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"), (lit((1 - Damping) / n) +
          lit(Damping) *
            coalesce(col("in12").cast("double") / 1e12, lit(0.0))).as("pr"))
    }
    pr.select(col("id").as("doc_id"), round(col("pr"), 8).as("pagerank"))
      .orderBy("doc_id")
  }

  val dupPagerankSql: String = {
    val iters = (1 to PageRankIters).map { k =>
      s"""pr$k AS (
         |  SELECT d.src AS id,
         |         (1 - $Damping) / nn.n
         |           + $Damping * COALESCE(CAST(s.in12 AS DOUBLE) / 1e12,
         |                                 0) AS pr
         |  FROM deg d CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS id,
         |           CAST(SUM(CAST(round((p.pr / dg.deg) * 1e12) AS BIGINT))
         |                AS BIGINT) AS in12
         |    FROM edges e
         |    JOIN pr${k - 1} p ON e.src = p.id
         |    JOIN deg dg ON dg.src = e.src
         |    GROUP BY e.dst
         |  ) s ON s.id = d.src
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS ($minhashPairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM p
       |), deg AS (
       |  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
       |), nn AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg
       |), pr0 AS (
       |  SELECT src AS id, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn
       |),
       |$iters
       |SELECT id AS doc_id, round(pr, 8) AS pagerank
       |FROM pr$PageRankIters ORDER BY doc_id""".stripMargin
  }

  /** q79 — source×source duplication matrix: project the q29 near-dup
    * pairs onto the `source` dimension to answer the curation question
    * "which sources copy from each other" (and which self-duplicate —
    * the diagonal). Pair endpoints order as (least, greatest) so the
    * matrix is upper-triangular regardless of doc_id assignment. The
    * source decoration rides two unhinted equi-joins over the id-only
    * pair list (wide payloads never enter the candidate shuffle; AQE
    * broadcasts the projection only while it is actually small), and
    * the final matrix is at most |sources|² rows. */
  def sourceDupMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedNgramPairs(spark, sfDir).select("doc_a", "doc_b")
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("source_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("source_b")), Seq("doc_b"))
      .groupBy(least(col("source_a"), col("source_b")).as("source_x"),
        greatest(col("source_a"), col("source_b")).as("source_y"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_x", "source_y")
  }

  val sourceDupMatrixSql: String =
    s"""WITH p AS ($ngramJaccardPairsSql)
       |SELECT least(sa.source, sb.source) AS source_x,
       |       greatest(sa.source, sb.source) AS source_y,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM p
       |JOIN documents sa ON p.doc_a = sa.doc_id
       |JOIN documents sb ON p.doc_b = sb.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q115 — source-level resemblance via MinHash UNION: each source's
    * signature is the component-wise min over every shingle the source
    * emits (a minhash of the UNION of its documents' shingle sets — the
    * mergeability that makes minhash a sketch, not just a pair trick),
    * and each source pair reports the matching-component fraction, the
    * standard estimator of whole-source Jaccard. q79 counts VERIFIED
    * near-dup pairs (exact, pair-bounded); this estimates corpus-level
    * overlap from |sources|·K longs of state — the sketch a curator
    * merges across 100 TB of shards for pennies, with no pairwise doc
    * work at all.
    *
    * Scale shape: the shingle explode is the only corpus-sized step;
    * signatures collapse by (source) with map-side partial mins; the
    * pair grid is |sources|² over a broadcast of |sources| signature
    * rows (bounded metadata, the q86 marginal assumption — PlanSpec
    * exemption documented). Same md5/Kirsch-Mitzenmacher family as
    * q11, so the estimate is oracle-exact. */
  def sourceResemblance(spark: SparkSession, sfDir: String): DataFrame =
    sourceResemblanceOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable (source, text) frame (spec plants corpora). */
  def sourceResemblanceOn(docs: DataFrame): DataFrame = {
    val sigs = signaturesFromShingles(
      shingles(docs.select(col("source").as("doc_id"), col("text"))))
      .withColumnRenamed("doc_id", "source")
    val a = sigs.select(col("source").as("source_a") +:
      (0 until K).map(k => col(s"s$k").as(s"a$k")): _*)
    val b = sigs.select(col("source").as("source_b") +:
      (0 until K).map(k => col(s"s$k").as(s"b$k")): _*)
    val matches = (0 until K)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduceLeft(_ + _)
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), matches.as("n_match"))
      .withColumn("est_jaccard", col("n_match").cast("double") / K)
      .orderBy("source_a", "source_b")
  }

  val sourceResemblanceSql: String =
    s"""WITH t AS (
       |  SELECT source, string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT source, unnest(list_distinct(
       |           [w[i]||' '||w[i+1]||' '||w[i+2]
       |            for i in generate_series(1, len(w)-2)])) AS sh
       |  FROM t WHERE len(w) >= $ShingleWords
       |), h AS (
       |  SELECT source,
       |         ('0x'||substr(md5(sh), 1, 8))::BIGINT AS h1,
       |         ('0x'||substr(md5(sh), 9, 8))::BIGINT AS h2
       |  FROM sh
       |), sig AS (
       |  SELECT source, k, MIN((h1 + k * h2) % $P32) AS mv
       |  FROM h, (SELECT unnest(generate_series(0, ${K - 1})) AS k)
       |  GROUP BY 1, 2
       |)
       |SELECT a.source AS source_a, b.source AS source_b,
       |       CAST(SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_match,
       |       SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END)::DOUBLE / $K
       |         AS est_jaccard
       |FROM sig a JOIN sig b ON a.k = b.k AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val simhashSql: String = {
    val votes = (0 until SimhashBits).map(b =>
      s"SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(", ")
    val bits = (0 until SimhashBits)
      .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, ${hash60Sql("tok")} AS th FROM (
       |    SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok
       |    FROM documents)
       |  WHERE length(tok) > 0
       |), v AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM v ORDER BY doc_id""".stripMargin
  }

  /** q91 — triangle census of the verified near-dup graph (q29's
    * edges): per node, its degree, triangle count, and local clustering
    * coefficient 2·T/(deg·(deg−1)). High coefficients mean dup clusters
    * are genuine cliques (one shared template); low ones mean chains of
    * pairwise-similar drift — which changes whether q62's
    * single-survivor policy is safe or loses content.
    *
    * Standard distributed triangle enumeration: edges are kept oriented
    * (doc_a < doc_b, as q29 emits them), so each triangle x<y<z is
    * found exactly once by joining (x,y)⋈(y,z) and probing (x,z) — two
    * hash self-joins, no direction explosion. The edge list is
    * localCheckpoint'd so the three probes reuse one materialization.
    * At 100 TB-corpus dup-graph sizes the same plan shuffles on the
    * join keys; the near-dup graph is sparse (bounded degree), so the
    * wedge fan-out stays linear in edges. */
  def triangleStats(spark: SparkSession, sfDir: String): DataFrame =
    triangleStatsOn(verifiedNgramPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")), pinned = true)

  /** Triangle kernel over any oriented (doc_a < doc_b) edge list;
    * `pinned` skips the defensive checkpoint when the caller already
    * supplies a materialized frame the three probes can reuse. */
  def triangleStatsOn(edges: DataFrame, pinned: Boolean = false): DataFrame = {
    val pairs = if (pinned) edges else edges.localCheckpoint()
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val tri = pairs.as("e1")
      .join(pairs.as("e2"), col("e2.doc_a") === col("e1.doc_b"))
      .join(pairs.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") &&
          col("e3.doc_b") === col("e2.doc_b"))
      .select(col("e1.doc_a").as("x"), col("e1.doc_b").as("y"),
        col("e2.doc_b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
      .orderBy("doc_id")
  }

  val triangleStatsSql: String =
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b FROM ($ngramJaccardPairsSql)
       |), deg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
       |    SELECT doc_a AS doc_id FROM pairs
       |    UNION ALL SELECT doc_b FROM pairs)
       |  GROUP BY 1
       |), tri AS (
       |  SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
       |  FROM pairs e1
       |  JOIN pairs e2 ON e2.doc_a = e1.doc_b
       |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
       |), pern AS (
       |  SELECT v AS doc_id, COUNT(*) AS n_tri
       |  FROM (SELECT unnest([x, y, z]) AS v FROM tri)
       |  GROUP BY 1
       |)
       |SELECT d.doc_id, d.degree,
       |       CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_triangles,
       |       CASE WHEN d.degree >= 2
       |            THEN round(2.0 * COALESCE(p.n_tri, 0)::DOUBLE
       |                       / (d.degree * (d.degree - 1))::DOUBLE, 6)
       |            ELSE 0.0 END AS clustering_coeff
       |FROM deg d LEFT JOIN pern p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** q130 parameters: token k-grams hashed, then winnowed with window
    * w — every window of w consecutive gram hashes contributes its
    * minimum (rightmost on ties), giving guaranteed fingerprint density
    * in [1/w, 2/(w+1)] (Schleimer, Wilkerson, Aiken, SIGMOD 2003). */
  val WinnowGramTokens = 4
  val WinnowWindow = 4

  /** q130 — winnowing fingerprint selection, the MOSS local-sampling
    * scheme: unlike MinHash (q11, a GLOBAL per-doc sketch for set
    * resemblance), winnowing picks POSITIONED fingerprints such that
    * any shared substring of ≥ w+k−1 tokens is guaranteed to share at
    * least one selected fingerprint — the right primitive for
    * substring-level plagiarism/overlap detection (q107's span finder
    * would consume these at 100 TB instead of every gram).
    *
    * Engine-portable tie-break without argmin-over-struct: each gram's
    * (hash, position) packs into ONE exact BIGINT key
    * `h36·2²⁴ + (2²⁴−1−pos)` — window MIN of the key IS "min hash,
    * rightmost position" (36-bit hash + 24-bit position stay inside
    * 60 bits, no ANSI overflow). The fingerprint set is the DISTINCT
    * window-min per doc; hash and position unpack by integer div/mod.
    *
    * Scale shape: explode to grams, ONE per-doc ordered window (never
    * global), distinct, count — all partitioned by doc_id. Output one
    * row per doc: selection density must land in the winnowing bound,
    * which the spec pins. */
  def winnowing(spark: SparkSession, sfDir: String): DataFrame =
    winnowingOn(Tables.load(spark, sfDir, "documents"))

  /** The distinct selected (doc_id, n_grams, packed wmin) rows —
    * winnowing's output set, before the per-doc rollup. */
  private[ext] def winnowSelected(docs: DataFrame): DataFrame = {
    val (k, wWin) = (WinnowGramTokens, WinnowWindow)
    val posMod = 1L << 24
    val toks = split(lower(col("text")), "\\s+")
    val grams = docs
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), (size(col("w")) - k + 1).cast("long").as("n_grams"),
        posexplode(word_ngrams(col("w"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("n_grams"), col("pos").cast("long").as("pos"),
        conv(substring(md5(col("g")), 1, 9), 16, 10).cast("long").as("h"))
      .select(col("doc_id"), col("n_grams"), col("pos"), col("h"),
        (col("h") * posMod + (lit(posMod - 1) - col("pos"))).as("key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, wWin - 1)
    grams
      .withColumn("wmin", min(col("key")).over(w))
      .filter(col("pos") <= col("n_grams") - wWin) // full windows only
      .select(col("doc_id"), col("n_grams"), col("wmin")).distinct()
  }

  /** Test hook: a doc set's selected gram hashes (positions stripped). */
  private[ext] def winnowingFingerprints(docs: DataFrame): Set[Long] =
    winnowSelected(docs).select(shiftright(col("wmin"), 24))
      .collect().map(_.getLong(0)).toSet

  /** Core over an injectable docs frame (spec plants shared runs). */
  def winnowingOn(docs: DataFrame): DataFrame = {
    val fps = winnowSelected(docs)
    fps.groupBy("doc_id")
      .agg(max(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_fp"),
        sum(shiftright(col("wmin"), 24)).as("fp_hash_sum"))
      .select(col("doc_id"), col("n_grams"), col("n_fp"),
        round(col("n_fp").cast("double") / col("n_grams"), 6).as("density"),
        col("fp_hash_sum"))
      .orderBy("doc_id")
  }

  val winnowingSql: String = {
    val (k, wWin) = (WinnowGramTokens, WinnowWindow)
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, CAST(len(w) - $k + 1 AS BIGINT) AS n_grams,
       |         unnest(generate_series(0, len(w) - $k)) AS pos, w
       |  FROM t WHERE len(w) >= $k
       |), h AS (
       |  SELECT doc_id, n_grams, pos,
       |         ('0x'||substr(md5(
       |            array_to_string(w[(pos+1):(pos+$k)], ' ')), 1, 9))::BIGINT
       |           AS hh
       |  FROM g
       |), keyed AS (
       |  SELECT doc_id, n_grams, pos,
       |         hh * 16777216 + (16777215 - pos) AS key
       |  FROM h
       |), wm AS (
       |  SELECT doc_id, n_grams, pos,
       |         min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN CURRENT ROW AND ${wWin - 1} FOLLOWING)
       |           AS wmin
       |  FROM keyed
       |), fp AS (
       |  SELECT DISTINCT doc_id, n_grams, wmin
       |  FROM wm WHERE pos <= n_grams - $wWin
       |)
       |SELECT doc_id, MAX(n_grams) AS n_grams,
       |       CAST(COUNT(*) AS BIGINT) AS n_fp,
       |       round(COUNT(*)::DOUBLE / MAX(n_grams), 6) AS density,
       |       CAST(SUM(wmin // 16777216) AS BIGINT) AS fp_hash_sum
       |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Boundary width for q129. 3 tokens: wide enough that a tail→head
    * match is a real continuation signal on the fixture (8 pairs at
    * sf0.001/sf0.01), narrow enough to tolerate shard splitters that
    * cut mid-sentence. */
  val StitchBoundaryTokens = 3

  /** q129 — split-document stitching: find (left, right) doc pairs
    * where left's LAST [[StitchBoundaryTokens]] tokens equal right's
    * FIRST ones — the signature of a crawl/shard splitter cutting one
    * document into two (the reassembly twin of q107's substring dedup:
    * there we find spans shared ANYWHERE; here the overlap must sit
    * exactly on the document boundary, which is what makes the pair a
    * stitch candidate rather than a near-dup).
    *
    * Scale shape: each doc contributes ONE boundary row (head gram,
    * tail gram) straight off the scan — no explode. The candidate join
    * runs on [[hash60]] fingerprints of the grams (long keys shuffle,
    * not strings) and exactness is restored by comparing the gram TEXT
    * post-join, so a 60-bit collision can suggest a pair but never emit
    * one. Output is candidate-bounded: |docs| in, matched pairs out. */
  def splitStitch(spark: SparkSession, sfDir: String): DataFrame =
    splitStitchOn(Tables.load(spark, sfDir, "documents"))

  /** Core over an injectable docs frame (spec plants split documents). */
  def splitStitchOn(docs: DataFrame): DataFrame = {
    val k = StitchBoundaryTokens
    val w = split(lower(col("text")), "\\s+")
    val hb = docs.select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), 1, k)).as("head_gram"),
        concat_ws(" ", slice(col("w"), -k, k)).as("tail_gram"))
    val lefts = hb.select(col("doc_id").as("left_doc"),
      col("tail_gram"), hash60(col("tail_gram")).as("th"))
    val rights = hb.select(col("doc_id").as("right_doc"),
      col("head_gram"), hash60(col("head_gram")).as("hh"))
    lefts.join(rights,
        col("th") === col("hh") && col("left_doc") =!= col("right_doc"))
      .filter(col("tail_gram") === col("head_gram"))
      .select(col("left_doc"), col("right_doc"),
        col("tail_gram").as("boundary"))
      .orderBy("left_doc", "right_doc")
  }

  val splitStitchSql: String = {
    val k = StitchBoundaryTokens
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), hb AS (
       |  SELECT doc_id,
       |         array_to_string(w[1:$k], ' ') AS head_gram,
       |         array_to_string(w[-$k:], ' ') AS tail_gram
       |  FROM t WHERE len(w) >= $k
       |)
       |SELECT a.doc_id AS left_doc, b.doc_id AS right_doc,
       |       a.tail_gram AS boundary
       |FROM hb a JOIN hb b
       |  ON a.tail_gram = b.head_gram AND a.doc_id <> b.doc_id
       |ORDER BY left_doc, right_doc""".stripMargin
  }

  /** Containment threshold: the smaller doc's n-gram set must be 80%
    * inside the bigger one. */
  val ContainTau = 0.8

  /** q137 — asymmetric n-gram CONTAINMENT join: find (small, big) doc
    * pairs where the smaller document's bigram set sits ≥ 80% inside
    * the bigger one — quotes, excerpts, and copy-with-additions that
    * symmetric Jaccard dedup (q29, τ on the UNION) structurally
    * misses: a 50-gram doc fully quoted inside a 500-gram doc has
    * J ≈ 0.1 but containment 1.0.
    *
    * Candidate generation is the asymmetric prefix scheme: only the
    * SMALLER side's containment prefix (n − ⌈c·n⌉ + 1 rarest tokens —
    * pigeonhole: if the intersection reaches c·n_small, a shared token
    * must land in that slice) probes the FULL posting lists of docs
    * with n_big ≥ n_small. Because interned ids sort rarest-first
    * ([[internVocab]]), prefix tokens are the RARE end of the
    * vocabulary, so the probed posting lists stay short; hot common
    * tokens never enter the probe side. Verification re-checks exact
    * intersection with the codegen'd two-pointer kernel on the
    * memoized [[internedDocsets]] — shared with q29/q37, so the
    * expensive explode+intern runs once per session. The docset
    * re-attach joins are unhinted (AQE broadcasts while small,
    * shuffles on doc id at 100 TB); candidate count stays bounded by
    * prefix×posting collisions, never n². */
  def containmentPairs(spark: SparkSession, sfDir: String): DataFrame =
    containmentVerify(internedDocsets(spark, sfDir),
      containmentCandidatesExact(spark, sfDir))
      .orderBy("doc_small", "doc_big")

  /** Exact (complete-by-pigeonhole) candidate generation: the smaller
    * side's containment prefix probes the full posting lists. The
    * probe filter restricts which docs may appear as the SMALL side —
    * `lit(true)` (q137/q246) probes everything; q253 passes the
    * deterministic sample so the quadratic branch only ever runs over
    * a corpus fraction. */
  private def containmentCandidatesExact(
      spark: SparkSession, sfDir: String,
      probeFilter: Column = lit(true)): DataFrame = {
    val ds = internedDocsets(spark, sfDir)
    val c = ContainTau
    // only the PROBE (small) side samples; the posting side must stay
    // complete or sampled smalls would lose their big-side partners
    val prefix = ds.filter(probeFilter).select(col("doc_id"), col("n"),
        explode(slice(col("tids"), lit(1),
          (col("n") - ceil(col("n") * c).cast("long") + 1).cast("int")))
          .as("tid"))
    val full = ds.select(col("doc_id"), col("n"), explode(col("tids")).as("tid"))
    prefix.as("a")
      .join(full.as("b"),
        col("a.tid") === col("b.tid") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))))
      .select(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"))
      .distinct()
  }

  /** Shared exact-verification tail (q137 + q245): re-attach the
    * memoized docsets to (doc_small, doc_big) candidates, count the
    * exact intersection with the codegen'd two-pointer kernel, and
    * keep pairs at containment ≥ [[ContainTau]]. Unordered — callers
    * sort (or aggregate) as needed. */
  private def containmentVerify(ds: DataFrame, candidates: DataFrame): DataFrame = {
    val c = ContainTau
    candidates
      .join(ds.select(col("doc_id").as("doc_small"),
        col("tids").as("tids_a"), col("n").as("n_small")), Seq("doc_small"))
      .join(ds.select(col("doc_id").as("doc_big"),
        col("tids").as("tids_b"), col("n").as("n_big")), Seq("doc_big"))
      .select(col("doc_small"), col("doc_big"), col("n_small"), col("n_big"),
        graft.functions.SortedIntersectSize.sorted_intersect_size(
          col("tids_a"), col("tids_b")).as("shared"))
      .filter(col("shared").cast("double") >= lit(c) * col("n_small"))
      .select(col("doc_small"), col("doc_big"), col("shared"),
        col("n_small"), col("n_big"),
        round(col("shared").cast("double") / col("n_small").cast("double"), 6)
          .as("containment"),
        round(col("shared").cast("double") /
          (col("n_small") + col("n_big") - col("shared")).cast("double"), 6)
          .as("jaccard"))
  }

  val containmentPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                 for i in generate_series(1, len(t)-1)])) AS ng
       |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |        FROM documents)
       |  WHERE len(t) >= $NgramWords
       |), counts AS (
       |  SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
       |), shared AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS s
       |  FROM toks a JOIN toks b ON a.ng = b.ng AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT da AS doc_small, db AS doc_big, CAST(s AS BIGINT) AS shared,
       |       CAST(ca.n AS BIGINT) AS n_small, CAST(cb.n AS BIGINT) AS n_big,
       |       round(s::DOUBLE / ca.n::DOUBLE, 6) AS containment,
       |       round(s::DOUBLE / (ca.n + cb.n - s)::DOUBLE, 6) AS jaccard
       |FROM shared
       |JOIN counts ca ON da = ca.doc_id
       |JOIN counts cb ON db = cb.doc_id
       |WHERE (ca.n < cb.n OR (ca.n = cb.n AND da < db))
       |  AND s::DOUBLE >= $ContainTau * ca.n
       |ORDER BY doc_small, doc_big""".stripMargin

  /** Banded-containment geometry (q245): a band is a [[BandR]]-subset
    * of a document's globally-rarest tokens, keyed by the raw id
    * 4-tuple. AND-amplification is what makes this scale where q137's exact
    * single-token probe cannot: on a topically homogeneous corpus even
    * each doc's RAREST single bigram is hot (median df ≈ 250 at sf0.1
    * — measured, PLANS.md round 6), so any single-token posting join
    * grows quadratically; the co-occurrence count of a specific
    * 4-token COMBINATION stays near-constant, so band-match rows grow
    * ~linearly (measured 4.6k → 65k for 10× docs vs 59k → 7.2M for
    * the exact probe). */
  val BandR = 4

  /** Probe side: all 4-subsets of the smaller doc's containment-prefix
    * slice, extended by BandR−1 and capped at [[BandProbeCap]] rarest
    * tokens (C(10,4)=210 bands/doc max). */
  val BandProbeCap = 10

  /** Posting side: all 4-subsets of each doc's rarest [[BandPostCap]]
    * tokens (C(14,4)=1001 bands/doc — a CONSTANT per-doc cost, which
    * is the whole point: the index is linear in the corpus). */
  val BandPostCap = 14

  /** The C(maxIdx, 4) index 4-subsets as a literal array of structs —
    * a CONSTANT the Generate operator unrolls per doc, keeping band
    * generation inside whole-stage codegen (the first formulation
    * nested four `transform`s and paid the interpreted
    * higher-order-function path on every band — measured ~9× slower
    * at sf0.1). */
  private def comboLit(maxIdx: Int): Column = typedlit(
    for {
      i <- 1 to maxIdx; j <- i + 1 to maxIdx
      k <- j + 1 to maxIdx; l <- k + 1 to maxIdx
    } yield (i, j, k, l))

  /** (doc_id, n, t1..t4) rows: every [[BandR]]-subset of the first
    * min(cap, maxIdx) entries of the rarest-first token array. The
    * array is sliced BEFORE the explode so Generate copies ≤ maxIdx
    * ints per output row, not the whole docset. The band key is the
    * raw ascending id 4-tuple itself — four int equi-join columns
    * instead of a hash: nothing to compute per band, nothing that can
    * collide, and trivially byte-identical in DuckDB. Docs with fewer
    * than BandR tokens in the slice emit no bands (no combo's largest
    * index fits). */
  private[ext] def bandRows(ds: DataFrame, cap: Column, maxIdx: Int): DataFrame =
    // widen HERE, not at the Memo pin: subset generation is the one
    // docsets consumer whose per-row cost is heavy (up to C(14,4)=1001
    // band rows per doc, ~1-1.8s single-task stages at sf0.1 when the
    // pinned artifact is 1 partition — guide §2.5); the cheap verify /
    // prefix consumers stay at the artifact's own layout where task
    // fan-out costs more than it buys (Memo.memoized doc). No-op at
    // production scale where the artifact is already ≥ cores wide.
    Similarity.widen(ds).select(col("doc_id"), col("n"),
        slice(col("tids"), lit(1), least(cap, lit(maxIdx))).as("ts"))
      .select(col("doc_id"), col("n"), col("ts"),
        explode(comboLit(maxIdx)).as("c"))
      .filter(col("c._4") <= size(col("ts")))
      .select(col("doc_id"), col("n"),
        element_at(col("ts"), col("c._1")).as("t1"),
        element_at(col("ts"), col("c._2")).as("t2"),
        element_at(col("ts"), col("c._3")).as("t3"),
        element_at(col("ts"), col("c._4")).as("t4"))

  private[ext] def bandedContainmentCandidates(
      spark: SparkSession, sfDir: String,
      probeFilter: Column = lit(true)): DataFrame = {
    val ds = internedDocsets(spark, sfDir)
    val c = ContainTau
    val probeCap =
      (col("n") - ceil(col("n") * c).cast("long") + BandR).cast("int")
    // probe = the small side of the band join, so filtering it is
    // exactly "pairs whose doc_small is sampled" (q253); the posting
    // index stays complete
    val probe = bandRows(ds.filter(probeFilter), probeCap, BandProbeCap)
    val post = bandRows(ds, lit(BandPostCap), BandPostCap)
    // pin the band join to sort-merge (guide §3: pick the strategy
    // deliberately): both sides are exploded band tuples — small BYTES
    // (compressed int 4-tuples) but corpus-linear ROWS (up to 1001 per
    // doc), so AQE's size-based DynamicJoinSelection flips it to a
    // broadcast join whose hash-relation build serializes millions of
    // rows on one driver thread (measured +2-3s driver CPU at sf0.1
    // once the inputs were widened); at 100 TB the posting side could
    // never broadcast at all. Byte size lies about this join; row
    // count is the truth.
    probe.as("a").hint("shuffle_merge")
      .join(post.as("b"),
        col("a.t1") === col("b.t1") && col("a.t2") === col("b.t2") &&
          col("a.t3") === col("b.t3") && col("a.t4") === col("b.t4") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))))
      .select(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"))
      .distinct()
  }

  /** q245 — BANDED approximate containment: q137's semantics on a
    * candidate set generated by deterministic rarest-token bands
    * instead of the exact (complete but quadratically-growing)
    * single-token prefix probe. Verification is identical — exact
    * intersection on the memoized docsets at the same τ — so every
    * emitted pair is a TRUE containment pair (banded ⊆ exact, no false
    * positives); only recall is approximate, and q246 measures it
    * against the exact pair set (100% at both fixture SFs, minimum 5
    * of 210 possible matching bands per true pair — measured).
    *
    * Scale shape: probe ≤ C(10,4)=210 and posting ≤ C(14,4)=1001 rows
    * per doc — both CONSTANT, so the exploded band frames are linear
    * in the corpus; the band equi-join shuffles on the id 4-tuple
    * and its match-row count grew 14× for 10× docs (vs 122× for
    * q137's probe — measured, PLANS.md round 6). This is the 100 TB
    * containment path; q137 stays as the declared small-SF exact
    * reference. */
  def bandedContainmentPairs(spark: SparkSession, sfDir: String): DataFrame =
    containmentVerify(internedDocsets(spark, sfDir),
      bandedContainmentCandidates(spark, sfDir))
      .orderBy("doc_small", "doc_big")

  /** q246 — recall audit of q245's banded candidates against q137's
    * exact pair set (the q81-style quality row this approximation owes
    * its users): exact pairs left-joined to banded pairs, one output
    * row — pair counts, misses, and recall in integer ppm (floor
    * division; banded ⊆ exact by construction so recall ≤ 1e6). */
  def containmentRecallAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val ds = internedDocsets(spark, sfDir)
    val exact = containmentVerify(ds,
      containmentCandidatesExact(spark, sfDir))
      .select(col("doc_small"), col("doc_big"))
    val banded = containmentVerify(ds,
      bandedContainmentCandidates(spark, sfDir))
      .select(col("doc_small"), col("doc_big"), lit(1L).as("hit"))
    exact.join(banded, Seq("doc_small", "doc_big"), "left")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_banded"))
      .selectExpr("n_exact", "n_banded",
        "n_exact - n_banded AS n_missed",
        "CASE WHEN n_exact = 0 THEN 0L ELSE n_banded * 1000000L div n_exact END" +
          " AS recall_ppm")
  }

  /** Deterministic audit-sample rate for q253, per mille: a doc joins
    * the recall sample when its md5-derived uniform lands below this.
    * 25% keeps the fixture audit populated (3/7 sampled exact pairs at
    * sf0.001/sf0.01) while cutting the exact branch's probe side 4× —
    * at 100 TB the same constant dials down and the estimate stays
    * unbiased (each exact pair enters the sample through its small doc
    * with exactly this probability). */
  val RecallSamplePerMille = 250

  /** The q253 sample predicate — the shared [[sampleHit]] contract
    * with the `:recall` salt. */
  private def inRecallSample(id: Column): Column =
    sampleHit(id, ":recall", RecallSamplePerMille)

  private val inRecallSampleSql: String => String = e =>
    sampleHitSql(e, ":recall", RecallSamplePerMille)

  /** q253 — SAMPLED recall audit: q246's banded-vs-exact recall
    * measured over the deterministic [[RecallSamplePerMille]] doc
    * sample instead of the full corpus. This is the 100 TB form of the
    * audit: q246's ground truth runs q137's exact probe over ALL docs
    * — quadratic by intent, fine at fixture SFs, fatal at scale — while
    * here only sampled docs enter the probe (small) side of both
    * branches, so the exact branch costs a constant fraction of q137
    * and the estimate is unbiased over pairs (a pair is sampled iff
    * its small doc is, with probability exactly p). The posting sides
    * stay complete, so a sampled small doc never loses a big-side
    * partner. q246 stays declared as the full-exact reference the
    * sampled number is validated against at fixture SFs (agreement
    * recorded in PLANS.md round 7). */
  def sampledContainmentRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val ds = internedDocsets(spark, sfDir)
    val sampled = inRecallSample(col("doc_id"))
    val exact = containmentVerify(ds,
      containmentCandidatesExact(spark, sfDir, sampled))
      .select(col("doc_small"), col("doc_big"))
    val banded = containmentVerify(ds,
      bandedContainmentCandidates(spark, sfDir, sampled))
      .select(col("doc_small"), col("doc_big"), lit(1L).as("hit"))
    exact.join(banded, Seq("doc_small", "doc_big"), "left")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_banded"))
      .selectExpr("n_exact", "n_banded",
        "n_exact - n_banded AS n_missed",
        "CASE WHEN n_exact = 0 THEN 0L ELSE n_banded * 1000000L div n_exact END" +
          " AS recall_ppm")
  }

  /** Shared DuckDB CTE chain computing the banded candidate set — the
    * oracle replicates the interning (row_number over (df, ng) ≡ the
    * distributed zipWithIndex order), the rarity ranks, and the
    * 4-subset band tuples exactly (the band key is the raw ascending
    * id 4-tuple, so there is no hash to keep in sync). */
  private val bandedCandidateCtes: String = {
    val probeLimit =
      s"least(a.n - ceil($ContainTau * a.n)::BIGINT + $BandR, $BandProbeCap)"
    s"""toks AS (
       |  SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                 for i in generate_series(1, len(t)-1)])) AS ng
       |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |        FROM documents)
       |  WHERE len(t) >= $NgramWords
       |), dfreq AS (
       |  SELECT ng, COUNT(*) AS df FROM toks GROUP BY 1
       |), vocab AS (
       |  SELECT ng, row_number() OVER (ORDER BY df, ng) AS tid FROM dfreq
       |), ranked AS (
       |  SELECT t.doc_id, v.tid,
       |         row_number() OVER (PARTITION BY t.doc_id ORDER BY v.tid) AS rk,
       |         COUNT(*) OVER (PARTITION BY t.doc_id) AS n
       |  FROM toks t JOIN vocab v USING (ng)
       |), probe AS (
       |  SELECT a.doc_id, a.n, a.tid AS t1, b.tid AS t2, c.tid AS t3,
       |         d.tid AS t4
       |  FROM ranked a
       |  JOIN ranked b ON a.doc_id = b.doc_id AND a.rk < b.rk
       |  JOIN ranked c ON b.doc_id = c.doc_id AND b.rk < c.rk
       |  JOIN ranked d ON c.doc_id = d.doc_id AND c.rk < d.rk
       |  WHERE d.rk <= $probeLimit
       |), post AS (
       |  SELECT a.doc_id, a.n, a.tid AS t1, b.tid AS t2, c.tid AS t3,
       |         d.tid AS t4
       |  FROM ranked a
       |  JOIN ranked b ON a.doc_id = b.doc_id AND a.rk < b.rk
       |  JOIN ranked c ON b.doc_id = c.doc_id AND b.rk < c.rk
       |  JOIN ranked d ON c.doc_id = d.doc_id AND c.rk < d.rk
       |  WHERE d.rk <= $BandPostCap
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM probe a JOIN post b
       |    ON a.t1 = b.t1 AND a.t2 = b.t2 AND a.t3 = b.t3 AND a.t4 = b.t4
       |  WHERE a.n < b.n OR (a.n = b.n AND a.doc_id < b.doc_id)
       |), counts AS (
       |  SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
       |), bshared AS (
       |  SELECT c.da, c.db, COUNT(*) AS s
       |  FROM cand c
       |  JOIN toks x ON x.doc_id = c.da
       |  JOIN toks y ON y.doc_id = c.db AND y.ng = x.ng
       |  GROUP BY 1, 2
       |), banded AS (
       |  SELECT da, db, s, ca.n AS n_small, cb.n AS n_big
       |  FROM bshared
       |  JOIN counts ca ON da = ca.doc_id
       |  JOIN counts cb ON db = cb.doc_id
       |  WHERE s::DOUBLE >= $ContainTau * ca.n
       |)""".stripMargin
  }

  val bandedContainmentPairsSql: String =
    s"""WITH $bandedCandidateCtes
       |SELECT da AS doc_small, db AS doc_big, CAST(s AS BIGINT) AS shared,
       |       CAST(n_small AS BIGINT) AS n_small,
       |       CAST(n_big AS BIGINT) AS n_big,
       |       round(s::DOUBLE / n_small::DOUBLE, 6) AS containment,
       |       round(s::DOUBLE / (n_small + n_big - s)::DOUBLE, 6) AS jaccard
       |FROM banded
       |ORDER BY doc_small, doc_big""".stripMargin

  val containmentRecallAuditSql: String =
    s"""WITH $bandedCandidateCtes, eshared AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS s
       |  FROM toks a JOIN toks b ON a.ng = b.ng AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |), exact AS (
       |  SELECT da, db FROM eshared
       |  JOIN counts ca ON da = ca.doc_id
       |  JOIN counts cb ON db = cb.doc_id
       |  WHERE (ca.n < cb.n OR (ca.n = cb.n AND da < db))
       |    AND s::DOUBLE >= $ContainTau * ca.n
       |), sizes AS (
       |  SELECT (SELECT COUNT(*) FROM exact) AS ne,
       |         (SELECT COUNT(*) FROM banded) AS nb
       |)
       |SELECT CAST(ne AS BIGINT) AS n_exact, CAST(nb AS BIGINT) AS n_banded,
       |       CAST(ne - nb AS BIGINT) AS n_missed,
       |       CAST(CASE WHEN ne = 0 THEN 0 ELSE nb * 1000000 // ne END
       |            AS BIGINT) AS recall_ppm
       |FROM sizes""".stripMargin

  /** q253's twin: the full exact / banded pair sets restricted to
    * sampled SMALL docs — set-identical to the Spark side's
    * probe-side filter (a pair's small doc decides membership), the
    * oracle just filters after the fact since its cost is not the
    * point. */
  val sampledContainmentRecallSql: String =
    s"""WITH $bandedCandidateCtes, eshared AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS s
       |  FROM toks a JOIN toks b ON a.ng = b.ng AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |), exact_s AS (
       |  SELECT da, db FROM eshared
       |  JOIN counts ca ON da = ca.doc_id
       |  JOIN counts cb ON db = cb.doc_id
       |  WHERE (ca.n < cb.n OR (ca.n = cb.n AND da < db))
       |    AND s::DOUBLE >= $ContainTau * ca.n
       |    AND ${inRecallSampleSql("da::VARCHAR")}
       |-- MATERIALIZED is load-bearing: without the barrier DuckDB
       |-- pushes the md5 sample predicate down into the four-way band
       |-- self-join and the plan degenerates (measured: >240s vs 6s at
       |-- sf0.001); the barrier pins "compute banded once, then filter"
       |), banded_m AS MATERIALIZED (
       |  SELECT da, db FROM banded
       |), banded_s AS (
       |  SELECT da, db FROM banded_m
       |  WHERE ${inRecallSampleSql("da::VARCHAR")}
       |), sizes AS (
       |  SELECT (SELECT COUNT(*) FROM exact_s) AS ne,
       |         (SELECT COUNT(*) FROM banded_s) AS nb
       |)
       |SELECT CAST(ne AS BIGINT) AS n_exact, CAST(nb AS BIGINT) AS n_banded,
       |       CAST(ne - nb AS BIGINT) AS n_missed,
       |       CAST(CASE WHEN ne = 0 THEN 0 ELSE nb * 1000000 // ne END
       |            AS BIGINT) AS recall_ppm
       |FROM sizes""".stripMargin

  /** q148 — SOFT dedup: instead of q62's hard drop, weight every
    * document by 1/|its near-dup cluster| so each duplicate family
    * contributes one document's worth of training mass in expectation
    * — the repetition-controlling alternative when dropping loses
    * long-tail variants. Reported per source: raw docs, effective
    * (weighted) docs, and the retention ratio — the table a curator
    * compares against q62's hard-dedup counts.
    *
    * Weights sum as integer nano-units (round(1e9/k) — 1/k repeats
    * across members, and a float sum's order would sit exactly on the
    * rounding knife edge), so both engines aggregate identically.
    * Scale shape: rides the session-memoized q29→q30 cluster pipeline
    * (shared with the other pair-list consumers); singleton docs never enter the cluster join —
    * one left join + a |sources|-sized agg. */
  def softDedupWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val cl = clusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_size"))
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
    val wNano = round(lit(1e9) /
      coalesce(col("cluster_size"), lit(1L)).cast("double"), 0).cast("long")
    docs.join(cl, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(wNano).as("eff_nano"),
        sum(when(col("cluster_size").isNotNull, 1L).otherwise(0L))
          .as("n_clustered"))
      .select(col("source"), col("n_docs"), col("n_clustered"),
        round(col("eff_nano").cast("double") / 1e9, 6).as("effective_docs"),
        round(col("eff_nano").cast("double") / 1e9 /
          col("n_docs").cast("double"), 6).as("retention"))
      .orderBy("source")
  }

  val softDedupWeightsSql: String = {
    val cl = clustersSql
    s"""WITH cl AS ($cl),
       |w AS (
       |  SELECT d.doc_id, d.source,
       |         round(1e9 / COALESCE(cl.cluster_size, 1)::DOUBLE)::BIGINT
       |           AS w_nano,
       |         CASE WHEN cl.cluster_size IS NOT NULL THEN 1 ELSE 0 END
       |           AS clustered
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(clustered) AS BIGINT) AS n_clustered,
       |       round(SUM(w_nano)::DOUBLE / 1e9, 6) AS effective_docs,
       |       round(SUM(w_nano)::DOUBLE / 1e9 / COUNT(*)::DOUBLE, 6)
       |         AS retention
       |FROM w GROUP BY source ORDER BY source""".stripMargin
  }

  /** Wide-simhash pair geometry: 48 fingerprint bits split into 4
    * bands of 12 — pigeonhole guarantees any pair within Hamming
    * distance 3 collides on at least one full band. (q12's 16-bit
    * fingerprint is a per-doc feature; at pair-generation scale it
    * saturates — 1% of RANDOM pairs land within 3 bits — so the pair
    * query widens to 48, where chance collisions are ~1e-10.) */
  val SimhashPairBits = 48
  val SimhashBands = 4
  val HamTau = 3

  /** q156 — SimHash banded near-dup pairs: the bit-band LSH
    * (Charikar 2002 fingerprints + the Hamming-pigeonhole bucketing
    * of Manku et al. 2007) as a pair GENERATOR, complementing q11's
    * MinHash bands (set resemblance) and q29's prefix filter (exact
    * Jaccard): candidates collide on one of 4 12-bit bands — an
    * equi-join on (band, value), never all-pairs — and survivors are
    * verified by exact Hamming distance ≤ 3 over the full 48 bits.
    *
    * Scale shape: fingerprints are one vocab-keyed agg (same shape as
    * q12); the band table is 4 rows per doc; bucket sizes follow band
    * collisions (AQE skew-splits hot template buckets); verification
    * is a bit_count over two longs. The DuckDB twin brute-forces all
    * pairs, independently proving the bands dropped no qualifying
    * pair. */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    verifiedSimhashPairs(spark, sfDir).orderBy("doc_a", "doc_b")

  /** Session-memoized, checkpoint-pinned q156 pair list (unordered) —
    * shared with q169's cascade funnel. */
  def verifiedSimhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    memoized(spark, sfDir, "simhash")(
      (simhashPairsFresh(spark, sfDir), Nil))

  /** Uncached single-pass build (plan-shape tests pin THIS). */
  def simhashPairsFresh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("th", hash60(col("tok")))
    val votes = (0 until SimhashPairBits).map(b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b"))
    val bits = (0 until SimhashPairBits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
    val sh = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).cast("long").as("sh"))
      .localCheckpoint()
    val bandW = SimhashPairBits / SimhashBands
    val bands = sh.select(col("doc_id"), col("sh"),
        explode(array((0 until SimhashBands).map(b =>
          struct(lit(b).as("bi"),
            shiftright(col("sh"), b * bandW)
              .bitwiseAND(lit((1L << bandW) - 1)).as("bv"))): _*)).as("p"))
      .select(col("doc_id"), col("p.bi").as("bi"), col("p.bv").as("bv"))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= HamTau)
  }

  val simhashPairsSql: String = {
    val votes = (0 until SimhashPairBits).map(b =>
      s"SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val bits = (0 until SimhashPairBits)
      .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, ${hash60Sql("tok")} AS th FROM (
       |    SELECT doc_id,
       |           unnest(list_distinct(string_split_regex(lower(text),
       |             '\\s+'))) AS tok
       |    FROM documents)
       |  WHERE length(tok) > 0
       |), v AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS sh FROM v)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $HamTau
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q157 — LSH bucket-size audit: per minhash band, the bucket-count,
    * the size envelope (p50/p99/max over buckets), and the implied
    * candidate-pair volume Σ s·(s−1)/2 — the report that TUNES an LSH
    * deployment: hot template buckets show up as a fat max (the skew
    * AQE must split), and the pair volume is the banded join's actual
    * cost model, checked BEFORE running it at 100 TB. Same band
    * construction as q11 (constants shared, so the audit can never
    * drift from the pipeline it audits); everything aggregates from
    * (band, key) counts — bucket-sized rows, never pair-sized. */
  def lshBucketAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val hashed = shingles(docs).select(col("doc_id"),
      conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("sh")), 9, 8), 16, 10).cast("long").as("h2"))
    val mins = (0 until K).map(k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % P32).as(s"s$k"))
    val sig = hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bandStructs = array((0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until RowsPerBand).map(i =>
          col(s"s${b * RowsPerBand + i}").cast("string")): _*).as("key"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"))
    val buckets = bands.groupBy("band", "key").agg(count(lit(1)).as("s"))
    buckets.groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        sum("s").as("n_docs"),
        max("s").as("max_bucket"),
        round(percentile(col("s"), lit(0.5)), 2).as("p50_bucket"),
        round(percentile(col("s"), lit(0.99)), 2).as("p99_bucket"),
        expr("sum((s * (s - 1)) div 2)").as("cand_pairs"))
      .orderBy("band")
  }

  val lshBucketAuditSql: String = {
    val sigCols = (0 until K)
      .map(k => s"MIN((h1 + $k * h2) % $P32) AS s$k").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand)
        .map(i => s"s${b * RowsPerBand + i}::VARCHAR").mkString("||','||")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |  FROM documents
       |), shg AS (
       |  SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
       |                 for i in generate_series(1, len(t)-2)])) AS sh
       |  FROM toks WHERE len(t) >= $ShingleWords
       |), hashed AS (
       |  SELECT doc_id,
       |         ('0x'||substr(md5(sh),1,8))::BIGINT AS h1,
       |         ('0x'||substr(md5(sh),9,8))::BIGINT AS h2
       |  FROM shg
       |), sig AS (
       |  SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id
       |), bands AS ($bandSelects
       |), buckets AS (
       |  SELECT band, key, COUNT(*) AS s FROM bands GROUP BY 1, 2
       |)
       |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |       CAST(SUM(s) AS BIGINT) AS n_docs,
       |       CAST(MAX(s) AS BIGINT) AS max_bucket,
       |       round(quantile_cont(s, 0.5), 2) AS p50_bucket,
       |       round(quantile_cont(s, 0.99), 2) AS p99_bucket,
       |       CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS cand_pairs
       |FROM buckets GROUP BY band ORDER BY band""".stripMargin
  }

  /** q176 — dedup-method agreement matrix: for every pair of the three
    * pair GENERATORS in this engine — MinHash band candidates (q11,
    * set resemblance), prefix-filtered exact n-gram Jaccard (q29,
    * τ=0.5), and 48-bit SimHash Hamming≤3 (q156, fingerprint space) —
    * the Jaccard overlap between the PAIR SETS each emits. This is
    * the meta-analysis a curator runs before picking a dedup tier:
    * where the methods disagree is exactly the gray zone (partial
    * overlaps, short docs, template families) each definition treats
    * differently. All three inputs are the session-memoized verified
    * lists, so the whole matrix costs three joins over pair-sized
    * frames. */
  def methodAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val sets = Seq(
      "minhash" -> verifiedMinhashPairs(spark, sfDir)
        .select("doc_a", "doc_b"),
      "ngram" -> verifiedNgramPairs(spark, sfDir)
        .select("doc_a", "doc_b"),
      "simhash" -> verifiedSimhashPairs(spark, sfDir)
        .select("doc_a", "doc_b"))
    val rows = for {
      i <- sets.indices; j <- sets.indices if i < j
    } yield {
      val (na, a) = sets(i)
      val (nb, b) = sets(j)
      val ca = a.count(); val cb = b.count()
      val common = a.join(b, Seq("doc_a", "doc_b")).count()
      (na, nb, ca, cb, common,
        BigDecimal(common.toDouble / (ca + cb - common).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toDF("method_a", "method_b", "n_a", "n_b", "n_common",
        "agreement")
      .orderBy("method_a", "method_b")
  }

  val methodAgreementSql: String =
    s"""WITH mh AS ($minhashPairsSql),
       |ng AS ($ngramJaccardPairsSql),
       |sh AS ($simhashPairsSql),
       |c AS (
       |  SELECT (SELECT COUNT(*) FROM mh) AS n_mh,
       |         (SELECT COUNT(*) FROM ng) AS n_ng,
       |         (SELECT COUNT(*) FROM sh) AS n_sh,
       |         (SELECT COUNT(*) FROM mh JOIN ng USING (doc_a, doc_b))
       |           AS mh_ng,
       |         (SELECT COUNT(*) FROM mh JOIN sh USING (doc_a, doc_b))
       |           AS mh_sh,
       |         (SELECT COUNT(*) FROM ng JOIN sh USING (doc_a, doc_b))
       |           AS ng_sh
       |), f AS (
       |  SELECT 'minhash' AS method_a, 'ngram' AS method_b,
       |         n_mh AS n_a, n_ng AS n_b, mh_ng AS n_common FROM c
       |  UNION ALL
       |  SELECT 'minhash', 'simhash', n_mh, n_sh, mh_sh FROM c
       |  UNION ALL
       |  SELECT 'ngram', 'simhash', n_ng, n_sh, ng_sh FROM c
       |)
       |SELECT method_a, method_b, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       |       n_common::BIGINT AS n_common,
       |       round(n_common::DOUBLE / (n_a + n_b - n_common)::DOUBLE, 6)
       |         AS agreement
       |FROM f ORDER BY method_a, method_b""".stripMargin

  /** q169 — the dedup cascade funnel: the two cheap tiers of a
    * production dedup stack run IN SEQUENCE — exact text-hash
    * keep-first, then SimHash Hamming≤3 near-dup (q156's pairs) over
    * the exact survivors — reported as the stage-by-stage funnel
    * (in, out, removed, rate) a curator reads to see where volume
    * actually dies. The near-dup survivor rule is the LOCAL greedy
    * ("drop any doc with a smaller-id surviving neighbor") — one
    * anti-join, no transitive closure — the documented cheap tier
    * before q30's connected components.
    *
    * Scale shape: stage 1 is a hash agg (min doc per md5); stage 2
    * restricts the q156 pair list to survivor×survivor and anti-joins
    * — all key-partitioned, nothing quadratic, nothing iterative. */
  def dedupFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n0 = docs.count()
    val s1 = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val n1 = s1.count()
    val pairs = verifiedSimhashPairs(spark, sfDir).select("doc_a", "doc_b")
      .join(s1.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(s1.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
    val s2 = s1.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val n2 = s2.count()
    import docs.sparkSession.implicits._
    Seq(
      ("1_exact_hash", n0, n1),
      ("2_simhash_ham3", n1, n2))
      .toDF("stage", "docs_in", "docs_out")
      .select(col("stage"), col("docs_in"), col("docs_out"),
        (col("docs_in") - col("docs_out")).as("removed"),
        round((col("docs_in") - col("docs_out")).cast("double") /
          col("docs_in").cast("double"), 6).as("removal_rate"))
      .orderBy("stage")
  }

  val dedupFunnelSql: String =
    s"""WITH s1 AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
       |), sp AS ($simhashPairsSql
       |), spx AS (
       |  SELECT p.doc_a, p.doc_b FROM sp p
       |  JOIN s1 a ON p.doc_a = a.doc_id
       |  JOIN s1 b ON p.doc_b = b.doc_id
       |), s2 AS (
       |  SELECT doc_id FROM s1
       |  WHERE doc_id NOT IN (SELECT doc_b FROM spx)
       |), t AS (
       |  SELECT (SELECT COUNT(*) FROM documents) AS n0,
       |         (SELECT COUNT(*) FROM s1) AS n1,
       |         (SELECT COUNT(*) FROM s2) AS n2
       |), f AS (
       |  SELECT '1_exact_hash' AS stage, n0 AS docs_in, n1 AS docs_out
       |  FROM t
       |  UNION ALL
       |  SELECT '2_simhash_ham3', n1, n2 FROM t
       |)
       |SELECT stage, docs_in::BIGINT AS docs_in,
       |       docs_out::BIGINT AS docs_out,
       |       (docs_in - docs_out)::BIGINT AS removed,
       |       round((docs_in - docs_out)::DOUBLE / docs_in::DOUBLE, 6)
       |         AS removal_rate
       |FROM f ORDER BY stage""".stripMargin

  /** q195 — inverse-frequency WEIGHTED Jaccard re-score of the verified
    * q29 near-dup pairs: rare words count more than stopword-like ones,
    * the standard fix for boilerplate-dominated docs where unweighted
    * Jaccard over-merges. Weight per word = (10⁶ · N) div df — a pure
    * integer inverse-frequency weight (integer DIVISION on both
    * engines), so every per-doc and per-pair weight sum is EXACT
    * integer arithmetic; the only doubles are the two final ratios.
    *
    * Scale shape: the weight dictionary is the word-df aggregate
    * (vocab-sized, unhinted — AQE broadcasts while small); per-doc
    * totals are one partial+final agg; the shared-weight sum touches
    * only the verified pair list (bucket-bounded by the q29 prefix
    * filter) joined twice on doc id, the same re-attach shape as every
    * other pair consumer.
    */
  def weightedJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val words = docs.select(col("doc_id"),
      explode(array_distinct(split(lower(col("text")), "\\s+"))).as("w"))
    val total = docs.agg(count(lit(1)).as("nd"))
    val wgt = words.groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .select(col("w"), expr("(1000000 * nd) div df").as("wt"))
    val wdoc = words.join(wgt, Seq("w"))
      .groupBy("doc_id").agg(sum(col("wt")).as("wtot"))
    val pairs = verifiedNgramPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val sharedW = pairs.select(col("doc_a"), col("doc_b"))
      .join(words.select(col("doc_id").as("doc_a"), col("w")), Seq("doc_a"))
      .join(words.select(col("doc_id").as("doc_b"), col("w")), Seq("doc_b", "w"),
        "left_semi")
      .join(wgt, Seq("w"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wt")).as("ws"))
    pairs
      .join(wdoc.select(col("doc_id").as("doc_a"), col("wtot").as("wa")),
        Seq("doc_a"))
      .join(wdoc.select(col("doc_id").as("doc_b"), col("wtot").as("wb")),
        Seq("doc_b"))
      .join(sharedW, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"),
        round(coalesce(col("ws"), lit(0L)).cast("double") /
          (col("wa") + col("wb") - coalesce(col("ws"), lit(0L))).cast("double"),
          6).as("weighted_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val weightedJaccardSql: String =
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b, jaccard FROM (
       |    WITH toks AS (
       |      SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                     for i in generate_series(1, len(t)-1)])) AS ng
       |      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents)
       |      WHERE len(t) >= $NgramWords
       |    ), counts AS (
       |      SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
       |    ), shared AS (
       |      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS s
       |      FROM toks a JOIN toks b ON a.ng = b.ng AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2
       |    )
       |    SELECT doc_a, doc_b,
       |           CAST(s AS DOUBLE) / CAST(ca.n + cb.n - s AS DOUBLE) AS jaccard
       |    FROM shared
       |    JOIN counts ca ON doc_a = ca.doc_id
       |    JOIN counts cb ON doc_b = cb.doc_id
       |    WHERE CAST(s AS DOUBLE) / CAST(ca.n + cb.n - s AS DOUBLE) >= $Tau
       |  )
       |), words AS (
       |  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS w
       |  FROM documents
       |), wgt AS (
       |  SELECT w, (1000000 * (SELECT COUNT(*) FROM documents)) // COUNT(*) AS wt
       |  FROM words GROUP BY w
       |), wdoc AS (
       |  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS wtot
       |  FROM words JOIN wgt USING (w) GROUP BY 1
       |), sw AS (
       |  SELECT p.doc_a, p.doc_b, CAST(SUM(g.wt) AS BIGINT) AS ws
       |  FROM pairs p
       |  JOIN words a ON a.doc_id = p.doc_a
       |  JOIN words b ON b.doc_id = p.doc_b AND b.w = a.w
       |  JOIN wgt g ON g.w = a.w
       |  GROUP BY 1, 2
       |)
       |SELECT p.doc_a, p.doc_b, round(p.jaccard, 6) AS jaccard,
       |       round(CAST(COALESCE(sw.ws, 0) AS DOUBLE) /
       |             CAST(wa.wtot + wb.wtot - COALESCE(sw.ws, 0) AS DOUBLE), 6)
       |         AS weighted_jaccard
       |FROM pairs p
       |JOIN wdoc wa ON wa.doc_id = p.doc_a
       |JOIN wdoc wb ON wb.doc_id = p.doc_b
       |LEFT JOIN sw ON sw.doc_a = p.doc_a AND sw.doc_b = p.doc_b
       |ORDER BY p.doc_a, p.doc_b""".stripMargin

  /** Jaccard thresholds the sensitivity curve sweeps (q209). Starts at
    * the pipeline's own Tau so every row is a restriction of the
    * already-verified pair list — no new pair generation per point. */
  val CurveThresholds: Seq[Double] = Seq(0.5, 0.55, 0.6, 0.65, 0.7,
    0.75, 0.8, 0.85, 0.9, 0.95)

  /** q209 — dedup threshold sensitivity curve: for each candidate
    * Jaccard cutoff, how many verified near-dup pairs survive and how
    * many distinct documents they touch. The de-dup policy question
    * ("what does tightening tau to 0.8 cost?") answered from the
    * session-memoized q29 pair list (shared with the other pair-list
    * consumers) — each pair map-side explodes the literal threshold
    * list it satisfies (a ≤10-element array filter, no join of any
    * kind), never a re-scan of the corpus. Jaccards are the identical
    * exact-integer-derived doubles in both engines, so every threshold
    * comparison lands on the same side.
    */
  def thresholdCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedNgramPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val thArr = array(CurveThresholds.map(lit): _*)
    val surviving = pairs.select(col("doc_a"), col("doc_b"),
      explode(filter(thArr, t => col("jaccard") >= t)).as("threshold"))
    val nPairs = surviving.groupBy("threshold")
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = surviving
      .select(col("threshold"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy("threshold")
      .agg(countDistinct(col("d")).as("n_docs"))
    nPairs.join(nDocs, Seq("threshold"))
      .orderBy("threshold")
  }

  val thresholdCurveSql: String = {
    val list = CurveThresholds.mkString(", ")
    s"""WITH p AS ($ngramJaccardPairsSql),
       |th AS (SELECT unnest([$list]::DOUBLE[]) AS threshold),
       |f AS (
       |  SELECT th.threshold, p.doc_a, p.doc_b
       |  FROM p, th WHERE p.jaccard >= th.threshold
       |), np AS (
       |  SELECT threshold, COUNT(*) AS n_pairs FROM f GROUP BY 1
       |), nd AS (
       |  SELECT threshold, COUNT(DISTINCT d) AS n_docs
       |  FROM (SELECT threshold, unnest([doc_a, doc_b]) AS d FROM f)
       |  GROUP BY 1
       |)
       |SELECT np.threshold, np.n_pairs, nd.n_docs
       |FROM np JOIN nd USING (threshold)
       |ORDER BY threshold""".stripMargin
  }

  /** q211 — semi-supervised label propagation over the near-dup graph:
    * docs with doc_id % 3 == 0 are the "labeled" seed (their lang is
    * trusted); two fixed rounds of majority voting push labels to
    * unlabeled neighbours along the verified q29 edges (count DESC,
    * label ASC tie-break — integer-exact, engine-identical). The
    * round-2 electorate includes round-1 winners, so a doc two hops
    * from any seed still resolves. Scale shape: each round is one
    * edge⋈assignment hash join + one (dst,label) aggregate + a
    * per-dst window (partitioned by dst, never global); the edge list
    * is the session-memoized pair list, bounded by near-dup density,
    * and assignments are localCheckpoint-pinned per round so the plan
    * never re-derives the previous round.
    */
  def labelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedNgramPairs(spark, sfDir).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val seed = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("lang").as("label"),
        lit(0).as("src_round"))
    def round(assigned: DataFrame, r: Int): DataFrame = {
      val votes = edges
        .join(assigned.select(col("doc_id").as("src"), col("label")), "src")
        .join(assigned.select(col("doc_id").as("dst")), Seq("dst"),
          "left_anti")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("dst").orderBy(col("c").desc, col("label"))
      val won = votes.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("dst").as("doc_id"), col("label"),
          lit(r).as("src_round"))
      assigned.union(won).localCheckpoint()
    }
    round(round(seed.localCheckpoint(), 1), 2).orderBy("doc_id")
  }

  val labelPropagationSql: String =
    s"""WITH p AS ($ngramJaccardPairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM p
       |), seed AS (
       |  SELECT doc_id, lang AS label, 0 AS src_round
       |  FROM documents WHERE doc_id % 3 = 0
       |), v1 AS (
       |  SELECT e.dst, s.label, COUNT(*) AS c
       |  FROM edges e JOIN seed s ON e.src = s.doc_id
       |  WHERE e.dst NOT IN (SELECT doc_id FROM seed)
       |  GROUP BY 1, 2
       |), r1 AS (
       |  SELECT dst AS doc_id, label, 1 AS src_round FROM (
       |    SELECT dst, label,
       |           row_number() OVER (PARTITION BY dst
       |                              ORDER BY c DESC, label) AS rk
       |    FROM v1) WHERE rk = 1
       |), a1 AS (
       |  SELECT * FROM seed UNION ALL SELECT * FROM r1
       |), v2 AS (
       |  SELECT e.dst, s.label, COUNT(*) AS c
       |  FROM edges e JOIN a1 s ON e.src = s.doc_id
       |  WHERE e.dst NOT IN (SELECT doc_id FROM a1)
       |  GROUP BY 1, 2
       |), r2 AS (
       |  SELECT dst AS doc_id, label, 2 AS src_round FROM (
       |    SELECT dst, label,
       |           row_number() OVER (PARTITION BY dst
       |                              ORDER BY c DESC, label) AS rk
       |    FROM v2) WHERE rk = 1
       |)
       |SELECT doc_id, label, src_round FROM a1
       |UNION ALL
       |SELECT doc_id, label, src_round FROM r2
       |ORDER BY doc_id""".stripMargin

  /** q222 — LSH s-curve calibration: per exact-Jaccard decile of the
    * q11 candidate pairs, the MinHash estimator's mean against the true
    * Jaccard (estimator bias) and the observed band-collision count
    * against the model's E[bands] = b·J^r — the audit that tells an
    * operator whether the deployed (b, r) geometry matches the theory
    * it was sized from before they trust it on 100 TB (the q157 bucket
    * audit checks COST; this checks RECALL calibration). Conditioned on
    * caught pairs by construction — low-J buckets over-represent lucky
    * collisions, which is exactly the survivorship the curve makes
    * visible (observed ≥ predicted at the low end, converging by
    * J ≈ the s-curve midpoint).
    *
    * Scale shape: one scan of the session-memoized verified pair list
    * → a ≤10-group aggregate; J^r and (1−J^r)^b are explicit multiply
    * chains generated from the SAME [[Bands]]/[[RowsPerBand]] constants
    * as the pipeline (never libm pow — the q168 1-ulp argument), so the
    * theory columns can't drift from the deployed geometry. */
  def lshCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = verifiedMinhashPairs(spark, sfDir)
    val j = col("jaccard")
    val jr = Seq.fill(RowsPerBand)(j).reduce(_ * _)
    val miss = lit(1.0) - jr
    val pCatch = lit(1.0) - Seq.fill(Bands)(miss).reduce(_ * _)
    pairs
      .select(least(floor(j * 10), lit(9)).cast("int").as("j_bucket"),
        j, col("est_jaccard"), col("shared_bands").cast("double").as("sb"),
        (lit(Bands.toDouble) * jr).as("pred_sb"), pCatch.as("pc"))
      .groupBy("j_bucket")
      // exact nano-means (q196 doctrine) for the four continuous
      // columns; mean_shared_bands stays a plain AVG — sb is
      // integer-valued, so its sum is exact in any order
      .agg(count(lit(1)).as("n_pairs"),
        Exact.mean9(j).as("mean_jaccard"),
        Exact.mean9(col("est_jaccard")).as("mean_est_jaccard"),
        round(avg(col("sb")), 6).as("mean_shared_bands"),
        Exact.mean9(col("pred_sb")).as("pred_shared_bands"),
        Exact.mean9(col("pc")).as("pred_catch_prob"))
      .orderBy("j_bucket")
  }

  val lshCalibrationSql: String = {
    val jr = Seq.fill(RowsPerBand)("jaccard").mkString(" * ")
    val miss = "(1.0 - jr)"
    val pc = "1.0 - " + Seq.fill(Bands)(miss).mkString(" * ")
    s"""WITH p AS ($minhashPairsSql),
       |b AS (
       |  SELECT LEAST(floor(jaccard * 10), 9)::INT AS j_bucket,
       |         jaccard, est_jaccard, shared_bands::DOUBLE AS sb,
       |         $jr AS jr
       |  FROM p
       |)
       |SELECT j_bucket, COUNT(*) AS n_pairs,
       |       ${Exact.mean9Sql("jaccard")} AS mean_jaccard,
       |       ${Exact.mean9Sql("est_jaccard")} AS mean_est_jaccard,
       |       round(AVG(sb), 6) AS mean_shared_bands,
       |       ${Exact.mean9Sql(s"$Bands.0 * jr")} AS pred_shared_bands,
       |       ${Exact.mean9Sql(pc)} AS pred_catch_prob
       |FROM b GROUP BY j_bucket ORDER BY j_bucket""".stripMargin
  }

  /** q225 — cluster-size distribution + transitivity audit over the
    * q30 connected components: per cluster size, how many clusters and
    * docs live there, the pair count the transitive closure IMPLIES
    * (Σ s·(s−1)/2), the DIRECT verified-pair count inside those
    * clusters, and the resulting edge density. The inferred (implied −
    * direct) pairs are exactly the doc pairs a cluster-level dedup
    * deletes WITHOUT ever verifying their Jaccard — the
    * friend-of-a-friend risk every transitive-closure dedup carries
    * (MinHash chains A~B~C where A,C share little), so density by size
    * band is the number an operator checks before trusting
    * survivor-only retention at 100 TB.
    *
    * Scale shape: clusters and pairs are both session-memoized frames;
    * one equi-join attaches each pair to its cluster size via doc_a
    * (both endpoints share a cluster by construction of connected
    * components), then two small keyed aggregates and a 1-row total
    * anchor (q73's scalar-broadcast shape) for the doc share. */
  def clusterTransitivity(spark: SparkSession, sfDir: String): DataFrame = {
    val cl = clusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val base = cl.groupBy("cluster_size")
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
    val direct = verifiedNgramPairs(spark, sfDir)
      .select(col("doc_a"))
      .join(cl.select(col("doc_id").as("doc_a"), col("cluster_size")),
        Seq("doc_a"))
      .groupBy("cluster_size").agg(count(lit(1)).as("direct_pairs"))
    val tot = cl.agg(count(lit(1)).as("total_docs"))
    val implied = (col("n_clusters") *
      (col("cluster_size") * (col("cluster_size") - 1)) / 2).cast("long")
    base.join(direct, Seq("cluster_size"))
      .crossJoin(broadcast(tot))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        round(col("n_docs").cast("double") /
          col("total_docs").cast("double"), 6).as("doc_share"),
        implied.as("implied_pairs"), col("direct_pairs"),
        (implied - col("direct_pairs")).as("inferred_pairs"),
        round(col("direct_pairs").cast("double") /
          implied.cast("double"), 6).as("edge_density"))
      .orderBy("cluster_size")
  }

  val clusterTransitivitySql: String =
    s"""WITH c AS ($clustersSql),
       |p AS ($ngramJaccardPairsSql),
       |base AS (
       |  SELECT cluster_size, COUNT(DISTINCT cluster_id) AS n_clusters,
       |         COUNT(*) AS n_docs
       |  FROM c GROUP BY 1
       |), direct AS (
       |  SELECT c.cluster_size, COUNT(*) AS direct_pairs
       |  FROM p JOIN c ON p.doc_a = c.doc_id GROUP BY 1
       |), tot AS (SELECT COUNT(*) AS total_docs FROM c)
       |SELECT b.cluster_size, b.n_clusters, b.n_docs,
       |       round(b.n_docs::DOUBLE / tot.total_docs::DOUBLE, 6)
       |         AS doc_share,
       |       CAST(b.n_clusters * (b.cluster_size * (b.cluster_size - 1))
       |            / 2 AS BIGINT) AS implied_pairs,
       |       d.direct_pairs,
       |       CAST(b.n_clusters * (b.cluster_size * (b.cluster_size - 1))
       |            / 2 - d.direct_pairs AS BIGINT) AS inferred_pairs,
       |       round(d.direct_pairs::DOUBLE /
       |             (b.n_clusters * (b.cluster_size * (b.cluster_size - 1))
       |              / 2)::DOUBLE, 6) AS edge_density
       |FROM base b JOIN direct d USING (cluster_size)
       |CROSS JOIN tot
       |ORDER BY b.cluster_size""".stripMargin

  /** q227 — dedup information-loss audit: per language, how many
    * distinct word bigrams exist only in documents the q62 survivor
    * policy REMOVES — i.e. content the dedup throws away that no kept
    * document still carries. Near-dup clusters are near, not equal, so
    * survivor-only retention always loses some long-tail n-grams; this
    * measures that loss, the number a curator weighs against the
    * dedup's training-loss benefit before running it over 100 TB
    * (the Lee et al. "Deduplicating Training Data" trade-off made
    * auditable).
    *
    * Scale shape: grams travel as 60-bit md5 fingerprints (the q107
    * trick — identical derivation in the oracle, so any collision is
    * shared), one (lang, gram) shuffle with map-side combine computes
    * each gram's kept/removed exposure, then a per-lang rollup. The
    * survivor flags ride the session-memoized pair list; docs outside
    * any cluster are kept by definition (left join + coalesce). */
  def dedupInfoLoss(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val removed = dedupSurvivors(spark, sfDir)
      .filter(!col("survivor")).select(col("doc_id"), lit(1).as("rm"))
    // lang rides the explode itself (one corpus scan), so the only join
    // on the gram side is the tiny removed-doc list
    val t = split(lower(col("text")), "\\s+")
    val grams = docs
      .select(col("doc_id"), col("lang"), t.as("t"))
      .filter(size(col("t")) >= NgramWords)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(word_ngrams(col("t"), NgramWords)))
          .as("ng"))
      .select(col("doc_id"), col("lang"), hash60(col("ng")).as("g"))
      .join(removed, Seq("doc_id"), "left")
      .select(col("lang"), col("g"),
        (coalesce(col("rm"), lit(0)) === 0).cast("int").as("kept"))
    grams.groupBy("lang", "g").agg(max(col("kept")).as("in_kept"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_grams"),
        sum(lit(1) - col("in_kept")).cast("long").as("n_lost"),
        round(avg(lit(1.0) - col("in_kept").cast("double")), 6)
          .as("lost_frac"))
      .orderBy("lang")
  }

  val dedupInfoLossSql: String =
    s"""WITH sv AS ($dedupSurvivorsSql),
       |removed AS (SELECT doc_id FROM sv WHERE NOT survivor),
       |grams AS (
       |  SELECT d.lang, ${hash60Sql("t.ng")} AS g,
       |         CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END AS kept
       |  FROM (
       |    SELECT doc_id, unnest(list_distinct([t[i]||' '||t[i+1]
       |                   for i in generate_series(1, len(t)-1)])) AS ng
       |    FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |          FROM documents)
       |    WHERE len(t) >= $NgramWords
       |  ) t
       |  JOIN documents d USING (doc_id)
       |  LEFT JOIN removed r USING (doc_id)
       |), per AS (
       |  SELECT lang, g, MAX(kept) AS in_kept FROM grams GROUP BY 1, 2
       |)
       |SELECT lang, COUNT(*) AS n_grams,
       |       CAST(SUM(1 - in_kept) AS BIGINT) AS n_lost,
       |       round(AVG(1.0 - in_kept::DOUBLE), 6) AS lost_frac
       |FROM per GROUP BY lang ORDER BY lang""".stripMargin

  /** q229 — survivor-quality audit: for each near-dup cluster, does
    * the q62 keep-the-longest survivor policy actually retain the
    * member the q98 quality classifier scores highest? Per cluster
    * size: how many clusters keep the best-scoring member, and the
    * mean score sacrificed when they don't. Length and quality
    * correlate but are not the same ranking — this is the audit that
    * decides whether a 100 TB dedup should re-rank survivors by
    * classifier score (a one-line policy change whose corpus-quality
    * effect this query prices BEFORE the run).
    *
    * Scale shape: the survivor frame is cluster-bounded (near-dup
    * density, never corpus-sized); one doc-keyed equi-join attaches
    * the row-local q98 score, then two bounded hash aggregates
    * (per-cluster, then per-size). Score comparisons happen on the
    * 6-dp-rounded p_keep both engines already share, so best/kept
    * verdicts are engine-exact. */
  def survivorQualityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val sv = dedupSurvivors(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("survivor"))
    val scores = TextAnalysis.logitQuality(spark, sfDir)
      .select(col("doc_id"), col("p_keep"))
    val per = sv.join(scores, Seq("doc_id"))
      .groupBy("cluster_id", "cluster_size")
      .agg(max(col("p_keep")).as("best_p"),
        max(when(col("survivor"), col("p_keep"))).as("surv_p"))
    per.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        sum((col("surv_p") >= col("best_p")).cast("long")).as("n_best_kept"),
        round(avg((col("surv_p") >= col("best_p")).cast("double")), 6)
          .as("best_kept_frac"),
        // exact nano-mean (q196 doctrine): the quality gaps are
        // continuous floats; best_kept_frac's AVG of exact 0/1 stays
        Exact.mean9(col("best_p") - col("surv_p")).as("mean_quality_gap"))
      .orderBy("cluster_size")
  }

  val survivorQualityAuditSql: String =
    s"""WITH sv AS ($dedupSurvivorsSql),
       |q AS (SELECT doc_id, p_keep FROM (${TextAnalysis.logitQualitySql})),
       |per AS (
       |  SELECT sv.cluster_id, sv.cluster_size,
       |         MAX(q.p_keep) AS best_p,
       |         MAX(CASE WHEN sv.survivor THEN q.p_keep END) AS surv_p
       |  FROM sv JOIN q USING (doc_id)
       |  GROUP BY 1, 2
       |)
       |SELECT cluster_size, COUNT(*) AS n_clusters,
       |       CAST(SUM(CASE WHEN surv_p >= best_p THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_best_kept,
       |       round(AVG(CASE WHEN surv_p >= best_p THEN 1.0 ELSE 0.0 END),
       |             6) AS best_kept_frac,
       |       ${Exact.mean9Sql("best_p - surv_p")} AS mean_quality_gap
       |FROM per GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** q231 — incremental cluster maintenance by CONTRACTION: fold a new
    * document batch (doc_id % 10 == 0, q37's increment convention)
    * into the STANDING dup clusters without re-clustering the corpus.
    * Standing components contract to single super-nodes (their min-id
    * label), so the connected-components pass runs on a graph whose
    * size is BATCH-proportional — new doc ids plus the handful of
    * standing labels their edges touch — never corpus-proportional.
    * Because every standing label is already the min id of its old
    * component and min is associative, the contracted labels equal a
    * full-graph recompute EXACTLY; the DuckDB oracle proves that by
    * doing the full recompute (both closures) and comparing.
    *
    * Output per batch doc in the near-dup graph: its final cluster id,
    * how many pre-existing components (counting corpus singletons) its
    * component absorbed, how many batch docs share it, and whether the
    * batch BRIDGED formerly-separate clusters (n_old_merged >= 2) —
    * the event an incremental 100 TB dedup must detect, because a
    * bridge changes survivor choices for documents it never read
    * today.
    *
    * Scale shape: edge filters ride the session-memoized pair list;
    * the standing-label attach is two doc-keyed equi-joins; the CC
    * pass sees only contracted batch edges. At 100 TB the batch edges
    * would come from q37's asymmetric batch×corpus prefix join; here
    * the memoized full pair list supplies them. */
  def incrementalClusters(spark: SparkSession, sfDir: String): DataFrame = {
    def isBatch(c: Column): Column = c % 10 === 0
    val pairs = verifiedNgramPairs(spark, sfDir).select("doc_a", "doc_b")
    val corpusPairs = pairs
      .filter(!isBatch(col("doc_a")) && !isBatch(col("doc_b")))
    val standing = connectedComponents(corpusPairs) // (id, lbl)
    val batchPairs = pairs
      .filter(isBatch(col("doc_a")) || isBatch(col("doc_b")))
    val contracted = batchPairs
      .join(standing.select(col("id").as("doc_a"), col("lbl").as("la")),
        Seq("doc_a"), "left")
      .join(standing.select(col("id").as("doc_b"), col("lbl").as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("na"),
        coalesce(col("lb"), col("doc_b")).as("nb"))
      .filter(col("na") =!= col("nb"))
      .select(least(col("na"), col("nb")).as("doc_a"),
        greatest(col("na"), col("nb")).as("doc_b"))
      .distinct()
    val merged = connectedComponents(contracted) // (id, lbl) contracted nodes
    val stats = merged.groupBy("lbl")
      .agg(sum(when(isBatch(col("id")), 0).otherwise(1)).as("n_old_merged"),
        sum(when(isBatch(col("id")), 1).otherwise(0))
          .as("n_batch_in_cluster"))
    merged.filter(isBatch(col("id")))
      .join(stats, Seq("lbl"))
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("n_old_merged"), col("n_batch_in_cluster"),
        (col("n_old_merged") >= 2).as("merged_old"))
      .orderBy("doc_id")
  }

  /** Full-recompute oracle: both closures (whole graph + corpus-only
    * subgraph), then per full component count the distinct old
    * component ids its non-batch members carried. Agreement proves the
    * contraction exact. */
  val incrementalClustersSql: String =
    s"""WITH RECURSIVE p AS (
       |  SELECT doc_a, doc_b FROM ($ngramJaccardPairsSql)
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM p
       |), reach(src, dst) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), comp AS (
       |  SELECT src AS node, MIN(dst) AS full_lbl FROM reach GROUP BY src
       |), cedges AS (
       |  SELECT src, dst FROM edges WHERE src % 10 != 0 AND dst % 10 != 0
       |), creach(src, dst) AS (
       |  SELECT DISTINCT src, src FROM cedges
       |  UNION
       |  SELECT r.src, e.dst FROM creach r JOIN cedges e ON r.dst = e.src
       |), ccomp AS (
       |  SELECT src AS node, MIN(dst) AS old_lbl FROM creach GROUP BY src
       |), decorated AS (
       |  SELECT c.node, c.full_lbl,
       |         CASE WHEN c.node % 10 = 0 THEN NULL
       |              ELSE COALESCE(cc.old_lbl, c.node) END AS old_id
       |  FROM comp c LEFT JOIN ccomp cc ON c.node = cc.node
       |), stats AS (
       |  SELECT full_lbl,
       |         CAST(COUNT(DISTINCT old_id) AS BIGINT) AS n_old_merged,
       |         CAST(SUM(CASE WHEN node % 10 = 0 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_batch_in_cluster
       |  FROM decorated GROUP BY 1
       |)
       |SELECT d.node AS doc_id, d.full_lbl AS cluster_id,
       |       s.n_old_merged, s.n_batch_in_cluster,
       |       s.n_old_merged >= 2 AS merged_old
       |FROM decorated d JOIN stats s USING (full_lbl)
       |WHERE d.node % 10 = 0
       |ORDER BY doc_id""".stripMargin
}
