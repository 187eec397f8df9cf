package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB:
  *
  *  - exact dedup: hash-groupBy on md5(text) (one shuffle on the hash);
  *  - MinHash + LSH near-dup: 3-word shingles → K salted-md5 minhashes →
  *    band buckets → self-join candidates → true-Jaccard verification;
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

  /** Minhash geometry: K = Bands × RowsPerBand. */
  val K = 16
  val Bands = 4
  val RowsPerBand = 4
  val ShingleWords = 3

  /** 60-bit hash from the first 15 hex digits of md5 — portable across
    * engines and safely inside BIGINT (no ANSI overflow). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val hash60Sql: String => String =
    e => s"('0x'||substr(md5($e),1,15))::BIGINT"

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
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("t")) - (ShingleWords - 1)),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2)))))
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
    * count, minhash-estimated Jaccard, and exact shingle Jaccard. */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = shingles(docs).cache() // one explode+md5 pass, reused below
    val sig = signaturesFromShingles(sh).cache()

    val bandStructs = array((0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until RowsPerBand).map(i =>
          col(s"s${b * RowsPerBand + i}").cast("string")): _*).as("key"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(countDistinct(col("a.band")).as("shared_bands"))

    // minhash-estimated jaccard: fraction of equal signature slots
    val estCol = (0 until K).map(k =>
      when(col(s"sa.s$k") === col(s"sb.s$k"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / lit(K.toDouble)
    val withEst = pairs
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared_bands"),
        estCol.as("est_jaccard"))

    // exact shingle jaccard, computed only for the candidate pairs
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sharedCnt = withEst.select("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))

    withEst
      .join(sharedCnt, Seq("doc_a", "doc_b"), "left")
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared_bands"), col("est_jaccard"),
        (coalesce(col("shared"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("shared"), lit(0L))).cast("double"))
          .as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

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
       |         ('0x'||substr(md5(sh),9,8))::BIGINT AS h2
       |  FROM shg
       |), sig AS (
       |  SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id
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
       |), counts AS (
       |  SELECT doc_id, COUNT(*) AS n FROM shg GROUP BY 1
       |), shared AS (
       |  SELECT e.doc_a, e.doc_b, COUNT(*) AS shared
       |  FROM est e
       |  JOIN shg a ON a.doc_id = e.doc_a
       |  JOIN shg b ON b.doc_id = e.doc_b AND b.sh = a.sh
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
}
