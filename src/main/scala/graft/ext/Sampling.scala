package graft.ext

import graft.Tables
import graft.functions.WordNgrams.word_ngrams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the "data mixing" step of a
  * training-corpus pipeline: take an exact per-stratum quota from every
  * (lang, source) cell so the mixture is controlled, reproducibly.
  *
  * Determinism: rows are ranked inside each stratum by
  * (md5(doc_id), doc_id) — a pseudo-random but engine-portable order —
  * and the first ⌈frac·|stratum|⌉ survive. No RNG, so Spark and the
  * DuckDB oracle pick the SAME sample, and re-runs are stable (the
  * property a curator actually needs for ablations).
  *
  * Scale: one shuffle keyed by (lang, source). `row_number` serializes
  * each stratum through one partition — fine while strata stay under
  * ~10M rows; for 100 TB mega-strata, swap to the two-pass form (count
  * per stratum, broadcast quotas, keep rows whose md5 rank-hash falls
  * under the per-stratum threshold) which trades exact quotas for
  * fully-parallel selection within each stratum.
  */
object Sampling {

  val SampleFrac = 0.2

  /** q31 — exact-quota stratified sample over (lang, source). */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val stratum = Window.partitionBy(col("lang"), col("source"))
    val order = stratum.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        row_number().over(order).as("rk"),
        count(lit(1)).over(stratum).as("cnt"))
      .filter(col("rk") <= ceil(col("cnt") * SampleFrac))
      .select(col("doc_id"), col("lang"), col("source"),
        col("rk").cast("long").as("stratum_rank"),
        col("cnt").as("stratum_size"))
      .orderBy("doc_id")
  }

  /** q105 — the MEGA-STRATA form of q31: identical sample, identical
    * ranks, computed by distributed selection instead of one window per
    * stratum. q31's `row_number` serializes each stratum through one
    * task — fine to ~10M rows, wrong at 100 TB where a single (lang,
    * source) cell can hold billions of documents. Two passes fix it:
    *
    *  1. histogram: count per (stratum, hash-bucket), where bucket =
    *     first two hex digits of the md5 rank key — ≤ 256·|strata|
    *     rows, with cumulative counts windowed over the 256-row
    *     per-stratum histogram (bounded input, never the corpus);
    *  2. select: rank rows only WITHIN (stratum, bucket) — 256-way
    *     parallel per stratum — and keep a row iff bucket-cum-before +
    *     in-bucket-rank clears the stratum quota.
    *
    * Because the bucket is a PREFIX of the rank key, (bucket, key,
    * doc_id) order equals q31's global (key, doc_id) order, so the
    * survivors AND their stratum_rank values are bit-identical to
    * q31's — the oracle is literally the same window SQL, proving the
    * decomposition exact (the strongest form of the "two-pass
    * mega-strata variant" SURVEY §2.8 prescribes). One broadcast of
    * the histogram; both shuffles keyed by (lang, source, bkt). */
  def stratifiedTwoPass(spark: SparkSession, sfDir: String): DataFrame =
    twoPassRanked(Tables.load(spark, sfDir, "documents"),
      Seq("lang", "source"), t => ceil(t * SampleFrac).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("stratum_rank"), col("stratum_size"))
      .orderBy("doc_id")

  /** The generic two-pass exact-quota kernel (shared by q105/q109):
    * per-(stratum, 256-bucket) histogram with cumulative counts over
    * the ≤256-row per-stratum histogram, broadcast back, in-bucket
    * ranks 256-way parallel inside every stratum. `quotaOfTotal` maps
    * the stratum total to its quota and may read other stratum columns
    * (q109's per-language weight). Returns (strata..., doc_id,
    * stratum_rank, stratum_size) for survivors, ranks bit-identical to
    * the single-window form. */
  private[ext] def twoPassRanked(docs: DataFrame, strata: Seq[String],
      quotaOfTotal: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val key = md5(col("doc_id").cast("string"))
    val base = docs.select(strata.map(col) ++ Seq(col("doc_id"),
      key.as("k"),
      conv(substring(key, 1, 2), 16, 10).cast("int").as("bkt")): _*)
    val wS = Window.partitionBy(strata.map(col): _*).orderBy("bkt")
    val info = base.groupBy((strata :+ "bkt").map(col): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_before", coalesce(
        sum("c").over(wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total",
        sum("c").over(Window.partitionBy(strata.map(col): _*)))
      .withColumn("quota", quotaOfTotal(col("total")))
      .drop("c")
    val wB = Window.partitionBy((strata :+ "bkt").map(col): _*)
      .orderBy(col("k"), col("doc_id"))
    base.join(broadcast(info), strata :+ "bkt")
      .withColumn("rk_in_bkt", row_number().over(wB))
      .filter(col("cum_before") + col("rk_in_bkt") <= col("quota"))
      .withColumn("stratum_rank",
        (col("cum_before") + col("rk_in_bkt")).cast("long"))
      .withColumn("stratum_size", col("total"))
  }

  /** q109 — the mega-strata form of q52's weighted language mix: same
    * survivors, same ranks, via the q105 two-pass kernel with the
    * per-language quota ceil(|stratum|·w_lang). q52 partitions by lang
    * ONLY — a handful of strata, so its one-window-per-stratum shape
    * serializes the whole corpus through ≤|langs| tasks, the worst
    * case for the window form and exactly where the 256-way in-bucket
    * decomposition matters. Oracle is deliberately q52's identical
    * window SQL. */
  def weightedMixTwoPass(spark: SparkSession, sfDir: String): DataFrame = {
    val weight = MixWeights.foldLeft(lit(0.0)) { case (acc, (l, w)) =>
      when(col("lang") === l, w).otherwise(acc) }
    twoPassRanked(Tables.load(spark, sfDir, "documents"),
      Seq("lang"), t => ceil(t * weight).cast("long"))
      .select(col("doc_id"), col("lang"),
        col("stratum_rank"), col("stratum_size"))
      .orderBy("doc_id")
  }

  /** q33 — token-budget sharding: pack documents into shards of roughly
    * `TokensPerShard` whitespace tokens each, the step that turns a
    * curated corpus into uniform training chunks. shard_id =
    * floor(exclusive-running-token-sum / budget) over a deterministic
    * pseudo-random order (md5(doc_id)), so shard contents are stable
    * across runs and engines.
    *
    * Scale: the exact global running sum rides [[packOffsetsBy]]'s
    * two-phase scan in (md5(doc_id), doc_id) order — range-partitioned
    * intra-partition windows in parallel plus a #partitions-sized
    * totals cumsum — so NO step serializes the corpus through one
    * task (PlanSpec pins no-unpartitioned-window across every declared
    * plan). The oracle states the same semantics as one flat window
    * cumsum, independently proving the decomposition. */
  val TokensPerShard = 4000L

  def tokenShards(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val nTokens = size(split(col("text"), "\\s+")).cast("long")
    packOffsetsBy(
      docs.select(col("doc_id"), nTokens.as("n_tokens")),
      Seq(md5(col("doc_id").cast("string")), col("doc_id")))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_off div $TokensPerShard").as("shard_id"))
      .orderBy("doc_id")
  }

  val tokenShardsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         len(string_split_regex(text, '\\s+')) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(floor(COALESCE(SUM(n_tokens) OVER (
       |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         / $TokensPerShard) AS BIGINT) AS shard_id
       |FROM t ORDER BY doc_id""".stripMargin

  /** q46 — per-language top-k documents by length through the typed
    * bounded-buffer `TopK` Aggregator (graft.functions.TopK): each task
    * keeps only k (score, id) pairs and partials merge associatively,
    * so a per-group (or global) top-k needs NO full sort and NO
    * single-partition window — the rewrite SURVEY.md §2.6 flags for W1
    * when group cardinality explodes. The oracle reproduces it with
    * the window it replaces. */
  val TopDocsK = 3

  def topDocsPerLang(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.TopK(TopDocsK).toColumn
    Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3.toDouble))
      .agg(agg.name("ids"))
      .toDF("lang", "ids")
      .select(col("lang"), posexplode(col("ids")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col").as("doc_id"))
      .orderBy("lang", "rank")
  }

  val topDocsPerLangSql: String =
    s"""WITH r AS (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM documents)
       |SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id
       |FROM r WHERE rn <= $TopDocsK ORDER BY lang, rank""".stripMargin

  /** q52 — weighted corpus mixing: per-language sampling FRACTIONS from
    * a mixture config (the "data mixing weights" step of training-corpus
    * assembly — upsample rare languages, downsample dominant ones).
    * Same deterministic md5 rank order as q31, but each stratum gets
    * its own quota ceil(|stratum| · w_lang); languages absent from the
    * config default to weight 0 (dropped). One (lang)-keyed shuffle. */
  val MixWeights: Seq[(String, Double)] = Seq(
    "en" -> 0.5, "es" -> 0.3, "de" -> 0.2, "fr" -> 0.1, "zh" -> 0.05)

  def weightedMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val weight = MixWeights.foldLeft(lit(0.0)) { case (acc, (l, w)) =>
      when(col("lang") === l, w).otherwise(acc) }
    val stratum = Window.partitionBy(col("lang"))
    val order = stratum.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        row_number().over(order).as("rk"),
        count(lit(1)).over(stratum).as("cnt"))
      .filter(col("rk") <= ceil(col("cnt") * weight))
      .select(col("doc_id"), col("lang"),
        col("rk").cast("long").as("stratum_rank"),
        col("cnt").as("stratum_size"))
      .orderBy("doc_id")
  }

  val weightedMixSql: String = {
    val cases = MixWeights.map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
      .mkString(" ")
    s"""WITH r AS (
       |  SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
       |         count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM documents)
       |SELECT doc_id, lang,
       |       CAST(rk AS BIGINT) AS stratum_rank,
       |       CAST(cnt AS BIGINT) AS stratum_size
       |FROM r WHERE rk <= ceil(cnt * (CASE $cases ELSE 0.0 END))
       |ORDER BY doc_id""".stripMargin
  }

  val stratifiedSampleSql: String =
    s"""WITH r AS (
       |  SELECT doc_id, lang, source,
       |         row_number() OVER (PARTITION BY lang, source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR(20))), doc_id) AS rk,
       |         count(*) OVER (PARTITION BY lang, source) AS cnt
       |  FROM documents)
       |SELECT doc_id, lang, source,
       |       CAST(rk AS BIGINT) AS stratum_rank,
       |       CAST(cnt AS BIGINT) AS stratum_size
       |FROM r WHERE rk <= ceil(cnt * $SampleFrac)
       |ORDER BY doc_id""".stripMargin

  /** q61 — context-window chunking: split each document's token stream
    * into windows of [[ChunkTokens]] tokens advancing by [[ChunkStride]]
    * (trailing overlap = ChunkTokens - ChunkStride, the standard
    * pretraining trick so no span is only ever seen cut in half).
    * Chunk boundaries are pure integer arithmetic on per-doc token
    * counts — `explode(sequence(...))` fans out row-parallel with no
    * shuffle at all until the output sort; a 100 TB corpus chunks at
    * scan speed. The final short chunk is kept iff it adds new tokens
    * (start < n), and its length is clipped. */
  val ChunkTokens = 64
  val ChunkStride = 48

  def contextChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = size(split(col("text"), "\\s+")).cast("long")
    docs
      .select(col("doc_id"), n.as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L),
          greatest(ceil((col("n_tokens") - ChunkTokens).cast("double") /
            ChunkStride).cast("long"), lit(0L)))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkStride).as("start_tok"),
        least(lit(ChunkTokens.toLong),
          col("n_tokens") - col("chunk_id") * ChunkStride).as("chunk_len"))
      .filter(col("chunk_len") > 0)
      .orderBy("doc_id", "chunk_id")
  }

  val contextChunksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         unnest(generate_series(0,
       |           greatest(CAST(ceil(CAST(n_tokens - $ChunkTokens AS DOUBLE)
       |             / $ChunkStride) AS BIGINT), 0))) AS chunk_id
       |  FROM d
       |)
       |SELECT doc_id, chunk_id,
       |       chunk_id * $ChunkStride AS start_tok,
       |       CAST(least($ChunkTokens, n_tokens - chunk_id * $ChunkStride) AS BIGINT) AS chunk_len
       |FROM c
       |WHERE n_tokens - chunk_id * $ChunkStride > 0
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** q72 — sequence packing, the pretraining "concat and slice" step:
    * documents are concatenated in doc_id order into one global token
    * stream, which is cut into fixed [[SeqLen]]-token training
    * sequences. Each document reports its start offset in the stream
    * and the range of sequences it lands in (a long doc can span
    * several; short docs share one).
    *
    * The global exclusive prefix sum is computed with the TWO-PHASE
    * scan (shared with q33): `repartitionByRange(keys)` keeps key
    * order across partition ids, an intra-partition window
    * (partitioned by `spark_partition_id()`) produces local running
    * sums in parallel, per-partition totals (one tiny row per
    * partition) get a driver-side cumsum, and a broadcast join adds
    * the two. No step ever serializes the corpus through one task, so
    * the scan holds at 100 TB — the cumsum over partition TOTALS
    * touches `#partitions` rows, not `#docs`.
    *
    * The range-partitioned frame is pinned with `localCheckpoint`
    * because RangePartitioner samples its bounds: both consumers (the
    * intra window and the totals agg) must see the SAME partitioning,
    * and a recompute could legally resample. Offsets themselves are
    * partitioning-independent, so the pin is about consistency inside
    * one job, not determinism of the result.
    *
    * Sequence ids use integer `div`, not double division, so offsets
    * stay exact past 2^53 tokens. */
  val SeqLen = 512L

  /** (doc_id, n_tokens) → + start_off via the scalable two-phase
    * exclusive prefix sum in doc_id order. */
  def packOffsets(docs: DataFrame): DataFrame =
    packOffsetsBy(docs, Seq(col("doc_id")))

  /** Two-phase exclusive prefix sum of `n_tokens` under the total order
    * given by `orderKeys` (which must be a deterministic total order —
    * include a unique tiebreak column). Adds `start_off`.
    *
    * The per-partition totals cumsum deliberately runs ON THE DRIVER:
    * it touches exactly one row per shuffle partition (32 here, a few
    * thousand on a 1000-executor cluster) — bounded by CLUSTER SIZE,
    * not data size — and doing it driver-side keeps every WindowExec
    * in the plan partitioned (PlanSpec pins that invariant globally).
    * The ranged frame is pinned with `localCheckpoint` because
    * RangePartitioner samples its bounds: both consumers (the intra
    * window and the totals agg) must see the SAME partitioning. */
  def packOffsetsBy(docs: DataFrame, orderKeys: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = docs.sparkSession
    val ranged = docs.repartitionByRange(orderKeys: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val intra = Window.partitionBy("pid").orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = ranged.groupBy("pid").agg(sum("n_tokens").as("pid_total"))
      .orderBy("pid").collect()
    var acc = 0L
    val before = totals.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row }.toSeq
    import spark.implicits._
    val pidBefore = before.toDF("pid", "pid_before")
    ranged
      .withColumn("intra_before", coalesce(sum("n_tokens").over(intra), lit(0L)))
      .join(broadcast(pidBefore), "pid")
      .withColumn("start_off", col("pid_before") + col("intra_before"))
      .drop("pid", "intra_before", "pid_before")
  }

  def sequencePacking(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    packOffsets(docs)
      .withColumn("first_seq", expr(s"start_off div $SeqLen"))
      .withColumn("last_seq", expr(s"(start_off + n_tokens - 1) div $SeqLen"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("first_seq"), col("last_seq"),
        (col("last_seq") - col("first_seq") + 1).as("n_seqs"))
      .orderBy("doc_id")
  }

  /** The oracle states the SAME semantics as one flat window cumsum —
    * fine in DuckDB at test scale, and an independent check that the
    * two-phase decomposition reassembles the exact global scan. */
  val sequencePackingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tokens
       |  FROM documents
       |), o AS (
       |  SELECT doc_id, n_tokens,
       |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
       |  FROM t
       |)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(start_off AS BIGINT) AS start_off,
       |       CAST(start_off // $SeqLen AS BIGINT) AS first_seq,
       |       CAST((start_off + n_tokens - 1) // $SeqLen AS BIGINT) AS last_seq,
       |       CAST((start_off + n_tokens - 1) // $SeqLen
       |            - start_off // $SeqLen + 1 AS BIGINT) AS n_seqs
       |FROM o ORDER BY doc_id""".stripMargin

  /** q59 — deterministic train/val/test split: bucket in [0,100) from
    * the first 8 md5 hex digits of doc_id → 90/5/5. Hash-based (not
    * rank-based) assignment is the production property: a document's
    * split NEVER changes as the corpus grows — append a shard, rerun,
    * and yesterday's val set is still today's val set, so no train/eval
    * leakage across corpus versions. Embarrassingly parallel (no
    * shuffle until the 3-row summary agg); per-split token totals come
    * along in one pass. */
  val SplitBuckets: Seq[(Int, String)] = Seq(90 -> "train", 95 -> "val")

  /** The hash-based split assignment as a Column over a doc_id — shared
    * by q59's summary and q125's leakage audit so the two can't drift. */
  def splitOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket =
      conv(substring(md5(docId.cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    SplitBuckets.foldRight(lit("test"): org.apache.spark.sql.Column) {
      case ((hi, name), acc) => when(bucket < hi, name).otherwise(acc) }
  }

  /** The same assignment as DuckDB SQL over a doc_id expression,
    * generated from [[SplitBuckets]] so the two forms cannot drift. */
  def splitOfSql(docId: String): String = {
    val b = s"('0x'||substr(md5(CAST($docId AS VARCHAR)),1,8))::BIGINT % 100"
    SplitBuckets.map { case (hi, name) => s"WHEN $b < $hi THEN '$name'" }
      .mkString("CASE ", " ", " ELSE 'test' END")
  }

  def trainSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs
      .select(splitOf(col("doc_id")).as("split"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("split")
  }

  val trainSplitSql: String =
    """WITH b AS (
      |  SELECT ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS bucket,
      |         len(string_split_regex(text, '\s+')) AS n_tokens
      |  FROM documents
      |)
      |SELECT CASE WHEN bucket < 90 THEN 'train'
      |            WHEN bucket < 95 THEN 'val'
      |            ELSE 'test' END AS split,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      |FROM b GROUP BY 1 ORDER BY split""".stripMargin

  /** q121 batch geometry: docs per training batch within a length
    * bucket. Buckets are powers of two on token count, so sequences in
    * one batch pad to at most 2× the shortest — the standard
    * dynamic-batching trade. */
  val BatchDocs = 16L

  /** q121 — length-bucketed batch assignment (dynamic batching): bucket
    * every document by ⌈log₂ n_tokens⌉, shuffle within the bucket by
    * the q114 keyed-md5 permutation, and cut each bucket's order into
    * fixed-size training batches. Batching by similar length is what
    * keeps padding waste bounded when sequences collate; the in-bucket
    * shuffle keeps batches i.i.d. within their length class.
    *
    * The in-bucket rank rides [[twoPassRanked]] with an always-pass
    * quota — full ranking, not selection — so no bucket ever
    * serializes through one window task no matter how many documents
    * share a length class (the q105 argument, reused verbatim). The
    * bucket id is exact integer log₂ (bit length of n−1), immune to
    * float log knife-edges on power-of-two counts. */
  def lengthBatches(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      // ceil(log2 n) as bit-length of (n-1): 1..2 -> bucket matches
      // pad-to-2x classes; exact integer arithmetic on both engines
      .withColumn("len_bucket",
        length(conv((col("n_tokens") - 1).cast("string"), 10, 2))
          .cast("long"))
    val ranked = twoPassRanked(docs, Seq("len_bucket"), total => total)
    ranked
      .join(docs.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("len_bucket"),
        expr(s"(stratum_rank - 1) div $BatchDocs").as("batch_id"),
        ((col("stratum_rank") - 1) % BatchDocs).as("batch_pos"))
      .orderBy("doc_id")
  }

  val lengthBatchesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
       |           AS n_tokens
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(length(bin(n_tokens - 1)) AS BIGINT) AS len_bucket
       |  FROM d
       |), r AS (
       |  SELECT doc_id, n_tokens, len_bucket,
       |         row_number() OVER (PARTITION BY len_bucket
       |           ORDER BY md5(CAST(doc_id AS VARCHAR(20))), doc_id) AS rk
       |  FROM b)
       |SELECT doc_id, n_tokens, len_bucket,
       |       CAST((rk - 1) // $BatchDocs AS BIGINT) AS batch_id,
       |       CAST((rk - 1) % $BatchDocs AS BIGINT) AS batch_pos
       |FROM r ORDER BY doc_id""".stripMargin

  /** q114 epoch-shuffle geometry: the seed names the epoch (re-seeding
    * re-permutes the corpus between epochs — the property pretraining
    * needs) and shards hold a fixed DOC count (q33 shards by token
    * budget; this is the row-count twin). */
  val EpochSeed = "epoch-1"
  val EpochShardDocs = 64L

  /** q114 — deterministic epoch shuffle: assign every document a
    * pseudorandom-but-reproducible global shuffle rank (md5 over
    * seed:doc_id — a keyed permutation, so epoch N+1 reshuffles by
    * changing one literal) and cut the permuted order into fixed-size
    * shards. This is THE step between curation and the trainer: the
    * global order must be uniform, stable under re-runs, and computed
    * without ever serializing the corpus through one task.
    *
    * The rank is the [[packOffsetsBy]] two-phase exclusive prefix sum
    * of 1 under the (hash, doc_id) total order — every window in the
    * plan stays partitioned (PlanSpec's global invariant), the
    * per-partition totals cumsum touches #partitions rows, and the
    * hash order itself is embarrassingly parallel. The oracle states
    * the same semantics as one flat row_number window — fine at test
    * scale in DuckDB, and an independent proof the decomposition
    * reassembles the exact global permutation. */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(concat(lit(EpochSeed + ":"), col("doc_id").cast("string")))
          .as("h"),
        lit(1L).as("n_tokens"))
    packOffsetsBy(docs, Seq(col("h"), col("doc_id")))
      .select(col("doc_id"), col("start_off").as("shuffle_rank"),
        expr(s"start_off div $EpochShardDocs").as("shard_id"),
        (col("start_off") % EpochShardDocs).as("shard_pos"))
      .orderBy("doc_id")
  }

  /** Temperature for q116 — the multilingual-pretraining standard
    * (τ < 1 upsamples small sources toward uniform; τ = 1 is
    * proportional, τ = 0 uniform). 0.7 is the published mT5 default. */
  val MixTau = 0.7

  /** q116 — temperature-scaled source mixing: the sampling weights a
    * multilingual/multi-source pretraining run uses to keep big crawls
    * from drowning small high-quality sources. Each source reports its
    * natural share n_s/N, its temperature weight n_s^τ / Σ n_t^τ, and
    * the boost factor between them — the artifact a curator reads to
    * see exactly how hard each source is being up/down-sampled (boost
    * > 1 = upsampled). q52/q109 CONSUME a fixed weight map; this
    * DERIVES one from corpus statistics.
    *
    * Scale shape: one count-agg to |sources| rows, then arithmetic on
    * the bounded cell table with the two totals as driver anchors
    * (q86's marginal pattern) — nothing corpus-sized after the first
    * shuffle. Float policy: the 6-dp round at the edge absorbs libm
    * pow/sum ulp skew (the q70 rule). */
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.load(spark, sfDir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    // exact nano-sum (q196 doctrine): the pow(n,τ) terms are floats
    // and the weights land on the round(6) grid
    val t = per.agg(sum("n_docs"),
      Exact.sum9(pow(col("n_docs").cast("double"), MixTau))).first()
    val nt = t.getLong(0).toDouble
    val wt = t.getLong(1).toDouble / 1e9
    val share = col("n_docs").cast("double") / nt
    val w = pow(col("n_docs").cast("double"), MixTau) / wt
    per.select(col("source"), col("n_docs"),
        round(share, 6).as("share"),
        round(w, 6).as("temp_weight"),
        round(w / share, 6).as("boost"))
      .orderBy("source")
  }

  val temperatureMixSql: String =
    s"""WITH per AS (
       |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
       |), t AS (
       |  SELECT SUM(n_docs)::DOUBLE AS nt,
       |         CAST(${Exact.sum9Sql(s"pow(n_docs::DOUBLE, $MixTau::DOUBLE)")}
       |              AS DOUBLE) / 1e9 AS wt
       |  FROM per
       |)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |       round(n_docs::DOUBLE / nt, 6) AS share,
       |       round(pow(n_docs::DOUBLE, $MixTau::DOUBLE) / wt, 6)
       |         AS temp_weight,
       |       round((pow(n_docs::DOUBLE, $MixTau::DOUBLE) / wt)
       |             / (n_docs::DOUBLE / nt), 6) AS boost
       |FROM per, t ORDER BY source""".stripMargin

  val epochShuffleSql: String =
    s"""WITH r AS (
       |  SELECT doc_id,
       |         row_number() OVER (
       |           ORDER BY md5('$EpochSeed:' || CAST(doc_id AS VARCHAR)),
       |                    doc_id) - 1 AS rk
       |  FROM documents
       |)
       |SELECT doc_id, CAST(rk AS BIGINT) AS shuffle_rank,
       |       CAST(rk // $EpochShardDocs AS BIGINT) AS shard_id,
       |       CAST(rk % $EpochShardDocs AS BIGINT) AS shard_pos
       |FROM r ORDER BY doc_id""".stripMargin

  /** q244 — shuffle-decorrelation audit of the q114 epoch permutation:
    * if the keyed-md5 shuffle is doing its job, adjacent documents in
    * the training order should collide on source no more often than a
    * uniform random permutation predicts — observed same-source
    * adjacent pairs vs the exact expectation n_s(n_s−1)/N per source
    * (N−1 adjacent slots × probability both ends are s). A ratio well
    * above 1 means the trainer will see source-correlated batches (the
    * gradient-noise pathology shuffling exists to prevent); this is
    * the audit that catches a broken or biased permutation BEFORE a
    * run trains on it.
    *
    * Scale shape: adjacency never uses a global window — shuffle_rank
    * is dense, so "rank r next to rank r+1" is a self EQUI-join on the
    * rank (embarrassingly parallel, shuffle on an integer key); counts
    * and the 1-row corpus total ride broadcast anchors (q73's scalar
    * shape). Expected counts are exact integer products over one final
    * double division, rounded at the edge.
    */
  def shuffleAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
    val sh = epochShuffle(spark, sfDir)
      .select(col("doc_id"), col("shuffle_rank"))
      .join(src, Seq("doc_id"))
    val a = sh.select(col("shuffle_rank").as("r"), col("source").as("sa"))
    val b = sh.select((col("shuffle_rank") - 1).as("r"),
      col("source").as("sb"))
    val per = a.join(b, Seq("r"))
      .filter(col("sa") === col("sb"))
      .groupBy(col("sa").as("source"))
      .agg(count(lit(1)).as("n_adj_same"))
    val counts = src.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("nn"))
    val expected = (col("n_docs") * (col("n_docs") - 1)).cast("double") /
      col("nn").cast("double")
    counts.join(per, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        coalesce(col("n_adj_same"), lit(0L)).as("n_adj_same"),
        round(expected, 6).as("expected_same"),
        round(when(col("n_docs") > 1,
            coalesce(col("n_adj_same"), lit(0L)).cast("double") / expected)
          .otherwise(0.0), 6).as("ratio"))
      .orderBy("source")
  }

  val shuffleAuditSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |         row_number() OVER (
       |           ORDER BY md5('$EpochSeed:' || CAST(doc_id AS VARCHAR)),
       |                    doc_id) - 1 AS r
       |  FROM documents
       |), j AS (
       |  SELECT sh.r, d.source
       |  FROM sh JOIN documents d USING (doc_id)
       |), per AS (
       |  SELECT a.source, COUNT(*) AS n_adj_same
       |  FROM j a JOIN j b ON b.r = a.r + 1
       |  WHERE a.source = b.source
       |  GROUP BY 1
       |), c AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1
       |), t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM c)
       |SELECT c.source, c.n_docs,
       |       CAST(COALESCE(per.n_adj_same, 0) AS BIGINT) AS n_adj_same,
       |       round((c.n_docs * (c.n_docs - 1))::DOUBLE / nn::DOUBLE, 6)
       |         AS expected_same,
       |       round(CASE WHEN c.n_docs > 1
       |             THEN COALESCE(per.n_adj_same, 0)::DOUBLE
       |                  / ((c.n_docs * (c.n_docs - 1))::DOUBLE / nn::DOUBLE)
       |             ELSE 0.0 END, 6) AS ratio
       |FROM c LEFT JOIN per USING (source), t
       |ORDER BY source""".stripMargin

  /** q127 fixture constants: epoch cap C and training budget
    * B = (37/10) × corpus tokens — 3.7 epochs' worth, between C×min and
    * C×max of the fixture's per-source caps, so the allocation splits
    * into a genuinely mixed capped/uncapped outcome. */
  val UnimaxEpochCap = 4
  val UnimaxBudgetNum = 37L
  val UnimaxBudgetDen = 10L

  /** q127 — UniMax token-budget allocation across sources (Chung et
    * al., ICLR 2023: cap every source at C epochs, spread the rest of
    * the budget uniformly). Complements q116: temperature mixing skews
    * SHARES by p^(1/τ); UniMax instead answers "how many tokens of each
    * source may a B-token training run draw without repeating any
    * source more than C times". Sources ascending by size: a source is
    * capped (gets exactly C·nᵢ tokens) while C·nᵢ ≤ remaining/(sources
    * left); everyone after the boundary splits the remainder equally.
    *
    * Scale shape: the corpus-sized work is ONE map-side-combined token
    * count to |sources| rows; the allocation scan is O(|sources| log
    * |sources|) on the driver — the bounded-anchor pattern (q116's
    * totals, q25's codebook), NOT an unpartitioned window and NOT an
    * n² join, both of which PlanSpec bans. |sources| is corpus
    * metadata (hundreds at 100 TB), never data-sized.
    *
    * Exactness: capped-prefix flags ride pure BIGINT arithmetic
    * (C·nᵢ·(N−i+1) ≤ B − Σ_{j<i} C·nⱼ — the naive prefix is exact
    * because caps fail monotonically: once C·nᵢ exceeds the running
    * uniform share, every later, larger source does too). Only the
    * final uniform share divides, in DOUBLE, identically in both
    * engines; round at the edge per the q70 rule. */
  def unimaxBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.load(spark, sfDir, "documents")
      .groupBy("source")
      .agg(sum(size(split(lower(col("text")), "\\s+")).cast("long"))
        .as("n_tokens"))
    val total = per.agg(sum("n_tokens")).first().getLong(0)
    unimaxOn(per, UnimaxBudgetNum * total / UnimaxBudgetDen, UnimaxEpochCap)
  }

  /** Core over an injectable (source, n_tokens) frame — spec plants
    * hand-computable size ladders. `budget`/`cap` in tokens/epochs. */
  def unimaxOn(per: DataFrame, budget: Long, cap: Int): DataFrame = {
    val spark = per.sparkSession
    import spark.implicits._
    val srcs = per.select(col("source").cast("string"),
        col("n_tokens").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, n) => (n, s) }
    val nSrc = srcs.length
    var sPrev = 0L
    val flags = srcs.zipWithIndex.map { case ((_, n), idx) =>
      val f = cap.toLong * n * (nSrc - idx) <= budget - sPrev
      sPrev += cap.toLong * n
      f
    }
    val k = flags.count(identity)
    val sK = srcs.zip(flags).collect { case ((_, n), true) => cap.toLong * n }.sum
    val share = (budget - sK).toDouble / math.max(nSrc - k, 1)
    val rows = srcs.zip(flags).toSeq.map { case ((s, n), f) =>
      val alloc = if (f) (cap.toLong * n).toDouble else share
      (s, n, f, alloc, alloc / n)
    }
    rows.toDF("source", "n_tokens", "capped", "alloc_raw", "epochs_raw")
      .select(col("source"), col("n_tokens"), col("capped"),
        round(col("alloc_raw"), 2).as("alloc_tokens"),
        round(col("epochs_raw"), 6).as("epochs"))
      .orderBy("source")
  }

  /** q131 shard counts: the audit compares an 8-shard layout with the
    * 9-shard layout after one shard is added. */
  val RdvShardsBefore = 8
  val RdvShardsAfter = 9

  /** q131 — rendezvous (highest-random-weight) shard assignment and
    * the resize-churn audit (Thaler & Ravishankar 1996, the HRW scheme
    * behind consistent object placement): doc d lands on the shard s
    * maximizing hash(s:d). Adding a shard moves ONLY the docs whose
    * new-shard weight wins — expected churn 1/N_after, and nothing
    * relocates between surviving shards, which is what makes HRW the
    * right layout for an incrementally-growing corpus (a mod-N
    * re-shard would move (N-1)/N of 100 TB; HRW moves 1/N).
    *
    * Engine-portable argmax: each (shard, doc) weight is a 52-bit md5
    * prefix packed as `w·16 + shard`, and the assignment is ONE
    * `greatest(...)` projection over the N packed keys — no explode,
    * no shuffle; the doc-level frame reduces map-side to the ≤N²
    * (old, new) transition matrix before anything moves. Output: one
    * row per shard with before/after populations and arrival/departure
    * counts; the spec pins the HRW invariant (departures flow only to
    * the new shard). */
  def rendezvousShards(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count().toDouble // bounded driver anchor (q116)
    def packed(s: Int) =
      conv(substring(md5(concat(lit(s"s$s:"),
        col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long") * 16 + s
    val before = greatest((0 until RdvShardsBefore).map(packed): _*) % 16
    val after = greatest((0 until RdvShardsAfter).map(packed): _*) % 16
    val m = docs.select(before.as("old_shard"), after.as("new_shard"))
      .groupBy("old_shard", "new_shard").agg(count(lit(1)).as("n"))
      .localCheckpoint() // tiny transition matrix, four consumers below
    val shards = m.sparkSession.range(RdvShardsAfter)
      .select(col("id").as("shard"))
    def tot(key: String, nm: String, onlyMoves: Boolean) = {
      val base = if (onlyMoves) m.filter(col("old_shard") =!= col("new_shard")) else m
      base.groupBy(col(key).as("shard")).agg(sum("n").as(nm))
    }
    shards
      .join(tot("old_shard", "n_before", onlyMoves = false), Seq("shard"), "left")
      .join(tot("new_shard", "n_after", onlyMoves = false), Seq("shard"), "left")
      .join(tot("new_shard", "arrivals", onlyMoves = true), Seq("shard"), "left")
      .join(tot("old_shard", "departures", onlyMoves = true), Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("arrivals"), lit(0L)).as("arrivals"),
        coalesce(col("departures"), lit(0L)).as("departures"),
        round(coalesce(col("arrivals"), lit(0L)).cast("double") / nDocs, 6)
          .as("arrival_frac"))
      .orderBy("shard")
  }

  val rendezvousShardsSql: String = {
    def packedSql(s: Int) =
      s"('0x'||substr(md5('s$s:'||CAST(doc_id AS VARCHAR)),1,13))::BIGINT*16+$s"
    val before = (0 until RdvShardsBefore).map(packedSql).mkString("greatest(", ", ", ")")
    val after = (0 until RdvShardsAfter).map(packedSql).mkString("greatest(", ", ", ")")
    s"""WITH a AS (
       |  SELECT $before % 16 AS old_shard, $after % 16 AS new_shard
       |  FROM documents
       |), m AS (
       |  SELECT old_shard, new_shard, COUNT(*) AS n FROM a GROUP BY 1, 2
       |), nd AS (SELECT SUM(n)::DOUBLE AS total FROM m),
       |shards AS (
       |  SELECT unnest(generate_series(0, ${RdvShardsAfter - 1})) AS shard
       |), nb AS (SELECT old_shard AS shard, SUM(n) AS n_before FROM m GROUP BY 1),
       |na AS (SELECT new_shard AS shard, SUM(n) AS n_after FROM m GROUP BY 1),
       |ar AS (SELECT new_shard AS shard, SUM(n) AS arrivals FROM m
       |       WHERE old_shard <> new_shard GROUP BY 1),
       |dp AS (SELECT old_shard AS shard, SUM(n) AS departures FROM m
       |       WHERE old_shard <> new_shard GROUP BY 1)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |       CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
       |       CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
       |       CAST(COALESCE(arrivals, 0) AS BIGINT) AS arrivals,
       |       CAST(COALESCE(departures, 0) AS BIGINT) AS departures,
       |       round(COALESCE(arrivals, 0)::DOUBLE / total, 6) AS arrival_frac
       |FROM shards LEFT JOIN nb USING (shard) LEFT JOIN na USING (shard)
       |LEFT JOIN ar USING (shard) LEFT JOIN dp USING (shard), nd
       |ORDER BY shard""".stripMargin
  }

  val unimaxBudgetSql: String = {
    val c = UnimaxEpochCap
    s"""WITH per AS (
       |  SELECT source,
       |         SUM(len(string_split_regex(lower(text), '\\s+'))) AS n
       |  FROM documents GROUP BY 1
       |), t AS (
       |  SELECT COUNT(*) AS nn,
       |         $UnimaxBudgetNum * SUM(n) // $UnimaxBudgetDen AS b
       |  FROM per
       |), r AS (
       |  SELECT source, n,
       |         row_number() OVER (ORDER BY n, source) AS i,
       |         COALESCE(SUM($c*n) OVER (ORDER BY n, source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS sp
       |  FROM per
       |), f AS (
       |  SELECT r.*, nn, b, $c*n*(nn - i + 1) <= b - sp AS capped
       |  FROM r, t
       |), k AS (
       |  SELECT COUNT(*) FILTER (WHERE capped) AS kk,
       |         COALESCE(SUM($c*n) FILTER (WHERE capped), 0) AS sk
       |  FROM f
       |)
       |SELECT source, CAST(n AS BIGINT) AS n_tokens, capped,
       |       round(CASE WHEN capped THEN ($c*n)::DOUBLE
       |             ELSE (b - sk)::DOUBLE / greatest(nn - kk, 1) END, 2)
       |         AS alloc_tokens,
       |       round((CASE WHEN capped THEN ($c*n)::DOUBLE
       |             ELSE (b - sk)::DOUBLE / greatest(nn - kk, 1) END)
       |             / n::DOUBLE, 6) AS epochs
       |FROM f, k ORDER BY source""".stripMargin
  }

  /** DSIR geometry: hashed uni+bigram features into B buckets; docs
    * from DsirTarget define the target-domain distribution. */
  val DsirBuckets = 1024
  val DsirTarget = "src0"

  /** q135 — DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-domain-like its hashed n-gram bag is —
    * avg log p_target(b)/p_raw(b) over the doc's features, add-1
    * smoothed — the standard cheap proxy for "select raw-web data
    * that looks like the curated domain" ahead of resampling.
    *
    * Portability: features hash through md5 → 1024 buckets (the q99
    * bucket recipe), so both engines build the identical feature
    * distributions; the bucket log-ratio table has ≤ B rows.
    *
    * Scale shape: gram hashing is map-side; per-doc bucket counts and
    * the two global bucket histograms are keyed aggregations with
    * map-side combine; scoring is a BROADCAST join of the ≤1024-row
    * log-ratio table back onto per-doc counts — no vocabulary-sized
    * shuffle anywhere, which is the entire point of the hashed
    * features at 100 TB (the vocabulary table DSIR replaces would be
    * corpus-sized). The totals anchor is a 1-row aggregate (q118's t
    * precedent). */
  /** Session memo for the DSIR per-doc weight frame: BOTH q135 (the
    * weights themselves) and q234 (their ESS diagnostics) consume it,
    * so the double-explode feature pass runs once per (session, sfDir)
    * and the pinned result — one row per doc — serves both (the
    * Dedup.memoized pattern). */
  graft.Memo.declare("dsir")(dsirWeightsFresh)

  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo.memoized(spark, sfDir, "dsir")(
      (dsirWeightsFresh(spark, sfDir), Nil))

  /** Uncached single-pass build (plan-shape tests pin THIS). */
  def dsirWeightsFresh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val w = split(lower(col("text")), "\\s+")
    val grams = docs.select(col("doc_id"), col("source"), w.as("w"))
      .select(col("doc_id"), col("source"),
        // unigrams ++ bigrams in one explode; the kernel yields an
        // empty array below 2 words, so no size guard is needed
        explode(concat(col("w"), word_ngrams(col("w"), 2))).as("g"))
    val feat = grams.select(col("doc_id"), col("source"),
      (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long")
        % DsirBuckets).as("b"))
    val perDoc = feat.groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("c"))
    val buckets = feat.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("source") === DsirTarget, 1L).otherwise(0L)).as("ct"))
    val tot = buckets.agg(sum("cr"), sum("ct")).first()
    val (rTot, tTot) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
    val lr = log((col("ct") + lit(1L)).cast("double") /
        lit(tTot + DsirBuckets)) -
      log((col("cr") + lit(1L)).cast("double") / lit(rTot + DsirBuckets))
    perDoc.join(broadcast(buckets.select(col("b"), lr.as("lr"))), Seq("b"))
      .groupBy("doc_id", "source")
      .agg(sum("c").as("n_feats"),
        // exact nano-sum (q196 doctrine): float c·lr terms feeding
        // the round(6) avg_log_ratio grid
        Exact.sum9(col("c") * col("lr")).as("s9"))
      .select(col("doc_id"), col("source"), col("n_feats"),
        round(col("s9").cast("double") / 1e9 /
          col("n_feats").cast("double"), 6)
          .as("avg_log_ratio"))
      .orderBy("doc_id")
  }

  val dsirWeightsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         string_split_regex(lower(text), '\\s+') AS w
       |  FROM documents
       |), uni AS (
       |  SELECT doc_id, source, unnest(w) AS g FROM d
       |), bi AS (
       |  SELECT doc_id, source, w[i] || ' ' || w[i+1] AS g
       |  FROM (SELECT doc_id, source, w,
       |               unnest(generate_series(1, len(w)-1)) AS i
       |        FROM d WHERE len(w) >= 2)
       |), g AS (
       |  SELECT * FROM uni UNION ALL SELECT * FROM bi
       |), f AS (
       |  SELECT doc_id, source,
       |         ('0x'||substr(md5(g),1,8))::BIGINT % $DsirBuckets AS b
       |  FROM g
       |), pd AS (
       |  SELECT doc_id, source, b, COUNT(*) AS c FROM f GROUP BY 1, 2, 3
       |), bk AS (
       |  SELECT b, COUNT(*) AS cr,
       |         SUM(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS ct
       |  FROM f GROUP BY 1
       |), tt AS (
       |  SELECT SUM(cr)::DOUBLE AS r, SUM(ct)::DOUBLE AS t FROM bk
       |), lr AS (
       |  SELECT b, ln((ct + 1)::DOUBLE / (t + $DsirBuckets))
       |           - ln((cr + 1)::DOUBLE / (r + $DsirBuckets)) AS lr
       |  FROM bk, tt
       |)
       |SELECT pd.doc_id, pd.source, CAST(SUM(c) AS BIGINT) AS n_feats,
       |       round(CAST(${Exact.sum9Sql("c * lr.lr")} AS DOUBLE) / 1e9
       |             / CAST(SUM(c) AS DOUBLE), 6) AS avg_log_ratio
       |FROM pd JOIN lr USING (b)
       |GROUP BY 1, 2 ORDER BY pd.doc_id""".stripMargin

  /** q234 — effective sample size of the DSIR importance weights, per
    * source: ESS = (Σw)²/Σw² with w = exp(q135's avg log-ratio) — the
    * Kish/Owen diagnostic every importance-weighted selection run
    * reports before trusting its weights. efficiency = ESS/n says what
    * fraction of the source's documents the weighted sample is
    * actually worth; max_w_share warns when a single document
    * dominates the mixture (the failure mode temperature-flattening
    * exists to fix). DSIR itself (Xie et al. 2023) reports exactly
    * this number; q135 derives the weights, this prices them.
    *
    * Scale shape: rides the q135 pipeline (hashed-bucket features, a
    * ≤1024-row broadcast log-ratio table), then ONE |sources|-row
    * aggregate carrying three float sums per group; the 4/6-dp rounds
    * at the edge absorb summation-order ulps (the q70 rule). */
  def dsirEss(spark: SparkSession, sfDir: String): DataFrame = {
    // The per-doc weight is quantized to integer NANO-units before the
    // per-source reduction: exp() runs on the memoized frame's already
    // 6-dp-rounded log-ratio (cross-engine-stable bits), and the
    // round(·×1e9) scalar absorbs any libm exp() ulp. The Σw / Σw²
    // folds then run EXACT (DECIMAL(38,0); HUGEINT in the twin) — this
    // was the float-policy audit's one genuine fold-over-a-fold chain
    // (an unordered double Σ over values that were themselves fold
    // outputs, the q226 flake class); nano-scaling cancels exactly in
    // (Σw)²/Σw², so only the final divisions are floating.
    val wn = round(exp(col("avg_log_ratio")) * 1e9, 0).cast("long")
    val wnDec = col("wn").cast("decimal(38,0)")
    dsirWeights(spark, sfDir)
      .select(col("source"), wn.as("wn"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(wnDec).as("sw"),
        sum(wnDec * wnDec).as("sw2"), max(col("wn")).as("mw"))
      .select(col("source"), col("n_docs"),
        round(col("sw").cast("double") * col("sw").cast("double") /
          col("sw2").cast("double"), 4).as("ess"),
        round(col("sw").cast("double") * col("sw").cast("double") /
          col("sw2").cast("double") /
          col("n_docs").cast("double"), 6).as("efficiency"),
        round(col("mw").cast("double") /
          col("sw").cast("double"), 6).as("max_w_share"))
      .orderBy("source")
  }

  val dsirEssSql: String =
    s"""WITH dw AS ($dsirWeightsSql),
       |w AS (SELECT source,
       |             CAST(round(exp(avg_log_ratio) * 1e9) AS BIGINT) AS wn
       |      FROM dw)
       |SELECT source, COUNT(*) AS n_docs,
       |       round(SUM(wn::HUGEINT)::DOUBLE * SUM(wn::HUGEINT)::DOUBLE
       |             / SUM(wn::HUGEINT * wn)::DOUBLE, 4) AS ess,
       |       round(SUM(wn::HUGEINT)::DOUBLE * SUM(wn::HUGEINT)::DOUBLE
       |             / SUM(wn::HUGEINT * wn)::DOUBLE
       |             / COUNT(*)::DOUBLE, 6) AS efficiency,
       |       round(MAX(wn)::DOUBLE / SUM(wn::HUGEINT)::DOUBLE, 6)
       |         AS max_w_share
       |FROM w GROUP BY source ORDER BY source""".stripMargin

  /** Weighted-reservoir draw size per source. */
  val ReservoirK = 3

  /** q151 — deterministic weighted reservoir sampling (Efraimidis &
    * Spirakis 2006, A-ES): draw K docs per source with probability
    * proportional to length, WITHOUT an RNG — each doc's uniform draw
    * u ∈ (0,1) derives from md5(doc_id) (the q31 determinism
    * discipline), its reservoir key is ln(u)/w (the monotone form of
    * u^{1/w}), and the K largest keys per source win. Identical draws
    * on both engines and on every re-run — reproducible weighted
    * sampling, which is what an ablation pipeline actually needs.
    *
    * Scale shape: the key is map-side arithmetic on the scan; the
    * per-source top-K plans as WindowGroupLimit (partial top-K before
    * the shuffle), so the full corpus never sorts — the one-pass
    * distributed reservoir. */
  def weightedReservoir(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // u from 13 hex chars (52 bits — fits a double exactly); (u+1)/16^13
    // keeps u strictly inside (0,1) so ln(u) is finite
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(math.pow(16.0, 13))
    val key = log(u) / col("n_chars").cast("double")
    val w = Window.partitionBy("source")
      .orderBy(col("key").desc, col("doc_id"))
    docs.select(col("source"), col("doc_id"), col("n_chars"), key.as("key"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ReservoirK)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
        round(col("key") * 1e6, 6).as("key_micro"))
      .orderBy("source", "rk")
  }

  val weightedReservoirSql: String =
    s"""WITH keyed AS (
       |  SELECT source, doc_id, n_chars,
       |         ln((('0x'||substr(md5(doc_id::VARCHAR),1,13))::BIGINT
       |             ::DOUBLE + 1.0) / ${math.pow(16.0, 13)})
       |           / n_chars::DOUBLE AS key
       |  FROM documents
       |), ranked AS (
       |  SELECT source, doc_id, n_chars, key,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY key DESC, doc_id) AS rk
       |  FROM keyed
       |)
       |SELECT source, CAST(rk AS INT) AS rk, doc_id, n_chars,
       |       round(key * 1e6, 6) AS key_micro
       |FROM ranked WHERE rk <= $ReservoirK
       |ORDER BY source, rk""".stripMargin

  /** q192 — deterministic k-fold assignment with a balance audit: fold =
    * md5(doc_id) mod K (engine-portable, independent of the q59 split
    * hash's first-8-hex bucket — this one reads hex digits 9-16 so fold
    * and split assignments are independent bits), then per (fold, lang)
    * doc/token counts and the fold-internal language share. The share a
    * consumer compares against the corpus share to detect a fold that
    * accidentally concentrated one language — the cross-validation
    * hygiene check. One pass, one partial+final agg, a fold-partitioned
    * window over K·|langs| aggregated rows.
    */
  val KFolds = 5L

  def kfold(spark: SparkSession, sfDir: String): DataFrame = {
    val fold =
      conv(substring(md5(col("doc_id").cast("string")), 9, 8), 16, 10)
        .cast("long") % KFolds
    val docs = Tables.load(spark, sfDir, "documents")
    val byFold = docs
      .select(fold.as("fold"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fold")
    byFold
      .withColumn("fold_docs", sum(col("n_docs")).over(w))
      .select(col("fold"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("fold_docs").cast("double"),
          6).as("lang_share"))
      .orderBy("fold", "lang")
  }

  val kfoldSql: String =
    s"""WITH b AS (
       |  SELECT ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),9,8))::BIGINT
       |           % $KFolds AS fold,
       |         lang,
       |         len(string_split_regex(text, '\\s+')) AS n_tokens
       |  FROM documents
       |), g AS (
       |  SELECT fold, lang, COUNT(*) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |  FROM b GROUP BY 1, 2
       |)
       |SELECT fold, lang, n_docs, n_tokens,
       |       round(CAST(n_docs AS DOUBLE) /
       |             CAST(SUM(n_docs) OVER (PARTITION BY fold) AS DOUBLE), 6)
       |         AS lang_share
       |FROM g ORDER BY fold, lang""".stripMargin

  /** q212 — target-mix reweighting: the per-(source, lang) sampling
    * weight that flattens the corpus to a UNIFORM joint mixture (the
    * standard "train on equal shares per domain×language cell"
    * rebalance). weight = target_share / corpus_share
    * = N / (G · n_cell), computed as one shared IEEE sequence from
    * exact integer counts, so both engines emit identical doubles.
    * `eff_chars` is what the cell contributes to a weighted token
    * budget. Scale shape: a |cells|-sized aggregate (map-side combine
    * collapses the corpus scan) crossed with the 1-row (N, G) anchor —
    * the scalar-broadcast shape q73/q191 pin, constant-bounded.
    */
  def targetMixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.load(spark, sfDir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val tot = cells.agg(sum(col("n_docs")).as("nn"),
      count(lit(1)).as("gg"))
    cells.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
        (col("nn").cast("double") / (col("gg") * col("n_docs")))
          .as("weight"),
        ((col("nn").cast("double") / (col("gg") * col("n_docs"))) *
          col("n_chars")).as("eff_chars"))
      .orderBy("source", "lang")
  }

  val targetMixWeightsSql: String =
    """WITH cells AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |         CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY 1, 2
      |), tot AS (
      |  SELECT SUM(n_docs) AS nn, COUNT(*) AS gg FROM cells
      |)
      |SELECT source, lang, n_docs, n_chars,
      |       CAST(nn AS DOUBLE) / (gg * n_docs) AS weight,
      |       (CAST(nn AS DOUBLE) / (gg * n_docs)) * n_chars AS eff_chars
      |FROM cells, tot
      |ORDER BY source, lang""".stripMargin

  /** q226's planning constants: the training run wants
    * [[BudgetMultiple]]× the corpus's total tokens, split uniformly
    * across sources, and no source may repeat more than [[EpochCap]]
    * epochs (the data-constrained-scaling guidance of Muennighoff et
    * al., NeurIPS'23: returns from repeated data decay fast after ~4
    * epochs). Exact integers — the whole planner stays in integer
    * arithmetic end-to-end. */
  val BudgetMultiple = 2L
  val EpochCap = 4L

  /** q226 — token-budget epoch planner, the data-constrained-scaling
    * worksheet: given a training budget of [[BudgetMultiple]]× total
    * corpus tokens split uniformly across sources, how many epochs of
    * each source does its share demand, how much does the
    * [[EpochCap]]-epoch repeat limit actually serve, and what
    * shortfall must be re-mixed elsewhere? The planner output is the
    * artifact mixture designers iterate on before launching a 100 TB
    * tokenization run — q212 flattens shares, this prices them in
    * epochs against the repeat cap.
    *
    * Determinism: every output is an exact BIGINT — token columns are
    * scaled ×10⁴ and epoch columns ×10⁶, computed by integer floor
    * division from exact integer token counts in BOTH engines, so no
    * IEEE rounding (and no engine's float formatting) can ever touch
    * the hash. `served_e4 + shortfall_e4 == target_e4` holds as an
    * exact integer identity, and `capped` is the exact comparison
    * t > [[EpochCap]]/[[BudgetMultiple]]·s·n (integers only).
    *
    * Scale shape: one corpus scan collapses to an S-row (source,
    * n_tokens) aggregate with map-side combine; everything after rides
    * the 1-row total anchor (q73's scalar-broadcast shape,
    * PlanSpec-exempt). */
  def epochPlanner(spark: SparkSession, sfDir: String): DataFrame = {
    val perSource = Tables.load(spark, sfDir, "documents")
      .select(col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))
    val tot = perSource.agg(sum("n_tokens").as("t"),
      count(lit(1)).as("s"))
    // all operands positive, so Spark `div` (truncating) ≡ DuckDB `//`.
    // The ×10⁴/×10⁶ products run in DECIMAL(38,0) (HUGEINT in the
    // oracle): in BIGINT they would wrap past ~4.6e12 total tokens —
    // INSIDE the 100 TB design point (~2.5e13 tokens). After widening,
    // the first saturation is the e4-scaled OUTPUT column itself at
    // ~9.2e14 target tokens, comfortably beyond it.
    val tD = s"CAST(t AS DECIMAL(38,0))"
    val targetE4 = expr(s"($BudgetMultiple * $tD * 10000) div s")
    val neededE6 = expr(
      s"($BudgetMultiple * $tD * 1000000) div (CAST(s AS DECIMAL(38,0)) * n_tokens)")
    val capTokE4 = col("n_tokens") * lit(EpochCap * 10000L)
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        targetE4.as("target_tokens_e4"),
        neededE6.as("epochs_needed_e6"),
        least(neededE6, lit(EpochCap * 1000000L)).as("epochs_served_e6"),
        least(targetE4, capTokE4).as("served_tokens_e4"),
        greatest(targetE4 - capTokE4, lit(0L)).as("shortfall_tokens_e4"),
        expr(s"CAST($BudgetMultiple AS DECIMAL(38,0)) * t > " +
          s"CAST($EpochCap AS DECIMAL(38,0)) * s * n_tokens").as("capped"))
      .orderBy("source")
  }

  val epochPlannerSql: String =
    s"""WITH per AS (
       |  SELECT source,
       |         CAST(SUM(len(string_split_regex(lower(text), '\\s+')))
       |              AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t, COUNT(*) AS s FROM per
       |)
       |SELECT source, n_tokens,
       |       CAST(($BudgetMultiple * t::HUGEINT * 10000) // s AS BIGINT)
       |         AS target_tokens_e4,
       |       CAST(($BudgetMultiple * t::HUGEINT * 1000000)
       |            // (s::HUGEINT * n_tokens)
       |            AS BIGINT) AS epochs_needed_e6,
       |       CAST(LEAST(($BudgetMultiple * t::HUGEINT * 1000000)
       |                  // (s::HUGEINT * n_tokens),
       |                  ${EpochCap * 1000000L}) AS BIGINT)
       |         AS epochs_served_e6,
       |       CAST(LEAST(($BudgetMultiple * t::HUGEINT * 10000) // s,
       |                  n_tokens * ${EpochCap * 10000L}) AS BIGINT)
       |         AS served_tokens_e4,
       |       CAST(GREATEST(($BudgetMultiple * t::HUGEINT * 10000) // s
       |                     - n_tokens * ${EpochCap * 10000L}, 0) AS BIGINT)
       |         AS shortfall_tokens_e4,
       |       ($BudgetMultiple * t::HUGEINT >
       |        $EpochCap * s::HUGEINT * n_tokens) AS capped
       |FROM per CROSS JOIN tot
       |ORDER BY source""".stripMargin

  /** Candidate context lengths q230 sweeps — the training-config choice
    * the fragmentation curve prices. Includes q72's own [[SeqLen]] so
    * the sweep contains the deployed configuration. */
  val ContextLens: Seq[Long] = Seq(256L, 512L, 1024L, 2048L)

  /** q230 — context-length fragmentation sweep: under q72's
    * concat-and-slice packing, how many documents get SPLIT across a
    * sequence boundary at each candidate context length, how many
    * fragments the average document shatters into, and the tail
    * padding the last sequence carries. Longer contexts fragment fewer
    * documents (better attention locality, fewer truncated
    * dependencies) but cost quadratic attention — this emits the data
    * side of that trade-off for the actual corpus, per candidate L,
    * before anyone pays for a tokenization run.
    *
    * Scale shape: ONE two-phase prefix sum gives every document its
    * stream offset (L-independent, shared kernel with q72/q33 — no
    * unpartitioned window); each doc then map-side explodes the
    * 4-element literal length array (the q209/q218 no-join sweep
    * shape) and everything reduces to a |lengths|-row aggregate plus
    * the 1-row token total (bounded-broadcast cross, PlanSpec-exempt).
    * All columns are exact integers except the two 6-dp means. */
  def contextSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val off = packOffsets(docs)
    val lens = array(ContextLens.map(lit): _*)
    val e = off.select(col("n_tokens"), col("start_off"),
        explode(lens).as("ctx_len"))
      .withColumn("frags",
        expr("(start_off + n_tokens - 1) div ctx_len") -
          expr("start_off div ctx_len") + 1)
    val per = e.groupBy("ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("frags") > 1).cast("long")).as("n_split"),
        round(avg((col("frags") > 1).cast("double")), 6).as("split_frac"),
        round(avg(col("frags").cast("double")), 6).as("mean_fragments"))
    val tot = docs.agg(sum("n_tokens").as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .withColumn("n_seqs",
        expr("(total_tokens + ctx_len - 1) div ctx_len"))
      .withColumn("tail_pad_tokens",
        col("n_seqs") * col("ctx_len") - col("total_tokens"))
      .drop("total_tokens")
      .orderBy("ctx_len")
  }

  val contextSweepSql: String = {
    val lens = ContextLens.mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tokens
       |  FROM documents
       |), o AS (
       |  SELECT doc_id, n_tokens,
       |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS start_off
       |  FROM t
       |), l AS (SELECT unnest([$lens]::BIGINT[]) AS ctx_len),
       |e AS (
       |  SELECT ctx_len, n_tokens,
       |         (start_off + n_tokens - 1) // ctx_len
       |           - start_off // ctx_len + 1 AS frags
       |  FROM o CROSS JOIN l
       |), per AS (
       |  SELECT ctx_len, COUNT(*) AS n_docs,
       |         CAST(SUM(CASE WHEN frags > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_split,
       |         round(AVG(CASE WHEN frags > 1 THEN 1.0 ELSE 0.0 END), 6)
       |           AS split_frac,
       |         round(AVG(frags::DOUBLE), 6) AS mean_fragments
       |  FROM e GROUP BY 1
       |), tot AS (SELECT SUM(n_tokens) AS total_tokens FROM t)
       |SELECT ctx_len, n_docs, n_split, split_frac, mean_fragments,
       |       CAST((total_tokens + ctx_len - 1) // ctx_len AS BIGINT)
       |         AS n_seqs,
       |       CAST(((total_tokens + ctx_len - 1) // ctx_len) * ctx_len
       |            - total_tokens AS BIGINT) AS tail_pad_tokens
       |FROM per CROSS JOIN tot
       |ORDER BY ctx_len""".stripMargin
  }

  /** q239's batching constants: documents bucket by token length in
    * [[LenBucketWidth]]-token bands and batch [[PadBatchDocs]] at a time
    * within a bucket (pad-to-longest-in-batch, the standard
    * length-bucketed alternative to q72's packing). */
  val PadBatchDocs = 32L
  val LenBucketWidth = 64L

  /** q239 — padding-waste audit of length-bucketed batching: if
    * training DIDN'T pack sequences (q72) but instead bucketed
    * documents by length and padded each [[PadBatchDocs]]-doc batch to
    * its longest member, how many pad tokens would every length band
    * burn? Reports, per band: docs, batches, real tokens, padded
    * slots, waste, waste rate — the measured side of the
    * pack-vs-pad decision (and the empirical case for packing: waste
    * concentrates in the wide bands). Complements q121, which ASSIGNS
    * docs to log₂-bucketed batches (per-doc output, shuffle-ranked);
    * this PRICES the padding a pad-to-longest collate would cost per
    * linear band — the aggregate audit a mixture designer reads, not
    * an assignment.
    *
    * Scale shape: the in-bucket batch index comes from the SAME
    * two-phase prefix-sum kernel as q33/q72 (count-prefix over
    * (bucket, doc_id) order minus a per-bucket base — never an
    * unpartitioned window over per-doc rows); the base is a cumsum
    * over the |bands|-row bucket-count aggregate (bounded by max
    * document length / band width, NOT corpus size — the q58 bounded-
    * input window argument, PlanSpec-exempt) broadcast back onto the
    * offsets. Everything else is two keyed aggregates with map-side
    * combine. All columns exact integers except the final 6-dp
    * rate. */
  def paddingWaste(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"))
      .withColumn("bucket", expr(s"nt div $LenBucketWidth"))
    val base = docs.select(col("doc_id"), col("bucket"), col("nt"),
      lit(1L).as("n_tokens"))
    val off = packOffsetsBy(base, Seq(col("bucket"), col("doc_id")))
    // the per-bucket start index = total docs in EARLIER buckets: a
    // cumsum over the tiny bucket-count aggregate, not a second pass
    // of the corpus-sized window
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBase = docs.groupBy("bucket")
      .agg(count(lit(1)).as("cb"))
      .withColumn("b0", coalesce(sum("cb").over(wB), lit(0L)))
      .select("bucket", "b0")
    off.join(broadcast(bucketBase), Seq("bucket"))
      .withColumn("batch_id", expr(s"(start_off - b0) div $PadBatchDocs"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("nb"), max("nt").as("mx"), sum("nt").as("sl"))
      .groupBy("bucket")
      .agg(sum("nb").as("n_docs"), count(lit(1)).as("n_batches"),
        sum("sl").as("n_tokens"),
        sum(col("nb") * col("mx")).as("padded_tokens"))
      .select(col("bucket").as("len_bucket"), col("n_docs"),
        col("n_batches"), col("n_tokens"), col("padded_tokens"),
        (col("padded_tokens") - col("n_tokens")).as("waste_tokens"),
        round((col("padded_tokens") - col("n_tokens")).cast("double") /
          col("padded_tokens").cast("double"), 6).as("waste_rate"))
      .orderBy("len_bucket")
  }

  val paddingWasteSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         len(string_split_regex(text, '\\s+')) AS nt,
       |         len(string_split_regex(text, '\\s+')) // $LenBucketWidth
       |           AS bucket
       |  FROM documents
       |), i AS (
       |  SELECT bucket, nt,
       |         (row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
       |          - 1) // $PadBatchDocs AS batch_id
       |  FROM t
       |), b AS (
       |  SELECT bucket, batch_id, COUNT(*) AS nb, MAX(nt) AS mx,
       |         SUM(nt) AS sl
       |  FROM i GROUP BY 1, 2
       |)
       |SELECT CAST(bucket AS BIGINT) AS len_bucket,
       |       CAST(SUM(nb) AS BIGINT) AS n_docs,
       |       CAST(COUNT(*) AS BIGINT) AS n_batches,
       |       CAST(SUM(sl) AS BIGINT) AS n_tokens,
       |       CAST(SUM(nb * mx) AS BIGINT) AS padded_tokens,
       |       CAST(SUM(nb * mx) - SUM(sl) AS BIGINT) AS waste_tokens,
       |       round((SUM(nb * mx) - SUM(sl))::DOUBLE
       |             / SUM(nb * mx)::DOUBLE, 6) AS waste_rate
       |FROM b GROUP BY 1 ORDER BY len_bucket""".stripMargin

  /** q252 — deterministic bootstrap confidence intervals: the
    * percentile-bootstrap CI for each source's mean document length,
    * with B Poisson(1) resample replicates — the standard way to put
    * honest error bars on any per-slice corpus statistic before acting
    * on it (is source A really longer-form than source B, or is that
    * noise?). The Poisson bootstrap IS the distributed formulation:
    * per-row independent weights need no global resample index, so the
    * whole thing is one corpus scan fanned B ways.
    *
    * Determinism: the replicate weight is the Poisson(1) inverse CDF
    * applied to an md5-derived uniform (per (doc, b), identical in both
    * engines; the CDF thresholds are precomputed ppm integer literals,
    * so w is an exact integer in 0..7). Per-replicate sums fold as
    * BIGINTs; each replicate mean is ONE division of exact integers
    * (identical bits both engines), and the CI bounds are order
    * statistics over those B values — selection, not arithmetic, with
    * the replicate id as a total tiebreak.
    *
    * Scale: the explode is corpus × B rows but stays linear (B is a
    * constant 128) and never materializes — it feeds one partial+final
    * hash aggregate keyed by (source, b), i.e. |sources|·B groups; the
    * rank window partitions by source over exactly B rows (bounded),
    * and the point-estimate branch is a second |sources|-group
    * aggregate off the same slim scan. */
  val BootstrapB = 128

  /** P(Poisson(1) ≤ k) · 1e6, floored, k = 0..6: weight = #{t : u ≥ t}
    * caps at 7 (P(X > 6) ≈ 8e-5 — the truncation is part of the
    * declared semantics, identical in both engines). */
  val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  def bootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val u = pmod(
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("b").cast("string"))), 1, 12), 16, 10).cast("long"),
      lit(1000000L))
    val w = PoissonCdfPpm
      .map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val perRep = docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
      .select(col("source"), col("b"),
        w.as("w"), (w * col("n_chars")).as("wx"))
      .groupBy("source", "b")
      .agg(sum("w").as("sw"), sum("wx").as("swx"))
      .filter(col("sw") > 0)
      .select(col("source"), col("b"),
        (col("swx").cast("double") / col("sw").cast("double")).as("mean_b"))
    val byMean = Window.partitionBy("source").orderBy(col("mean_b"), col("b"))
    val perSrc = Window.partitionBy("source")
    val ci = perRep
      .withColumn("rk", row_number().over(byMean))
      .withColumn("nb", count(lit(1)).over(perSrc))
      .withColumn("lo_rk", expr("(nb * 25) div 1000 + 1"))
      .groupBy("source").agg(
        max(when(col("rk") === col("lo_rk"), col("mean_b"))).as("ci_lo"),
        max(when(col("rk") === col("nb") - col("lo_rk") + 1,
          col("mean_b"))).as("ci_hi"))
    val point = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum("n_chars").as("sc"))
    point.join(ci, Seq("source"))
      .select(col("source"), col("n_docs"),
        round(col("sc").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_chars"),
        round(col("ci_lo"), 6).as("ci_lo_chars"),
        round(col("ci_hi"), 6).as("ci_hi_chars"))
      .orderBy("source")
  }

  val bootstrapCiSql: String = {
    val wTerms = PoissonCdfPpm
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH g AS (
       |  SELECT source, doc_id, n_chars, r.range AS b,
       |         ('0x'||substr(md5(doc_id::VARCHAR||':'||r.range::VARCHAR),
       |                       1, 12))::BIGINT % 1000000 AS u
       |  FROM documents CROSS JOIN range($BootstrapB) r
       |), wts AS (
       |  SELECT source, b, ($wTerms)::BIGINT AS w, n_chars FROM g
       |), rep AS (
       |  SELECT source, b,
       |         SUM(w * n_chars)::DOUBLE / SUM(w)::DOUBLE AS mean_b
       |  FROM wts GROUP BY source, b HAVING SUM(w) > 0
       |), ranked AS (
       |  SELECT source, b, mean_b,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY mean_b, b) AS rk,
       |         COUNT(*) OVER (PARTITION BY source) AS nb
       |  FROM rep
       |), ci AS (
       |  SELECT source,
       |         MAX(CASE WHEN rk = (nb * 25) // 1000 + 1
       |                  THEN mean_b END) AS ci_lo,
       |         MAX(CASE WHEN rk = nb - ((nb * 25) // 1000 + 1) + 1
       |                  THEN mean_b END) AS ci_hi
       |  FROM ranked GROUP BY source
       |), pt AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         SUM(n_chars) AS sc
       |  FROM documents GROUP BY source
       |)
       |SELECT pt.source, n_docs,
       |       round(sc::DOUBLE / n_docs::DOUBLE, 6) AS mean_chars,
       |       round(ci_lo, 6) AS ci_lo_chars,
       |       round(ci_hi, 6) AS ci_hi_chars
       |FROM pt JOIN ci ON pt.source = ci.source
       |ORDER BY pt.source""".stripMargin
  }
}
