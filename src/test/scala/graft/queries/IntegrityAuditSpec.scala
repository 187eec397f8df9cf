package graft.queries

import graft.SparkSpec

/** q117: every violation class the audit claims to catch is planted
  * once and must be counted exactly — and the clean fixture must audit
  * clean (all violation counters zero). */
class IntegrityAuditSpec extends SparkSpec {
  import spark.implicits._

  private def auditMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap

  test("clean fixture audits clean") {
    val got = auditMap(Etl.integrityAudit(spark, sf001).collect())
    assert(got("docs_total") > 0 && got("embeddings_total") > 0)
    Seq("docs_missing_embedding", "embeddings_orphaned",
      "duplicate_doc_ids", "duplicate_vec_ids", "null_or_empty_text")
      .foreach(c => assert(got(c) == 0L, s"$c nonzero on clean fixture"))
  }

  test("each planted violation is counted exactly") {
    // doc 4 has no embedding; embedding 9 is orphaned; doc 2 is
    // duplicated; vec 3 is duplicated; doc 5 has empty text
    val docs = Seq(
      (1L, "ok"), (2L, "dup"), (2L, "dup"), (3L, "ok"),
      (4L, "no embedding"), (5L, "")).toDF("doc_id", "text")
    val embs = Seq(1L, 2L, 3L, 3L, 5L, 9L).toDF("vec_id")
    val got = auditMap(Etl.integrityAuditOn(docs, embs).collect())
    assert(got == Map(
      "docs_total" -> 6L, "embeddings_total" -> 6L,
      "docs_missing_embedding" -> 1L, // doc 4
      "embeddings_orphaned" -> 1L, // vec 9
      "duplicate_doc_ids" -> 1L, // key 2 (one key, not two rows)
      "duplicate_vec_ids" -> 1L, // key 3
      "null_or_empty_text" -> 1L), s"got $got") // doc 5
  }
}
