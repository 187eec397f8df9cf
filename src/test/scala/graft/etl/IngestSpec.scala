package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class IngestSpec extends SparkSpec {

  private def tmpFile(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    val f = dir.resolve(name)
    Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    f.toString
  }

  test("readCsv pins the declared schema, no inference") {
    val p = tmpFile("sales.csv", Seq(
      "TransactionID,Date,CustomerID,ProductID,Amount",
      "1,2024-01-02,10,100,12.34",
      "2,not-a-date,11,101,99.99"))
    val df = Ingest.readCsv(spark, p, Ingest.salesSchema)
    // file sources force nullable=true; names and types must pin exactly
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      Ingest.salesSchema.map(f => (f.name, f.dataType)))
    assert(df.count() == 2)
    // Date stays a string here; coercion happens downstream (P6)
    assert(df.collect().map(_.getString(1)).toSet == Set("2024-01-02", "not-a-date"))
  }

  test("readJsonl reads schema-pinned lines and nulls unparseable fields") {
    val p = tmpFile("docs.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "hola", "lang": "es"}""",
      """{"doc_id": "not-a-number", "text": "bad id", "lang": "de"}"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val rows = Ingest.readJsonl(spark, p, schema).collect()
    assert(rows.length == 3)
    val good = rows.filter(!_.isNullAt(0))
    assert(good.map(_.getLong(0)).toSet == Set(1L, 2L))
    // PERMISSIVE mode nulls the whole row's typed fields on mismatch
    assert(rows.exists(_.isNullAt(0)), "bad doc_id must coerce to null")
  }

  test("q106 csv clean drops exactly the planted malformed rows") {
    // recompute the fixture generator's predicates independently:
    // kept = positive amount (i%5!=0) AND parseable date (not i%7==0
    // bad string, not i%11==0 month-13)
    val expected = (1 to 200).count(i => i % 5 != 0 && i % 7 != 0 && i % 11 != 0)
    val got = graft.queries.Etl.csvClean(spark, sf001)
    assert(got.count() == expected.toLong,
      s"kept ${got.count()} rows, want $expected")
    // the date column came out as a real DATE, not a string
    assert(got.schema("transaction_date").dataType ==
      org.apache.spark.sql.types.DateType)
  }
}
