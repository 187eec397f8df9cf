package graft.etl

import graft.SparkSpec

class CountryDimSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(names: Seq[String]): Map[String, String] = {
    val df = names.toDF("COUNTRY")
    CountryDim.resolve(df, "COUNTRY", CountryDim.dim(spark))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
  }

  test("exact normalized match") {
    val got = resolve(Seq("Germany", "  france ", "UNITED STATES"))
    assert(got == Map("Germany" -> "DEU", "  france " -> "FRA",
      "UNITED STATES" -> "USA"))
  }

  test("alias tier") {
    val got = resolve(Seq("USA", "UK", "Holland", "Russian Federation"))
    assert(got.values.toSet == Set("USA", "GBR", "NLD", "RUS"))
  }

  test("fuzzy levenshtein <= 2 tier") {
    val got = resolve(Seq("Untied States", "Grmany", "Japaan"))
    assert(got("Untied States") == "USA")
    assert(got("Grmany") == "DEU")
    assert(got("Japaan") == "JPN")
  }

  test("fuzzy tie at equal distance resolves deterministically") {
    // "Jpaan" is levenshtein-2 from both JAPAN and SPAIN; alphabetical
    // code tiebreak must always pick ESP, never flip between runs.
    val got = resolve(Seq("Jpaan"))
    assert(got("Jpaan") == "ESP")
  }

  test("unresolvable stays null (gate catches downstream)") {
    val got = resolve(Seq("Atlantis"))
    assert(got("Atlantis") == null)
  }

  test("duplicate input rows survive the fuzzy tier") {
    val df = Seq("Grmany", "Grmany", "Spain").toDF("COUNTRY")
    val out = CountryDim.resolve(df, "COUNTRY", CountryDim.dim(spark))
    assert(out.count() == 3)
  }
}
