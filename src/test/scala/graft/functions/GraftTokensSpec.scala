package graft.functions

import graft.SparkSuite

class GraftTokensSpec extends SparkSuite {

  test("native tokenizer is bit-identical to the regex chain") {
    import spark.implicits._
    val cases = Seq(
      "Hello, World! 42 times",
      "", "   ", "!!!", "a", "ABC123def",
      "tabs\tand\nnewlines  here",
      "unicode: café Über straße 中文 end",
      "digits007mixed42words", "-leading and trailing-")
    val df = cases.toDF("text")
    df.createOrReplaceTempView("tok_cases")
    val rows = spark.sql(
      """SELECT graft_tokens(text) AS native,
        |  filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '),
        |         t -> t != '') AS regex
        |FROM tok_cases""".stripMargin).collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"input: '$c'")
    }
  }
}
