package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Text building blocks: tokenization, shingles, fingerprint stability,
  * language-ID heuristic. */
class TextSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens and tokenCount: lower-cased whitespace split") {
    val r = one("  The Quick  brown\tFox ")
      .select(Text.tokens(col("text")).as("t"), Text.tokenCount(col("text")).as("n"))
      .head()
    assert(r.getSeq[String](0) == Seq("the", "quick", "brown", "fox") && r.getInt(1) == 4)
  }

  test("shingles: sliding word n-grams; short docs yield an empty array") {
    val r = one("a b c d").select(Text.shingles(col("text"), 3).as("sh")).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    val short = one("a b").select(Text.shingles(col("text"), 3).as("sh")).head()
    assert(short.getSeq[String](0).isEmpty)
  }

  test("fingerprint is stable under whitespace noise, distinct for distinct text") {
    val fp = (s: String) => one(s).select(Text.fingerprint(col("text"))).head().getString(0)
    assert(fp("Hello   world") == fp("  hello world "))
    assert(fp("hello world") != fp("hello word"))
  }

  test("language-ID heuristic predicts marker-bearing languages") {
    val pred = (s: String) =>
      one(s).select(Text.predictedLanguage(col("text"))).head().getString(0)
    assert(pred("the cat is in the house and it is warm") == "en")
    assert(pred("le chat est dans la maison et il est content") == "fr")
    assert(pred("el gato es de las casas y es un gato") == "es")
    assert(pred("der Hund und die Katze das ist ein Haus") == "de")
    assert(pred("你好 世界 这是 中文 文本") == "zh")
    assert(pred("xyzzy plugh") == "und")
  }

  test("quality features: ratios are well-formed") {
    val feats = Text.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }
    val r = one("Hello, world! This is 1 test.").select(feats: _*).head()
    assert(r.getAs[Int]("n_chars") == 29)
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Double]("punct_ratio") > 0 && r.getAs[Double]("digit_ratio") > 0)
  }
}
