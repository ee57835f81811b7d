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

  test("redactPii scrubs email, SSN, IPv4 and phone shapes") {
    val red = (s: String) =>
      one(s).select(Text.redactPii(col("text"))).head().getString(0)
    assert(red("mail a.b+c%d@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(red("ssn 123-45-6789 end") == "ssn <SSN> end")
    assert(red("host 192.168.0.1 up") == "host <IP> up")
    assert(red("call +1 555-867-5309 or 1.555.867.5309")
      == "call <PHONE> or <PHONE>")
    assert(red("two bob@x.org carl@y.net") == "two <EMAIL> <EMAIL>")
  }

  test("redactPii pattern order: SSN wins over the phone shape; clean text unchanged") {
    val red = (s: String) =>
      one(s).select(Text.redactPii(col("text"))).head().getString(0)
    // an SSN must come out as <SSN>, never half-eaten by the digit-group
    // phone shape that runs after it
    assert(red("id 123-45-6789") == "id <SSN>")
    assert(red("no pii here just words") == "no pii here just words")
  }

  test("chunkSpans: overlapping windows tile the token stream; short docs yield one chunk") {
    val spans = (s: String, size: Int, overlap: Int) =>
      one(s).select(Text.chunkSpans(col("text"), size, overlap).as("c")).head()
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getInt(0), r.getString(1)))
    // 10 tokens, size 4, overlap 1 (stride 3): [1..4][4..7][7..10]
    assert(spans("a b c d e f g h i j", 4, 1) == Seq(
      (0, "a b c d"), (1, "d e f g"), (2, "g h i j")))
    // ragged tail: 8 tokens -> last chunk is short but present
    assert(spans("a b c d e f g h", 4, 1) == Seq(
      (0, "a b c d"), (1, "d e f g"), (2, "g h")))
    // doc shorter than the window: exactly one chunk
    assert(spans("a b", 4, 1) == Seq((0, "a b")))
  }

  test("quality features: ratios are well-formed") {
    val feats = Text.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }
    val r = one("Hello, world! This is 1 test.").select(feats: _*).head()
    assert(r.getAs[Int]("n_chars") == 29)
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Double]("punct_ratio") > 0 && r.getAs[Double]("digit_ratio") > 0)
  }

  test("charNgrams: sliding positions, short-text guard, single evaluation") {
    def grams(s: String, n: Int): Seq[String] =
      one(s).select(Text.charNgrams(col("text"), n).as("g"))
        .head().getSeq[String](0)
    assert(grams("abcde", 3) == Seq("abc", "bcd", "cde"))
    assert(grams("abc", 3) == Seq("abc"))
    assert(grams("ab", 3) == Seq.empty)   // no descending-sequence blowup
    assert(grams("", 3) == Seq.empty)
    assert(grams("aaaa", 2) == Seq("aa", "aa", "aa"))
  }
}
