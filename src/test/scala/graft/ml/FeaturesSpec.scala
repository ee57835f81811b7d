package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hashing-trick featurization: mass conservation, determinism, and
  * collision semantics. */
class FeaturesSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 32

  test("feature mass equals the token count, vector length equals dim") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Features.hashedTokenCounts(docs, "doc_id", "text", dim)
    val bad = feats
      .join(docs.select(col("doc_id").as("id"),
        graft.functions.Text.tokenCount(col("text")).as("n_tokens")), "id")
      .filter(size(col("features")) =!= dim ||
        aggregate(col("features"), lit(0L), (a, x) => a + x) =!= col("n_tokens"))
    assert(bad.count() == 0)
    assert(feats.count() == docs.count())
  }

  test("vectors are identical across repartitionings") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def vecs(df: org.apache.spark.sql.DataFrame) =
      Features.hashedTokenCounts(df, "doc_id", "text", dim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(vecs(docs) == vecs(docs.repartition(13)))
  }

  test("identical texts produce identical vectors; a term always lands in one slot") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha"),
      (3L, "alpha")).toDF("doc_id", "text")
    val v = Features.hashedTokenCounts(docs, "doc_id", "text", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(v(1L) == v(2L))
    assert(v(1L).sum == 3 && v(3L).sum == 1)
    // doc 3's slot mass is a sub-multiset of doc 1's (alpha slot shared)
    assert(v(1L).zip(v(3L)).forall { case (a, b) => a >= b })
  }
}
