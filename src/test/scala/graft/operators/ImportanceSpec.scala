package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

/** DSIR-style importance resampling: brute-force parity on a planted
  * corpus, target-skew ranking, layout invariance, top-k determinism. */
class ImportanceSpec extends SparkSpec {

  test("weights match a brute-force computation on a planted corpus") {
    import spark.implicits._
    val dim = 8
    val docs = Seq(
      (1L, "alpha beta alpha", true),
      (2L, "beta gamma", true),
      (3L, "delta delta epsilon", false),
      (4L, "alpha beta gamma", false),
      (5L, "zeta zeta zeta eta", false)
    ).toDF("doc_id", "text", "is_t")

    val got = Importance
      .importanceWeights(docs, "doc_id", "text", col("is_t"), dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force in plain Scala, mirroring the documented convention:
    // md5 slot, Laplace-smoothed per-slot log ratio, 6-dp round, micro
    // ints, exact long sums
    def slot(term: String): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.take(7), 16) % dim).toInt
    }
    val rows = Seq(
      (1L, "alpha beta alpha", true), (2L, "beta gamma", true),
      (3L, "delta delta epsilon", false), (4L, "alpha beta gamma", false),
      (5L, "zeta zeta zeta eta", false))
    val toks = rows.flatMap { case (id, text, t) =>
      text.trim.toLowerCase.split("\\s+").map(term => (id, t, slot(term))) }
    val nSrc = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nTgt = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (totSrc, totTgt) = (toks.size.toLong, toks.count(_._2).toLong)
    def logMicro(n: Long, tot: Long): Long = {
      val r = BigDecimal(math.log((n + 1).toDouble / (tot + dim)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (r * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val lr = (0 until dim).map(s => s ->
      (logMicro(nTgt.getOrElse(s, 0L), totTgt) -
        logMicro(nSrc.getOrElse(s, 0L), totSrc))).toMap
    val expected = toks.groupBy(_._1).view.mapValues(ts =>
      ts.groupBy(_._3).map { case (s, g) => g.size.toLong * lr(s) }.sum).toMap

    assert(got == expected, s"got $got expected $expected")
  }

  test("target-matching docs outrank off-target docs; weights are layout-invariant") {
    val docs = Tables(spark, sfDir, "documents")
    val w = Importance.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en")
    val byLang = w.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(avg(col("logw_micro")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = byLang.filter(_._1 != "en").values
    assert(others.forall(_ < byLang("en")),
      s"en must carry the highest mean importance weight: $byLang")
    // layout invariance: a different partitioning produces identical rows
    val w2 = Importance.importanceWeights(docs.repartition(13), "doc_id",
      "text", col("lang") === "en")
    assert(w.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      w2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("resampleTopK is the deterministic k-head and plans as TakeOrdered") {
    val docs = Tables(spark, sfDir, "documents")
    val top = Importance.resampleTopK(docs, "doc_id", "text",
      col("lang") === "en", 10)
    val all = Importance.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, wt) => (-wt, id) }.take(10).toSeq
    assert(top.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == all)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort:\n$plan")
  }
}
