package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Supervised encodings: WoE signs/symmetry on a planted separation,
  * out-of-fold target encoding's leak-freeness verified by recomputing
  * each fold's complement mean directly. */
class EncodeSpec extends SparkSpec {

  test("woeBins: bad-heavy bin gets negative WoE, good-heavy positive, symmetric IV") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toDouble * 4, true)) ++
      (1 to 10).map(i => (50.0 + i * 4, false))).toDF("v", "bad")
    val rows = Encode.woeBins(df, "v", col("bad"), binWidth = 50.0)
      .orderBy("bin").collect()
    assert(rows.length == 2)
    val (w0, w1) = (rows(0).getDouble(3), rows(1).getDouble(3))
    assert(w0 < 0 && w1 > 0, s"woe signs: $w0 $w1")
    assert(math.abs(w0 + w1) < 1e-9, "symmetric split should mirror WoE")
    assert(rows.map(_.getDouble(4)).forall(_ > 0), "IV parts are nonnegative")
    assert(rows(0).getLong(1) == 10 && rows(0).getLong(2) == 10)
  }

  test("targetEncodeOof: constant target encodes to the constant; fold means are leak-free") {
    import spark.implicits._
    val const = (1 to 200).map(i => (i.toLong, "c", 7.0)).toDF("id", "cat", "y")
    val encConst = Encode.targetEncodeOof(const, "id", "cat", "y")
    assert(encConst.collect().forall(_.getDouble(3) == 7.0))

    // varied target: each fold's encoding must equal the mean over the
    // OTHER folds, recomputed here from the operator's own fold column
    val varied = (1 to 200).map(i => (i.toLong, "c", i.toDouble)).toDF("id", "cat", "y")
    val withFold = varied.withColumn("fold",
      (call_function("graft_md5_prefix", col("id").cast("string"), lit(7)) % 5)
        .cast("int"))
    val direct = (0 until 5).map { f =>
      val m = withFold.filter(col("fold") =!= f).agg(avg(col("y"))).head.getDouble(0)
      f -> BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Encode.targetEncodeOof(varied, "id", "cat", "y")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(got == direct, s"$got vs $direct")
  }
}
