package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Salted skew join: identical results to the plain equi-join, with the
  * salt present in the join keys (the skew-spreading mechanism). */
class SaltedJoinSpec extends SparkSpec {

  test("saltedJoin == plain join on lineitem ⋈ orders") {
    val lineitem = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val orders = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))

    val salted = Joins.saltedJoin(lineitem, orders, "l_orderkey", "o_orderkey",
      salts = 8, saltSource = hash(col("l_linenumber"), col("l_extendedprice")))
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))

    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)

    // the salt must be part of the join keys (that is the whole point)
    val p = salted.queryExecution.sparkPlan.toString
    assert(p.contains("__salt"), s"salt not in join:\n$p")
  }

  test("saltFor wires the skew census to the salt factor; result == plain join") {
    import spark.implicits._
    // hot-key fixture: key 1 carries 900 of 1000 rows over 101 keys —
    // skew_x(key 1) = 900 * 101 / 1000 ≈ 90.9 → ceil capped at 32
    val hot = ((0 until 900).map(i => (1L, i)) ++
      (0 until 100).map(i => (i + 2L, i))).toDF("k", "payload")
    val censusHot = Joins.skewCensus(hot, "k")
    val salts = Joins.saltFor(censusHot)
    assert(salts > 1, s"hot-key census must select salting, got $salts")
    assert(salts == 32, s"ceil(90.9) caps at maxSalts=32, got $salts")

    // the auto-selected factor yields results identical to the plain join
    val dim = (1L to 101L).map(k => (k, s"dim$k")).toDF("dk", "label")
    val salted = Joins.saltedJoin(hot, dim, "k", "dk", salts,
      saltSource = hash(col("payload")))
    val plain = hot.join(dim, col("k") === col("dk"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)

    // uniform keys: census stays under the threshold, no salting
    val uniform = (0 until 1000).map(i => (i.toLong % 100, i)).toDF("k", "payload")
    assert(Joins.saltFor(Joins.skewCensus(uniform, "k")) == 1)
    // empty census (no rows at all) also declines to salt
    assert(Joins.saltFor(Joins.skewCensus(uniform.filter(col("k") < 0), "k")) == 1)
  }

  test("salting spreads a hot key across buckets") {
    import spark.implicits._
    // pathological skew: one key carries 10k rows
    val probe = (0 until 10000).map(i => (1L, i)).toDF("k", "payload")
      .withColumn("__salt", pmod(hash(col("payload")), lit(16)))
    val spread = probe.groupBy("__salt").count().collect()
    assert(spread.length == 16)
    assert(spread.map(_.getLong(1)).max < 10000 / 16 * 2)  // no bucket >2x fair share
  }
}
