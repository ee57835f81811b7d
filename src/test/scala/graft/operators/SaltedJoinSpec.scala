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
