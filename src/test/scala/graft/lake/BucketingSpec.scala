package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located joins: same results as the shuffle join, with NO
  * Exchange in the physical plan. */
class BucketingSpec extends SparkSpec {

  test("bucketized fact-fact join plans without an Exchange and matches the shuffle join") {
    val lineitem = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val orders = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))

    Bucketing.bucketize(lineitem, "li_bucketed", "l_orderkey", 8)
    Bucketing.bucketize(orders, "o_bucketed", "o_orderkey", 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"))

    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be shuffle-free:\n$plan")

    val reference = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
    assert(joined.except(reference).count() == 0
      && reference.except(joined).count() == 0)
  }
}
