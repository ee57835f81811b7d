package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables

/** Joins over the star schema (SURVEY.md §2.11: the reference has no joins;
  * these are the parity-plus extension scheduled in §7.9).
  *
  * Scale design: dimension tables (region/nation/customer at typical star
  * ratios) are broadcast — no shuffle of the fact side at all. Fact-fact
  * joins (lineitem ⋈ orders) are shuffle hash/sort-merge on the join key;
  * with both sides pre-bucketed by orderkey in a real deployment the
  * shuffle disappears entirely. AQE converts to broadcast at runtime when a
  * filtered side turns out small, and splits skewed partitions.
  */
object Joins {

  /** Broadcast dim-chain: customer ⋈ nation ⋈ region, aggregated per
    * region. The two dims are tiny at any scale factor (25 nations / 5
    * regions at TPC-H ratios) — broadcast keeps the 100 TB fact side
    * shuffle-free until the final 5-group aggregation. */
  def customersPerRegion(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val nation   = Tables(spark, dir, "nation")
    val region   = Tables(spark, dir, "region")
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
  }

  /** Fact-fact join in the shape of TPC-H Q3: revenue per order among
    * BUILDING-segment customers, top 10. customer is broadcast; lineitem ⋈
    * orders shuffles on orderkey (bucketing would remove it). The filters
    * sit directly over the scans so Parquet gets them pushed down. */
  def topUrgentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables(spark, dir, "lineitem")
    val orders   = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val revenue = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    revenue.orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
  }

  /** Multi-dim star join in the shape of TPC-H Q5: revenue per supplier
    * nation. supplier/nation broadcast; single shuffle for the group-by. */
  def revenuePerSupplierNation(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables(spark, dir, "lineitem")
    val supplier = Tables(spark, dir, "supplier")
    val nation   = Tables(spark, dir, "nation")
    lineitem
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Skew-resistant equi-join for when one join key is pathologically hot
    * and the other side is too large to broadcast: each probe row scatters
    * to one of `salts` sub-keys (via `saltSource`, which must vary WITHIN
    * a key — e.g. a hash of other columns — or the hot key still lands on
    * one task), and the build side replicates `salts` times. A hot key's
    * rows then spread over `salts` tasks instead of one. AQE's skew-join
    * splitting handles moderate skew automatically; explicit salting is
    * for the extreme tail (one key = significant corpus fraction). */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, salts: Int, saltSource: Column): DataFrame = {
    // NULL-safe: a NULL saltSource would otherwise yield a NULL salt that
    // matches no replicated build salt, silently dropping probe rows whose
    // join KEY is valid. Salt 0 keeps them (skew-spread just degrades).
    val sp = probe.withColumn("__salt", coalesce(pmod(saltSource, lit(salts)), lit(0)))
    val sb = build.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sp.join(sb, sp(probeKey) === sb(buildKey) && sp("__salt") === sb("__salt"))
      .drop("__salt")
  }

  /** Join-key skew census: per-key share and skew factor (count / mean
    * count), top `topK` — the decision input for [[saltFor]]. The window
    * is global but runs over the per-key AGGREGATE (keys ≪ rows), and
    * the rank cut stays a partial WindowGroupLimit. */
  def skewCensus(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
    counts.crossJoin(broadcast(stats))
      .withColumn("share", round(col("n") / col("n_rows").cast("double"), 6))
      .withColumn("skew_x",
        round(col("n") * col("n_keys") / col("n_rows").cast("double"), 4))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col(key))))
      .filter(col("rank") <= topK)
      .select(col(key), col("n"), col("share"), col("skew_x"), col("rank"))
  }

  /** Choose a salt factor from a skew census (the `q_skew_report` shape:
    * a `skew_x` column holding each key's count / mean key count). Rule:
    * no salting (1) while the worst skew factor stays under `threshold` —
    * AQE's skew-join splitting owns the moderate range — else the ceiling
    * of the worst factor, capped at `maxSalts` (build-side replication
    * is `salts`×, so the cap bounds that cost). The census is a tiny
    * per-key aggregate (top-k keys), so reading its one-row max is
    * planning-time configuration like an AQE statistic, not a data-path
    * collect. */
  def saltFor(skewReport: DataFrame, threshold: Double = 2.0,
      maxSalts: Int = 32): Int =
    Option(skewReport.agg(max(col("skew_x"))).head().get(0))
      .map(_.asInstanceOf[Double]) match {
      case Some(worst) if worst > threshold =>
        math.min(maxSalts, math.ceil(worst).toInt)
      case _ => 1
    }

  /** Bloom-pruned equi-join — the pre-shuffle filter for the regime
    * BETWEEN broadcast and plain shuffle join: the dim side is too big to
    * broadcast as a hash relation (10⁷-10⁸ keys), but the fact side's
    * matching fraction is small, so most fact rows shuffle only to be
    * dropped by the join. A Bloom filter of the dim keys is a few MB at
    * 1% false positives regardless of row width; testing it MAP-SIDE on
    * the fact side before the exchange removes ~all non-matching rows
    * from the shuffle. The join afterwards is unchanged — Bloom false
    * positives are eliminated there, so the result is EXACTLY the plain
    * join (spec-asserted), making this a transparent swap-in.
    *
    * Spark's own runtime filtering injects this shape only under its
    * rule's cost heuristics; this surfaces it as an explicit operator via
    * the same internal expressions (`BloomFilterAggregate` /
    * `BloomFilterMightContain`, registered as graft functions). The
    * one-value collect of the filter bytes is planning-time
    * configuration — the same driver-side materialization Spark's
    * injected scalar subquery performs.
    *
    * `expectedItems`/`numBits` size the filter: ~8 bits/key ≈ 2% fpp,
    * 10 bits ≈ 1%. Defaults fit 10⁶ dim keys in 1.25 MB. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long = 1000000L, numBits: Long = 10000000L): DataFrame = {
    val bf = dim.agg(call_function("graft_bloom_agg",
      col(key), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pruned =
      if (bf == null) fact.filter(lit(false)) // empty dim side
      else fact.filter(call_function("graft_might_contain", lit(bf), col(key)))
    pruned.join(dim, key)
  }

  /** As-of join — the time-series join Spark lacks as a built-in: for
    * every `left` row, the single most recent `right` row with the same
    * key and right time <= left time (ties at equal time INCLUDED, right
    * rows among themselves tie-broken by `rightPayload.head`, which must
    * be unique within (key, time) for determinism).
    *
    * Shape: UNION the two sides (right rows sort BEFORE left rows at the
    * same time via the side flag) and carry every right payload forward
    * with one running `last(_, ignoreNulls)` window — ONE shuffle by key,
    * NO join node. The naive formulation is a range join (O(|L|·|R|) per
    * key — a 100 TB scale-killer); this is the linear union-scan shape
    * time-series stores use. Left rows with no preceding match are
    * dropped (inner as-of). Output: key, time, leftPayload columns, and
    * each right payload column prefixed `asof_`. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      leftPayload: Seq[String], rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rightTypes = rightPayload.map(c => c -> right.schema(c).dataType)
    val leftTypes  = leftPayload.map(c => c -> left.schema(c).dataType)
    val lNorm = left.select(
      Seq(col(key).as("asof_k"), col(time).as("asof_t"), lit(1).as("asof_side")) ++
        leftPayload.map(col) ++
        rightTypes.map { case (c, dt) => lit(null).cast(dt).as(s"asof_$c") }: _*)
    val rNorm = right.select(
      Seq(col(key).as("asof_k"), col(time).as("asof_t"), lit(0).as("asof_side")) ++
        leftTypes.map { case (c, dt) => lit(null).cast(dt).as(c) } ++
        rightPayload.map(c => col(c).as(s"asof_$c")): _*)
    val w = Window.partitionBy(col("asof_k"))
      .orderBy(col("asof_t"), col("asof_side"), col(s"asof_${rightPayload.head}"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select(
        (Seq("asof_k", "asof_t", "asof_side") ++ leftPayload).map(col) ++
          rightPayload.map(c =>
            last(col(s"asof_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("asof_side") === 1 && col(s"asof_${rightPayload.head}").isNotNull)
      .select((Seq("asof_k", "asof_t") ++ leftPayload ++
        rightPayload.map("asof_" + _)).map(col): _*)
      .withColumnRenamed("asof_k", key)
      .withColumnRenamed("asof_t", time)
  }

  /** Semi/anti join: customers with at least one order vs. none.
    * left_semi/left_anti move no payload columns from the probe side. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders   = Tables(spark, dir, "orders")
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  def customersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders   = Tables(spark, dir, "orders")
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }
}

/** Window functions — parity-plus (absent from the reference, SURVEY.md
  * §2.11). Partitioned windows scale: each partition key's frame is local
  * to one task after the hash exchange; no global sort is required unless
  * the window is unpartitioned (which the engine avoids).
  */
object Windows {
  import org.apache.spark.sql.expressions.Window

  /** Top-k per group via row_number — the distributed replacement for a
    * driver-side "first N" (reference `ingestion-datalake.py:96`).
    *
    * Two-phase for scale: o_orderpriority has only 5 values, so a single
    * partitioned window would sort 5 giant partitions on 5 tasks at 100 TB.
    * Phase 1 takes the top-k within each (priority, salt) bucket — every
    * global top-k row is necessarily in its bucket's top-k — shrinking the
    * input of the exact phase-2 window to k * salts * priorities rows. */
  def topKOrdersPerPriority(spark: SparkSession, dir: String, k: Int,
      salts: Int = 32): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val order  = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val wPartial = Window.partitionBy(col("o_orderpriority"), col("salt"))
      .orderBy(order: _*)
    val survivors = orders
      .withColumn("salt", pmod(col("o_orderkey"), lit(salts)))
      .withColumn("r", row_number().over(wPartial))
      .filter(col("r") <= k)
      .drop("salt", "r")
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(order: _*)
    survivors
      .withColumn("rank_in_priority", row_number().over(w))
      .filter(col("rank_in_priority") <= k)
      .select(col("o_orderpriority"), col("rank_in_priority"), col("o_orderkey"),
        col("o_totalprice"))
  }

  /** Running daily revenue per returnflag: cumulative sum over an ordered
    * window within each partition key. */
  def runningDailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables(spark, dir, "lineitem")
    val daily = lineitem
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"))
      .agg(sum(col("l_extendedprice")).as("day_revenue"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("ship_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_revenue", round(sum(col("day_revenue")).over(w), 2))
      .select(col("l_returnflag"), col("ship_day"),
        round(col("day_revenue"), 2).as("day_revenue"), col("running_revenue"))
  }
}

/** Set operations — parity-plus (absent from the reference, SURVEY.md
  * §2.11). Implemented over the events table as user-cohort algebra.
  */
object SetOps {
  private def usersOf(spark: SparkSession, dir: String, eventType: String): DataFrame =
    Tables(spark, dir, "events").filter(col("event_type") === eventType)
      .select(col("user_id")).distinct()

  /** Users who clicked but never purchased (EXCEPT), plus counts of the
    * union/intersect cohorts as a single summary relation. */
  def clickedNeverPurchased(spark: SparkSession, dir: String): DataFrame =
    usersOf(spark, dir, "click").except(usersOf(spark, dir, "purchase"))

  def engagedBuyers(spark: SparkSession, dir: String): DataFrame =
    usersOf(spark, dir, "click").intersect(usersOf(spark, dir, "purchase"))
}
