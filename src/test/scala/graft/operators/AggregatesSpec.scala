package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Readers

/** A1-A5 against the reference's executed notebook goldens over test3.csv
  * and test1.csv (`/root/reference/pyspark-2.ipynb:523-617`,
  * `pyspark-1.ipynb:276-294`). */
class AggregatesSpec extends SparkSpec {

  private lazy val test3 = Readers.csvInferred(spark, tutoCsv("test3.csv"))
  private lazy val test1 = Readers.csvInferred(spark, tutoCsv("test1.csv"))

  test("A1 groupBy sum golden: {Sudhanshu:35000, Sunny:12000, Krish:19000, Mahesh:7000}") {
    // pyspark-2.ipynb:523-543 output block.
    val sums = test3.groupBy("Name").sum().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("Sudhanshu" -> 35000L, "Sunny" -> 12000L,
      "Krish" -> 19000L, "Mahesh" -> 7000L))
  }

  test("A2 groupBy mean per department") {
    // pyspark-2.ipynb:571 output: Data Science 10750, IOT 7500, Big Data 3750.
    val means = test3.groupBy("Departments").mean().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means == Map("Data Science" -> 10750.0, "IOT" -> 7500.0,
      "Big Data" -> 3750.0))
  }

  test("A3 groupBy count per department") {
    // pyspark-2.ipynb:595 output: Data Science 4, IOT 2, Big Data 4.
    val counts = Aggregates.countBy(test3, "Departments").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("Data Science" -> 4L, "IOT" -> 2L, "Big Data" -> 4L))
  }

  test("A4 global agg map form with case-insensitive column: sum 73000") {
    // pyspark-2.ipynb:617: df.agg({'Salary':'sum'}) over column `salary`.
    val total = test3.agg(Map("Salary" -> "sum")).head().getLong(0)
    assert(total == 73000L)
  }

  test("A5 describe() includes string columns: count+min/max, NULL mean/stddev") {
    // pyspark-1.ipynb:276-294 semantics on test1.csv.
    val d = test1.describe()
    val byStat = d.collect().map(r => r.getString(0) -> r).toMap
    assert(byStat("count").getString(1) == "6")            // Name count
    assert(byStat("mean").getString(1) == null)            // Name mean NULL
    assert(byStat("min").getString(1) == "Harsha")         // lexicographic
    assert(byStat("max").getString(1) == "Sunny")
    assert(byStat("mean").getString(2).startsWith("26.333"))  // age mean
    assert(byStat("mean").getString(4).toDouble == 128000.0 / 6)  // Salary
  }

  test("A5 describeNumeric single-pass matches describe() values") {
    val d = Aggregates.describeNumeric(test1, Seq("age", "Salary"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("age").getLong(1) == 6L)
    assert(math.abs(d("age").getDouble(2) - 158.0 / 6) < 1e-9)
    assert(d("Salary").getDouble(4) == 15000.0 && d("Salary").getDouble(5) == 30000.0)
  }

  test("approx_count_distinct is within 3*rsd of the exact per-group count") {
    val li = graft.lake.Tables(spark, sfDir, "lineitem")
    val exact = Aggregates.distinctCountBy(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Aggregates.approxDistinctBy(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(1L, (3 * 0.05 * ex).toLong),
        s"group $k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("bound-check twins: exact side matches, all guarantee booleans hold") {
    val li = graft.lake.Tables(spark, sfDir, "lineitem")
    val dc = Aggregates.approxDistinctCheck(li, "l_returnflag", "l_partkey").collect()
    val exact = Aggregates.distinctCountBy(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dc.length == exact.size)
    dc.foreach { r =>
      assert(r.getAs[Long]("exact_distinct") == exact(r.getString(0)))
      assert(r.getAs[Boolean]("within_rsd"), r.toString)
    }
    val qc = Aggregates.approxQuantilesCheck(li, "l_returnflag", "l_quantity").collect()
    assert(qc.nonEmpty)
    qc.foreach { r =>
      assert(r.getAs[Boolean]("p25_ok") && r.getAs[Boolean]("p50_ok")
        && r.getAs[Boolean]("p75_ok"), r.toString)
    }
  }

  test("approx_percentile quartiles land within rank-error of the exact quartiles") {
    // GK sketch at accuracy a bounds RANK error by n/a; translate to a
    // value tolerance by checking the approx quartile's true rank.
    val li = graft.lake.Tables(spark, sfDir, "lineitem")
    val n = li.count().toDouble
    val rankTol = n / 10000 + 1
    val approx = Aggregates.approxQuantilesBy(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val values = li.groupBy("l_returnflag")
      .agg(sort_array(collect_list(col("l_quantity"))).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approx.foreach { case (k, qs) =>
      val v = values(k)
      Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (p, q) =>
        // with ties the value occupies a rank INTERVAL; it must overlap
        // the target rank +- tolerance
        val rankLo = v.count(_ < q) + 1
        val rankHi = v.count(_ <= q)
        val target = p * v.size
        assert(rankLo <= target + rankTol && rankHi >= target - rankTol,
          s"group $k p$p: approx $q occupies ranks [$rankLo,$rankHi], target $target")
      }
    }
  }

  test("rollup/cube include grand-total rows") {
    val r = Aggregates.rollupAgg(test3, Seq("Name", "Departments"), "salary")
    val grand = r.filter(col("Name").isNull && col("Departments").isNull)
    assert(grand.head().getLong(2) == 73000L)
    val c = Aggregates.cubeAgg(test3, Seq("Name", "Departments"), "salary")
    // cube additionally has per-Departments rows with Name NULL
    assert(c.filter(col("Name").isNull && col("Departments") === "IOT").count() == 1)
  }

  test("equidepthHistogram: ~equal bucket depths, ordered non-overlapping ranges, mass conserved") {
    import spark.implicits._
    val n = 1000
    // heavy-tailed values: equal-WIDTH bins would put ~everything in bin 0
    val df = (1 to n).map(i => math.pow(i.toDouble, 3)).toDF("v")
    val h = Aggregates.equidepthHistogram(df, "v", 5)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(h.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    assert(h.map(_._2).sum == n, "every row lands in exactly one bucket")
    // exact-percentile cuts on distinct values: depths within ±1 of n/5
    h.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt - n / 5) <= 1, s"bucket $b depth $cnt far from ${n / 5}") }
    // ranges are ordered and non-overlapping
    h.sliding(2).foreach { case Array((_, _, _, hi0), (_, _, lo1, _)) =>
      assert(hi0 <= lo1, s"bucket ranges overlap: $hi0 > $lo1")
    case _ => () }
  }
}
