package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Market-basket rules and RFM segmentation on planted fixtures with
  * hand-computed supports, confidences, lifts and quintiles. */
class AffinitySpec extends SparkSpec {

  test("associationRules: a-priori prune, exact support/confidence/lift, duplicate lines collapse") {
    import spark.implicits._
    // 4 baskets: {A,B}, {A,B,C}, {A,C}, {B} — plus a duplicated (b1, A)
    // line that must NOT double-count support.
    val rows = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "A"), (3L, "C"),
      (4L, "B")
    ).toDF("basket", "item")
    val got = Affinity.associationRules(rows, "basket", "item", 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // supports: A=3, B=3, C=2; pairs: AB=2, AC=2, BC=1(below minSupport)
    assert(got.keySet == Set(("A", "B"), ("A", "C")), got.toString)
    // conf(A->B)=2/3, conf(B->A)=2/3, lift = 2*4/(3*3)
    assert(got(("A", "B")) == ((2L, 3L, 3L, 0.666667, 0.666667, 0.888889)))
    // conf(A->C)=2/3, conf(C->A)=1.0, lift = 2*4/(3*2)
    assert(got(("A", "C")) == ((2L, 3L, 2L, 0.666667, 1.0, 1.333333)))
  }

  test("associationRules: infrequent items never reach pair expansion; maxBasket caps the in-basket tail") {
    import spark.implicits._
    // X appears once (below minSupport 2) inside a basket of frequent
    // items — it must not appear in any pair. maxBasket=2 keeps only the
    // 2 smallest items of basket 1, so (A,C) loses that basket.
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "X"),
      (2L, "A"), (2L, "B"), (2L, "C")
    ).toDF("basket", "item")
    val capped = Affinity.associationRules(rows, "basket", "item", 2,
      maxBasket = 2)
    val pairs = capped.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(("A", "B", 2L)), pairs.toString)
    val uncapped = Affinity.associationRules(rows, "basket", "item", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(uncapped == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(!uncapped.exists(p => p._1 == "X" || p._2 == "X"))
  }

  test("rfm: quintiles deterministic, segment corners, monetary rounded before ordering") {
    import spark.implicits._
    // 10 customers, single metric spread so each quintile holds 2.
    val orders = (1 to 10).flatMap { c =>
      // customer c: c orders (frequency), last order day c, spend 100*c
      (1 to c).map(_ => (c.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-${c}%02d 00:00:00"),
        100.0 * c))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Affinity.rfm(orders)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    // customer 10: most recent (recency 0), most frequent -> champion
    val c10 = got(10L)
    assert(c10._1 == 0 && c10._2 == 10L && c10._3 == 5 && c10._4 == 5 &&
      c10._6 == "champion", c10.toString)
    // customer 1: oldest, least frequent -> dormant
    val c1 = got(1L)
    assert(c1._1 == 9 && c1._2 == 1L && c1._3 == 1 && c1._4 == 1 &&
      c1._6 == "dormant", c1.toString)
    // quintile sizes: exactly 2 customers per r_score bucket
    val sizes = got.values.groupBy(_._3).map { case (k, v) => k -> v.size }
    assert(sizes == Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2, 5 -> 2), sizes.toString)
  }
}
