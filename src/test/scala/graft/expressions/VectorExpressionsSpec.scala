package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Vectors

/** The native DotProduct expression must agree bit-for-bit with the
  * higher-order-function formulation (which the SQL oracles mirror),
  * including null semantics. */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("graft_dot == HOF fold on random vectors, bit-for-bit") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("native", Vectors.dot(col("a"), col("b")))
      .withColumn("hof", Vectors.dotHof(col("a"), col("b")))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("null semantics: null array, null element, length mismatch -> null (like zip_with)") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),      // 11.0
      (2L, Seq(1.0, 2.0), Seq(3.0)),            // mismatch -> null
      (3L, null, Seq(3.0, 4.0)),                // null array -> null
    ).toDF("id", "a", "b")
      .withColumn("native", Vectors.dot(col("a"), col("b")))
      .withColumn("hof", Vectors.dotHof(col("a"), col("b")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDouble(3) == 11.0 && rows(0).getDouble(4) == 11.0)
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(4))
    // null ELEMENT -> null, both formulations
    val e = Seq((1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("id", "a", "b")
      .withColumn("native", Vectors.dot(col("a"), col("b")))
      .withColumn("hof", Vectors.dotHof(col("a"), col("b")))
      .head()
    assert(e.isNullAt(3) && e.isNullAt(4))
  }

  test("optimizer rewrites the HOF dot idiom to the native expression") {
    val df = graft.lake.Tables(spark, sfDir, "embeddings")
      .select(Vectors.dotHof(col("embedding"), col("embedding")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"HOF idiom not rewritten:\n${df.queryExecution.optimizedPlan}")
    // and an aggregate over it still computes correctly
    assert(df.agg(min(col("d"))).head().getDouble(0) >= 0.0)
  }

  test("rewrite guard: a non-dot fold is left alone") {
    val df = graft.lake.Tables(spark, sfDir, "embeddings")
      .select(aggregate(zip_with(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    df.collect()  // still evaluates
  }

  test("graft_top_cells == the declarative struct-sort argmax, bit-for-bit on real embeddings") {
    import graft.functions.Text
    import graft.operators.Quantize
    val emb = graft.lake.Tables(spark, sfDir, "embeddings")
    // the declarative reference: per-centroid (round4 cosine, -id) structs,
    // sorted desc, top-8 — exactly what the SQL oracle computes
    val centsStruct = Quantize.codebook(emb)
      .select(struct(col("c_id"), col("c_emb").cast("array<double>").as("c_emb"),
        Vectors.norm(col("c_emb")).as("c_nrm")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("cents_s"))
    val hofProbe = transform(slice(reverse(array_sort(
      Text.let(Vectors.norm(col("embedding"))) { n =>
        transform(col("cents_s"), c => struct(
          round(Vectors.dot(col("embedding"), c.getField("c_emb"))
            / (n * c.getField("c_nrm")), 4).as("a"),
          (-c.getField("c_id")).as("nc")))
      })), 1, 8), s => -s.getField("nc"))
    val df = Quantize.withCodebook(emb.crossJoin(broadcast(centsStruct)), emb)
      .select(col("vec_id"),
        Quantize.probeCellsExpr(col("embedding"), col("cents"), 8).as("native"),
        hofProbe.as("declarative"))
    assert(df.count() == emb.count())
    val diff = df.filter(not(col("native") === col("declarative"))).count()
    assert(diff == 0, s"$diff of ${emb.count()} probe lists differ")
  }

  test("graft_lsh_buckets == the per-plane when/dot formulation, all tables") {
    import graft.operators.Similarity
    val emb = graft.lake.Tables(spark, sfDir, "embeddings")
    val declared = (0 until Similarity.LshTables).map { t =>
      (0 until Similarity.LshPlanes).map { p =>
        val coefs = array(Similarity.planeCoefs(t * Similarity.LshPlanes + p).map(lit): _*)
        when(Vectors.dot(col("embedding"), slice(coefs, lit(1), size(col("embedding")))) > 0,
          1L << p).otherwise(0L)
      }.reduce(_ + _)
    }
    val df = emb.select(col("vec_id"),
      Similarity.lshBucketsExpr(col("embedding")).as("native"),
      array(declared: _*).as("declarative"))
    val diff = df.filter(not(col("native") === col("declarative"))).count()
    assert(diff == 0, s"$diff of ${emb.count()} bucket arrays differ")
  }

  test("round4 fast path == Spark's BigDecimal HALF_UP rounding on a million random doubles") {
    // the TopCells affinity rounding takes a floor-based fast path away
    // from decimal ties; it must be indistinguishable from the
    // Double.toString-based BigDecimal rounding Spark's round() performs
    def reference(v: Double): Double =
      java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 1000000) {
      val v = rnd.nextDouble() * 2 - 1   // cosine range
      assert(VectorExprUtil.round4(v) == reference(v), s"mismatch at $v")
      i += 1
    }
    // adversarial: values AT and near decimal .00005 boundaries
    for (k <- -20000 to 20000; eps <- Seq(0.0, 1e-13, -1e-13)) {
      val v = k / 10000.0 + 0.00005 + eps
      assert(VectorExprUtil.round4(v) == reference(v), s"boundary mismatch at $v")
    }
  }

  test("graft_top_cells tie-break: identical centroids resolve by smaller id; k > C returns C") {
    import graft.operators.Quantize
    val v = Seq(1.0, 2.0, 3.0, 4.0)
    val w = Seq(-4.0, 3.0, -2.0, 1.0)
    // ids deliberately unsorted; 5 and 3 share the SAME vector (exact tie)
    val cents = Seq((5L, v), (3L, v), (9L, w)).toDF("c_id", "c_emb")
    val row = Quantize.codebookRowOf(cents)
    val df = Seq((1L, v)).toDF("id", "embedding").crossJoin(broadcast(row))
    val probes = df.select(
      Quantize.probeCellsExpr(col("embedding"), col("cents"), 2).as("p2"),
      Quantize.probeCellsExpr(col("embedding"), col("cents"), 10).as("p10"),
      Quantize.cellExpr(col("embedding"), col("cents")).as("cell")).head()
    assert(probes.getSeq[Long](0) == Seq(3L, 5L), "tie must order by smaller centroid id")
    assert(probes.getSeq[Long](1) == Seq(3L, 5L, 9L), "k > C returns all C cells ranked")
    assert(probes.getLong(2) == 3L)
  }

  test("graft_md5_prefix == the declarative md5 hex-digit arithmetic") {
    import graft.functions.Text
    val toks = graft.lake.Tables(spark, sfDir, "documents")
      .select(explode(array_distinct(Text.tokens(col("text")))).as("token"))
    def declarative(n: Int) = Text.let(md5(col("token"))) { h =>
      (1 to n).map { i =>
        (instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1).cast("long") *
          lit(1L << (4 * (n - i)))
      }.reduce(_ + _)
    }
    for (n <- Seq(7, 8)) {
      val df = toks.select(
        call_function("graft_md5_prefix", col("token"), lit(n)).as("native"),
        declarative(n).as("decl"))
      assert(df.filter(col("native") =!= col("decl")).count() == 0, s"mismatch at n=$n")
    }
  }

  test("graft_minhash == the declarative transform/array_min universal-hash formulation") {
    import graft.functions.Text
    import graft.operators.Dedup
    val base = graft.lake.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), Text.shingles(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val declSlots = {
      val hashes = transform(col("shingles"),
        s => call_function("graft_md5_prefix", s, lit(7)))
      (0 until Dedup.MinhashK).map { i =>
        array_min(transform(hashes,
          h => (lit(Dedup.minhashA(i)) * h + lit(Dedup.minhashB(i))) % lit(Dedup.MinhashP)))
      }
    }
    val df = base.select(
      call_function("graft_minhash", col("shingles"),
        typedlit[Seq[Long]]((0 until Dedup.MinhashK).map(Dedup.minhashA).toList),
        typedlit[Seq[Long]]((0 until Dedup.MinhashK).map(Dedup.minhashB).toList),
        lit(Dedup.MinhashP)).as("native"),
      array(declSlots: _*).as("decl"))
    assert(df.filter(not(col("native") === col("decl"))).count() == 0)
  }

  test("graft_skipgram == the declarative nested-transform formulation on real docs") {
    import graft.functions.Text
    val w = 3
    val base = graft.lake.Tables(spark, sfDir, "documents")
      .select(Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val decl = flatten(transform(
      sequence(lit(1), size(col("t")) - 1), i =>
        transform(sequence(i + 1, least(i + w, size(col("t")))), j =>
          struct(
            least(element_at(col("t"), i), element_at(col("t"), j)).as("a"),
            greatest(element_at(col("t"), i), element_at(col("t"), j)).as("b")))))
    val df = base.select(
      call_function("graft_skipgram", col("t"), lit(w)).as("native"),
      decl.as("decl"))
    assert(df.filter(not(col("native") === col("decl"))).count() == 0)
    // sub-2-token inputs yield an EMPTY array (the declarative form needs
    // a guard against Spark's descending sequence(1, 0))
    val edge = spark.sql(
      "SELECT graft_skipgram(array('only'), 3) AS p, graft_skipgram(CAST(NULL AS ARRAY<STRING>), 3) AS np")
      .head()
    assert(edge.getSeq[Any](0).isEmpty && edge.isNullAt(1))
  }

  test("the expression is registered for plain SQL too") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(10.0d, 20.0d)) AS d").head()
    assert(r.getDouble(0) == 50.0)
  }

  test("whole-stage codegen survives the native expression (no fallback)") {
    // a real parquet scan (a local relation would be folded at plan time)
    val df = graft.lake.Tables(spark, sfDir, "embeddings")
      .select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
    assert(df.collect().forall(_.getDouble(0) >= 0.0))
    // the '*(n)' prefix marks a WholeStageCodegen stage: the projection
    // containing graft_dot must be INSIDE one, not ejected to interpreted
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"),
      s"graft_dot not inside a codegen stage:\n$plan")
  }
}
