package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.lake.LakePaths

/** Property layer (SURVEY §5.1): invariants that hold for ALL inputs, not
  * just the fixture goldens. Raw ScalaCheck runner (no scalatestplus
  * bridge in the offline cache). */
class PropertiesSpec extends SparkSpec {

  private def check(p: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  private val segment: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("LakePaths.derive: always prefixed, always region_city_filename of the URL tail") {
    val urls = for {
      host <- segment; region <- segment; city <- segment
      date <- segment; file <- segment
    } yield (region, city, file, s"https://$host/x/$region/$city/$date/data/$file.csv")
    check(Prop.forAll(urls) { case (region, city, file, url) =>
      val derived = LakePaths.derive(url)
      derived == s"airbnb/spain/${region}_${city}_$file.csv"
    })
  }

  test("na.drop(thresh=n) keeps exactly the rows with >= n non-null cells") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("a", "b", "c").map(StructField(_, IntegerType, nullable = true)))
    val rowGen = Gen.listOfN(3, Gen.option(Gen.choose(0, 9)))
      .map(cells => Row(cells.map(_.map(Int.box).orNull): _*))
    val dataGen = Gen.listOfN(30, rowGen)
    check(Prop.forAll(dataGen, Gen.choose(0, 4)) { (rows, n) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val kept = df.na.drop(n).collect()
      val expected = rows.count(r => (0 until 3).count(i => !r.isNullAt(i)) >= n)
      kept.length == expected &&
        kept.forall(r => (0 until 3).count(i => !r.isNullAt(i)) >= n)
    })
  }

  test("fingerprint is invariant under leading/trailing/duplicated whitespace") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString))
    check(Prop.forAll(words) { ws =>
      val clean = ws.mkString(" ")
      val noisy = "  " + ws.mkString("   ") + " \t "
      val fps = Seq(clean, noisy).toDF("text")
        .select(graft.functions.Text.fingerprint(col("text"))).as[String].collect()
      fps(0) == fps(1)
    })
  }

  test("chunkSpans: chunks tile the token stream exactly (overlap removed == original)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.Text
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val docGen = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, wordGen))
    val cfgGen = for {
      size <- Gen.chooseNum(2, 8); overlap <- Gen.chooseNum(0, size - 1)
    } yield (size, overlap)
    check(Prop.forAll(docGen, cfgGen) { case (words, (size, overlap)) =>
      val chunks = Seq(words.mkString(" ")).toDF("text")
        .select(Text.chunkSpans(col("text"), size, overlap).as("c")).head()
        .getSeq[org.apache.spark.sql.Row](0).map(_.getString(1))
      val stride = size - overlap
      // every chunk starts at k*stride and has `size` tokens (last may be
      // shorter); dropping the first `overlap` tokens of chunks 1.. and
      // concatenating reproduces the doc exactly
      val rebuilt = (chunks.head +: chunks.tail.map(
        _.split(" ").drop(overlap).mkString(" "))).filter(_.nonEmpty).mkString(" ")
      rebuilt == words.mkString(" ")
    }, minTests = 60)
  }

  test("windowCooccurrence: total pair mass == sum over docs of min(w, n-i)") {
    import spark.implicits._
    val tokGen  = Gen.choose(0, 5).map(i => s"t$i")
    val docGen  = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val dataGen = Gen.listOfN(8, docGen)
    check(Prop.forAll(dataGen, Gen.choose(1, 4)) { (docsToks, w) =>
      val df = docsToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      import org.apache.spark.sql.functions.{coalesce, lit, sum}
      val mass = graft.operators.Retrieval.windowCooccurrence(df, w, 1)
        .agg(coalesce(sum("n_ab"), lit(0L))).head().getLong(0)
      val expected = docsToks.map(_.length).filter(_ >= 2)
        .map(n => (1 until n).map(i => math.min(w, n - i)).sum.toLong).sum
      mass == expected
    }, minTests = 20)
  }

  test("redactPii is idempotent and never leaves a redactable span behind") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.Text
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val pii = Gen.oneOf(
      Gen.const("a.user@example.org"),
      Gen.const("123-45-6789"),
      Gen.const("10.0.3.77"),
      Gen.const("+1 555-867-5309"))
    val docGen = for {
      ws <- Gen.listOfN(6, word); p1 <- pii; p2 <- pii
    } yield (ws.take(3) ++ Seq(p1) ++ ws.drop(3) ++ Seq(p2)).mkString(" ")
    check(Prop.forAll(docGen) { doc =>
      val out = Seq(doc).toDF("text")
        .select(Text.redactPii(col("text")).as("r1"),
          Text.redactPii(Text.redactPii(col("text"))).as("r2"))
        .head()
      out.getString(0) == out.getString(1) &&
        !out.getString(0).exists(_.isDigit) && !out.getString(0).contains("@")
    }, minTests = 40)
  }

  test("scd2Merge: empty batch is identity; any batch preserves one-live-row-per-key and never shrinks history") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Evolve
    val attrs = Seq("v")
    val dimGen = Gen.listOfN(8, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 3)))
      .map(_.distinctBy(_._1)) // key-unique live set
    val updGen = Gen.listOfN(4, Gen.zip(Gen.choose(1L, 8L), Gen.choose(0, 3)))
      .map(_.distinctBy(_._1))
    check(Prop.forAll(dimGen, updGen) { (dim, upd) =>
      val current = dim.toDF("k", "v")
        .select(col("k"), col("v"),
          lit("2024-01-01").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
      val asOf = lit("2024-06-01").cast("timestamp")
      // empty batch -> identity
      val empty = Evolve.scd2Merge(current,
        Seq.empty[(Long, Int)].toDF("k", "v"), "k", attrs, asOf)
      val idOk = empty.collect().map(_.toString).sorted.toSeq ==
        current.collect().map(_.toString).sorted.toSeq
      // any key-unique batch -> exactly one live row per key, row count
      // only grows (versions append, never vanish)
      val merged = Evolve.scd2Merge(current, upd.toDF("k", "v"), "k", attrs, asOf)
      val liveDups = merged.filter(col("valid_to").isNull)
        .groupBy("k").count().filter(col("count") > 1).count()
      idOk && liveDups == 0 && merged.count() >= current.count()
    }, minTests = 15)
  }

  test("snapshotDiff(x, x) is all 'same'; statuses partition the key space") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Evolve
    val snapGen = Gen.listOfN(10, Gen.zip(Gen.choose(1L, 12L), Gen.choose(0, 2)))
      .map(_.distinctBy(_._1))
    check(Prop.forAll(snapGen, snapGen) { (b, a) =>
      val bd = b.toDF("k", "v"); val ad = a.toDF("k", "v")
      val self = Evolve.snapshotDiff(bd, bd, "k", Seq("v"))
        .filter(col("status") =!= "same").count() == 0
      val d = Evolve.snapshotDiff(bd, ad, "k", Seq("v"))
      // one verdict per key, and the verdict set covers every key once
      val keys = (b.map(_._1) ++ a.map(_._1)).distinct.size
      self && d.count() == keys &&
        d.select("k").distinct().count() == keys
    }, minTests = 15)
  }

  test("auc: census formulation equals brute-force pair counting for all inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Gen.listOfN(20, Gen.zip(Gen.choose(0, 5), Gen.oneOf(0, 1)))
      .suchThat(l => l.exists(_._2 == 1) && l.exists(_._2 == 0))
    check(Prop.forAll(rows) { data =>
      val df = data.map { case (s, y) => (s.toDouble, y) }.toDF("s", "y")
      val got = graft.ml.Logistic.auc(df, col("s"), col("y") === 1)
        .collect()(0).getDouble(2)
      val pos = data.filter(_._2 == 1).map(_._1)
      val neg = data.filter(_._2 == 0).map(_._1)
      val u = (for { p <- pos; n <- neg } yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val brute = BigDecimal(u / (pos.size.toLong * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got == brute
    }, minTests = 20)
  }

  test("ksStatistic: census formulation equals brute-force ECDF sup for all inputs") {
    import spark.implicits._
    val pair = Gen.zip(Gen.nonEmptyListOf(Gen.choose(0, 8)),
      Gen.nonEmptyListOf(Gen.choose(0, 8)))
    check(Prop.forAll(pair) { case (la, lb) =>
      val got = graft.operators.Drift.ksStatistic(
        la.map(_.toDouble).toDF("v"), lb.map(_.toDouble).toDF("v"), "v")
        .collect()(0).getDouble(2)
      val vals = (la ++ lb).distinct.sorted
      val brute = vals.map { t =>
        math.abs(la.count(_ <= t).toDouble / la.size -
          lb.count(_ <= t).toDouble / lb.size)
      }.max
      got == BigDecimal(brute).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }, minTests = 20)
  }

  test("associationRules: pair supports equal brute-force basket intersection counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val baskets = Gen.listOfN(12,
      Gen.zip(Gen.choose(1L, 6L), Gen.choose(0, 4).map(i => s"i$i")))
    check(Prop.forAll(baskets) { rows =>
      val df = rows.toDF("basket", "item")
      val got = graft.operators.Affinity
        .associationRules(df, "basket", "item", 2)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val sets = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val items = rows.map(_._2).distinct.sorted
      val brute = (for {
        a <- items; b <- items if a < b
        supp = sets.count { case (_, s) => s(a) && s(b) }
        if supp >= 2
        sa = sets.count(_._2(a)); sb = sets.count(_._2(b))
        if sa >= 2 && sb >= 2
      } yield (a, b) -> supp.toLong).toMap
      got == brute
    }, minTests = 20)
  }

  test("deletionNeighborhoodPairs ≡ brute force lev≤1 on arbitrary small-alphabet strings") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // small alphabet + short lengths force dense lev-1 neighborhoods —
    // substitutions, insertions and deletions all exercised
    val word: Gen[String] = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpus: Gen[List[String]] = Gen.listOfN(12, word)
    check(Prop.forAll(corpus) { words =>
      val distinct = words.distinct
      val brute = (for {
        a <- distinct; b <- distinct if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      val got = graft.operators.FuzzyJoin
        .deletionNeighborhoodPairs(words.toDF("s"), "s")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      got == brute
    }, minTests = 15)
  }
}
