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
}
