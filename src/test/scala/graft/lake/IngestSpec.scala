package graft.lake

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** S4/S5/K1 end-to-end: fixture hrefs → plan → distributed LocalCopyFetcher
  * copy into a `datastorage/`-shaped directory, layout per
  * `/root/reference/ingestion-datalake.py:103-105`, idempotent re-run. */
class IngestSpec extends SparkSpec {

  test("Ingest.run copies planned files into the lake layout, idempotently") {
    val srcRoot = Files.createTempDirectory("graft-src")
    val lakeRoot = Files.createTempDirectory("graft-lake")
    def mkSrc(rel: String, content: String): String = {
      val p = srcRoot.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
      s"file:$p"
    }
    val hrefs = Seq(
      mkSrc("spain/catalonia/barcelona/2024-01-01/data/listings.csv", "a,b\n1,2\n"),
      mkSrc("spain/andalucia/sevilla/2024-01-01/data/reviews.csv", "x\n9\n"),
      mkSrc("spain/madrid/madrid/2024-01-01/data/notes.txt", "ignored"),  // wrong suffix
      mkSrc("france/idf/paris/2024-01-01/data/listings.csv", "ignored"))  // wrong country

    val planned = Ingest.plan(Ingest.manifest(spark, FixtureLinkSource(hrefs)),
      "spain", ".csv", 14, "airbnb/spain")
    assert(planned.count() == 2)   // F6 contains + F7 suffix filters applied

    val report = Ingest.run(spark, planned, LocalLakeLocator(lakeRoot.toString),
      "datastorage", new LocalCopyFetcher)
    val rows = report.collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Boolean]("ok")))

    // reference layout: datastorage/airbnb/spain/<region>_<city>_<file>
    val bcn = lakeRoot.resolve("datastorage/airbnb/spain/catalonia_barcelona_listings.csv")
    val sev = lakeRoot.resolve("datastorage/airbnb/spain/andalucia_sevilla_reviews.csv")
    assert(Files.readString(bcn) == "a,b\n1,2\n")
    assert(Files.readString(sev) == "x\n9\n")

    // idempotence: re-run overwrites, same report, same bytes
    val rerun = Ingest.run(spark, planned, LocalLakeLocator(lakeRoot.toString),
      "datastorage", new LocalCopyFetcher).collect()
    assert(rerun.length == 2 && rerun.forall(_.getAs[Boolean]("ok")))
    assert(Files.readString(bcn) == "a,b\n1,2\n")
  }

  test("Ingest.run reports per-file failure without failing the job") {
    val lakeRoot = Files.createTempDirectory("graft-lake2")
    import spark.implicits._
    val planned = Seq(("file:/nonexistent/spain/a/b/2024/data/gone.csv",
      "airbnb/spain/a_b_gone.csv")).toDF("href", "blob_path")
    val report = Ingest.run(spark, planned, LocalLakeLocator(lakeRoot.toString),
      "datastorage", new LocalCopyFetcher).collect()
    assert(report.length == 1 && !report.head.getAs[Boolean]("ok")
      && report.head.getAs[Long]("bytes") == -1L)
  }
}
