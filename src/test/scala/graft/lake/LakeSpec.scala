package graft.lake

import java.nio.file.Files
import graft.SparkSpec

/** K1-K3 + S6: path derivation against the reference's URL shapes
  * (`/root/reference/ingestion-datalake.py:102-105`), writer round-trips,
  * secret providers. */
class LakeSpec extends SparkSpec {

  test("K3 LakePaths.derive matches the reference's layout") {
    // url.split('/')[-5:-3] joined with '_', prefixed filename:
    // an Inside-Airbnb-shaped URL keeps <region>_<city>_<file>.
    val url = "https://data.example.com/spain/catalonia/barcelona/2024-09-06/data/listings.csv.gz"
    assert(LakePaths.derive(url) == "airbnb/spain/catalonia_barcelona_listings.csv.gz")
    val url2 = "https://host/x/andalucia/sevilla/2024-06-30/data/reviews.csv"
    assert(LakePaths.derive(url2) == "airbnb/spain/andalucia_sevilla_reviews.csv")
  }

  test("K3 columnar deriveCol agrees with the pure-Scala derive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "https://data.example.com/spain/catalonia/barcelona/2024-09-06/data/listings.csv.gz",
      "https://host/x/andalucia/sevilla/2024-06-30/data/reviews.csv")
    val got = urls.toDF("href")
      .select(LakePaths.deriveCol(col("href"), "airbnb/spain")).as[String]
      .collect().toSeq
    assert(got == urls.map(LakePaths.derive(_)))
  }

  test("LakeLocator resolves container + blob path under a root (and serializes)") {
    val loc: LakeLocator = LocalLakeLocator("/tmp/lakeroot")
    assert(loc.uri("datastorage", "airbnb/spain/f.csv") == "/tmp/lakeroot/datastorage/airbnb/spain/f.csv")
    val out = new java.io.ObjectOutputStream(java.io.OutputStream.nullOutputStream())
    out.writeObject(loc)   // mapPartitions closure capture must not throw
  }

  test("K1 writer round-trip: overwrite parquet is idempotent") {
    val dir = Files.createTempDirectory("graft-writer").toString
    val df = spark.range(10).toDF("id")
    Writers.parquet(df, s"$dir/t")
    Writers.parquet(df, s"$dir/t")   // overwrite, not append
    assert(spark.read.parquet(s"$dir/t").count() == 10)
    Writers.csv(df, s"$dir/c")
    assert(spark.read.option("header", "true").csv(s"$dir/c").count() == 10)
  }

  test("K1 partitioned write produces hive-style directories and prunes on read") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-part").toString
    val df = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    Writers.parquet(df, s"$dir/ev", partitionBy = Seq("event_type"))
    val parts = new java.io.File(s"$dir/ev").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(parts.exists(_.startsWith("event_type=")), s"no partition dirs: $parts")
    // partition pruning: the filtered read touches only one directory
    val one = spark.read.parquet(s"$dir/ev").filter(col("event_type") === "click")
    assert(one.count() == df.filter(col("event_type") === "click").count())
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not applied:\n$scan")
  }

  test("K1 dynamic backfill rewrites only the touched partition; others keep their files") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-backfill").toString
    val df = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    Writers.parquet(df, s"$dir/ev", partitionBy = Seq("event_type"))
    def files(p: String) = new java.io.File(s"$dir/ev/event_type=$p")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    val clickBefore = files("click")
    val viewBefore = files("view")
    // backfill ONLY the view partition with doubled values
    val patch = df.filter(col("event_type") === "view")
      .withColumn("value", col("value") * 2)
    Writers.backfillPartitions(patch, s"$dir/ev", Seq("event_type"))
    assert(files("click") == clickBefore, "untouched partition must keep its files")
    assert(files("view") != viewBefore, "backfilled partition must be rewritten")
    val after = spark.read.parquet(s"$dir/ev")
    assert(after.filter(col("event_type") === "view").agg(sum(col("value")))
      .head.getDouble(0) ==
      df.filter(col("event_type") === "view")
        .agg(sum(col("value") * 2)).head.getDouble(0))
    assert(after.count() == df.count(), "row count preserved across backfill")
    // idempotence: re-running the same backfill converges
    Writers.backfillPartitions(patch, s"$dir/ev", Seq("event_type"))
    assert(spark.read.parquet(s"$dir/ev").count() == df.count())
  }

  test("K1 range-sorted layout: disjoint per-file key intervals, sorted within files") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-range").toString
    val df = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Writers.parquetRangeSorted(df, "o_totalprice", 4, s"$dir/o")
    // the write plan range-partitions (sampled bounds), not hash
    val files = new java.io.File(s"$dir/o").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1, "expected multiple range files")
    // per-file key intervals are non-overlapping and internally sorted —
    // the property parquet min/max footers turn into file-level pruning
    val ranges = files.map { f =>
      val vals = spark.read.parquet(f)
        .select(col("o_totalprice")).collect().map(_.getDouble(0))
      assert(vals.sameElements(vals.sorted), s"file $f not sorted")
      (vals.min, vals.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping file intervals: $hi > $lo")
      case _ =>
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(s"$dir/o").count() == df.count())
  }

  test("K1 compaction: many small appends rewrite to few files, content intact, no shuffle") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-compact").toString
    // simulate 20 micro-batch appends of one tiny file each
    (0 until 20).foreach { i =>
      spark.range(i * 10, i * 10 + 10).toDF("id")
        .coalesce(1).write.mode("append").parquet(s"$dir/small")
    }
    val countFiles = (p: String) => new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(countFiles(s"$dir/small") == 20)
    Writers.compact(spark, s"$dir/small", s"$dir/big", 2)
    assert(countFiles(s"$dir/big") <= 2)
    // nothing lost, nothing duplicated
    val got = spark.read.parquet(s"$dir/big").select(col("id")).collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(got == (0L until 200L).toSeq)
    // coalesce merges partitions without an exchange
    val plan = spark.read.parquet(s"$dir/small").coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      Writers.compact(spark, s"$dir/small", s"$dir/small", 2)
    }
  }

  test("S6 secret providers: env mapping, props file, chain fallback") {
    val env = new EnvSecretProvider("kv_", Map("KV_SP_SECRET" -> "from-env"))
    assert(env.secret("sp-secret").contains("from-env"))
    assert(env.secret("absent").isEmpty)

    val f = Files.createTempFile("secrets", ".properties")
    Files.writeString(f, "sp-secret=from-file\nother=x\n")
    val props = new PropsFileSecretProvider(f.toString)
    assert(props.secret("sp-secret").contains("from-file"))
    assert(props.names == Set("sp-secret", "other"))

    // chain: first provider with a binding wins (env -> vault order,
    // ingestion-datalake.py:26-31).
    val chain = SecretProviders.chain(env, props, InMemorySecretProvider(Map("only" -> "mem")))
    assert(chain.secret("sp-secret").contains("from-env"))
    assert(chain.secret("other").contains("x"))
    assert(chain.secret("only").contains("mem"))
    intercept[NoSuchElementException](chain.secretOrThrow("nope"))
  }
}
