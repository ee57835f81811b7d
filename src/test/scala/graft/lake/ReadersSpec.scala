package graft.lake

import org.apache.spark.sql.types._
import graft.SparkSpec

/** S1/S2: the reference's most-used operator — CSV read with header and
  * schema inference (`/root/reference/pyspark-1.ipynb:68,103`;
  * `pyspark-2.ipynb:66,333,468`; `pyspark-3.ipynb:66`). Goldens are the
  * executed notebook outputs (schema printouts + head rows). */
class ReadersSpec extends SparkSpec {

  test("S2 csvInferred: header row becomes column names, types are inferred") {
    val df = Readers.csvInferred(spark, tutoCsv("test1.csv"))
    // printSchema golden (pyspark-1.ipynb:92 output): Name string, ints.
    assert(df.schema == StructType(Seq(
      StructField("Name", StringType, nullable = true),
      StructField("age", IntegerType, nullable = true),
      StructField("Experience", IntegerType, nullable = true),
      StructField("Salary", IntegerType, nullable = true))))
    assert(df.count() == 6)
    // head(3) golden (pyspark-1.ipynb:172 output): first row Krish/31/10.
    val first = df.head()
    assert(first.getString(0) == "Krish" && first.getInt(1) == 31
      && first.getInt(2) == 10 && first.getInt(3) == 30000)
  }

  test("S2 csvInferred: doubles inferred for tips.csv") {
    val df = Readers.csvInferred(spark, tutoCsv("tips.csv"))
    assert(df.schema("total_bill").dataType == DoubleType)
    assert(df.schema("sex").dataType == StringType)
    assert(df.schema("size").dataType == IntegerType)
    assert(df.count() == 244)
  }

  test("S1 csv with explicit schema: no inference pass, empty cells are NULL") {
    val schema = StructType(Seq(
      StructField("Name", StringType), StructField("age", IntegerType),
      StructField("Experience", IntegerType), StructField("Salary", IntegerType)))
    val df = Readers.csv(spark, tutoCsv("test2.csv"), schema)
    assert(df.count() == 9)
    // test2.csv rows 7-9 carry empty cells (pyspark-2.ipynb:96 output
    // shows NULL): Mahesh row has null age+Experience.
    val mahesh = df.filter("Name = 'Mahesh'").head()
    assert(mahesh.isNullAt(1) && mahesh.isNullAt(2) && mahesh.getInt(3) == 40000)
  }

  test("S3 parquet scan reads the driver tables") {
    val docs = Readers.parquet(spark, s"$sfDir/documents.parquet")
    assert(docs.columns.contains("doc_id") && docs.count() > 0)
  }

  test("ORC round-trip is lossless and predicates push into the ORC scan") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = Readers.parquet(spark, s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars")
    Writers.orc(docs, dir)
    val back = Readers.orc(spark, dir).filter(col("n_chars") >= 100)
    assert(back.count() == docs.filter(col("n_chars") >= 100).count())
    assert(back.schema == docs.schema)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(n_chars,100)")
      && plan.contains("Format: ORC"),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("JSONL round-trip is lossless, writes one object per line, prunes on read") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Readers.parquet(spark, s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    Writers.jsonl(docs, dir)

    // files are newline-delimited JSON objects
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    assert(part.nonEmpty, "no JSONL part files written")
    val firstLine = scala.io.Source.fromFile(part.head).getLines().next()
    assert(firstLine.startsWith("{") && firstLine.endsWith("}"))

    val back = Readers.jsonl(spark, dir, docs.schema)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    // lossless: anti-join both ways is empty
    assert(back.join(docs, Seq("doc_id", "lang", "text"), "left_anti").isEmpty)
    assert(docs.join(back, Seq("doc_id", "lang", "text"), "left_anti").isEmpty)

    // projection pushes into the scan: only requested fields are read
    val pruned = back.select(col("doc_id")).queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema: struct<doc_id:bigint>"),
      s"JSON scan did not prune to doc_id:\n$pruned")
  }

  test("binaryFiles: glob prunes at listing, size cap pushes down, bytes survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes)
    put("a.jpg", Array[Byte](-1, -40, 1, 2, 3))      // JPEG-ish magic FF D8
    put("b.jpg", Array[Byte](-1, -40, 9, 8))
    put("notes.txt", "not media".getBytes)           // glob-excluded
    put("huge.jpg", Array.fill[Byte](4096)(7))       // over the size cap

    val media = Readers.binaryFiles(spark, dir, "*.jpg", maxBytes = 1024)
    val rows = media.collect().map(r =>
      (new java.io.File(r.getAs[String]("path").stripPrefix("file:")).getName,
        r.getAs[Array[Byte]]("content"))).toMap
    assert(rows.keySet == Set("a.jpg", "b.jpg"), rows.keySet.toString)
    assert(rows("a.jpg").toSeq == Seq[Byte](-1, -40, 1, 2, 3))
    assert(media.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))

    // the size cap reaches the source as a pushed filter — oversized
    // files are excluded from file metadata, never opened
    val plan = media.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("length"),
      s"length filter not pushed into the binaryFile scan:\n$plan")
  }
}
