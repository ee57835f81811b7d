package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion dataflow (SURVEY.md §3.2), redesigned from the reference's
  * sequential single-process loop (`/root/reference/ingestion-datalake.py:
  * 100-127`: discover links → filter → take 14 → GET each → PUT each) into
  * a distributed, idempotent Spark plan:
  *
  *   manifest DataFrame of URIs → columnar filter (substring/suffix) →
  *   deterministic ordered limit → path derivation → `mapPartitions` fetch
  *   (parallel, per-executor) → report relation.
  *
  * The HTML-scrape discovery step (S4) and HTTP fetch (S5) are behind
  * [[LinkSource]] / [[Fetcher]] traits: the zero-egress build uses a local
  * fixture list and filesystem copy; a networked deployment swaps in an
  * HTTP implementation without touching the plan.
  */
trait LinkSource { def hrefs(): Seq[String] }

final case class FixtureLinkSource(links: Seq[String]) extends LinkSource {
  def hrefs(): Seq[String] = links
}

trait Fetcher extends Serializable {
  /** Fetch the URI's content to `targetPath`; returns bytes written. */
  def fetch(uri: String, targetPath: String): Long
}

/** Local-filesystem fetcher: treats the URI path as a local source file. */
final class LocalCopyFetcher extends Fetcher {
  def fetch(uri: String, targetPath: String): Long = {
    val src = Paths.get(uri.replaceFirst("^file:", ""))
    val dst = Paths.get(targetPath)
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.size(dst)
  }
}

object Ingest {

  /** Manifest: discovered links as a single-column DataFrame — the
    * distributed replacement for the reference's in-memory Python list. */
  def manifest(spark: SparkSession, source: LinkSource): DataFrame = {
    import spark.implicits._
    source.hrefs().toDF("href")
  }

  /** Filter + deterministic limit + lake-path derivation, all columnar:
    * the reference's `"spain" in href` / `.endswith(".parquet")` /
    * `[0:14]` (`ingestion-datalake.py:95-96`,
    * `ingestion-datalake-parquet.py:97-98`). */
  def plan(manifest: DataFrame, contains: String, suffix: String,
      limit: Int, prefix: String): DataFrame =
    manifest
      .filter(col("href").contains(contains) && col("href").endsWith(suffix))
      .orderBy(col("href"))
      .limit(limit)
      .withColumn("blob_path", LakePaths.deriveCol(col("href"), prefix))

  /** Execute the copy distributed: each partition fetches its URIs inside
    * `mapPartitions` (retry-per-file, parallel across executors) and emits
    * a report row. Idempotent: re-running overwrites the same target. */
  def run(spark: SparkSession, planned: DataFrame, locator: LakeLocator,
      container: String, fetcher: Fetcher): DataFrame = {
    import spark.implicits._
    planned.select(col("href"), col("blob_path")).as[(String, String)]
      .mapPartitions { it =>
        it.map { case (href, blobPath) =>
          val target = locator.uri(container, blobPath)
          val bytes =
            try fetcher.fetch(href, target)
            catch { case e: Exception => -1L }
          (href, blobPath, bytes, bytes >= 0)
        }
      }
      .toDF("href", "blob_path", "bytes", "ok")
  }
}
