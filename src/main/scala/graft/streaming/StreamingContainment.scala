package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.operators.Dedup

/** Streaming twin of [[Dedup.incrementalContainmentPairs]] — the ingest
  * wiring for the subset/containment tier, completing the streaming dedup
  * family (exact, MinHash bands, SimHash chunks, token spans, and now
  * containment). Each micro-batch of incoming documents
  *
  *   1. computes its shingle sets once, derives postings + bottom-k
  *      probes,
  *   2. probes the durable corpus postings with its probes AND replays
  *      the corpus' persisted probes against its own postings (either
  *      side of a subset pair can be the smaller one),
  *   3. appends the verified pairs to `pairsPath`, and
  *   4. appends its postings, probes, and ADDITIVE (shingle, n) df rows
  *      to the artifact dir — history is never re-shingled, and the
  *      df cap always reflects the accumulated corpus.
  *
  * Artifact layout under `indexDir`: `postings/` (doc_id, shingle),
  * `probes/` (doc_id, shingle — k rows/doc), `dfstats/` (shingle, n).
  *
  * Delivery semantics match [[StreamingNearDup]]: pass `checkpointDir`
  * for restart tracking; the self-pair filter keeps a replayed batch from
  * pairing documents with their own previously-appended postings, and
  * replayed duplicate pair rows collapse in the downstream `distinct` the
  * pair consumers already run. One replay-specific caveat: a replayed
  * batch's df rows are appended twice, inflating those shingles' counts —
  * the cap then prunes them EARLIER than a clean run would (conservative:
  * hot-shingle recall narrows, nothing false appears). A lake with atomic
  * multi-table commits would remove the caveat.
  */
object StreamingContainment {

  val PostingSchema: StructType = new StructType()
    .add("doc_id", LongType).add("shingle", StringType)
  val DfSchema: StructType = new StructType()
    .add("shingle", StringType).add("n", LongType)

  /** Create empty postings/probes/dfstats tables under `indexDir` if the
    * artifact does not exist yet — first deployment of a fresh corpus. */
  def ensureIndex(spark: SparkSession, indexDir: String): Unit = {
    def ensure(path: String, schema: StructType): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema).write.parquet(path)
    }
    ensure(s"$indexDir/postings", PostingSchema)
    ensure(s"$indexDir/probes", PostingSchema)
    ensure(s"$indexDir/dfstats", DfSchema)
  }

  /** Start the ingest: `incoming` must carry (doc_id, text). Verified
    * pairs land in `pairsPath` as (doc_a, doc_b, cont_a, cont_b). */
  def start(incoming: DataFrame, indexDir: String, pairsPath: String,
      threshold: Double, bottomK: Int = Dedup.ContainBottomK,
      maxDf: Int = Dedup.ContainMaxDf, minHits: Int = Dedup.ContainMinHits,
      checkpointDir: Option[String] = None): StreamingQuery = {
    ensureIndex(incoming.sparkSession, indexDir)
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{col, count, explode, lit}
        // shingle sets computed ONCE per batch, shared by the pair search
        // and all three artifact appends
        val sets = Dedup.shingleSetRelation(batch).persist()
        try {
          val exPostings = spark.read.schema(PostingSchema).parquet(s"$indexDir/postings")
          val exProbes   = spark.read.schema(PostingSchema).parquet(s"$indexDir/probes")
          val exDf       = spark.read.schema(DfSchema).parquet(s"$indexDir/dfstats")
          Dedup.incrementalContainmentFromSets(exPostings, exProbes, exDf, sets,
              threshold, bottomK, maxDf, minHits)
            .filter(col("doc_a") =!= col("doc_b"))
            .write.mode("append").parquet(pairsPath)
          val postings = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
          postings.write.mode("append").parquet(s"$indexDir/postings")
          Dedup.containmentProbeRelation(sets, bottomK)
            .write.mode("append").parquet(s"$indexDir/probes")
          postings.groupBy(col("shingle")).agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(s"$indexDir/dfstats")
        } finally sets.unpersist(false)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
