package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
import graft.operators.Dedup

/** Streaming twin of [[Dedup.incrementalSimhashFromChunks]] — the daily-
  * ingest wiring for the SimHash near-dup tier, completing the streaming
  * dedup family (exact: [[StreamingDedup]]; MinHash bands:
  * [[StreamingNearDup]]; token spans: [[StreamingSpanDedup]]). Each
  * micro-batch of incoming documents
  *
  *   1. computes its (doc_id, simhash, chunk, chunk_val) table once
  *      (persisted for the batch),
  *   2. probes the durable corpus chunk artifact at `chunksPath` for
  *      cross pairs within Hamming `maxDist`, plus the capped
  *      within-batch expansion,
  *   3. appends the found pairs to `pairsPath`, and
  *   4. appends its own chunks to `chunksPath` — so later batches see
  *      earlier ones without re-hashing any history.
  *
  * State lives in the chunk TABLE, not in streaming state: the corpus
  * side is a parquet artifact bucketable by (chunk, chunk_val), so
  * executor memory is O(micro-batch), independent of corpus size.
  *
  * Delivery semantics match [[StreamingNearDup]]: pass `checkpointDir`
  * for restart tracking; the self-pair filter keeps a REPLAYED batch
  * (which finds its own chunks already appended) from pairing documents
  * with themselves, and replayed duplicate rows collapse in the
  * downstream `distinct` the pair consumers already run.
  */
object StreamingSimhash {

  /** Chunk-table schema as produced by [[Dedup.simhashChunksOf]]. */
  val ChunkSchema: StructType = new StructType()
    .add("doc_id", LongType).add("simhash", LongType)
    .add("chunk", IntegerType).add("chunk_val", LongType)

  /** Create an empty corpus chunk table at `chunksPath` if none exists. */
  def ensureChunkTable(spark: SparkSession, chunksPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(chunksPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ChunkSchema).write.parquet(chunksPath)
  }

  /** Start the ingest: `incoming` must carry (doc_id, text). Pairs land in
    * `pairsPath` as (doc_a, doc_b, hamming); chunks accumulate in
    * `chunksPath`. */
  def start(incoming: DataFrame, chunksPath: String, pairsPath: String,
      maxDist: Int = 3, maxBucket: Int = Dedup.MaxBucket,
      checkpointDir: Option[String] = None): StreamingQuery = {
    ensureChunkTable(incoming.sparkSession, chunksPath)
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.col
        // chunks computed ONCE per batch, used twice (probe + append)
        val incChunks = Dedup.simhashChunksOf(batch).persist()
        try {
          val exChunks = spark.read.schema(ChunkSchema).parquet(chunksPath)
          Dedup.incrementalSimhashFromChunks(exChunks, incChunks, maxDist, maxBucket)
            .filter(col("doc_a") =!= col("doc_b"))
            .write.mode("append").parquet(pairsPath)
          incChunks.write.mode("append").parquet(chunksPath)
        } finally incChunks.unpersist(false)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
