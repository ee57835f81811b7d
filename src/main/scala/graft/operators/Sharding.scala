package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — the consistent-hash
  * assignment layer a stateful serving tier (ANN index shards, postings
  * shards, feature stores) needs when the shard count changes: every key
  * scores each shard with an independent hash and lands on the argmax,
  * so adding the (N+1)-th shard moves EXACTLY the keys whose new score
  * beats their old max — 1/(N+1) of them in expectation — and nothing
  * else (Thaler & Ravishankar, IEEE/ACM ToN 1998). Contrast mod-N
  * hashing, where a +1 reshard moves (N−1)/N of all keys and cold-starts
  * the whole tier.
  *
  * Scale shape: assignment is one map-side pass (N md5 evaluations per
  * key folded with `array_position`/max over a let-bound array — no
  * shuffle, no shard table); the shard census is one map-side-combined
  * aggregate. Scores are the engine-wide md5 7-nibble base hash —
  * integer, engine-exact, layout-free. Ties (two shards drawing the same
  * 28-bit score for a key) break to the LOWER shard id by argmax-first
  * semantics, deterministically. */
object Sharding {

  /** HRW score of `key` for shard `s` — the md5 7-nibble integer of
    * "hrw:s:key" under the engine-wide hash namespace discipline. */
  private def score(key: Column, s: Int): Column =
    call_function("graft_md5_prefix",
      concat(lit(s"hrw:$s:"), key.cast("string")), lit(7))

  /** The winning shard id in [0, n) for `key`: first index achieving the
    * max score (lower id wins ties). Pure per-row arithmetic. */
  def assign(key: Column, n: Int): Column = {
    require(n >= 1, s"shard count must be >= 1, got $n")
    val scores = array((0 until n).map(score(key, _)): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Shard census: keys per shard at `n` shards plus each shard's share,
    * the balance read (HRW is balanced in expectation; the census is the
    * certificate). One map-side assignment pass + one n-row aggregate. */
  def shardCensus(df: DataFrame, key: Column, n: Int): DataFrame =
    df.select(assign(key, n).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_keys"))
      .withColumn("total", sum(col("n_keys")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("shard"), col("n_keys"),
        round(col("n_keys").cast("double") / col("total"), 6).as("share"))

  /** Reshard-stability census for growing `from` → `to` shards: per
    * (old_shard, moved?) key counts plus the global moved fraction — the
    * minimal-disruption certificate (HRW moves ≈ (to−from)/to of keys;
    * mod-N would move (from−1)/from). Both assignments evaluate in the
    * SAME map-side pass; nothing shuffles but the tiny census. */
  def reshardMoves(df: DataFrame, key: Column, from: Int, to: Int): DataFrame = {
    require(from >= 1 && to > from, s"need 1 <= from < to, got $from -> $to")
    df.select(assign(key, from).as("old_shard"),
        (assign(key, to) =!= assign(key, from)).as("moved"))
      .groupBy(col("old_shard"), col("moved"))
      .agg(count(lit(1)).as("n_keys"))
      .withColumn("total", sum(col("n_keys")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("old_shard"), col("moved"), col("n_keys"),
        round(col("n_keys").cast("double") / col("total"), 6).as("share"))
  }

  /** Content-addressed shard manifest — the reproducibility certificate
    * for shipping a sharded dataset: per shard, the row count, byte
    * mass, and an ORDER-INDEPENDENT content digest (bit_xor over each
    * row's 60-bit md5 of key:payload). Two independently-produced copies
    * of a 100 TB export agree iff every shard's (n_rows, sum_bytes,
    * digest) triple matches — no row ordering, partitioning, or file
    * layout can flip the answer, and a single corrupted/dropped/duped
    * row flips the digest. One map-side pass + one n-shard aggregate;
    * xor is associative+commutative, so partial aggregation combines
    * map-side like any sum. */
  def shardManifest(df: DataFrame, key: Column, payload: Column,
      n: Int): DataFrame =
    df.select(assign(key, n).as("shard"),
        call_function("graft_md5_prefix",
          concat(key.cast("string"), lit(":"), payload.cast("string")),
          lit(15)).as("h"),
        octet_length(payload.cast("string")).cast("long").as("bytes"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("bytes")).as("sum_bytes"),
        expr("bit_xor(h)").as("digest"))
}
