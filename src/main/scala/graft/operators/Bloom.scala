package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Bloom-filter prefilter for incremental exact dedup — the artifact that
  * lets a mostly-novel delta batch skip the corpus entirely.
  *
  * [[Dedup.incrementalExactDedup]] anti-joins every delta fingerprint
  * against the corpus fingerprint table: correct, but the join touches
  * the corpus-side artifact for EVERY delta row even though in a healthy
  * ingest almost all rows are novel. A Bloom filter over the corpus
  * fingerprints is a few-KB-per-million-docs summary with no false
  * negatives: a delta row whose k probe bits are not all set is
  * DEFINITELY novel and never reaches the join; only Bloom-positive rows
  * (true duplicates + the false-positive fraction) are verified exactly.
  *
  * Scale shape: the filter is `bits/32` words (32 occupied bits per long
  * keep the mask out of the sign bit, which DuckDB's checked shift
  * rejects), built with one map-side explode + a `bit_or` hash agg over
  * at most `bits/32` groups —
  * broadcast to the probe side, so probing is map-side. At 100 TB the
  * filter is a PERSISTED artifact maintained additively (bit_or of the
  * old filter with the accepted batch's bits — union of Bloom filters is
  * bitwise OR), so steady-state ingest reads the corpus only for the
  * ~`fpRate · |delta| + |true dups|` verify rows. Size the filter as
  * m ≈ 1.44 · n · log2(1/fp) bits (n = corpus cardinality): 1% FP over
  * 10^9 fingerprints is ~1.2 GiB — partition the filter by fingerprint
  * prefix into executor-sized broadcast shards at that scale.
  *
  * Relation to [[Joins.bloomPrunedJoin]]: that operator builds an
  * in-plan, single-query runtime filter via the native `graft_bloom_agg`
  * (opaque bytes, fastest path); THIS one materializes the filter as a
  * plain (word, bits) RELATION — persistable alongside the corpus
  * fingerprint table, additively maintainable, and bit-reproducible in
  * ANSI SQL, which is what an ingest pipeline's saved artifact needs.
  *
  * Determinism: bit positions use the engine-wide md5 base
  * (`graft_md5_prefix`, mirrored in SQL by `md5PrefixSqlOf`) with
  * Kirsch–Mitzenmacher double hashing — position_j = (h1 + j·h2) mod m,
  * h1/h2 two independent 28-bit md5 prefixes — so the filter bits are a
  * pure function of the fingerprint in both engines.
  */
object Bloom {

  val DefaultBits = 4096
  val DefaultHashes = 3

  /** The k probe positions of a fingerprint as an array column. */
  private def positions(fp: Column, bits: Int, k: Int): Column = {
    val h1 = call_function("graft_md5_prefix", fp, lit(7))
    val h2 = call_function("graft_md5_prefix", concat(fp, lit(":b2")), lit(7))
    transform(sequence(lit(0), lit(k - 1)), j => (h1 + j * h2) % bits)
  }

  /** Build the filter relation (`word` → 32-bit-occupied `bits`) over a
    * corpus fingerprint relation. ≤ `bits`/32 rows; map-side-combined
    * hash agg. */
  def build(corpusFps: DataFrame, bits: Int = DefaultBits,
      k: Int = DefaultHashes): DataFrame =
    corpusFps
      .select(explode(positions(col("fingerprint"), bits, k)).as("pos"))
      .select((col("pos") / 32).cast("int").as("word"),
        (col("pos") % 32).cast("int").as("bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))

  /** Tag each delta fingerprint with `bloom_hit` (1 = all k bits set,
    * must be verified; 0 = definitely novel). The filter side is
    * broadcast; probing never shuffles the delta. */
  def probe(deltaFps: DataFrame, filter: DataFrame,
      bits: Int = DefaultBits, k: Int = DefaultHashes): DataFrame = {
    val keep = deltaFps.columns.map(col)
    deltaFps
      .withColumn("pos", explode(positions(col("fingerprint"), bits, k)))
      .withColumn("word", (col("pos") / 32).cast("int"))
      .withColumn("bit", (col("pos") % 32).cast("int"))
      .join(broadcast(filter), Seq("word"), "left")
      .withColumn("hit",
        expr("CASE WHEN bits IS NULL THEN 0 ELSE shiftright(bits, bit) & 1 END"))
      .groupBy(keep: _*)
      .agg(min(col("hit")).cast("int").as("bloom_hit"))
  }

  /** [[Dedup.incrementalExactDedup]] through the Bloom prefilter: same
    * result (novel delta docs, min-id survivor per fingerprint), but the
    * exact anti-join verifies ONLY Bloom-positive rows. `bloom_hit` is
    * kept in the output: a surviving row with `bloom_hit = 1` is a false
    * positive that paid the verify join — the filter's observable cost. */
  def incrementalExactDedup(existing: DataFrame, incoming: DataFrame,
      bits: Int = DefaultBits, k: Int = DefaultHashes): DataFrame = {
    val ex = existing.select(Text.fingerprint(col("text")).as("fingerprint")).distinct()
    val inc = incoming
      .withColumn("fingerprint", Text.fingerprint(col("text")))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"))
    val flagged = probe(inc, build(ex, bits, k), bits, k)
    val novel = flagged.filter(col("bloom_hit") === 0)
    val verified = flagged.filter(col("bloom_hit") === 1)
      .join(ex, Seq("fingerprint"), "left_anti")
    novel.unionByName(verified)
      .select(col("doc_id"), col("fingerprint"), col("bloom_hit"))
  }
}
