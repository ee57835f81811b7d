package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Rendezvous sharding: total-coverage census, determinism, and the
  * minimal-disruption invariant that justifies HRW over mod-N. */
class ShardingSpec extends SparkSpec {

  test("shardCensus covers every key once, shares sum to 1, assignment is layout-independent") {
    import spark.implicits._
    val keys = (1 to 2000).map(_.toLong).toDF("k")
    val census = Sharding.shardCensus(keys, col("k"), 8).collect()
    assert(census.map(_.getLong(1)).sum == 2000L)
    assert(census.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    assert(math.abs(census.map(_.getDouble(2)).sum - 1.0) < 1e-6)
    // balance: no shard should be pathologically loaded (md5 is uniform;
    // 2000 keys over 8 shards, expect 250 ± a generous band)
    assert(census.map(_.getLong(1)).max < 400, census.mkString(","))
    val reparted = Sharding.shardCensus(keys.repartition(7), col("k"), 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(reparted == census.map(r => r.getInt(0) -> r.getLong(1)).toMap)
  }

  test("reshardMoves: growing 8 -> 10 moves ~1/5 of keys, and every moved key lands on a NEW shard") {
    import spark.implicits._
    val keys = (1 to 2000).map(_.toLong).toDF("k")
    val moves = Sharding.reshardMoves(keys, col("k"), 8, 10).collect()
    val movedShare = moves.filter(_.getBoolean(1)).map(_.getDouble(3)).sum
    // expectation 0.2; 2000 draws keeps it well inside [0.1, 0.3]
    assert(movedShare > 0.1 && movedShare < 0.3, movedShare.toString)
    // the HRW invariant: the old argmax only loses to a NEW entrant, so
    // a moved key's new shard is 8 or 9 — never a reshuffle among 0..7
    val landed = keys
      .select(Sharding.assign(col("k"), 8).as("o"),
        Sharding.assign(col("k"), 10).as("n"))
      .filter(col("o") =!= col("n"))
      .select(col("n")).distinct().collect().map(_.getInt(0)).toSet
    assert(landed.subsetOf(Set(8, 9)), landed.toString)
  }

  test("shardManifest: layout-invariant digests; any row mutation/drop/dup flips its shard") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (i.toLong, s"payload-$i")).toDF("k", "p")
    def manifest(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long, Long)] =
      Sharding.shardManifest(df, col("k"), col("p"), 4).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val base = manifest(rows)
    assert(base.keySet == Set(0, 1, 2, 3))
    assert(base.values.map(_._1).sum == 200L)
    // repartitioned + reversed copy: identical manifest (order-free xor)
    assert(manifest(rows.orderBy(col("k").desc).repartition(7)) == base)
    // one mutated payload: that row's shard digest flips, counts intact
    val mutated = manifest(
      (1 to 200).map(i => (i.toLong, if (i == 17) "oops" else s"payload-$i"))
        .toDF("k", "p"))
    assert(mutated != base)
    assert(mutated.values.map(_._1).sum == 200L)
    // a DUPLICATED row: count catches it even though xor self-cancels
    // only on pairs of identical digests in the same shard
    val duped = manifest(rows.unionAll(rows.filter(col("k") === 17)))
    assert(duped.values.map(_._1).sum == 201L)
    // a dropped row flips its shard's triple
    val dropped = manifest(rows.filter(col("k") =!= 17))
    assert(dropped != base)
  }
}
