package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up test-data generator for scaling probes (SURVEY §6).
  *
  * Builds a k× copy of a driver-generated sf directory by unioning k
  * key-shifted shards, so queries can be timed at 10× the largest
  * driver-provided scale factor without touching the read-only
  * /root/testdata. The construction keeps the per-shard statistical
  * structure of the source while making shards DISJOINT, so total work
  * (rows, duplicate clusters, join fan-out) grows linearly in k — the
  * property a scaling exponent measurement needs. Concretely:
  *
  *  - all integer keys are shifted per shard by (max_key + 1) so joins
  *    stay consistent within a shard and never match across shards;
  *  - `documents.text` gets a shard tag token spliced in after every 4
  *    words (shard 0 is byte-identical to the source). This breaks ~3/4
  *    of word trigram shingles across shards (cross-shard Jaccard « any
  *    dedup threshold) while preserving token counts and stopword
  *    statistics to within the 20% dilution of the tag itself — so
  *    near-dup clusters stay shard-local (cluster count ×k, cluster SIZE
  *    constant) and quality gates keep passing on shifted shards;
  *  - `embeddings.embedding` gets a small shard- and dimension-dependent
  *    additive perturbation (±0.006·shard), keeping shifted vectors near
  *    (but not tied with) their originals so ANN top-k work scales in
  *    corpus size rather than collapsing into exact-duplicate ties;
  *  - dimension tables `nation`/`region` are passed through unchanged
  *    (dimensions don't grow with fact volume), as are timestamps and
  *    prices (the value distributions are what queries aggregate over).
  *
  * Usage: runMain graft.ScaleGen <srcDir> <dstDir> [factor=10]
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // oracle-parity reader configs live in Sessions.baseConfigs — one place
    val spark = graft.engine.Sessions.local(cpus.toInt)

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** Union of k shards of `df`, each produced by `shard(i)`. */
    def shards(df: DataFrame)(shard: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => shard(df, i)).reduce(_ unionByName _)

    /** Shift an integral key column by i·(max+1), preserving its type. */
    def keyShift(df: DataFrame, keyCols: Seq[String]): (DataFrame, Int) => DataFrame = {
      val offsets: Map[String, Long] = keyCols.map { c =>
        c -> (df.agg(max(col(c))).head.getAs[Number](0).longValue() + 1L)
      }.toMap
      (d, i) =>
        offsets.foldLeft(d) { case (acc, (c, off)) =>
          acc.withColumn(c, (col(c) + lit(i * off)).cast(acc.schema(c).dataType))
        }
    }

    def load(t: String): DataFrame = read(t)

    def write(t: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // ---- facts: shifted keys -------------------------------------------
    val lineitem = load("lineitem")
    write("lineitem", shards(lineitem)(keyShift(lineitem, Seq("l_orderkey", "l_partkey", "l_suppkey"))), 32)

    val orders = load("orders")
    write("orders", shards(orders)(keyShift(orders, Seq("o_orderkey", "o_custkey"))), 16)

    val customer = load("customer")
    write("customer", shards(customer)(keyShift(customer, Seq("c_custkey"))), 8)

    val part = load("part")
    write("part", shards(part)(keyShift(part, Seq("p_partkey"))), 8)

    val supplier = load("supplier")
    write("supplier", shards(supplier)(keyShift(supplier, Seq("s_suppkey"))), 4)

    val events = load("events")
    write("events", shards(events)(keyShift(events, Seq("event_id", "user_id"))), 16)

    // ---- documents: shifted ids + shard-tag text ------------------------
    val documents = load("documents")
    val docShift = keyShift(documents, Seq("doc_id"))
    write("documents", shards(documents) { (d, i) =>
      val shifted = docShift(d, i)
      if (i == 0) shifted
      else shifted.withColumn("text",
        // splice "shN" after every 4th word: kills most cross-shard
        // shingles, keeps per-shard token statistics
        regexp_replace(col("text"), "((?:\\S+\\s+){4})", s"$$1sh$i "))
    }, 16)

    // ---- embeddings: shifted ids + small shard perturbation -------------
    val embeddings = load("embeddings")
    val vecShift = keyShift(embeddings, Seq("vec_id"))
    write("embeddings", shards(embeddings) { (d, i) =>
      val shifted = vecShift(d, i)
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + lit(0.002f * i) * ((j + lit(i)) % 7 - 3).cast("float")).cast("float")))
    }, 8)

    // ---- dimensions: unchanged -----------------------------------------
    write("nation", load("nation"), 1)
    write("region", load("region"), 1)

    println(s"""{"scalegen":"done","src":"$src","dst":"$dst","factor":$k}""")
    spark.stop()
  }
}
