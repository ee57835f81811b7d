package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.lake.Tables

/** Approximate-nearest-neighbor search over the embedding column
  * (BASELINE.json north star).
  *
  * Three tiers, same interface (query set -> top-k neighbor relation):
  *  - brute force: exact, O(|Q| * N); right answer when |Q| is small and
  *    the corpus fits a broadcast-probe pattern (queries broadcast, corpus
  *    streamed — the 100 TB side is never shuffled).
  *  - IVF-style cell-restricted: probe only the query's nearest coarse
  *    cells — the equi-join on cell turns the cross product into a
  *    partitioned hash join. This is the scale path.
  *  - LSH (random hyperplane, multi-table multi-probe): sign-bit bucket
  *    join; hyperplanes are derived deterministically from md5 so plans
  *    are reproducible.
  */
/** IVF-style coarse quantizer: a deterministic sampled codebook (every
  * `CodebookStep`-th vector — random-sample codebooks are a standard IVF
  * initialization; Lloyd iterations would refine, not change the shape)
  * with cell assignment as a broadcast-codebook projection.
  *
  * The codebook is aggregated into ONE array-of-structs row and attached to
  * the corpus with a broadcast join — the centroid values live in the
  * broadcast payload at RUNTIME, never in the plan. That keeps the plan
  * (expression tree, codegen, task binaries) O(1) in the codebook size C,
  * so C can grow toward the ~√N cells a real IVF deployment uses; the
  * earlier driver-`collect()` + `typedlit` formulation grew the plan
  * linearly with C and capped out around C ≈ 100. Assignment is still one
  * argmax over C cosines per row with NO shuffle of the corpus (the build
  * side is a single row). Affinities are rounded to 4 decimals with
  * centroid-id tie-break so the argmax is reproducible in the SQL oracle.
  */
object Quantize {

  /** Sampling stride for the deterministic codebook. C = N/step: small
    * enough to broadcast, large enough (hundreds at the verify SF) to prove
    * the plan does not grow with it. */
  val CodebookStep = 2

  /** Ceiling on codebook size: C = min(N/step, MaxCells) so the broadcast
    * payload and the O(C·d) per-row assignment stay bounded as the corpus
    * grows (a real deployment re-tunes step toward √N; the cap is the
    * guardrail). Inert at the test SFs (N/step < 4096). */
  val MaxCells = 4096

  def codebook(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % CodebookStep === 0
        && col("vec_id") < CodebookStep.toLong * MaxCells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))

  /** The whole codebook as ONE row holding a `cents` struct of three flat
    * arrays — ids (sorted), the row-major concatenation of the centroid
    * embeddings, and their precomputed norms — the broadcast build side in
    * the exact shape [[graft.expressions.TopCells]] consumes (primitive
    * arrays, no per-centroid structs to unwrap per row). */
  def codebookRow(emb: DataFrame): DataFrame = codebookRowOf(codebook(emb))

  /** [[codebookRow]] over an explicit (c_id, c_emb) centroid relation. */
  def codebookRowOf(cent: DataFrame): DataFrame =
    cent
      .select(struct(
        col("c_id"),
        col("c_emb").cast("array<double>").as("c_emb"),
        Vectors.norm(col("c_emb")).as("c_nrm")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("cs"))
      .select(struct(
        transform(col("cs"), c => c.getField("c_id")).as("ids"),
        flatten(transform(col("cs"), c => c.getField("c_emb"))).as("flat"),
        transform(col("cs"), c => c.getField("c_nrm")).as("nrms")).as("cents"))

  /** Attach the broadcast single-row codebook to every row of `df` as a
    * `cents` column. A 1-row build side makes the BroadcastNestedLoopJoin
    * a free map-side attach: the probe side streams, nothing shuffles. */
  def withCodebook(df: DataFrame, emb: DataFrame): DataFrame =
    df.crossJoin(broadcast(codebookRow(emb)))

  /** [[withCodebook]] over an explicit (c_id, c_emb) centroid relation —
    * how a REFINED codebook (or any externally-trained one) is attached. */
  def withCodebookOf(df: DataFrame, cent: DataFrame): DataFrame =
    df.crossJoin(broadcast(codebookRowOf(cent)))

  /** `iterations` distributed Lloyd updates over the sampled codebook:
    * assign every vector to its nearest centroid, recompute each cell's
    * elementwise mean, repeat. Each iteration is the q_codebook_refine
    * shape (argmax materialized once at the cell exchange — see that
    * entry's comment on the load-bearing repartition) plus one array
    * re-assembly agg; the centroid relation is `localCheckpoint`ed per
    * iteration (same discipline as the CC label loop) so plans stay O(1)
    * in the iteration count and the broadcast payload never re-derives
    * upstream. Cells that attract no vectors drop out (standard Lloyd);
    * ids stay the sampled seed ids for reproducibility. */
  def refineCodebook(emb: DataFrame, iterations: Int): DataFrame = {
    var cent = codebook(emb)
      .select(col("c_id"), col("c_emb").cast("array<double>").as("c_emb"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      cent = emb.crossJoin(broadcast(codebookRowOf(cent)))
        .select(cellExpr(col("embedding"), col("cents")).as("cell"),
          col("embedding").cast("array<double>").as("embedding"))
        .repartition(col("cell"))
        .select(col("cell"), posexplode(col("embedding")))
        .toDF("cell", "dim", "x")
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell").as("c_id"),
          transform(col("dm"), s => s.getField("m")).as("c_emb"))
        .localCheckpoint()
    }
    cent
  }

  /** [[refineCodebook]] iterated to a CERTIFIED Lloyd fixpoint: run
    * assign → recenter until a full pass reassigns ZERO vectors (the
    * classical k-means termination, guaranteed in finitely many steps
    * since Lloyd monotonically decreases the finite-valued objective),
    * fail LOUDLY at `maxIterations` rather than ship a half-converged
    * codebook — the kCoreCertified / fixpoint-CC discipline. Each pass
    * is the q_codebook_refine exchange plus one vec-keyed join to count
    * reassignments; everything localCheckpoints so plan size is O(1) in
    * passes. The oracled fixed-iteration form stays the engine-exact
    * replay; this is the production training path. */
  def refineCodebookCertified(emb: DataFrame,
      maxIterations: Int = 25): DataFrame = {
    def assignOf(cent: DataFrame): DataFrame =
      emb.crossJoin(broadcast(codebookRowOf(cent)))
        .select(col("vec_id"),
          cellExpr(col("embedding"), col("cents")).as("cell"))
    def centroidsOf(assign: DataFrame): DataFrame =
      emb.join(assign, "vec_id")
        .repartition(col("cell"))
        .select(col("cell"), posexplode(col("embedding").cast("array<double>")))
        .toDF("cell", "dim", "x")
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell").as("c_id"),
          transform(col("dm"), s => s.getField("m")).as("c_emb"))
    var cent = codebook(emb)
      .select(col("c_id"), col("c_emb").cast("array<double>").as("c_emb"))
      .localCheckpoint()
    var assign = assignOf(cent).localCheckpoint()
    var it = 0
    while (it < maxIterations) {
      cent = centroidsOf(assign).localCheckpoint()
      val next = assignOf(cent).localCheckpoint()
      val changed = next
        .join(assign.withColumnRenamed("cell", "old"), "vec_id")
        .filter(col("cell") =!= col("old")).count()
      assign = next
      if (changed == 0) return cent
      it += 1
    }
    throw new IllegalStateException(
      s"k-means failed to stabilize in $maxIterations Lloyd passes — " +
        "raise maxIterations; do NOT ship a half-converged codebook")
  }

  /** Nearest-centroid cell id — one native-expression projection over the
    * broadcast codebook column, evaluates in-stage. */
  def cellExpr(emb: Column, cents: Column): Column =
    element_at(probeCellsExpr(emb, cents, 1), 1)

  /** The `nprobe` nearest cells (rounded-affinity desc, id-asc ties) as an
    * array — the query-side multi-probe, and (exploded) the multi-cell
    * assignment the embedding near-dup join uses. One O(C·d) primitive
    * loop per row ([[graft.expressions.TopCells]]). */
  def probeCellsExpr(emb: Column, cents: Column, nprobe: Int): Column =
    call_function("graft_top_cells", emb.cast("array<double>"),
      cents.getField("flat"), cents.getField("nrms"), cents.getField("ids"),
      lit(nprobe))
}

object Similarity {

  /** Corpus with its norm materialized once per vector — every tier pays
    * one norm per VECTOR instead of one per scored pair. */
  private def corpusWithNorm(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"),
      Vectors.norm(col("embedding")).as("nrm"))

  private def queriesSet(spark: SparkSession, dir: String, nQueries: Int): DataFrame =
    corpusWithNorm(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))

  private def pairCosine: Column =
    round(Vectors.dot(col("q_emb"), col("embedding"))
      / (col("q_nrm") * col("nrm")), 4)

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors for each of the first `nQueries` vectors.
    * The query side is broadcast; the corpus side streams through a single
    * stage (scan -> cosine -> per-query top-k). Ranking uses row_number
    * with vec_id tie-break for determinism. */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val corpus = corpusWithNorm(spark, dir)
    val q      = queriesSet(spark, dir, nQueries)
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
    topK(scored, k)
  }

  /** SEMANTIC decontamination — the embedding-space complement of
    * [[Decontaminate]]'s n-gram overlap: a training vector is contaminated
    * when its max cosine against ANY benchmark vector clears `threshold`
    * (paraphrased eval questions share no n-grams but sit close in
    * embedding space). The benchmark set is small by construction, so it
    * folds into a SINGLE broadcast row of (vector, norm) structs and the
    * per-train max is an `array_max(transform(...))` over that payload —
    * entirely map-side: the corpus is never shuffled, never joined row-to-
    * row, and the plan is O(1) in benchmark size (values live in the
    * broadcast, not the plan — the [[Quantize]] codebook discipline). */
  def embedDecontamination(spark: SparkSession, dir: String, nBench: Int,
      threshold: Double): DataFrame =
    embedDecontaminationOf(Tables(spark, dir, "embeddings"), nBench, threshold)

  def embedDecontaminationOf(emb: DataFrame, nBench: Int,
      threshold: Double): DataFrame = {
    val bench = emb.filter(col("vec_id") < nBench)
      .agg(collect_list(struct(
        col("embedding").cast("array<double>").as("b_emb"),
        Vectors.norm(col("embedding")).as("b_nrm"))).as("bench"))
    emb.filter(col("vec_id") >= nBench)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        Vectors.norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(bench))
      .select(col("vec_id"),
        round(array_max(transform(col("bench"), b =>
          Vectors.dot(col("e"), b("b_emb")) / (col("nrm") * b("b_nrm")))), 4)
          .as("max_bench_cos"))
      .withColumn("contaminated", col("max_bench_cos") >= threshold)
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most-similar corpus vectors with a DIFFERENT label —
    * the negatives nearest the decision boundary. Same broadcast shape as
    * [[bruteForceTopK]] with the label-mismatch predicate fused into the
    * join condition (rows drop BEFORE the cosine is computed); the
    * IVF/LSH-bucketed swap applies unchanged when the corpus is 100 TB. */
  def hardNegativesTopK(spark: SparkSession, dir: String, nQueries: Int,
      k: Int): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding"), col("label"),
      Vectors.norm(col("embedding")).as("nrm"))
    val q = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_label"))
    val scored = corpus
      .join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        pairCosine.as("cosine"))
    topK(scored, k)
  }

  /** Default number of cells each IVF query probes. With a ~√N codebook
    * the cells are small; probing several keeps recall useful while the
    * scanned fraction stays ~nprobe/C. */
  val IvfNprobe = 8

  /** IVF ANN with the broadcast sampled-codebook quantizer: the corpus is
    * assigned one cell each (map-only projection over the broadcast
    * codebook, [[Quantize.cellExpr]]); each query probes its `nprobe`
    * nearest cells. The equi-join on cell turns the cross product into a
    * partitioned hash join over ~nprobe/C of the corpus — the scale path;
    * recall trades against nprobe. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      nprobe: Int = IvfNprobe): DataFrame =
    ivfTopKWith(spark, dir, nQueries, k,
      Quantize.codebook(Tables(spark, dir, "embeddings")), nprobe)

  /** [[ivfTopK]] with an explicit (c_id, c_emb) centroid relation — the
    * entry point for a [[Quantize.refineCodebook]]-trained codebook; the
    * plan is identical (broadcast 1-row codebook on both sides). */
  def ivfTopKWith(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      cent: DataFrame, nprobe: Int = IvfNprobe): DataFrame =
    ivfTopKFromAssignments(
      cellAssignmentsOf(Tables(spark, dir, "embeddings"), cent),
      corpusWithNorm(spark, dir).filter(col("vec_id") < nQueries), k, cent, nprobe)

  /** Cell assignment of a vector batch against a FIXED codebook — the
    * unit of incremental IVF ingest: a daily embedding drop is assigned
    * with the same persisted codebook and APPENDED to the assignment
    * artifact, so the existing corpus is never re-quantized (full
    * re-assignment happens only when the codebook itself is retrained).
    * Map-side projection over the broadcast codebook; no shuffle. */
  def cellAssignmentsOf(emb: DataFrame, cent: DataFrame): DataFrame =
    Quantize.withCodebookOf(
        emb.select(col("vec_id"), col("embedding"),
          Vectors.norm(col("embedding")).as("nrm")), cent)
      .withColumn("cell", Quantize.cellExpr(col("embedding"), col("cents")))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))

  /** IVF top-k served from a prebuilt (vec_id, embedding, nrm, cell)
    * assignment relation — at scale a persisted, partitioned-by-cell
    * table that incremental batches append to. `queries` carries
    * (vec_id, embedding, nrm). */
  def ivfTopKFromAssignments(assignments: DataFrame, queries: DataFrame,
      k: Int, cent: DataFrame, nprobe: Int = IvfNprobe): DataFrame = {
    val q = Quantize.withCodebookOf(queries, cent)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(Quantize.probeCellsExpr(col("embedding"), col("cents"), nprobe)).as("q_cell"))
    val scored = assignments.join(broadcast(q),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
    topK(scored, k)
  }

  /** Number of LSH hyperplanes per table (bucket bits). */
  val LshPlanes = 8

  /** Number of independent LSH tables (each with its own plane set). */
  val LshTables = 8

  /** Query-side multi-probe radius: all buckets within this Hamming
    * distance of the query's bucket are probed, per table. */
  val LshProbeRadius = 2

  /** Max embedding dimensionality the precomputed plane matrix covers. */
  val LshMaxDims = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * first 4 hex chars of md5("plane{p}|{d}") as a 16-bit value, scaled to
    * [-0.5, 0.5). Table t owns plane ids t*LshPlanes .. t*LshPlanes+7.
    * Evaluated ONCE driver-side (the matrix is a plan literal), not per
    * row: at 100 TB, per-row md5 plane derivation would dominate the scan.
    * Every value is k/65536 - 0.5 (k a 16-bit int) — exactly representable
    * as a double, so the literal round-trips bit-identically through the
    * SQL oracle's decimal literals. */
  def planeCoefs(plane: Int): Seq[Double] =
    (0 until LshMaxDims).map { d =>
      Integer.parseInt(md5hex(s"plane$plane|$d").substring(0, 4), 16) / 65536.0 - 0.5
    }

  /** All [[LshTables]] sign-bit bucket ids of an embedding as ONE array
    * column: bit p of table t = [dot(v, plane_{t·8+p}) > 0]. The full
    * plane matrix is a SINGLE flat literal consumed by the native
    * [[graft.expressions.LshBuckets]] loop — the per-plane Column
    * formulation (64 dot expressions × 64-element literal arrays) blew the
    * plan up to thousands of nodes and fell out of codegen. */
  def lshBucketsExpr(emb: Column): Column =
    call_function("graft_lsh_buckets", emb.cast("array<double>"),
      typedlit[Seq[Double]]((0 until LshTables * LshPlanes).flatMap(planeCoefs).toList),
      lit(LshPlanes), lit(LshMaxDims))

  /** Single-table bucket id (table 0 by default) — the planted-collision
    * property tests use this directly. */
  def lshBucket(emb: Column, table: Int = 0): Column =
    element_at(lshBucketsExpr(emb), table + 1)

  /** XOR masks for the Hamming ball of radius [[LshProbeRadius]] around a
    * bucket: identity + all 1-bit and 2-bit flips (1 + 8 + 28 = 37 probes
    * per table at the defaults). */
  def probeMasks: Seq[Long] =
    0L +: (1 to LshProbeRadius).flatMap(r =>
      (0 until LshPlanes).combinations(r).map(_.map(1L << _).sum).toSeq)

  /** LSH-bucketed ANN, multi-table + multi-probe: the corpus is indexed in
    * [[LshTables]] independent sign-bit tables (one (table, bucket) row per
    * vector per table — the standard L-table LSH layout; at 100 TB these
    * are precomputed bucket indexes); each query probes the full
    * Hamming-<=[[LshProbeRadius]] ball around its bucket in every table.
    * Candidates found by several tables/probes are deduplicated BEFORE
    * ranking (distinct on the scored row) so row_number never double-counts
    * a neighbor. The corpus side never shuffles — the probe set is
    * broadcast; only the candidate rows (3 narrow columns) shuffle for the
    * distinct + per-query ranking.
    *
    * Recall is governed by (tables, radius): a single 8-plane table probed
    * exactly finds bucket-mates only (measured recall ~0 vs brute force on
    * the near-orthogonal test vectors); 8 tables probed to radius 2 reach
    * recall 1.0 on sf0.01 (SimilaritySpec asserts >= 0.9). The probe count
    * is L * 37 tiny broadcast rows per query — independent of N. */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    def withBuckets(df: DataFrame, emb: Column, out: Seq[String]): DataFrame =
      df.select(df.columns.map(col) :+ posexplode(lshBucketsExpr(emb)): _*)
        .toDF(df.columns ++ out: _*)
    val corpus = withBuckets(corpusWithNorm(spark, dir), col("embedding"),
      Seq("tbl", "bucket"))
    val q = withBuckets(queriesSet(spark, dir, nQueries), col("q_emb"),
      Seq("q_tbl", "q_bucket"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("q_tbl"),
        explode(array(probeMasks.map(m =>
          col("q_bucket").bitwiseXOR(lit(m))): _*)).as("probe"))
    val scored = corpus.join(broadcast(q),
        col("tbl") === col("q_tbl") && col("bucket") === col("probe")
          && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
      .distinct()
    topK(scored, k)
  }

  /** Brute-force top-k over the int8-QUANTIZED corpus (asymmetric
    * distance: original query vectors score against dequantized corpus
    * codes — the ADC setup of product-quantization search). The plan is
    * [[bruteForceTopK]] with one extra map-side transform: the per-dim
    * range row broadcasts, each corpus vector dequantizes in-stage, and
    * the corpus still streams through a single unshuffled stage. At 8
    * bits/dim the ranking is near-lossless (recall spec-asserted); the
    * point at 100 TB is the index READS 4× less. */
  def quantizedTopK(spark: SparkSession, dir: String, nQueries: Int,
      k: Int): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val stats = Tables(spark, dir, "embeddings")
      .select(posexplode(v).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(array_sort(collect_list(struct(col("dim"), col("lo")))).as("l"),
        array_sort(collect_list(struct(col("dim"), col("hi")))).as("h"))
      .select(transform(col("l"), s => s.getField("lo")).as("los"),
        transform(col("h"), s => s.getField("hi")).as("his"))
    val deq = Tables(spark, dir, "embeddings")
      .crossJoin(broadcast(stats))
      .select(col("vec_id"), transform(v, (x, i) => {
        val lo = element_at(col("los"), i + 1)
        val hi = element_at(col("his"), i + 1)
        when(hi === lo, lo).otherwise(
          lo + floor((x - lo) / (hi - lo) * 255 + 0.5) * (hi - lo) / 255)
      }).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("nrm"))
    val q = queriesSet(spark, dir, nQueries)
    val scored = deq.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
    topK(scored, k)
  }

  /** Scalar (per-dimension) int8 quantization of the embedding column —
    * the 4× storage compression step before an ANN index is built: code =
    * ⌊(x − lo_d)/(hi_d − lo_d)·255 + 0.5⌋ against per-dimension corpus
    * [lo, hi] ranges. Constant dimensions (hi = lo) code to 0.
    *
    * Scale shape: the range pass is one posexplode + a DIMS-bounded
    * aggregate folded into a single broadcast row of two arrays (the
    * codebook-attach pattern); coding is then a map-side indexed
    * `transform` — the corpus is read twice and never shuffled.
    * Determinism: widening float→double is exact, the code arithmetic is
    * written with one fixed parenthesization, and `floor(… + 0.5)` ties
    * identically on both engines (unlike HALF_EVEN-vs-away `round`). */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val stats = emb.select(posexplode(v).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(array_sort(collect_list(struct(col("dim"), col("lo")))).as("l"),
        array_sort(collect_list(struct(col("dim"), col("hi")))).as("h"))
      .select(transform(col("l"), s => s.getField("lo")).as("los"),
        transform(col("h"), s => s.getField("hi")).as("his"))
    emb.crossJoin(broadcast(stats))
      .select(col("vec_id"), posexplode(transform(v, (x, i) => {
        val lo = element_at(col("los"), i + 1)
        val hi = element_at(col("his"), i + 1)
        when(hi === lo, lit(0))
          .otherwise(floor((x - lo) / (hi - lo) * 255 + 0.5).cast("int"))
      })).as(Seq("dim", "code")))
  }

  /** Per-label MEDOID: the corpus vector closest (by cosine) to its
    * label's centroid — the exemplar a cluster-pruning or labeling pass
    * keeps per group. The centroid relation is labels×dims (tiny,
    * equi-joined back on label after a broadcast-sized reshape); each
    * vector computes ONE dot/norm pair map-side and a per-label min
    * window picks the winner on (rounded distance, vec_id) — fully
    * deterministic, corpus shuffled once on label. */
  def labelMedoids(emb: DataFrame): DataFrame = {
    val x = emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding").cast("array<double>")))
      .toDF("vec_id", "label", "dim", "x")
    val cent = x.groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x")), 4).as("m"))
    val scored = x.join(cent, Seq("label", "dim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("x") * col("m")).as("dot"),
        sqrt(sum(col("x") * col("x"))).as("nx"),
        sqrt(sum(col("m") * col("m"))).as("nm"))
      .select(col("vec_id"), col("label"),
        round(col("dot") / (col("nx") * col("nm")), 6).as("cos_to_centroid"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_to_centroid").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("label"), col("vec_id"), col("cos_to_centroid"))
  }

  /** Pairwise cosine similarity between per-label embedding CENTROIDS —
    * "which sources/classes sit close in embedding space", the label-level
    * read on the corpus geometry (cluster drift, near-duplicate sources).
    * The 100 TB side folds in the first map-side-combinable centroid
    * aggregation; everything after runs on the labels×dims relation.
    * Centroids round to 4 (the q_embed_centroids artifact), and `+ 0`
    * normalizes any −0.0 cosine so both engines hash identically. */
  def centroidSimilarity(emb: DataFrame): DataFrame = {
    val cent = emb
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .toDF("label", "dim", "x")
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x")), 4).as("m"))
    val norms = cent.groupBy(col("label"))
      .agg(sqrt(sum(col("m") * col("m"))).as("nrm"))
    cent.as("a")
      .join(cent.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.m") * col("b.m")).as("dot"))
      .join(norms.select(col("label").as("label_a"), col("nrm").as("na")),
        "label_a")
      .join(norms.select(col("label").as("label_b"), col("nrm").as("nb")),
        "label_b")
      .select(col("label_a"), col("label_b"),
        (round(col("dot") / (col("na") * col("nb")), 6) + lit(0.0))
          .as("cosine"))
  }

  /** Simplified (centroid) silhouette per label (Hruschka et al.'s
    * medoid-free variant of Rousseeuw 1987): for each vector,
    * a = distance to its OWN label centroid, b = distance to the nearest
    * OTHER centroid, s = (b−a)/max(a,b) ∈ [−1,1]; the per-label mean is
    * the cluster-quality read (≈1 compact & separated, ≈0 overlapping,
    * <0 likely mislabeled) — the evaluation complement to
    * [[labelMedoids]]/[[centroidSimilarity]], at O(n·L) instead of the
    * true silhouette's O(n²) pairwise matrix.
    *
    * Scale shape: centroids fold map-side to the labels×dims relation
    * (rounded to 4 — the centroid-artifact convention) and BROADCAST
    * back; each vector scores all L centroids in one fanout join + one
    * (vec, label) aggregate — the corpus is never self-joined. Distances
    * round to 4 BEFORE the min/argmax so cross-engine ulp drift cannot
    * flip the nearest-other choice; a degenerate vector sitting exactly
    * on both centroids (max(a,b) = 0) scores 0, not NaN. */
  def silhouetteByLabel(emb: DataFrame): DataFrame = {
    val x = emb.select(col("vec_id"), col("label").as("own"),
      posexplode(col("embedding").cast("array<double>")))
      .toDF("vec_id", "own", "dim", "x")
    val cent = x.groupBy(col("own").as("clabel"), col("dim"))
      .agg(round(avg(col("x")), 4).as("m"))
    val d = x.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("own"), col("clabel"))
      .agg(round(sqrt(sum((col("x") - col("m")) * (col("x") - col("m")))), 4)
        .as("dist"))
    val ab = d.groupBy(col("vec_id"), col("own"))
      .agg(max(when(col("clabel") === col("own"), col("dist"))).as("a"),
        min(when(col("clabel") =!= col("own"), col("dist"))).as("b"))
    ab.select(col("vec_id"), col("own"),
        when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise(round((col("b") - col("a")) /
            greatest(col("a"), col("b")), 4)).as("s"))
      .groupBy(col("own").as("label"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("s")), 4).as("silhouette"))
  }

  /** Sign random projection (Achlioptas 2003's database-friendly
    * Johnson–Lindenstrauss transform): y_j = Σ_i s(j,i)·x_i / √p with
    * s ∈ {−1,+1} — the cheap dimensionality-reduction stage before
    * ANN/clustering when d is large (pairwise distances and cosines are
    * preserved within the JL bound; no training, unlike
    * [[Quantize.refineCodebook]]'s codebook, and no per-dim ranges,
    * unlike [[quantizeInt8]]).
    *
    * Determinism and scale shape: the signs derive from md5("rp:j:i")
    * parity — no RNG, identical in SQL — and the p×d sign matrix is
    * folded into ONE broadcast row built from a `range` relation, so the
    * plan is O(1) in p·d and the corpus pass is entirely map-side
    * (nothing shuffles, nothing collects). Components accumulate in
    * exact INTEGER MICRO units (the DSIR ledger discipline:
    * round(x·10⁶) longs sum exactly in any order, so the result is
    * independent of summation order in BOTH engines) and divide by 10⁶√p
    * only at the output — unrounded, because identical longs over an
    * identical constant are already bit-identical IEEE. */
  def randomProjection(emb: DataFrame, outDims: Int,
      inDims: Int = 64): DataFrame = {
    require(outDims >= 1, s"outDims must be >= 1, got $outDims")
    val spark = emb.sparkSession
    val sgns = spark.range(outDims.toLong * inDims)
      .select(struct(col("id"),
        (lit(1L) - lit(2L) * (call_function("graft_md5_prefix",
          concat(lit("rp:"), (col("id") / inDims).cast("long"), lit(":"),
            col("id") % inDims), lit(1)) % 2)).as("s")).as("r"))
      .agg(array_sort(collect_list(col("r"))).as("rs"))
      .select(transform(col("rs"), r => r.getField("s")).as("sgns"))
    val scale = 1e6 * math.sqrt(outDims.toDouble)
    emb
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1e6, 0).cast("long")).as("xm"))
      .crossJoin(broadcast(sgns))
      // NO rounding: the micro sum is an exact long in both engines and
      // long / constant is bit-identical IEEE — a round() here would
      // reintroduce engine drift on representational .5 ties (Spark
      // rounds the double's DECIMAL string, DuckDB its binary value)
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(outDims - 1)), j =>
          aggregate(sequence(lit(0), lit(inDims - 1)), lit(0L),
            (acc, i) => acc +
              element_at(col("sgns"), (j * inDims + i + 1).cast("int")) *
              element_at(col("xm"), (i + 1).cast("int")))
            .cast("double") / lit(scale))))
      .toDF("vec_id", "dim", "y")
  }
}
