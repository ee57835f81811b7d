package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance self-join (record linkage / fuzzy key dedup): all pairs
  * of values whose Levenshtein distance is in [1, k], WITHOUT the O(n²)
  * cross join — the segment-pigeonhole scheme of the PassJoin family
  * (Li, Deng, Feng; VLDB 2011-12 line of work).
  *
  * Pigeonhole: split the SHORTER string of a pair into k+1 contiguous
  * segments. ≤ k edits cannot touch all k+1 of them, so at least one
  * segment survives VERBATIM in the longer string, displaced by at most
  * k positions. Candidates therefore come from an equi-join: every value
  * INDEXES its k+1 segments; every value PROBES with the substrings that
  * could equal segment i of a partner of length l ∈ [len−k, len] at
  * displacement δ ∈ [−k, k] — (k+1)²·(2k+1) probe rows per value, a
  * CONSTANT. The join key (segment_idx, partner_len, text) carries the
  * length filter for free.
  *
  * Scale shape: the search runs over DISTINCT values (the first map-side
  * aggregate — fuzzy joins on key-ish columns collapse massively), probe
  * generation is pure per-row array arithmetic deduplicated BEFORE the
  * explode, candidates equi-join and dedup by pair, and only candidate
  * pairs pay a `levenshtein` verify. Nothing is quadratic except inside
  * a single join bucket — and buckets are capped: an index segment shared
  * by more than `maxBucket` values is dropped (window census, the
  * SimHash-tier pattern). The cap is the knob for adversarial data
  * (values sharing a long constant prefix, e.g. 'Customer#0…', drive
  * their prefix buckets toward all-pairs); a capped bucket loses a pair
  * only if EVERY surviving segment of its shorter side is also capped.
  */
object FuzzyJoin {

  /** Index-bucket census cap (values per (segment_idx, len, text) key). */
  val MaxSegBucket = 256

  /** Even-partition segment [start, start+len) of a length-`l` string,
    * 0-based segment `i` of `k`+1: the first (k+1−l%(k+1)) segments get
    * ⌊l/(k+1)⌋ chars, the rest one more. Pure closed-form arithmetic. */
  private def segStart(l: Column, i: Int, k: Int): Column = {
    val parts = k + 1
    val base = floor(l / parts).cast("int")
    val nShort = (lit(parts) - l % parts).cast("int")
    when(lit(i) < nShort, base * i).otherwise(base * i + (lit(i) - nShort))
  }

  private def segLen(l: Column, i: Int, k: Int): Column = {
    val parts = k + 1
    val base = floor(l / parts).cast("int")
    val nShort = (lit(parts) - l % parts).cast("int")
    when(lit(i) < nShort, base).otherwise(base + 1)
  }

  /** All (value_a, value_b, dist) with value_a < value_b and
    * 1 ≤ levenshtein ≤ k over the DISTINCT values of `strCol` (identical
    * values are the exact-dedup tier's job). */
  def editDistancePairs(df: DataFrame, strCol: String, k: Int,
      maxBucket: Int = MaxSegBucket): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
    val l = length(col("s"))

    // index: the k+1 segments of s, as the shorter-or-equal side
    val segs = (0 to k).map { i =>
      struct(lit(i).as("i"), l.as("pl"),
        col("s").substr(segStart(l, i, k) + 1, segLen(l, i, k)).as("t"))
    }
    val census = Window.partitionBy(col("i"), col("pl"), col("t"))
    val index = vals
      .select(col("s").as("s_short"), explode(array(segs: _*)).as("g"))
      .select(col("s_short"), col("g.i"), col("g.pl"), col("g.t"))
      .withColumn("cnt", count(lit(1)).over(census))
      .filter(col("cnt") <= maxBucket)
      .drop("cnt")

    // probe: substrings that could be segment i of a partner of length
    // pl ∈ [len−k, len] displaced by δ ∈ [−k, k] — built per row, deduped
    // map-side (array_distinct) BEFORE the explode
    val combos = for {
      i <- 0 to k
      dl <- 0 to k
      d <- -k to k
    } yield {
      val pl = l - dl
      val st = segStart(pl, i, k) + d
      val le = segLen(pl, i, k)
      when(pl >= lit(0) && st >= 0 && st + le <= l,
        struct(lit(i).as("i"), pl.as("pl"),
          col("s").substr(st + 1, le).as("t")))
    }
    val probes = vals
      .select(col("s").as("s_long"),
        explode(array_distinct(filter(array(combos: _*), _.isNotNull))).as("g"))
      .select(col("s_long"), col("g.i"), col("g.pl"), col("g.t"))

    probes.join(index, Seq("i", "pl", "t"))
      .filter(col("s_short") =!= col("s_long"))
      .select(least(col("s_short"), col("s_long")).as("value_a"),
        greatest(col("s_short"), col("s_long")).as("value_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("value_a"), col("value_b")))
      .filter(col("dist") <= k)
  }

  /** Edit-distance-1 self-join via FastSS DELETION NEIGHBORHOODS (Bocek,
    * Hunt & Stiller, ETH TIK report 2007): every value indexes itself
    * plus its |s| single-character deletions; two values are within one
    * edit iff they share a variant (substitution at i → both delete i;
    * indel → the shorter string IS a deletion variant of the longer).
    * Lossless for k = 1 by the FastSS theorem.
    *
    * Why this exists next to [[editDistancePairs]]: PassJoin's segment
    * buckets blow past any cap on ID-LIKE keys — every 'Customer#0…'
    * shares the same first-half segment, so the cap drops the one
    * segment that could match and silently loses every suffix-edit pair.
    * Deletion variants are nearly full-length, so a bucket holds only
    * values genuinely within one edit of each other (plus hash-free
    * structure like '#1490'..'#1499' — ~alphabet-sized), and the census
    * cap is a safety net for degenerate inputs (single-repeated-char
    * strings), not a load-bearing prune. Cost: |s|+1 variant rows per
    * DISTINCT value — linear, shuffled on the variant key. */
  def deletionNeighborhoodPairs(df: DataFrame, strCol: String,
      maxBucket: Int = MaxSegBucket): DataFrame = {
    val vals = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
    val l = length(col("s"))
    val dels = transform(sequence(lit(1), l), i =>
      concat(col("s").substr(lit(1), i - 1), col("s").substr(i + 1, l - i)))
    val variants = vals
      .select(col("s"), explode(array_distinct(
        concat(array(col("s")), dels))).as("v"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("v"))))
      .filter(col("cnt") <= maxBucket)
      .drop("cnt")
    variants.as("a").join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.s") < col("b.s"))
      .select(col("a.s").as("value_a"), col("b.s").as("value_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("value_a"), col("value_b")))
      .filter(col("dist") <= 1)
  }

  /** EXACT set-similarity self-join — ALL pairs with Jaccard ≥ `threshold`
    * over distinct 3-gram shingle sets — via PREFIX FILTERING (the
    * AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08).
    * The lossless complement of the MinHash-LSH dedup tier: LSH trades
    * recall for speed; this tier guarantees completeness and still never
    * forms the O(n²) cross join.
    *
    * Prefix filter (lossless): order every set by ascending global
    * document frequency (ties by shingle) and keep each set's first
    * |x| − ⌈t·|x|⌉ + 1 shingles. If J(x,y) ≥ t then |x∩y| ≥ t·|x∪y| ≥
    * t·|x|; were NO shared shingle inside x's prefix, all shared shingles
    * would fit in the remaining ⌈t·|x|⌉ − 1 < t·|x| tail slots —
    * contradiction. Symmetrically for y, so the globally-smallest shared
    * shingle lies in BOTH prefixes and the prefix equi-join emits every
    * qualifying pair.
    *
    * Positional filter (PPJoin, lossless — the round-9 addition): the
    * globally-SMALLEST shared shingle s* of a qualifying pair lies in
    * both prefixes (were it outside x's prefix, every shared shingle
    * would be — prefix elements are the set's smallest — and the prefix
    * principle above already forbids that). Every other shared shingle
    * is > s* in the global (df, shingle) order, so it sits AFTER s* in
    * both sets' orders: overlap ≤ 1 + min(|x|−pos_x(s*), |y|−pos_y(s*)).
    * J ≥ t needs overlap ≥ ⌈t/(1+t)·(|x|+|y|)⌉; candidates whose bound
    * falls short are pruned BEFORE the verify join. Measured at the 10×
    * scale probe: 32.8M raw candidates → the filter removes the
    * cross-shard near-threshold mass that made the raw prefix join grow
    * quadratically (each shard copy shares a handful of surviving rare
    * shingles with every correlated copy — enough to collide in a
    * bucket, never enough to pass the bound). Round-10 tightening: the
    * PPJoin+ LENGTH filter (min(|x|,|y|) ≥ t·max(|x|,|y|)) and the
    * positional bound itself ride the candidate JOIN condition row-wise —
    * the bound at the first common shingle is the loosest of a pair's
    * rows, so row-wise pruning drops exactly the pairs the grouped filter
    * would and the near-threshold mass dies before the group-by exchange.
    *
    * Scale shape: the candidate join keys on PREFIX shingles only, and
    * prefixes hold each set's RAREST shingles by construction, so join
    * buckets concentrate at df ≈ 1 — the frequency ordering is itself the
    * skew defence. The per-pair s* is an argmin GROUP-BY
    * over the bucket join (same shuffle volume the old pair-distinct
    * paid), only bound-surviving candidates pay the exact
    * `array_intersect` verify, joined against the ONCE-materialized set
    * relation. The per-doc prefix rank is a window over doc_id — each
    * document's own shingles, never a corpus-wide sort.
    *
    * SATURATION GUARD (the exactness tax, enforced): an EXACT join
    * cannot df-cap its candidate buckets without breaking completeness,
    * so when the corpus vocabulary SATURATES — mass-duplicated
    * documents, template spam, any shape where "rare" prefix shingles
    * stop being rare — the lossless candidate join fans out
    * quadratically with the bucket df and no plan shape can save it.
    * Before building the candidate join, one cheap agg over the
    * (already materialized) prefix relation computes the EXACT raw
    * candidate count Σ_shingle C(bucket, 2); when it exceeds
    * `maxCandidatesPerDoc` × |docs| the operator REFUSES LOUDLY, naming
    * the approximate tiers ([[graft.operators.Dedup.containmentLshPairs]],
    * MinHash banding) and exact-dedup-first as the prescribed path —
    * a 100 TB user on a pathological corpus gets the cliff as an error
    * with measured numbers, never as a silent week-long stage. The
    * default bound (4096 pairs/doc) is ~50× the healthy Heaps-law mass
    * (observed 86/doc at sf0.1) and ~5× the saturating synthetic sf1
    * fixture (792/doc) — one more decade of that saturation trips it. */
  val MaxCandidatesPerDoc = 4096L

  def setSimilarityPairs(docs: DataFrame, threshold: Double,
      maxCandidatesPerDoc: Long = MaxCandidatesPerDoc): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // EAGER pin (r18): the preflight census/count actions and the main
    // candidate join are separate concurrent-ish consumers; the lazy
    // checkpoint measurably recomputed the tokenize+md5 shingle build
    // twice (two ~7 s-task-time stages with identical 3.87 MB output in
    // one StageProbe run). Eager materializes once.
    val sets = Dedup.shingleSetRelation(docs).localCheckpoint(true)
    val post = sets.select(col("doc_id"), size(col("sh")).as("len"),
      explode(col("sh")).as("shingle"))
    val dft = post.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    // NOT materialized: measured at both scales, the exchange-reuse
    // shape (the window's shuffle is shared by both self-join sides and
    // by the census job) beats a localCheckpoint by ~15% at sf1 — the
    // census below re-derives pref from the checkpointed `sets`, one
    // extra small job, cheaper than forcing every consumer through a
    // materialized copy
    val pref = post.join(dft, "shingle")
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= col("len") - ceil(lit(threshold) * col("len")) + 1)
      .select(col("shingle"), col("df"), col("doc_id"), col("len"), col("pos"))
    // preflight df census: exact raw candidate mass of the prefix
    // equi-join, ONE small agg job over the prefix relation
    val censusRow = pref.groupBy(col("shingle")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - lit(1))), lit(0L)).as("p2"),
        coalesce(max(col("c")), lit(0L)).as("maxBucket")).head()
    val rawPairs = censusRow.getLong(0) / 2
    val maxBucket = censusRow.getLong(1)
    val nDocs = sets.count()
    if (nDocs > 0 && rawPairs > maxCandidatesPerDoc * nDocs)
      throw new IllegalStateException(
        s"setSimilarityPairs: prefix-df saturation — the exact join's raw " +
        s"candidate mass is $rawPairs pairs over $nDocs docs " +
        s"(${rawPairs / nDocs}/doc, max prefix bucket $maxBucket), above the " +
        s"$maxCandidatesPerDoc/doc bound. The corpus vocabulary is saturated " +
        s"(mass duplication / template spam): an exact set-similarity join " +
        s"cannot df-cap without losing pairs. Run exact dedup first, or use " +
        s"the approximate tiers (Dedup.containmentLshPairs, " +
        s"Dedup.ngramJaccardPairs MinHash banding); raise maxCandidatesPerDoc " +
        s"only if the quadratic candidate stage is truly acceptable.")
    // per-pair first common shingle s* = argmin by (df, shingle): struct
    // min orders lexicographically, so (df, shingle) picks s* and carries
    // its positions; len_a/len_b ride the grouping key (constant per doc)
    // Positional bound, integer-safe: overlap >= t/(1+t)*(la+lb) compared
    // as bound*(1+t) >= t*(la+lb) − eps — the float `ceil` form could push
    // an exactly-integer requirement up by one ULP and prune a pair at
    // J = t exactly (the lossless claim would quietly break at threshold
    // boundaries).
    def posBoundOk(la: Column, lb: Column, pa: Column, pb: Column): Column =
      (lit(1.0) + least(la - pa, lb - pb)) * (1 + threshold) >=
        lit(threshold) * (la + lb) - lit(1e-9)
    val cand = pref.as("a").join(pref.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id")
          // LENGTH filter (PPJoin+): J >= t forces min(|x|,|y|) >= t·max —
          // prunes cross-length candidates before they reach the shuffle
          && least(col("a.len"), col("b.len")).cast("double") >=
             lit(threshold) * greatest(col("a.len"), col("b.len")) - lit(1e-9)
          // per-ROW positional prune: the bound at the pair's first common
          // shingle s* is the LOOSEST (every later shared shingle sits
          // deeper in both orders), so if s* fails this predicate every
          // row of the pair fails and the pair drops entirely — and if s*
          // survives, the argmin below is unchanged. Lossless, and the
          // near-threshold candidate mass dies before the group-by
          // exchange instead of after it.
          && posBoundOk(col("a.len"), col("b.len"), col("a.pos"), col("b.pos")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.len").as("la"), col("b.len").as("lb"),
        struct(col("a.df"), col("a.shingle"),
          col("a.pos").as("pa"), col("b.pos").as("pb")).as("k"))
      .groupBy(col("doc_a"), col("doc_b"), col("la"), col("lb"))
      .agg(min(col("k")).as("f"))
      .filter(posBoundOk(col("la"), col("lb"), col("f.pa"), col("f.pb")))
      .select(col("doc_a"), col("doc_b"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** GROUP-level overlap matrix: exact pairwise Jaccard between the
    * distinct-shingle sets of each group (source/domain/snapshot) — the
    * which-sources-mirror-each-other report that decides whether two
    * feeds are worth ingesting separately. Doc-level near-dup answers
    * "is this pair a copy"; this answers "is this whole FEED a copy".
    *
    * Plan: one corpus pass explodes (group, shingle) and dedups it (the
    * relation is bounded by Σ per-group vocabularies, not token count);
    * the self-equi-join on shingle emits pairs only for CO-OCCURRING
    * shingles, so output is the sparse overlap census (zero-overlap pairs
    * don't appear — absence IS the report for them). Per-shingle blowup
    * is ≤ C(|groups|, 2) — groups are feeds, a small set by nature.
    * Totals are a groups-sized relation, broadcast back; Jaccard =
    * inter / (a + b − inter) is one exact-integer division. */
  def groupOverlap(docs: DataFrame, groupCol: String,
      shingleN: Int = 3): DataFrame = {
    val gs = docs.select(col(groupCol).as("g"),
        explode(graft.functions.Text.shingles(col("text"), shingleN)).as("sh"))
      .distinct()
    val totals = gs.groupBy(col("g")).agg(count(lit(1)).as("n_sh"))
    val inter = gs.select(col("g").as("g_a"), col("sh"))
      .join(gs.select(col("g").as("g_b"), col("sh")), "sh")
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(totals.select(col("g").as("g_a"),
        col("n_sh").as("n_a"))), "g_a")
      .join(broadcast(totals.select(col("g").as("g_b"),
        col("n_sh").as("n_b"))), "g_b")
      .select(col("g_a"), col("g_b"), col("n_inter"), col("n_a"), col("n_b"),
        round(col("n_inter") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
  }
}
