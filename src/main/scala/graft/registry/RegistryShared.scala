package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.{Ingest, LakePaths, Readers, Tables, Writers}
import graft.operators._
import graft.streaming.{Alerts, Funnel, Sessions}

/** Helpers shared across the registry slices: common projections with
  * their mirrored oracle SQL, and the heavy oracle SQL builders. All
  * previously private to SparkEntry; `private[graft]` so only the
  * registry and SparkEntry see them. */
object RegistryShared {
  private[graft] def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Shared nullified-events projection for the na.* / impute operators —
    * the driver tables have no NULLs, so NULLs are injected
    * deterministically (mirrored exactly in the oracle SQL). */
  private[graft] def nulledEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      col("event_id"),
      when(col("value") < 2, lit(null)).otherwise(col("value")).as("value_n"),
      when(col("event_type") === "error", lit(null)).otherwise(col("props")).as("props_n"),
      when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id")).as("user_n"))

  private[graft] val nulledEventsSql =
    """SELECT event_id,
      |  CASE WHEN value < 2 THEN NULL ELSE value END AS value_n,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS props_n,
      |  CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS user_n
      |FROM events""".stripMargin

  /** Synthetic ingestion manifest (S4 stub): URLs in the reference's
    * Inside-Airbnb layout built from document attributes. */
  private[graft] def manifestUrls(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(concat(
      lit("https://insideairbnb.example.com/spain/"), col("lang"), lit("/"),
      col("source"), lit("/2024-01-01/data/d"), col("doc_id").cast("string"),
      lit(".csv")).as("href"))

  private[graft] val manifestUrlsSql =
    """SELECT 'https://insideairbnb.example.com/spain/' || lang || '/' || source
      |  || '/2024-01-01/data/d' || CAST(doc_id AS VARCHAR) || '.csv' AS href
      |FROM documents""".stripMargin


  // ---- heavy oracle SQL builders (kept as defs for readability) ----

  private[graft] def shinglesSql: String = shinglesSqlOver("documents", "")

  private[graft] def shinglesSqlOver(rel: String, where: String, n: Int = 3): String = {
    val terms = (0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""SELECT doc_id, lang,
       |  list_transform(range(1, len(t) - ${n - 2}),
       |    i -> $terms) AS sh
       |FROM (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS t
       |      FROM $rel $where)
       |WHERE len(t) >= $n""".stripMargin
  }

  /** Distinct (doc_id, gram) 5-gram CTEs over the train/benchmark doc-id
    * split — shared by both decontamination oracles. */
  private[graft] def decontamGramsSql: String =
    s"""tr AS (${shinglesSqlOver("documents", "WHERE doc_id >= 50", 5)}),
       |be AS (${shinglesSqlOver("documents", "WHERE doc_id < 50", 5)}),
       |tg AS (SELECT DISTINCT doc_id, g
       |       FROM (SELECT doc_id, unnest(sh) AS g FROM tr)),
       |bg AS (SELECT DISTINCT doc_id AS bench_id, g
       |       FROM (SELECT doc_id, unnest(sh) AS g FROM be))""".stripMargin

  /** Char-trigram LM scoring CTEs shared by the q_lm_score / q_lm_gate
    * oracles: en-trained counts, add-0.5 smoothing, unseen mass, per-doc
    * mean NLL rounded to 4 (the `s` relation). */
  private[graft] def lmScoreSql: String =
    """tr AS (SELECT lower(text) AS t FROM documents WHERE lang = 'en'),
      |tg0 AS (SELECT t, unnest(range(1, len(t) - 1)) AS i FROM tr),
      |c AS (SELECT substr(t, CAST(i AS INT), 3) AS gram, count(*) AS cnt
      |      FROM tg0 GROUP BY 1),
      |st AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM c),
      |m AS (SELECT gram, ln((cnt + 0.5) / (n + 0.5 * (v + 1))) AS logp FROM c, st),
      |u AS (SELECT ln(0.5 / (n + 0.5 * (v + 1))) AS logp_unseen FROM st),
      |dg0 AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      |        FROM (SELECT doc_id, lower(text) AS t FROM documents)),
      |dg AS (SELECT doc_id, substr(t, CAST(i AS INT), 3) AS gram FROM dg0),
      |s AS (SELECT doc_id, count(*) AS n_grams,
      |        round(-avg(coalesce(m.logp, u.logp_unseen)), 4) AS avg_nll
      |      FROM dg LEFT JOIN m USING (gram) CROSS JOIN u GROUP BY doc_id)""".stripMargin

  /** Per-doc English-stopword ratio — the quality proxy the source-
    * reputation gate averages (same formula as q_text_quality's
    * stopword_ratio, unrounded so the per-source mean is exact). */
  private[graft] def stopwordRatio: Column =
    Text.markerHits(col("text"), Text.stopwords("en")).cast("double") /
      Text.tokenCount(col("text"))

  /** Source-reputation CTEs shared by the q_source_stats / q_source_gate
    * oracles: per-doc stopword ratio, per-source stats, corpus-wide mean. */
  private[graft] def sourceRepSql: String =
    """q AS (SELECT doc_id, source,
      |        len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |              t -> t IN ('the','a','of','and','is','in','to','it')))
      |          / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS s
      |      FROM documents),
      |st AS (SELECT source, count(*) AS n_docs, avg(s) AS avg_s
      |       FROM q GROUP BY source),
      |g AS (SELECT avg(s) AS global_s FROM q)""".stripMargin

  /** Corpus-duplicated 4-token-span CTEs (ExactSubstr tier): `t` tokenizes,
    * `h` hashes every span via 1-based list slicing, `d` keeps occurrences
    * whose hash repeats corpus-wide (window census, like the Spark side).
    * Shared by the q_dup_span_frac / q_span_scrub oracles. */
  private[graft] def dupSpansSql: String =
    """t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |       FROM documents),
      |s AS (SELECT doc_id, toks,
      |        unnest(range(0, greatest(len(toks) - 3, 0))) AS start FROM t),
      |h AS (SELECT doc_id, start,
      |        md5(array_to_string(toks[start + 1:start + 4], ' ')) AS h FROM s),
      |d AS (SELECT doc_id, start
      |      FROM (SELECT doc_id, start, count(*) OVER (PARTITION BY h) AS cnt
      |            FROM h)
      |      WHERE cnt > 1)""".stripMargin

  /** BM25 demo queries — terms drawn from the synthetic corpus vocabulary;
    * shared by the Spark query and the oracle builder. */
  private[graft] val bm25Queries: Seq[(Int, String)] = Seq(
    0 -> "spark window agg",
    1 -> "customer order value",
    2 -> "slow hash join")

  /** BM25 oracle — identical term list, identical double literals (k1, b
    * folded in Scala so e.g. `k1 + 1` prints the same 2.2 DuckDB parses),
    * avgdl rounded before scoring on both sides. */
  private[graft] def bm25Sql: String = {
    val (k1, b, k) = (1.2, 0.75, 10)
    val qt = bm25Queries.flatMap { case (qid, q) =>
      q.toLowerCase.trim.split("\\s+").distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""WITH qt(query_id, term) AS (VALUES $qt),
       |docs_t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |           FROM documents),
       |stats AS (SELECT count(*) AS n_docs, round(avg(len(t)), 4) AS avgdl FROM docs_t),
       |toks AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM docs_t),
       |tf AS (SELECT term, doc_id, dl, count(*) AS tf
       |       FROM toks JOIN (SELECT DISTINCT term FROM qt) q USING (term)
       |       GROUP BY term, doc_id, dl),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT query_id, doc_id,
       |    round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * (tf * ${k1 + 1}) / (tf + $k1 * (${1 - b} + $b * dl / avgdl))), 4) AS score
       |  FROM tf JOIN dft USING (term) JOIN qt USING (term) CROSS JOIN stats
       |  GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
       |FROM scored QUALIFY rank <= $k""".stripMargin
  }

  /** The PII scrub oracle folds the SAME [[Text.PiiPatterns]] list the
    * Spark query uses — one pattern source, two engines (patterns are
    * Java∩RE2, see Text.scala). */
  private[graft] def piiRedactSql: String = {
    val dirty =
      """regexp_replace(substring(text, 1, 40), '[0-9]', '', 'g')
        | || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com ssn 123-45-'
        | || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        | || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 555-'
        | || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        | || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"""
        // flattened: the outer template below runs stripMargin over the
        // INTERPOLATED text, which would eat the first '|' of a
        // line-leading '||'
        .stripMargin.replace("\n", "")
    val redacted = Text.PiiPatterns.foldLeft("dirty") { case (e, (p, r)) =>
      s"regexp_replace($e, '$p', '$r', 'g')"
    }
    s"""SELECT doc_id, dirty,
       |  $redacted AS redacted
       |FROM (SELECT doc_id,
       |  $dirty AS dirty
       |FROM documents)""".stripMargin
  }

  private[graft] def minhashSigSql: String = minhashSigSqlOver("documents", "")

  private[graft] def minhashSigSqlWhere(where: String): String =
    minhashSigSqlOver("documents", where)

  private[graft] def minhashSigSqlOver(rel: String, where: String): String = {
    // base hash: first 7 md5 nibbles as an integer (< 2^28), then the
    // universal-hash family (A_i * h + B_i) mod P — mirrors Dedup exactly;
    // all products < 2^60 so DuckDB's checked BIGINT arithmetic never throws.
    val base = (1 to 7).map { i =>
      s"(instr('0123456789abcdef', substring(md5(s), $i, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString(" + ")
    val slots = (0 until Dedup.MinhashK).map { i =>
      s"    list_aggregate(list_transform(hashes, h -> (${Dedup.minhashA(i)} * h + ${Dedup.minhashB(i)}) % ${Dedup.MinhashP}), 'min') AS mh_$i"
    }.mkString(",\n")
    s"""WITH docs AS (${shinglesSqlOver(rel, where)}),
       |hs AS (
       |  SELECT doc_id, list_transform(sh, s -> $base) AS hashes
       |  FROM docs WHERE len(sh) > 0)
       |SELECT doc_id,
       |$slots
       |FROM hs""".stripMargin
  }

  /** Band bucket rows over the signature CTE `sigs` (shared by the pairs
    * and Jaccard oracles). Slots are BIGINT — cast for the string concat. */
  private[graft] def bandRowsSql: String = bandRowsSqlFrom("sigs")

  private[graft] def bandRowsSqlFrom(sigsName: String,
      bands: Int = Dedup.Bands): String = {
    val rpb = Dedup.MinhashK / bands
    (0 until bands).map { b =>
      val slots = (b * rpb until (b + 1) * rpb)
        .map(h => s"CAST(mh_$h AS VARCHAR)").mkString(" || '|' || ")
      s"  SELECT doc_id, $b AS band, md5($slots) AS bucket FROM $sigsName"
    }.mkString("\n  UNION ALL\n")
  }

  /** The capped within-bucket pair expansion (mirrors
    * Dedup.minhashCandidatePairsOf): full C(n,2) for buckets up to
    * MaxBucket, min-id star pairs beyond. Yields CTEs `grouped` and a
    * final SELECT-able `cand` (doc_a, doc_b). */
  private[graft] def cappedPairCtes: String = cappedPairCtesFrom("bands")

  private[graft] def cappedPairCtesFrom(bandsName: String): String =
    s"""grouped AS (
       |  SELECT band, bucket, list_sort(list(doc_id)) AS ids
       |  FROM $bandsName GROUP BY band, bucket HAVING count(*) > 1),
       |expanded AS (
       |  SELECT unnest(CASE WHEN len(ids) <= ${Dedup.MaxBucket}
       |    THEN flatten(list_transform(range(1, len(ids)), i ->
       |           list_transform(range(i + 1, len(ids) + 1), j -> {'a': ids[i], 'b': ids[j]})))
       |    ELSE list_transform(ids[2:], x -> {'a': ids[1], 'b': x})
       |  END) AS p FROM grouped),
       |cand AS (
       |  SELECT DISTINCT p.a AS doc_a, p.b AS doc_b FROM expanded)""".stripMargin

  private[graft] def minhashPairsSql: String =
    s"""WITH sigs AS ($minhashSigSql),
       |bands AS (
       |$bandRowsSql),
       |$cappedPairCtes
       |SELECT doc_a, doc_b FROM cand""".stripMargin

  /** One min-propagation step over band buckets (mirrors
    * Dedup.minhashClustersOf): per-bucket min doc_id, then the min of
    * those over each document's buckets. */
  private[graft] def minhashClusterSql: String =
    s"""WITH sigs AS ($minhashSigSql),
       |bands AS (
       |$bandRowsSql),
       |reps AS (
       |  SELECT band, bucket, min(doc_id) AS rep FROM bands GROUP BY band, bucket)
       |SELECT b.doc_id, min(r.rep) AS cluster_id
       |FROM bands b JOIN reps r ON b.band = r.band AND b.bucket = r.bucket
       |GROUP BY b.doc_id""".stripMargin

  private[graft] def simhashCoreSql: String = {
    val nibbles = Dedup.SimhashBits / 4
    val hv = (1 to nibbles).map { i =>
      s"(instr('0123456789abcdef', substring(md5(token), $i, 1)) - 1) * ${1L << (4 * (nibbles - i))}"
    }.mkString("\n    + ")
    // integer division (//): hv is up to 2^60, so float division + floor
    // rounds above the 53-bit double mantissa and flips low-bit votes
    val votes = (0 until Dedup.SimhashBits).map { j =>
      s"    sum(CASE WHEN (hv // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v_$j"
    }.mkString(",\n")
    val sig = (0 until Dedup.SimhashBits).map { j =>
      s"(CASE WHEN v_$j > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS token
       |  FROM documents),
       |hv AS (
       |  SELECT doc_id,
       |    $hv AS hv
       |  FROM toks),
       |votes AS (
       |  SELECT doc_id,
       |$votes
       |  FROM hv GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM votes""".stripMargin
  }

  private[graft] def simhashSql: String = simhashCoreSql

  /** Mirrors Dedup.simhashNearDupPairsOf: bucket members grouped per
    * (chunk, chunk_val), the SAME capped expansion as the MinHash oracle
    * (full C(n,2) up to MaxBucket, min-id star pairs beyond), Hamming
    * filter, distinct over the filtered candidates. */
  private[graft] def simhashPairsSql: String = bandedHammingPairsSql(simhashCoreSql)

  /** The banded Hamming-pair SQL over ANY (doc_id, simhash) core CTE —
    * shared by the token-SimHash and multimodal-dHash tiers, mirroring
    * Dedup.simhashPairsFromChunks chunk for chunk. */
  private[graft] def bandedHammingPairsSql(coreSql: String): String = {
    val chunkRows = (0 until Dedup.SimhashChunks).map { c =>
      val p = 1L << (c * Dedup.ChunkBits)
      // exact integer division (//): simhash is up to 2^60, so float
      // division + floor would round above the 53-bit double mantissa
      s"  SELECT doc_id, simhash, $c AS chunk, (simhash // $p) % ${1 << Dedup.ChunkBits} AS chunk_val FROM sigs"
    }.mkString("\n  UNION ALL\n")
    s"""WITH sigs AS ($coreSql),
       |chunks AS (
       |$chunkRows),
       |grouped AS (
       |  SELECT chunk, chunk_val,
       |    list_sort(list({'doc_id': doc_id, 'simhash': simhash})) AS ms
       |  FROM chunks GROUP BY chunk, chunk_val HAVING count(*) > 1),
       |expanded AS (
       |  SELECT unnest(CASE WHEN len(ms) <= ${Dedup.MaxBucket}
       |    THEN flatten(list_transform(range(1, len(ms)), i ->
       |           list_transform(range(i + 1, len(ms) + 1), j -> {'a': ms[i], 'b': ms[j]})))
       |    ELSE list_transform(ms[2:], x -> {'a': ms[1], 'b': x})
       |  END) AS p FROM grouped)
       |SELECT DISTINCT p.a.doc_id AS doc_a, p.b.doc_id AS doc_b,
       |  CAST(bit_count(xor(p.a.simhash, p.b.simhash)) AS INTEGER) AS hamming
       |FROM expanded
       |WHERE bit_count(xor(p.a.simhash, p.b.simhash)) <= 3""".stripMargin
  }

  /** The dHash core: 61 box-filter cells over the payload bytes (ascii
    * codes — the documents' text is ASCII, matching the binary cast), bit
    * j = cell j mean > cell j+1 mean via EXACT cross-multiplied integer
    * sums. Mirrors Multimodal.dhashSignature; column named simhash so the
    * shared banded-pairs SQL applies unchanged. */
  private[graft] def phashCoreSql: String =
    """WITH pb AS (
      |  SELECT doc_id, (CAST(i - 1 AS BIGINT) * 61) // length(text) AS cell,
      |    ascii(substr(text, i, 1)) AS code
      |  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)
      |  WHERE length(text) >= 61),
      |pc AS (
      |  SELECT doc_id, cell, CAST(sum(code) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM pb GROUP BY 1, 2),
      |pbits AS (
      |  SELECT x.doc_id, x.cell AS j,
      |    CASE WHEN x.s * y.n > y.s * x.n THEN 1 ELSE 0 END AS bit
      |  FROM pc x JOIN pc y ON x.doc_id = y.doc_id AND y.cell = x.cell + 1
      |  WHERE x.cell < 60)
      |SELECT doc_id,
      |  CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(j AS INTEGER))) AS BIGINT)
      |    AS simhash
      |FROM pbits GROUP BY doc_id""".stripMargin

  /** First-7-md5-nibbles of the doc id as an integer — the deterministic
    * split/sampling bucket base (mirrors graft_md5_prefix(doc_id, 7)). */
  private[graft] def md5BucketSql: String = md5BucketSqlOf("doc_id")

  /** Shared Naive Bayes oracle CTE chain: md5 train band → (label, term)
    * counts → dense add-one-smoothed model (mirrors `ml.NaiveBayes.model`,
    * same 6-decimal rounding at the model boundary). */
  private[graft] def nbModelCte: String =
    s"""WITH train AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE CAST(($md5BucketSql) % 100 AS INTEGER) < 90),
       |counts AS (
       |  SELECT label, term, CAST(count(*) AS BIGINT) AS n_lt FROM (
       |    SELECT lang AS label,
       |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
       |    FROM train)
       |  GROUP BY label, term),
       |totals AS (
       |  SELECT label, CAST(sum(n_lt) AS BIGINT) AS n_l FROM counts GROUP BY label),
       |vocab AS (SELECT DISTINCT term FROM counts),
       |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
       |model AS (
       |  SELECT t.label, vo.term,
       |    round(ln((COALESCE(c.n_lt, 0) + 1) / CAST(t.n_l + vs.v AS DOUBLE)), 6) AS logp
       |  FROM totals t CROSS JOIN vocab vo CROSS JOIN vs
       |  LEFT JOIN counts c ON c.label = t.label AND c.term = vo.term)""".stripMargin

  /** The NB inference CTE chain (priors → tf → scored → ranked), shared
    * by the predict and confusion-census oracles; appended after
    * [[nbModelCte]]. */
  private[graft] def nbPredictCtes: String =
    """priors AS (
      |  SELECT label, round(ln(CAST(n_docs_l AS DOUBLE) / n_docs), 6) AS log_prior
      |  FROM (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs_l
      |        FROM train GROUP BY 1)
      |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM train)),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |    FROM documents)
      |  GROUP BY doc_id, term),
      |scored AS (
      |  -- integer micro-unit sum: logp is rounded to 6 decimals, so the
      |  -- long arithmetic is exact and order-independent (mirrors
      |  -- ml.NaiveBayes.predict)
      |  SELECT tf.doc_id, m.label,
      |    CAST(sum(tf.tf * CAST(round(m.logp * 1000000) AS BIGINT)) AS BIGINT) AS ll_micro
      |  FROM tf JOIN model m ON tf.term = m.term
      |  GROUP BY tf.doc_id, m.label),
      |ranked AS (
      |  SELECT s.doc_id, s.label,
      |    s.ll_micro + CAST(round(p.log_prior * 1000000) AS BIGINT) AS score_micro,
      |    row_number() OVER (PARTITION BY s.doc_id
      |      ORDER BY s.ll_micro + CAST(round(p.log_prior * 1000000) AS BIGINT) DESC,
      |        s.label) AS rnk
      |  FROM scored s JOIN priors p USING (label))""".stripMargin

  /** The χ² cell chain (full A×B grid, marginal window sums, raw expected
    * counts) as CTEs ending in `e` — shared by the per-cell report and
    * the Cramér's V summary. Mirrors Audit.chiSquareIndependence. */
  private[graft] def chi2CellsSql: String =
    """WITH counts AS (
      |  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cell_n
      |  FROM lineitem GROUP BY 1, 2),
      |grid AS (
      |  SELECT a.l_returnflag, b.l_linestatus
      |  FROM (SELECT DISTINCT l_returnflag FROM lineitem) a
      |  CROSS JOIN (SELECT DISTINCT l_linestatus FROM lineitem) b),
      |cells AS (
      |  SELECT g.l_returnflag, g.l_linestatus,
      |    COALESCE(c.cell_n, 0) AS n_obs
      |  FROM grid g LEFT JOIN counts c USING (l_returnflag, l_linestatus)),
      |m AS (
      |  SELECT *,
      |    CAST(sum(n_obs) OVER (PARTITION BY l_returnflag) AS BIGINT) AS row_tot,
      |    CAST(sum(n_obs) OVER (PARTITION BY l_linestatus) AS BIGINT) AS col_tot,
      |    CAST(sum(n_obs) OVER () AS BIGINT) AS n
      |  FROM cells),
      |e AS (
      |  SELECT l_returnflag, l_linestatus, n_obs,
      |    CAST(row_tot AS DOUBLE) * col_tot / n AS exp_raw
      |  FROM m)""".stripMargin

  /** The skip-gram term graph (window 3, pair count >= 50) as CTEs ending
    * in `sym` (both directions, self-loops dropped) — the edge relation
    * behind q_triangles/q_graph_cc/q_degree_dist. Mirrors
    * Retrieval.windowCooccurrence + Graph.symmetric. */
  private[graft] def termGraphCtes: String =
    """WITH tk AS (
      |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |pp AS (
      |  SELECT unnest(flatten(list_transform(range(1, len(t)),
      |    i -> list_transform(range(i + 1, least(i + 3, len(t)) + 1),
      |      j -> {'a': least(t[i], t[j]), 'b': greatest(t[i], t[j])})))) AS p
      |  FROM tk WHERE len(t) >= 2),
      |e AS (
      |  SELECT p.a AS term_a, p.b AS term_b, count(*) AS n_ab
      |  FROM pp GROUP BY 1, 2 HAVING count(*) >= 50),
      |sym AS (
      |  SELECT term_a AS u, term_b AS v FROM e WHERE term_a <> term_b
      |  UNION ALL
      |  SELECT term_b AS u, term_a AS v FROM e WHERE term_a <> term_b)""".stripMargin

  /** DSIR importance weights (mirrors operators.Importance): hashed
    * unigram slots (md5 mod 64), Laplace-smoothed target/source log
    * ratio per slot, each log rounded to 6 dp then micro-scaled with a
    * round-to-integer (the NB convention), per-doc weight as an exact
    * BIGINT sum. Target exemplars = lang = 'en'. */
  private[graft] def importanceWeightsSql: String = {
    val dim = 64
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, lang,
       |    CAST((${md5BucketSqlOf("term")}) % $dim AS INTEGER) AS slot
       |  FROM toks),
       |stats AS (
       |  SELECT slot, CAST(count(*) AS BIGINT) AS n_src,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
       |  FROM f GROUP BY slot),
       |tot AS (SELECT CAST(sum(n_src) AS BIGINT) AS tot_src,
       |  CAST(sum(n_tgt) AS BIGINT) AS tot_tgt FROM stats),
       |lr AS (
       |  SELECT slot,
       |    CAST(round(round(ln((n_tgt + 1) / CAST(tot_tgt + $dim AS DOUBLE)), 6) * 1000000) AS BIGINT)
       |    - CAST(round(round(ln((n_src + 1) / CAST(tot_src + $dim AS DOUBLE)), 6) * 1000000) AS BIGINT)
       |      AS lr_micro
       |  FROM stats CROSS JOIN tot),
       |ds AS (SELECT doc_id, slot, CAST(count(*) AS BIGINT) AS tf
       |       FROM f GROUP BY doc_id, slot)
       |SELECT doc_id, CAST(sum(tf * lr_micro) AS BIGINT) AS logw_micro
       |FROM ds JOIN lr USING (slot) GROUP BY doc_id""".stripMargin
  }

  private[graft] def md5BucketSqlOf(ref: String): String =
    (1 to 7).map { i =>
      s"(instr('0123456789abcdef', substring(md5(CAST($ref AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString(" + ")

  /** General-width twin of md5BucketSqlOf: first `nibbles` hex digits of
    * md5(`ref`) as a bigint, over an already-VARCHAR ref expression —
    * mirrors `graft_md5_prefix(ref, nibbles)`. */
  private[graft] def md5PrefixSqlOf(ref: String, nibbles: Int): String =
    (1 to nibbles).map { i =>
      s"(instr('0123456789abcdef', substring(md5($ref), $i, 1)) - 1) * ${1L << (4 * (nibbles - i))}"
    }.mkString(" + ")

  /** The composed curation oracle: quality filter, fingerprint-window
    * exact dedup, the unrolled CC chain over the kept slice, survivors,
    * hash split — every stage the same SQL its standalone oracle runs. */
  private[graft] def curateSql(iterations: Int): String =
    s"""WITH quality AS (
       |  SELECT doc_id, lang, text,
       |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INTEGER) AS n_tokens
       |  FROM documents
       |  WHERE CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INTEGER) >= ${Curate.MinTokens}),
       |kept AS (
       |  SELECT doc_id, lang, text, n_tokens FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY
       |      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS keep_id
       |    FROM quality)
       |  WHERE doc_id = keep_id),
       |${ccCtes(iterations, "kept")}
       |SELECT doc_id, lang, n_tokens, bucket,
       |  CASE WHEN bucket < 90 THEN 'train'
       |       WHEN bucket < 95 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT k.doc_id, k.lang, k.n_tokens,
       |    CAST((${md5BucketSqlOf("k.doc_id")}) % 100 AS INTEGER) AS bucket
       |  FROM kept k JOIN l$iterations l ON k.doc_id = l.doc_id AND l.label = k.doc_id)""".stripMargin

  /** Min-label propagation unrolled `iterations` times over the band
    * buckets (mirrors Dedup.minhashConnectedComponentsOf exactly: both
    * sides run the same fixed iteration count). `ccCtes` yields the CTE
    * chain (over an arbitrary source relation) so composite oracles can
    * embed it; the converged labels live in CTE `l<iterations>`. */
  private[graft] def ccCtes(iterations: Int, rel: String): String = {
    val steps = (1 to iterations).map { i =>
      s"""b$i AS (
         |  SELECT b.band, b.bucket, min(l.label) AS bl
         |  FROM bands b JOIN l${i - 1} l ON b.doc_id = l.doc_id
         |  GROUP BY b.band, b.bucket),
         |l$i AS (
         |  SELECT b.doc_id, min(x.bl) AS label
         |  FROM bands b JOIN b$i x ON b.band = x.band AND b.bucket = x.bucket
         |  GROUP BY b.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""sigs AS (${minhashSigSqlOver(rel, "")}),
       |bands AS (
       |$bandRowsSql),
       |l0 AS (SELECT DISTINCT doc_id, doc_id AS label FROM bands),
       |$steps""".stripMargin
  }

  private[graft] def minhashCcSql(iterations: Int): String =
    s"""WITH ${ccCtes(iterations, "documents")}
       |SELECT doc_id, label AS cluster_id FROM l$iterations""".stripMargin

  /** Mirrors the candidates-then-verify Spark plan: MinHash-LSH candidate
    * pairs (same CTE chain as q_dedup_minhash), exact Jaccard on those via
    * list_intersect (distinct-element intersection, like array_intersect). */
  private[graft] def jaccardSql: String = jaccardSql(Dedup.Bands)

  /** Shared CTE chain ending in `verified(doc_a, doc_b, inter, na, nb)` —
    * the exact-intersection stats both the Jaccard and containment
    * oracles select over. */
  private[graft] def verifiedPairCtes(bands: Int): String =
    s"""sigs AS ($minhashSigSql),
       |bands AS (
       |${bandRowsSqlFrom("sigs", bands)}),
       |$cappedPairCtes,
       |docs AS (
       |  SELECT doc_id, list_distinct(sh) AS sh FROM ($shinglesSql)
       |  WHERE len(sh) > 0),
       |verified AS (
       |  SELECT cand.doc_a, cand.doc_b,
       |    len(list_intersect(da.sh, db.sh)) AS inter,
       |    len(da.sh) AS na, len(db.sh) AS nb
       |  FROM cand
       |  JOIN docs da ON cand.doc_a = da.doc_id
       |  JOIN docs db ON cand.doc_b = db.doc_id)""".stripMargin

  private[graft] def jaccardSql(bands: Int): String =
    s"""WITH ${verifiedPairCtes(bands)}
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
       |FROM verified
       |WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) >= 0.5""".stripMargin

  /** Mirrors Dedup.containmentLshPairs: bottom-k (by first-7-md5-nibbles,
    * shingle) probe sketch per document, df-capped inverted shingle index,
    * equi-join candidates, exact-intersection verify. */
  private[graft] def containmentLshSql(threshold: Double, bottomK: Int, maxDf: Int,
      minHits: Int): String =
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(sh) AS sh FROM ($shinglesSql)
       |  WHERE len(sh) > 0),
       |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
       |pr AS (
       |  SELECT doc_id AS probe_id, shingle FROM (
       |    SELECT doc_id, shingle,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY ${md5BucketSqlOf("shingle")}, shingle) AS rk
       |    FROM ex)
       |  WHERE rk <= $bottomK),
       |idx AS (
       |  SELECT doc_id AS index_id, shingle FROM (
       |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS cnt
       |    FROM ex)
       |  WHERE cnt <= $maxDf),
       |cand AS (
       |  SELECT least(probe_id, index_id) AS doc_a,
       |    greatest(probe_id, index_id) AS doc_b
       |  FROM pr JOIN idx USING (shingle)
       |  WHERE probe_id != index_id
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $minHits),
       |verified AS (
       |  SELECT cand.doc_a, cand.doc_b,
       |    len(list_intersect(da.sh, db.sh)) AS inter,
       |    len(da.sh) AS na, len(db.sh) AS nb
       |  FROM cand
       |  JOIN docs da ON cand.doc_a = da.doc_id
       |  JOIN docs db ON cand.doc_b = db.doc_id)
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE) / na, 4) AS cont_a,
       |  round(CAST(inter AS DOUBLE) / nb, 4) AS cont_b
       |FROM verified
       |WHERE greatest(round(CAST(inter AS DOUBLE) / na, 4),
       |               round(CAST(inter AS DOUBLE) / nb, 4)) >= $threshold""".stripMargin

  /** Mirrors Dedup.incrementalContainmentPairs over the doc_id split at
    * `splitId`: same probes/index/df-cap as the batch form, but hits keep
    * only legs with >= 1 delta member (probe or index above the split) —
    * existing↔existing pairs were found when those documents arrived. */
  private[graft] def containmentIncrSql(threshold: Double, bottomK: Int, maxDf: Int,
      minHits: Int, splitId: Long): String =
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(sh) AS sh FROM ($shinglesSql)
       |  WHERE len(sh) > 0),
       |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
       |oks AS (
       |  SELECT shingle FROM (
       |    SELECT shingle, count(*) AS df FROM ex GROUP BY shingle)
       |  WHERE df <= $maxDf),
       |pr AS (
       |  SELECT doc_id AS probe_id, shingle FROM (
       |    SELECT doc_id, shingle,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY ${md5BucketSqlOf("shingle")}, shingle) AS rk
       |    FROM ex)
       |  WHERE rk <= $bottomK),
       |idx AS (
       |  SELECT ex.doc_id AS index_id, ex.shingle
       |  FROM ex JOIN oks USING (shingle)),
       |cand AS (
       |  SELECT least(probe_id, index_id) AS doc_a,
       |    greatest(probe_id, index_id) AS doc_b
       |  FROM pr JOIN idx USING (shingle)
       |  WHERE probe_id != index_id
       |    AND (probe_id >= $splitId OR index_id >= $splitId)
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $minHits),
       |verified AS (
       |  SELECT cand.doc_a, cand.doc_b,
       |    len(list_intersect(da.sh, db.sh)) AS inter,
       |    len(da.sh) AS na, len(db.sh) AS nb
       |  FROM cand
       |  JOIN docs da ON cand.doc_a = da.doc_id
       |  JOIN docs db ON cand.doc_b = db.doc_id)
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE) / na, 4) AS cont_a,
       |  round(CAST(inter AS DOUBLE) / nb, 4) AS cont_b
       |FROM verified
       |WHERE greatest(round(CAST(inter AS DOUBLE) / na, 4),
       |               round(CAST(inter AS DOUBLE) / nb, 4)) >= $threshold""".stripMargin

  private[graft] def containmentSql(bands: Int, threshold: Double): String =
    s"""WITH ${verifiedPairCtes(bands)}
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE) / na, 4) AS cont_a,
       |  round(CAST(inter AS DOUBLE) / nb, 4) AS cont_b
       |FROM verified
       |WHERE greatest(round(CAST(inter AS DOUBLE) / na, 4),
       |               round(CAST(inter AS DOUBLE) / nb, 4)) >= $threshold""".stripMargin

  /** Cosine over DOUBLE[] casts — the exact arithmetic Vectors.cosine runs. */
  private[graft] def cosSql(a: String, b: String): String =
    s"""list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))
       |       * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))""".stripMargin

  /** The sampled-codebook quantizer CTEs (mirrors Quantize: centroids are
    * every CodebookStep-th vector, cell = argmax of rounded cosine with
    * centroid-id tie-break). Yields CTEs `cent`, `qscored`, `assign`. */
  private[graft] def quantizeCtes: String =
    s"""cent AS (
       |  SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
       |  FROM embeddings WHERE vec_id % ${Quantize.CodebookStep} = 0
       |    AND vec_id < ${Quantize.CodebookStep.toLong * Quantize.MaxCells}),
       |qscored AS (
       |  SELECT e.vec_id, e.embedding, c.c_id,
       |    round(${cosSql("e.embedding", "c.c_emb")}, 4) AS aff
       |  FROM embeddings e CROSS JOIN cent c),
       |assign AS (
       |  SELECT vec_id, embedding, c_id AS cell FROM (
       |    SELECT vec_id, embedding, c_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id) AS rn
       |    FROM qscored)
       |  WHERE rn = 1)""".stripMargin

  private[graft] def ivfSql: String =
    s"""WITH $quantizeCtes,
       |probe AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, c_id AS q_cell FROM (
       |    SELECT vec_id, embedding, c_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id) AS rn
       |    FROM qscored WHERE vec_id < 10)
       |  WHERE rn <= ${Similarity.IvfNprobe}),
       |scored AS (
       |  SELECT p.q_id, a.vec_id,
       |    round(${cosSql("p.q_emb", "a.embedding")}, 4) AS cosine
       |  FROM assign a JOIN probe p ON a.cell = p.q_cell AND a.vec_id != p.q_id)
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT q_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** Multi-cell assignment (each vector in its EmbedAssignCells nearest
    * cells) with pair dedup — mirrors Dedup.embeddingNearDupPairs. */
  private[graft] def embedDedupSql: String =
    s"""WITH $quantizeCtes,
       |massign AS (
       |  SELECT vec_id, embedding, c_id AS cell FROM (
       |    SELECT vec_id, embedding, c_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id) AS rn
       |    FROM qscored)
       |  WHERE rn <= ${Dedup.EmbedAssignCells})
       |SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(${cosSql("a.embedding", "b.embedding")}, 4) AS cosine
       |FROM massign a JOIN massign b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE round(${cosSql("a.embedding", "b.embedding")}, 4) >= 0.3""".stripMargin

  /** Byte histogram over the UTF-8 payload, bucket = high nibble of each
    * byte — which is exactly the ODD-position hex digits of hex(payload).
    * Counts are integers, so the compare is rounding-free. */
  private[graft] def mmHistSql: String = {
    val hexDigits = "0123456789ABCDEF"
    val buckets = (0 until 16).map { k =>
      s"""  CAST(len(list_filter(range(1, CAST(n_bytes AS INTEGER) + 1),
         |    i -> substring(hx, 2 * i - 1, 1) = '${hexDigits(k)}')) AS BIGINT) AS h$k""".stripMargin
    }.mkString(",\n")
    s"""WITH h AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents)
       |SELECT doc_id, n_bytes,
       |$buckets
       |FROM h""".stripMargin
  }

  /** Multi-table multi-probe LSH in SQL (mirrors Similarity.lshTopK): the
    * SAME md5-derived plane coefficients the Spark plan bakes in as
    * literals, here as exact decimal array literals (each value is
    * k/65536 - 0.5 — a finite decimal that round-trips bit-identically
    * into a double), one bucket expression per table, and the query side
    * exploded over every Hamming-ball XOR mask. */
  private[graft] def lshAnnSql: String = {
    def coefArr(plane: Int): String =
      Similarity.planeCoefs(plane)
        .map(v => new java.math.BigDecimal(v).toPlainString)
        .mkString("[", ", ", "]")
    // both sides sliced so the dot runs over min(d, LshMaxDims) dims —
    // exactly the native LshBuckets loop (inert at d = 64, the fixture
    // dim, but keeps the oracle faithful for other dimensionalities)
    def bucketExpr(t: Int): String =
      (0 until Similarity.LshPlanes).map { p =>
        s"""(CASE WHEN list_dot_product(
           |      (CAST(embedding AS DOUBLE[]))[1:${Similarity.LshMaxDims}],
           |      (CAST(${coefArr(t * Similarity.LshPlanes + p)} AS DOUBLE[]))[1:len(embedding)]) > 0
           |    THEN ${1L << p} ELSE 0 END)""".stripMargin
      }.mkString("\n  + ")
    val tableRows = (0 until Similarity.LshTables).map { t =>
      s"""  SELECT vec_id, embedding, $t AS tbl,
         |  ${bucketExpr(t)} AS bucket FROM embeddings""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val probeList = Similarity.probeMasks
      .map(m => s"xor(bucket, $m)").mkString(", ")
    s"""WITH b AS (
       |$tableRows),
       |p AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, tbl AS q_tbl,
       |    unnest([$probeList]) AS probe
       |  FROM b WHERE vec_id < 10),
       |scored AS (
       |  SELECT DISTINCT p.q_id, e.vec_id,
       |    round(${cosSql("p.q_emb", "e.embedding")}, 4) AS cosine
       |  FROM b e JOIN p ON e.tbl = p.q_tbl AND e.bucket = p.probe AND e.vec_id != p.q_id)
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT q_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  private[graft] def annSql(cellRestricted: Boolean, nQueries: Int = 10,
      k: Int = 5): String = {
    val cell = if (cellRestricted) " AND e.label = q.q_label" else ""
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
       |  FROM embeddings WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |    round(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))
       |       * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 4) AS cosine
       |  FROM embeddings e JOIN q ON e.vec_id != q.q_id$cell)
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT q_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }
}
