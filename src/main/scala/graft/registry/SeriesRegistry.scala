package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables
import graft.operators._

/** Registry slice — survival analysis and series-shape operators
  * (Kaplan-Meier / log-rank, SAX, Haar, seasonality strength). Split out
  * of TextAnalysisRegistry for the per-file registry size guard (same
  * conventions; see SparkEntry scaladoc). */
object SeriesRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Kaplan-Meier survival over user lifetimes: right-censored at the
    // final 7 days; exact integer risk-set ratios, running ordered sum
    "q_kaplan_meier" -> ((s, d) =>
      TimeSeries.kaplanMeier(Tables(s, d, "events"))),
    // two-group log-rank: O-E hypergeometric folds over the lifetime
    // census (KM draws the curves, this tests them); odd/even user split
    "q_logrank" -> ((s, d) =>
      TimeSeries.logRankTest(Tables(s, d, "events"))),
    // SAX symbolization of the per-type daily value series: 4-day PAA
    // block sums (exact micros), z via one sqrt over exact HUGEINT
    // moments, quartile-breakpoint alphabet on the rounded z
    "q_sax" -> ((s, d) => TimeSeries.saxSymbols(Tables(s, d, "events"), 4)),
    // Haar wavelet coefficients over the first 16 days per type —
    // UNSCALED integer block sums / contrasts (micros), densified grid,
    // one grid-sized aggregate per level
    "q_haar" -> ((s, d) =>
      TimeSeries.haarCoefficients(Tables(s, d, "events"), 16)),
    // weekly-seasonality strength: variance share explained by
    // day-of-week means — exact moments, divisions on the 7-row census,
    // dow only ever a grouping key (engine numbering irrelevant)
    "q_seasonality_strength" -> ((s, d) =>
      TimeSeries.seasonalityStrength(Tables(s, d, "events"))),
    // seasonal-naive vs naive forecast-skill ratio (the MASE logic) on
    // per-type daily micros — CALENDAR-lag diffs (day−1/day−7 self-
    // joins, honest on sparse series), same-support MAEs, one rounded
    // ratio per series
    "q_mase" -> ((s, d) =>
      TimeSeries.seasonalNaiveMase(Tables(s, d, "events"))),
  )

  def oracleSql: Map[String, String] = Map(
    // calendar-lag naive baselines (self-joins on day − 1 / day − 7);
    // both MAEs over rows with BOTH partners; exact // for the micro MAEs
    "q_mase" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |lagd AS (
        |  SELECT d.event_type,
        |    abs(d.m - p1.m) AS e1,
        |    abs(d.m - p7.m) AS e7
        |  FROM daily d
        |  JOIN daily p1 ON p1.event_type = d.event_type
        |    AND p1.day = d.day - INTERVAL 1 DAY
        |  JOIN daily p7 ON p7.event_type = d.event_type
        |    AND p7.day = d.day - INTERVAL 7 DAY),
        |f AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(e1) AS BIGINT) AS ae1, CAST(sum(e7) AS BIGINT) AS ae7
        |  FROM lagd GROUP BY 1)
        |SELECT event_type, n_days,
        |  ae1 // n_days AS mae_naive_micro,
        |  ae7 // n_days AS mae_snaive_micro,
        |  CASE WHEN ae1 = 0 THEN NULL
        |    ELSE round(CAST(ae7 AS DOUBLE) / ae1, 4) END AS mase_weekly
        |FROM f""".stripMargin,
    // the KM lifetime CTE split odd/even, reverse-cumulative at-risk
    // windows over the census, one sqrt on the one-row output
    "q_logrank" ->
      """WITH horizon AS (SELECT max(ts) AS max_ts FROM events),
        |life AS (
        |  SELECT (user_id % 2 = 1) AS g1,
        |    date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
        |      AS t,
        |    CASE WHEN max(ts) >= (SELECT max_ts FROM horizon)
        |      - INTERVAL 7 DAY THEN 0 ELSE 1 END AS observed
        |  FROM events GROUP BY user_id),
        |sizes AS (
        |  SELECT CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1_users,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n2_users
        |  FROM life),
        |census AS (
        |  SELECT t,
        |    CAST(sum(CASE WHEN g1 THEN observed ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(observed) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM life GROUP BY t),
        |at_risk AS (
        |  SELECT t, d1, d, m1, m,
        |    CAST(sum(m) OVER rev AS BIGINT) AS n,
        |    CAST(sum(m1) OVER rev AS BIGINT) AS n1
        |  FROM census
        |  WINDOW rev AS (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |terms AS (
        |  SELECT d1,
        |    CAST(d AS DOUBLE) * n1 / n AS e1,
        |    CAST(d AS DOUBLE) * n1 / n * (1.0 - CAST(n1 AS DOUBLE) / n)
        |      * CAST(n - d AS DOUBLE) / (n - 1) AS v
        |  FROM at_risk WHERE d > 0 AND n > 1),
        |fold AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS o1, sum(e1) AS e1r,
        |    sum(v) AS vr
        |  FROM terms)
        |SELECT n1_users, n2_users, o1, round(e1r, 4) AS e1,
        |  CASE WHEN vr <= 0.0 THEN NULL
        |    ELSE round((o1 - e1r) / sqrt(vr), 4) END AS z
        |FROM fold, sizes""".stripMargin,
    "q_kaplan_meier" ->
      """WITH horizon AS (SELECT max(ts) AS max_ts FROM events),
        |life AS (
        |  SELECT date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS t,
        |    CASE WHEN max(ts) >= (SELECT max_ts FROM horizon) - INTERVAL 7 DAY
        |         THEN 0 ELSE 1 END AS observed
        |  FROM events GROUP BY user_id),
        |census AS (
        |  SELECT t, CAST(sum(observed) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM life GROUP BY t),
        |at_risk AS (
        |  SELECT t, d, m,
        |    CAST(sum(m) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk
        |  FROM census),
        |deaths AS (
        |  SELECT t, d, n_risk,
        |    CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
        |  FROM at_risk WHERE d > 0)
        |SELECT t AS t_days, n_risk, d AS n_events,
        |  CASE WHEN min(factor) OVER cum = 0 THEN 0.0
        |       ELSE round(exp(sum(ln(factor)) OVER cum), 4) END AS survival
        |FROM deaths
        |WINDOW cum AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |  AND CURRENT ROW)""".stripMargin,
    // same exact-moment R²; dayofweek numbering differs across engines
    // but only partitions the grouping, never the output
    "q_seasonality_strength" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |bydow AS (
        |  SELECT event_type, dayofweek(CAST(day AS DATE)) AS dw,
        |    CAST(count(*) AS BIGINT) AS nw, CAST(sum(m) AS BIGINT) AS sw
        |  FROM daily GROUP BY 1, 2),
        |agg1 AS (
        |  SELECT event_type, CAST(sum(nw) AS BIGINT) AS n,
        |    CAST(sum(sw) AS BIGINT) AS s,
        |    sum(CAST(CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE)
        |      / CAST(nw AS DOUBLE)) AS a
        |  FROM bydow GROUP BY 1),
        |qq AS (
        |  SELECT event_type,
        |    sum(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS q
        |  FROM daily GROUP BY 1),
        |j AS (
        |  SELECT agg1.event_type, n, s, a,
        |    CAST(q AS DOUBLE)
        |      - CAST(CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE) / n
        |      AS sst
        |  FROM agg1 JOIN qq USING (event_type))
        |SELECT event_type, n AS n_days,
        |  CASE WHEN sst <= 0.0 THEN NULL
        |    ELSE round((a
        |      - CAST(CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE) / n)
        |      / sst, 4) END AS r2_weekly
        |FROM j""".stripMargin,
    // densified 16-slot grid, one UNION ALL block per level with the
    // same integer sum/contrast folds
    "q_haar" -> {
      val levels = (1 to 4).map { l =>
        val b = 1 << l
        s"""SELECT event_type, $l AS level, i // $b AS k,
           |  CAST(sum(m) AS BIGINT) AS s_sum,
           |  CAST(sum(CASE WHEN i % $b < ${b / 2} THEN m ELSE -m END)
           |    AS BIGINT) AS d_sum
           |FROM grid GROUP BY 1, 3""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH daily AS (
         |  SELECT event_type, date_trunc('day', ts) AS day,
         |    CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS m
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT min(day) AS day0 FROM daily),
         |idx AS (
         |  SELECT event_type,
         |    CAST(date_diff('day', CAST(day0 AS DATE), CAST(day AS DATE))
         |      AS BIGINT) AS i, m
         |  FROM daily, a
         |  WHERE date_diff('day', CAST(day0 AS DATE), CAST(day AS DATE)) < 16),
         |grid AS (
         |  SELECT t.event_type, s.i, coalesce(idx.m, 0) AS m
         |  FROM (SELECT DISTINCT event_type FROM idx) t
         |  CROSS JOIN (SELECT unnest(range(16)) AS i) s
         |  LEFT JOIN idx ON idx.event_type = t.event_type AND idx.i = s.i)
         |$levels""".stripMargin
    },
    // exact HUGEINT moments per series, z = (xk−S)/√(kQ−S²) with one
    // sqrt, symbols on the ROUNDED z; zero-variance series -> NULLs
    "q_sax" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT min(day) AS day0 FROM daily),
        |paa AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', CAST(day0 AS DATE), CAST(day AS DATE))
        |      AS BIGINT) // 4 AS bucket,
        |    CAST(sum(m) AS BIGINT) AS x
        |  FROM daily, a GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(x) AS BIGINT) AS s,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
        |  FROM paa GROUP BY 1),
        |j AS (
        |  SELECT p.event_type, p.bucket, p.x,
        |    CAST(k AS HUGEINT) * q
        |      - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS den2,
        |    CAST(p.x AS HUGEINT) * k - s AS znum
        |  FROM paa p JOIN stats USING (event_type)),
        |z AS (
        |  SELECT event_type, bucket, x AS paa_micro,
        |    CASE WHEN den2 <= 0 THEN NULL
        |      ELSE round(CAST(znum AS DOUBLE) / sqrt(CAST(den2 AS DOUBLE)), 4)
        |      END AS z
        |  FROM j)
        |SELECT event_type, bucket, paa_micro, z,
        |  CASE WHEN z IS NULL THEN NULL
        |    WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
        |    WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS symbol
        |FROM z""".stripMargin,
  )
}
