"""Search-relevance, time-series-diagnostic, and graph-centrality queries.

Round-5 additions past the reference surface: BM25 retrieval over the
inverted-index corpus (the serving-side twin of tfidf_top_terms /
inverted_index), autocorrelation + CUSUM changepoint diagnostics of the
hourly event series (the detection layer on top of seasonal_decompose /
hourly_trend_ols), and PageRank over the event-type transition graph
(the centrality view of event_transitions / type_reachability).

Reference anchors: the event stream these diagnose is the reference's
recentchange feed (/root/reference/pkg/ingester/ingester.go); the
reference has no search/centrality layer — these extend the rebuild's
LLM-corpus suite.

Float-parity strategy (repo invariant): every accumulation that crosses
an engine boundary is INTEGER — BM25 per-term scores are quantized to
micro-units before the per-doc sum, autocorrelation moments are raw
integer sums of counts, CUSUM works on n·x − T mean-centered integers,
and PageRank iterates in integer nano-prob units with `div`/`//` floor
division. The only float ops are final divisions/sqrt/ln applied in
identical textual order on both engines.

Scale notes: each plan's shuffles are bounded by data keys (doc_id,
event_type × hour) with map-side combine; the hourly series and the
type graph are |types|·|hours| / |types|² bounded, so their joins are
explicitly broadcast; global top-k goes through functions/ranking.py's
global_topk (TakeOrderedAndProject, no single-partition sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark import catalog
from pleiades_spark.functions.hashing import h32, h32_sql
from pleiades_spark.operators.timeseries import QUANTIZE4_SQL, _quantize4
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return catalog.load(spark, sf_dir, name)


# --- BM25 retrieval ------------------------------------------------------

# Frozen query-term set: two high-df terms, two mid, one rare (df≈25 at
# sf0.01) so the idf spread is visible in the ranking.
BM25_TERMS = ("hash", "join", "vector", "scan", "dup")
BM25_K = 10
# k1 frozen at 1.25 (5/4) and b at 0.75 (3/4): binary-exact literals per
# the repo float invariant (k1+1 = 2.25 and 1−b = 0.25 likewise exact).
BM25_K1 = 1.25
BM25_B = 0.75


def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a fixed term set.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + ½)/(df + ½)).

    Parity: dl/avgdl is computed as (dl·N)/tot_tokens so both operands
    of the single float division are exact BIGINTs; each per-term score
    is quantized to integer micro-units BEFORE the per-doc sum, so the
    cross-term accumulation is exact integer addition in both engines.

    Plan: one documents scan → explode filtered to the 5-term literal
    set → (doc, term) tf agg; df and the global (N, tot_tokens) aggs are
    1-to-5-row broadcasts; top-k is TakeOrderedAndProject via
    global_topk (per-partition heaps — no global sort materializes)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    base = docs.select(
        "doc_id", F.size("toks").cast("long").alias("dl"), "toks"
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("tot_tokens"),
    )
    hits = base.select(
        "doc_id",
        "dl",
        F.explode(
            F.array_intersect("toks", F.array(*[F.lit(t) for t in BM25_TERMS]))
        ).alias("term"),
        "toks",
    ).select(
        "doc_id",
        "dl",
        "term",
        F.size(F.filter("toks", lambda x: x == F.col("term")))
        .cast("long")
        .alias("tf"),
    )
    df_tab = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "norm",
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B)
            * ((F.col("dl") * F.col("n_docs")) / F.col("tot_tokens")),
        )
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "su",
            F.floor(
                F.col("idf")
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (F.col("tf") + F.lit(BM25_K1) * F.col("norm"))
                * 1000000
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    from pleiades_spark.functions.ranking import global_topk

    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("su").alias("score_u"),
    )
    return global_topk(
        per_doc, BM25_K, F.col("score_u").desc(), F.col("doc_id").asc(),
        rank_col="rk",
    ).select(
        "rk",
        "doc_id",
        "n_terms_hit",
        (F.col("score_u") / F.lit(1000000.0)).alias("score"),
    )


_BM25_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in BM25_TERMS) + "]"

ORACLE_BM25_RETRIEVAL = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), corpus_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS tot_tokens
  FROM base
), hits AS (
  SELECT doc_id, dl, unnest(list_intersect(toks, {_BM25_TERMS_SQL})) AS term,
         toks
  FROM base
), tf_tab AS (
  SELECT doc_id, dl, term,
         CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
  FROM hits
), df_tab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf_tab GROUP BY term
), scored AS (
  SELECT t.doc_id,
         CAST(floor(
           ln(1.0 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * {BM25_K1 + 1.0})
           / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
              * ((t.dl * g.n_docs) / g.tot_tokens)))
           * 1000000 + 0.5) AS BIGINT) AS su
  FROM tf_tab t JOIN df_tab d ON t.term = d.term CROSS JOIN corpus_stats g
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         CAST(sum(su) AS BIGINT) AS score_u
  FROM scored GROUP BY doc_id
)
SELECT rk, doc_id, n_terms_hit, score_u / 1000000.0 AS score FROM (
  SELECT *, row_number() OVER (ORDER BY score_u DESC, doc_id ASC) AS rk
  FROM per_doc
) WHERE rk <= {BM25_K}
"""


# --- hybrid retrieval: reciprocal-rank fusion ------------------------------

RRF_C = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_TOPK = 10


def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two rankings over the same documents:
    the BM25 relevance list (q_bm25_retrieval's top-10) and a
    document-prior list (top-10 by composite quality score) —
    RRF(d) = Σ_lists 1/(C + rank_d) over the lists that contain d, the
    standard score-free fusion used by hybrid lexical+prior (and
    lexical+vector) retrieval stacks.

    Parity: each list contribution is quantized to integer micro-units
    BEFORE the sum (floor(1e6/(C+r) + 0.5) — r is a small integer, so
    the double division is identical on both engines and the cross-list
    accumulation is exact BIGINT addition; the BM25 score pipeline uses
    the same trick). Fusion ordering uses the integer sum; ties break
    on doc_id.

    Plan: both inputs end in TakeOrderedAndProject top-10s, so the
    fusion is a full-outer join of two ≤10-row frames plus one 20-row
    sort — everything after the two corpus scans is driver-trivial, and
    the scans themselves are the already-audited BM25/quality plans."""
    from pleiades_spark.functions.ranking import global_topk
    from pleiades_spark.plans.llm import q_text_quality

    bm = q_bm25_retrieval(spark, sf_dir).select(
        "doc_id", F.col("rk").alias("r_bm25")
    )
    qr = global_topk(
        q_text_quality(spark, sf_dir).select("doc_id", "quality"),
        RRF_TOPK,
        F.col("quality").desc(),
        F.col("doc_id").asc(),
        rank_col="r_q",
    ).select("doc_id", "r_q")

    def _contrib(rank_col: str):
        return F.coalesce(
            F.floor(
                F.lit(1000000.0) / (F.lit(RRF_C) + F.col(rank_col)) + F.lit(0.5)
            ).cast("long"),
            F.lit(0).cast("long"),
        )

    fused = (
        bm.join(qr, "doc_id", "full")
        .withColumn("rrf_u", _contrib("r_bm25") + _contrib("r_q"))
    )
    return global_topk(
        fused, RRF_TOPK, F.col("rrf_u").desc(), F.col("doc_id").asc(),
        rank_col="rank",
    ).select(
        "rank",
        "doc_id",
        "r_bm25",
        "r_q",
        (F.col("rrf_u") / F.lit(1000000.0)).alias("rrf_score"),
    )


def _oracle_hybrid_rrf() -> str:
    from pleiades_spark.plans.llm import ORACLE_TEXT_QUALITY

    return f"""
WITH bm AS ({ORACLE_BM25_RETRIEVAL}),
q0 AS ({ORACLE_TEXT_QUALITY}),
qr AS (
  SELECT doc_id, r_q FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS r_q
    FROM q0
  ) WHERE r_q <= {RRF_TOPK}
),
fused AS (
  SELECT doc_id,
         bm.rk AS r_bm25, qr.r_q,
         coalesce(CAST(floor(1000000.0 / ({RRF_C} + bm.rk) + 0.5) AS BIGINT), 0)
         + coalesce(CAST(floor(1000000.0 / ({RRF_C} + qr.r_q) + 0.5) AS BIGINT), 0)
           AS rrf_u
  FROM bm FULL JOIN qr USING (doc_id)
)
SELECT rank, doc_id, r_bm25, r_q, rrf_u / 1000000.0 AS rrf_score FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_u DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {RRF_TOPK}
"""


# --- hourly autocorrelation ----------------------------------------------

ACF_LAGS = (1, 2, 3)


def q_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each type's hourly event-count series at lags
    1–3h — the periodicity diagnostic behind seasonal_decompose's fixed
    24h assumption (a flat ACF says don't bother deseasonalizing).

    Pearson r over the (x_h, x_{h+k}) pairs that BOTH exist, paired by
    an explicit h+k equi-join (window lag would silently pair across
    gaps). All five moments are exact BIGINT sums of counts; the only
    float ops are the final sqrt/division, identical on both engines.

    Plan: one (type, hour) agg (map-side combined) → ×3 lag explode →
    self-join on (type, h+k) with the hourly side broadcast (bounded by
    |types|·|hours|, ~3.4k rows at any event volume for a fixed time
    range) → per-(type, lag) agg.

    HARD ASSUMPTION (round-6 advice): the broadcast bound scales with
    HISTORY LENGTH, not event volume — |types|·|hours| ≈ 9·24·days. The
    ~230 MB/decade growth stays inside the default 8 GB driver ceiling
    for any realistic retention, but an unbounded time axis (centuries,
    or second-granularity re-bucketing) must drop the broadcast() hint
    and let AQE pick the join side at runtime — the equi-keys
    (event_type, h+k) make it a plain shuffled hash join then. Same
    caveat applies to q_type_crosscorr and q_rolling_kmv_users' end-day
    broadcast."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    lagged = hourly.withColumn(
        "lag_h", F.explode(F.array(*[F.lit(k) for k in ACF_LAGS]))
    )
    nxt = hourly.select(
        F.col("event_type").alias("et2"), F.col("h").alias("h2"),
        F.col("x").alias("y"),
    )
    pairs = lagged.join(
        F.broadcast(nxt),
        (F.col("event_type") == F.col("et2"))
        & (F.col("h2") == F.col("h") + F.col("lag_h")),
    ).select("event_type", "lag_h", "x", "y")
    # Second-order moments decimal(38,0) BEFORE the sum (the ab_welch
    # overflow class): hourly counts reach ~5e7/type at 100 TB, so Σx²
    # alone passes int64. Exact either way → identical doubles at the
    # final sqrt/divide; the oracle's twin sums are native HUGEINT.
    xd = F.col("x").cast("decimal(38,0)")
    sums = pairs.groupBy("event_type", "lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    d1 = F.col("n") * F.col("sxx") - sxd * F.col("sx")
    d2 = F.col("n") * F.col("syy") - syd * F.col("sy")
    num = F.col("n") * F.col("sxy") - sxd * F.col("sy")
    acf = F.when(
        (d1 > 0) & (d2 > 0),
        F.floor(num / (F.sqrt(d1) * F.sqrt(d2)) * 10000 + F.lit(0.5)) / 10000,
    )
    return sums.select(
        "event_type",
        "lag_h",
        F.col("n").alias("n_pairs"),
        acf.alias("acf"),
    )


ORACLE_HOURLY_AUTOCORR = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, h
), pairs AS (
  SELECT a.event_type, k.lag_h, a.x, b.x AS y
  FROM hourly a
  CROSS JOIN (SELECT unnest({list(ACF_LAGS)}) AS lag_h) k
  JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + k.lag_h
), sums AS (
  SELECT event_type, lag_h, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY event_type, lag_h
)
SELECT event_type, CAST(lag_h AS INT) AS lag_h, n AS n_pairs,
       CASE WHEN (n * sxx - CAST(sx AS HUGEINT) * sx) > 0
             AND (n * syy - CAST(sy AS HUGEINT) * sy) > 0 THEN
         floor((n * sxy - CAST(sx AS HUGEINT) * sy)
               / (sqrt(n * sxx - CAST(sx AS HUGEINT) * sx)
                  * sqrt(n * syy - CAST(sy AS HUGEINT) * sy))
               * 10000 + 0.5) / 10000
       END AS acf
FROM sums
"""


# --- cross-type correlation ----------------------------------------------


def q_type_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between every PAIR of event types' hourly
    count series (hours where both are present) — do clicks and views
    move together, is the error series independent of load? The
    cross-series companion of hourly_autocorr, same exact-integer
    moment machinery.

    Plan: one (type, hour) agg; the pairing self-join is an equi-join on
    the hour with the right side broadcast (|types|·|hours| bounded);
    t1 < t2 keeps each pair once; one tiny per-pair agg.

    Same HARD ASSUMPTION as q_hourly_autocorr (see its docstring): the
    broadcast grows with history length — drop the hint past a
    multi-decade axis and let AQE choose."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    rhs = hourly.select(
        F.col("event_type").alias("t2"), F.col("h").alias("h2"),
        F.col("x").alias("y"),
    )
    pairs = hourly.join(
        F.broadcast(rhs),
        (F.col("h") == F.col("h2")) & (F.col("event_type") < F.col("t2")),
    ).select(F.col("event_type").alias("t1"), "t2", "x", "y")
    # decimal(38,0) second-order moments — see q_hourly_autocorr's note
    xd = F.col("x").cast("decimal(38,0)")
    sums = pairs.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    d1 = F.col("n") * F.col("sxx") - sxd * F.col("sx")
    d2 = F.col("n") * F.col("syy") - syd * F.col("sy")
    num = F.col("n") * F.col("sxy") - sxd * F.col("sy")
    corr = F.when(
        (d1 > 0) & (d2 > 0),
        F.floor(num / (F.sqrt(d1) * F.sqrt(d2)) * 10000 + F.lit(0.5)) / 10000,
    )
    return sums.select(
        "t1", "t2", F.col("n").alias("n_hours"), corr.alias("corr")
    )


ORACLE_TYPE_CROSSCORR = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, h
), pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2, a.x, b.x AS y
  FROM hourly a JOIN hourly b
    ON a.h = b.h AND a.event_type < b.event_type
), sums AS (
  SELECT t1, t2, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY t1, t2
)
SELECT t1, t2, n AS n_hours,
       CASE WHEN (n * sxx - CAST(sx AS HUGEINT) * sx) > 0
             AND (n * syy - CAST(sy AS HUGEINT) * sy) > 0 THEN
         floor((n * sxy - CAST(sx AS HUGEINT) * sy)
               / (sqrt(n * sxx - CAST(sx AS HUGEINT) * sx)
                  * sqrt(n * syy - CAST(sy AS HUGEINT) * sy))
               * 10000 + 0.5) / 10000
       END AS corr
FROM sums
"""


# --- CUSUM changepoint ---------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM over each type's hourly count series: the hour
    where the cumulative upward drift from the series mean peaks — the
    changepoint detector paired with value_anomalies' pointwise z-score.

    The recurrence S_t = max(0, S_{t-1} + (x_t − μ)) is NOT computed
    sequentially: with P_t the prefix sum of (x_t − μ), the closed form
    is S_t = P_t − min(0, min_{j≤t} P_j) — two window passes. To keep
    both engines exact, the series is mean-centered in scaled integers
    v_t = n·x_t − T (n hours, T total), so P, the running min, and S are
    all BIGINT; the single float op is the final S/n division.

    Plan: one (type, hour) agg → whole-partition window for (n, T) →
    two ordered windows + one rank-filtered row_number, all partitioned
    by event_type — no global sort, no shuffle beyond the hourly agg."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wp = W.partitionBy("event_type")
    wo = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    centered = hourly.select(
        "event_type",
        "h",
        F.count(F.lit(1)).over(wp).alias("n"),
        (F.col("x") * F.count(F.lit(1)).over(wp) - F.sum("x").over(wp)).alias(
            "v"
        ),
    )
    pref = centered.withColumn("p", F.sum("v").over(wo)).withColumn(
        "s", F.col("p") - F.least(F.min("p").over(wo), F.lit(0).cast("long"))
    )
    rk = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.col("s").desc(), F.col("h").asc())
    )
    return (
        pref.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("h").alias("changepoint_hour"),
            (F.floor(F.col("s") / F.col("n") * 10000 + F.lit(0.5)) / 10000).alias(
                "max_cusum"
            ),
        )
    )


ORACLE_CUSUM_CHANGEPOINT = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, h
), centered AS (
  SELECT event_type, h,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(x * count(*) OVER (PARTITION BY event_type)
              - sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS v
  FROM hourly
), pref AS (
  SELECT event_type, h, n,
         CAST(sum(v) OVER w AS BIGINT) AS p
  FROM centered
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), scored AS (
  SELECT event_type, h, n,
         p - least(CAST(min(p) OVER w AS BIGINT), 0) AS s
  FROM pref
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, n AS n_hours, h AS changepoint_hour,
       floor(s / n * 10000 + 0.5) / 10000 AS max_cusum
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY s DESC, h ASC) AS rk
  FROM scored
) WHERE rk = 1
"""


# --- PageRank over the type-transition graph -----------------------------

PAGERANK_ITERS = 5
# Damping 7/8 — binary-exact, and 1−d = 1/8 keeps the teleport term an
# integer division (125000000 // N nano-units).
PAGERANK_SCALE = 1_000_000_000


def q_pagerank_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of event types in the consecutive-event
    transition graph — which state the per-user Markov chain
    (event_transitions) concentrates on.

    Fixed 5 power iterations ENTIRELY in integer nano-prob units:
    contribution i→j is (r_u(i)·n(i,j)) div out(i), the new rank is
    125000000 div N + (7·Σ contrib) div 8 — floor division at every
    step, so both engines agree bit-for-bit with no float in the loop
    (mass lost to flooring is deterministic and identical). The oracle
    unrolls the same 5 iterations as chained CTEs.

    Plan: the edge list is |types|² ≤ a few hundred rows (one shuffle to
    build, from a per-user lag window); each iteration is a broadcast
    join + tiny agg. At 100 TB the per-user window dominates; the loop
    itself is constant-size."""
    ev = _t(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = ev.select(
        F.lag("event_type", 1).over(wu).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    # NOT localCheckpoint'd (unlike type_reachability's edge list): the
    # iteration branches share the edge aggregation via ReuseExchange at
    # runtime, and the eager checkpoint jobs measured SLOWER in the
    # bench harness (3.3 s vs 1.7 s at sf0.1) — the corpus-sized window
    # executes once either way.
    edges = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("out_n", F.sum("n").over(W.partitionBy("src")))
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"{PAGERANK_SCALE} div n_nodes").alias("r_u"))
    )
    base = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{PAGERANK_SCALE // 8} div n_nodes").alias("base_u")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = edges.join(
            F.broadcast(ranks), edges.src == ranks.node
        ).select(
            F.col("dst").alias("node"),
            F.expr("(r_u * n) div out_n").alias("c"),
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            base.join(F.broadcast(s), "node", "left")
            .select(
                "node",
                (
                    F.col("base_u")
                    + F.expr("(7 * coalesce(s, 0L)) div 8")
                ).alias("r_u"),
            )
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("r_u").alias("rank_u"),
        (F.col("r_u") / F.lit(float(PAGERANK_SCALE))).alias("pagerank"),
    )


def _pagerank_oracle() -> str:
    its = []
    for k in range(1, PAGERANK_ITERS + 1):
        its.append(
            f"""s{k} AS (
  SELECT e.dst AS node, CAST(sum((r.r_u * e.n) // e.out_n) AS BIGINT) AS s
  FROM eo e JOIN it{k - 1} r ON r.node = e.src GROUP BY e.dst
), it{k} AS (
  SELECT n.node,
         ({PAGERANK_SCALE // 8} // nn.n_nodes)
           + (7 * coalesce(s.s, 0)) // 8 AS r_u
  FROM nodes n CROSS JOIN nn LEFT JOIN s{k} s ON s.node = n.node
)"""
        )
    chain = ", ".join(its)
    return f"""
WITH pairs AS (
  SELECT lag(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS src,
         event_type AS dst
  FROM events
), edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE src IS NOT NULL GROUP BY src, dst
), eo AS (
  SELECT src, dst, n,
         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS out_n
  FROM edges
), nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
it0 AS (
  SELECT node, {PAGERANK_SCALE} // nn.n_nodes AS r_u FROM nodes CROSS JOIN nn
), {chain}
SELECT node AS event_type, CAST(r_u AS BIGINT) AS rank_u,
       r_u / {float(PAGERANK_SCALE)} AS pagerank
FROM it{PAGERANK_ITERS}
"""


ORACLE_PAGERANK_TYPES = _pagerank_oracle()


# --- k-fold cross-validation splits --------------------------------------

KFOLD_K = 5


def q_kfold_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment over documents (fold =
    md5-derived hash of the doc id, mod k — stable across runs,
    engines, and partitionings, like hash_split's train/val/test) plus
    the per-fold balance report a CV harness checks before training:
    fold sizes, token mass, and per-language composition.

    Plan: one map-side fold assignment (no shuffle until the
    (fold, lang) agg), grouping-sets rollup so the per-fold total and
    the per-(fold, lang) rows come from ONE pass."""
    from pleiades_spark.functions.hashing import h32

    docs = _t(spark, sf_dir, "documents")
    folded = docs.select(
        (h32(F.concat(F.lit("fold:"), F.col("doc_id").cast("string")))
         % KFOLD_K).alias("fold"),
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    out = folded.rollup("fold", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    # drop the grand-total row (fold IS NULL): the report is per fold,
    # with lang IS NULL marking each fold's subtotal
    return out.filter(F.col("fold").isNotNull()).select(
        "fold",
        F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
        "n_docs",
        "n_tokens",
    )


ORACLE_KFOLD_SPLITS = f"""
WITH folded AS (
  SELECT {h32_sql("'fold:' || CAST(doc_id AS VARCHAR)")} % {KFOLD_K} AS fold,
         lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT fold, coalesce(lang, 'ALL') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM folded
GROUP BY ROLLUP (fold, lang)
HAVING fold IS NOT NULL
"""


# Co-occurrence edge threshold as a corpus FRACTION (pairs sharing ≥60%
# of docs): an absolute count degenerates with corpus size (at sf0.1
# every hub pair clears any small constant and the graph is a complete
# clique); the fraction keeps the same non-trivial graph shape at every
# SF. Integer comparison (100·count ≥ 60·n_docs) — no float threshold.
# Shared by token_triangles and token_communities.
COOC_MIN_PCT = 60


# --- label-propagation communities ---------------------------------------

LPA_ITERS = 3


def q_token_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the token co-occurrence graph by
    synchronous label propagation: each node starts as its own label;
    each round it adopts the label with the highest total edge weight
    among its neighbors (ties → lexicographically smallest label;
    isolated nodes keep their own). Fixed 3 rounds, fully deterministic
    — the community layer between connected components (too coarse:
    one giant component) and triangles (too local).

    Plan: the corpus-sized pair aggregation builds the
    vocabulary-bounded weighted edge list ONCE; each round is a
    broadcast join + (node, label) weight agg + per-node rank-1 argmax
    (partitioned window). The oracle unrolls the same 3 rounds.

    Scale: label state is |nodes| rows; per-round cost is |edges| —
    both vocabulary-bounded here. On a billion-node graph the same loop
    runs with hash joins instead of broadcasts; the synchronous
    update rule is what makes the result partition-independent."""
    docs = _t(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    arrs = docs.select(
        F.array_sort(F.array_distinct(F.split("text", " "))).alias("arr")
    )
    pairs = arrs.select(
        F.explode(
            F.flatten(
                F.transform(
                    "arr",
                    lambda x, i: F.transform(
                        F.slice(F.col("arr"), i + F.lit(2), F.size(F.col("arr"))),
                        lambda y: F.struct(x.alias("t1"), y.alias("t2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    # localCheckpoint: the symmetric union references `und` twice and the
    # loop re-references the union 3× — the corpus-sized pair explode
    # lands in branches ReuseExchange does not fully cover (measured
    # 4.7 s vs 2.4 s at sf0.1). The checkpointed frame is
    # vocabulary²-bounded. eager=False keeps plan-only paths job-free
    # (materializes on first action; non-reliable on executor loss —
    # see type_reachability's note).
    und = (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("w"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("w") * 100 >= F.lit(COOC_MIN_PCT) * F.col("n_docs"))
        .select("t1", "t2", "w")
        .localCheckpoint(eager=False)
    )
    edges = und.select(
        F.col("t1").alias("src"), F.col("t2").alias("dst"), "w"
    ).unionAll(und.select(F.col("t2").alias("src"), F.col("t1").alias("dst"), "w"))
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("lab"))
    for _ in range(LPA_ITERS):
        scores = (
            edges.join(
                F.broadcast(labels.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.sum("w").alias("tw"))
        )
        rk = F.row_number().over(
            W.partitionBy("node").orderBy(F.col("tw").desc(), F.col("lab").asc())
        )
        best = scores.withColumn("rn", rk).filter(F.col("rn") == 1).select(
            "node", F.col("lab").alias("new_lab")
        )
        # localCheckpoint per round: iteration k references labels k-1
        # TWICE (scores + old_lab) and the epilogue twice more, so the
        # lazy chain re-executed ~2^k copies of every earlier round
        # (2167-line plan, 144 exchanges at 3 rounds). Labels are
        # |nodes| rows — materializing each round is vocabulary-bounded
        # and keeps per-round cost at |edges| as the docstring promises.
        labels = (
            nodes.join(F.broadcast(best), "node", "left")
            .join(
                F.broadcast(
                    labels.select("node", F.col("lab").alias("old_lab"))
                ),
                "node",
            )
            .select(
                "node", F.coalesce("new_lab", "old_lab").alias("lab")
            )
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("community_size"))
    return (
        labels.join(F.broadcast(sizes), "lab")
        .select(
            F.col("node").alias("token"),
            F.col("lab").alias("community"),
            "community_size",
        )
    )


def _lpa_oracle() -> str:
    its = []
    for k in range(1, LPA_ITERS + 1):
        its.append(f"""s{k} AS (
  SELECT e.dst AS node, l.lab AS lab, CAST(sum(e.w) AS BIGINT) AS tw
  FROM edges e JOIN it{k - 1} l ON l.node = e.src GROUP BY e.dst, l.lab
), b{k} AS (
  SELECT node, lab AS new_lab FROM (
    SELECT node, lab, row_number() OVER (PARTITION BY node
           ORDER BY tw DESC, lab ASC) AS rn
    FROM s{k}
  ) WHERE rn = 1
), it{k} AS (
  SELECT n.node, coalesce(b.new_lab, p.lab) AS lab
  FROM nodes n LEFT JOIN b{k} b ON b.node = n.node
  JOIN it{k - 1} p ON p.node = n.node
)""")
    chain = ", ".join(its)
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), pairs AS (
  SELECT a.t AS t1, b.t AS t2
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
), und AS (
  SELECT t1, t2, CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY t1, t2
  HAVING count(*) * 100 >= {COOC_MIN_PCT} * (SELECT count(*) FROM documents)
), edges AS (
  SELECT t1 AS src, t2 AS dst, w FROM und
  UNION ALL SELECT t2 AS src, t1 AS dst, w FROM und
), nodes AS (SELECT DISTINCT src AS node FROM edges),
it0 AS (SELECT node, node AS lab FROM nodes), {chain}
SELECT l.node AS token, l.lab AS community, s.community_size
FROM it{LPA_ITERS} l JOIN (
  SELECT lab, CAST(count(*) AS BIGINT) AS community_size
  FROM it{LPA_ITERS} GROUP BY lab
) s ON s.lab = l.lab
"""


ORACLE_TOKEN_COMMUNITIES = _lpa_oracle()


# --- LSH recall audit ----------------------------------------------------

AUDIT_N = 500


def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honesty metric for the MinHash-LSH dedup path, inside the
    hash gate itself: on a FIXED-SIZE deterministic sample (bottom-500
    docs by audit hash — TakeOrderedAndProject, so the audit costs the
    same at any corpus size), compare the pairs the banded LSH pipeline
    verifies against ALL true pairs at the same Jaccard threshold.
    recall_pct = LSH-found / true; the quadratic exact side is bounded
    to C(500,2) pairs by construction, never corpus-sized (this is the
    gate-registry twin of tests/test_ann_recall.py's audits).

    Both sides round jaccard to 6 before the threshold compare, exactly
    as the LSH verify step does, so boundary pairs classify identically
    across engines."""
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.functions.text import word_shingles
    from pleiades_spark.operators.dedup import minhash_lsh_pairs
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD

    docs = _t(spark, sf_dir, "documents")
    # localCheckpoint: `sample` feeds FOUR branches (shingle sides a/b,
    # the LSH pipeline, the n_docs count) and is a global TakeOrdered
    # over the whole corpus — lazily it re-ran that full scan per branch
    # (the r12 plan showed 11 parquet scans). 500 rows materialize for
    # the price of one scan; the audit hash order is total (ah, doc_id),
    # so the materialized sample is deterministic.
    sample = (
        docs.withColumn(
            "ah", h32(F.concat(F.lit("audit:"), F.col("doc_id").cast("string")))
        )
        .orderBy(F.col("ah").asc(), F.col("doc_id").asc())
        .limit(AUDIT_N)
        .select("doc_id", "text")
        .localCheckpoint()
    )
    shs = sample.select(
        "doc_id",
        word_shingles(F.col("text")).alias("sh"),
    ).withColumn("ns", F.size("sh"))
    # repartition spreads the bounded nested loop over the cores (the
    # broadcast side streams against ONE 500-row partition otherwise —
    # a single-task 125k-pair stage); the shuffle moves ≤ AUDIT_N rows.
    a = shs.select(
        F.col("doc_id").alias("da"), F.col("sh").alias("sh_a"),
        F.col("ns").alias("na"),
    ).repartition(32)
    b = shs.select(
        F.col("doc_id").alias("db"), F.col("sh").alias("sh_b"),
        F.col("ns").alias("nb"),
    )
    # bounded all-pairs: both sides are ≤ AUDIT_N rows by construction,
    # so the nested-loop inequality join is a constant ≤ C(500,2) pairs.
    # |A∪B| = |A|+|B|−|A∩B| (shingle arrays are distinct sets), so the
    # union is never materialized — same integer operands, same double.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    exact = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .withColumn("ni", inter)
        .withColumn(
            "jaccard",
            F.round(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 6),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    n_true = exact.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    n_lsh = minhash_lsh_pairs(sample, JACCARD_THRESHOLD).agg(
        F.count(F.lit(1)).alias("n_lsh_pairs")
    )
    n_docs = sample.agg(F.count(F.lit(1)).alias("n_docs_sampled"))
    out = n_docs.crossJoin(n_true).crossJoin(n_lsh)
    recall = F.when(
        F.col("n_true_pairs") > 0,
        F.floor(
            F.col("n_lsh_pairs") / F.col("n_true_pairs") * 100 * 10000
            + F.lit(0.5)
        )
        / 10000,
    )
    return out.select(
        "n_docs_sampled", "n_true_pairs", "n_lsh_pairs",
        recall.alias("recall_pct"),
    )


def _lsh_audit_oracle() -> str:
    from pleiades_spark.functions.text import word_shingles_sql
    from pleiades_spark.plans.llm import (
        _BANDS_RANGE_SQL,
        _SIG_SQL,
        JACCARD_THRESHOLD,
    )
    from pleiades_spark.functions.hashing import LSH_ROWS

    return f"""
WITH samp AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (
             ORDER BY {h32_sql("'audit:' || CAST(doc_id AS VARCHAR)")} ASC,
                      doc_id ASC) AS rn
    FROM documents
  ) WHERE rn <= {AUDIT_N}
), sh AS (
  SELECT doc_id, {word_shingles_sql('text')} AS sh FROM samp
), exact AS (
  SELECT da, db FROM (
    SELECT a.doc_id AS da, b.doc_id AS db,
           len(list_intersect(a.sh, b.sh)) AS ni,
           len(a.sh) AS na, len(b.sh) AS nb
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE round(ni * 1.0 / (na + nb - ni), 6) >= {JACCARD_THRESHOLD}
), hashed AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM hashed
), bands AS (
  SELECT doc_id, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), lsh AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(a.sh, b.sh)) AS ni,
           len(a.sh) AS na, len(b.sh) AS nb
    FROM cand JOIN sh a ON a.doc_id = cand.doc_a
              JOIN sh b ON b.doc_id = cand.doc_b
  ) WHERE round(ni * 1.0 / (na + nb - ni), 6) >= {JACCARD_THRESHOLD}
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM samp) AS n_docs_sampled,
       (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_true_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh_pairs,
       CASE WHEN (SELECT count(*) FROM exact) > 0 THEN
         floor((SELECT count(*) FROM lsh) * 1.0
               / (SELECT count(*) FROM exact) * 100 * 10000 + 0.5) / 10000
       END AS recall_pct
"""


ORACLE_LSH_RECALL_AUDIT = _lsh_audit_oracle()


# --- rolling-window distinct via mergeable KMV ---------------------------

ROLLING_KMV_K = 64
ROLLING_KMV_DAYS = 7


def q_rolling_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per window-end day, twice: the exact
    count (the expensive path a 100 TB deployment drops) and the KMV
    bottom-k estimate — the mergeable-sketch form of "rolling weekly
    uniques", the classic metric exact distinct cannot serve at scale
    because COUNT(DISTINCT) over sliding windows recomputes per window.

    KMV here is deterministic cross-engine (md5-derived h32, estimate
    (k−1)/h_(k) replayed bit-for-bit by the oracle, exact below k). The
    (day, user) de-dup collapses the corpus first; each day then fans
    out to its ≤7 covering windows, and the per-window bottom-k is a
    rank-filtered window PARTITIONED by window end (WindowGroupLimit:
    per-window heaps of k hashes — never a full sort of the user set).

    Scale: state per window is k·8 bytes; the only corpus-sized shuffle
    is the (day, user) distinct. The exact column's cost is the point —
    it rides the same fan-out here for auditability, and the |err_pct|
    column shows the sketch honest (~1/√k ≈ 12.5 % error bound)."""
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.operators.sketch import KMV_K  # noqa: F401  (doc link)

    ev = _t(spark, sf_dir, "events")
    day_user = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
            F.col("user_id"),
        )
        .distinct()
        .withColumn("h", h32(F.col("user_id").cast("string")))
    )
    # a (day, user) pair is visible to windows ending day .. day+6 that
    # actually exist in the data — explode the 7 candidate ends per row
    # (constant fan-out) and EQUI-join the observed end-days broadcast:
    # the inequality-join form would compare every row against every
    # end-day (rows × |days| nested-loop work once the time axis grows),
    # where this is rows × 7 at any history length. The ends broadcast
    # is ONE bigint per retained day (~3 KB/decade) — the same
    # history-length-bounded assumption as q_hourly_autocorr's docstring,
    # with orders of magnitude more headroom.
    ends = day_user.select(F.col("day").alias("wend")).distinct()
    fan = day_user.withColumn(
        "wend",
        F.explode(F.sequence(F.col("day"), F.col("day") + ROLLING_KMV_DAYS - 1)),
    ).join(F.broadcast(ends), "wend")
    # distinct users per window (a user may appear on several days)
    wu = fan.select("wend", "user_id", "h").distinct()
    # KMV ranks DISTINCT HASH values (round-6 advice fix): two users
    # colliding on the 32-bit h previously occupied two bottom-k slots,
    # biasing the estimator relative to the (k-1)/h_(k) theory, which is
    # defined on the hash SET. dense_rank gives the distinct-h semantics
    # in the SAME single window pass row_number used (equal h share a
    # rank; countDistinct collapses them in the aggregate) — no second
    # corpus-sized distinct. exact_users still counts users.
    rk = F.dense_rank().over(W.partitionBy("wend").orderBy(F.col("h").asc()))
    bottomk = wu.withColumn("rn", rk).filter(F.col("rn") <= ROLLING_KMV_K)
    sk = bottomk.groupBy("wend").agg(
        F.countDistinct("h").alias("n_min"), F.max("h").alias("h_k")
    )
    exact = wu.groupBy("wend").agg(F.count(F.lit(1)).alias("exact_users"))
    est = F.when(
        F.col("n_min") < ROLLING_KMV_K, F.col("n_min").cast("double")
    ).otherwise(
        (F.lit(ROLLING_KMV_K - 1))
        / (F.col("h_k") / F.lit(4294967296.0))
    )
    joined = sk.join(exact, "wend")
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return joined.select(
        F.col("wend").alias("window_end_day"),
        "exact_users",
        q4(est).alias("kmv_estimate"),
        q4((est - F.col("exact_users")) / F.col("exact_users") * 100).alias(
            "err_pct"
        ),
    )


ORACLE_ROLLING_KMV_USERS = f"""
WITH day_user AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
), hashed AS (
  SELECT day, user_id, {h32_sql("CAST(user_id AS VARCHAR)")} AS h FROM day_user
), ends AS (SELECT DISTINCT day AS wend FROM day_user),
fan AS (
  SELECT e.wend, d.user_id, d.h
  FROM hashed d JOIN ends e
    ON e.wend >= d.day AND e.wend < d.day + {ROLLING_KMV_DAYS}
), wu AS (SELECT DISTINCT wend, user_id, h FROM fan),
bottomk AS (
  SELECT wend, h FROM (
    SELECT wend, h, dense_rank() OVER (PARTITION BY wend
           ORDER BY h ASC) AS rn
    FROM wu
  ) WHERE rn <= {ROLLING_KMV_K}
), sk AS (
  SELECT wend, count(DISTINCT h) AS n_min, CAST(max(h) AS BIGINT) AS h_k
  FROM bottomk GROUP BY wend
), exact AS (
  SELECT wend, CAST(count(*) AS BIGINT) AS exact_users FROM wu GROUP BY wend
)
SELECT s.wend AS window_end_day, e.exact_users,
       floor((CASE WHEN s.n_min < {ROLLING_KMV_K}
                   THEN CAST(s.n_min AS DOUBLE)
                   ELSE {ROLLING_KMV_K - 1} / (s.h_k / 4294967296.0) END)
             * 10000 + 0.5) / 10000 AS kmv_estimate,
       floor(((CASE WHEN s.n_min < {ROLLING_KMV_K}
                    THEN CAST(s.n_min AS DOUBLE)
                    ELSE {ROLLING_KMV_K - 1} / (s.h_k / 4294967296.0) END
               - e.exact_users) / e.exact_users * 100)
             * 10000 + 0.5) / 10000 AS err_pct
FROM sk s JOIN exact e ON s.wend = e.wend
"""


# --- seasonal-adjusted anomalies -----------------------------------------

SEASONAL_ANOM_K = 3


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k anomalous hours per type AFTER seasonal adjustment: rank
    |residual| from the additive decomposition
    (operators/timeseries.seasonal_decompose_hourly) instead of the raw
    value — catches the 2pm spike that a raw z-score
    (value_anomalies) hides inside the daily cycle, and ignores the
    nightly dip that a raw score would flag every day.

    Residuals are already deterministic integers-over-2500 quantized to
    4 decimals on both engines, so |resid| ranking ties break
    identically; the top-k window is partitioned by event_type with a
    rank filter (WindowGroupLimit — per-type heaps over the
    hours-bounded decomposition output)."""
    from pleiades_spark.operators.timeseries import seasonal_decompose_hourly

    dec = seasonal_decompose_hourly(_t(spark, sf_dir, "events"))
    w = W.partitionBy("event_type").orderBy(
        F.abs(F.col("resid")).desc(), F.col("hour").asc()
    )
    return (
        dec.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SEASONAL_ANOM_K)
        .select("event_type", "rk", "hour", "hour_value", "trend", "resid")
    )


def _seasonal_anomalies_oracle() -> str:
    from pleiades_spark.plans.pleiades import ORACLE_SEASONAL_DECOMPOSE

    return f"""
WITH dec AS ({ORACLE_SEASONAL_DECOMPOSE})
SELECT event_type, rk, hour, hour_value, trend, resid FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY abs(resid) DESC, hour ASC) AS rk
  FROM dec
) WHERE rk <= {SEASONAL_ANOM_K}
"""


ORACLE_SEASONAL_ANOMALIES = _seasonal_anomalies_oracle()


# --- CDC / MERGE apply ---------------------------------------------------


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics in plain DataFrame ops: apply a change feed
    (upserts + deletes, last-writer-wins per key) to the orders base
    table — the SCD1 counterpart of scd2_user_state, and the batch core
    of any CDC ingestion pipeline.

    The change feed derives deterministically from events: each event
    targets order key (event_id·7919) mod 60000 + 1 (7919 prime spreads
    keys), user_id%10 ≥ 8 means delete, else upsert with price
    round(value·100, 2). Last change per key = one (ts, event_id)-ordered
    row_number partitioned BY KEY — never a global sort. The apply is a
    single full-outer join on the key:

      base ⋉ no change        → keep base row            (src 'base')
      base + upsert           → new values               (src 'updated')
      no base + upsert        → insert                   (src 'inserted')
      delete (base or not)    → row absent

    Scale: both sides shuffle once on the natural merge key (exactly the
    co-partitioning a bucketed base table would make shuffle-free); the
    change feed collapses to ≤ one row per key before the join."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("base_status"),
        F.col("o_totalprice").alias("base_price"),
    )
    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        ((F.col("event_id") * 7919) % 60000 + 1).alias("k"),
        "ts",
        "event_id",
        (F.col("user_id") % 10 >= 8).alias("is_delete"),
        F.round(F.col("value") * 100, 2).alias("new_price"),
    )
    wk = W.partitionBy("k").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    last = (
        changes.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("k", "is_delete", "new_price")
    )
    merged = orders.join(last, orders.o_orderkey == last.k, "full_outer")
    alive = merged.filter(
        (F.col("is_delete").isNull() | ~F.col("is_delete"))
        & (F.col("o_orderkey").isNotNull() | F.col("k").isNotNull())
    )
    return alive.select(
        F.coalesce(F.col("o_orderkey"), F.col("k")).alias("okey"),
        F.when(F.col("k").isNull(), F.col("base_status"))
        .otherwise(F.lit("O"))
        .alias("status"),
        F.round(
            F.coalesce(F.col("new_price"), F.col("base_price")), 2
        ).alias("price"),
        F.when(F.col("k").isNull(), F.lit("base"))
        .when(F.col("o_orderkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("src"),
    )


ORACLE_CDC_APPLY = """
WITH changes AS (
  SELECT (event_id * 7919) % 60000 + 1 AS k, ts, event_id,
         (user_id % 10 >= 8) AS is_delete,
         round(value * 100, 2) AS new_price
  FROM events
), last AS (
  SELECT k, is_delete, new_price FROM (
    SELECT *, row_number() OVER (PARTITION BY k
              ORDER BY ts DESC, event_id DESC) AS rn
    FROM changes
  ) WHERE rn = 1
), merged AS (
  SELECT o.o_orderkey, o.o_orderstatus AS base_status,
         o.o_totalprice AS base_price, l.k, l.is_delete, l.new_price
  FROM orders o FULL OUTER JOIN last l ON o.o_orderkey = l.k
)
SELECT coalesce(o_orderkey, k) AS okey,
       CASE WHEN k IS NULL THEN base_status ELSE 'O' END AS status,
       round(coalesce(new_price, base_price), 2) AS price,
       CASE WHEN k IS NULL THEN 'base'
            WHEN o_orderkey IS NULL THEN 'inserted'
            ELSE 'updated' END AS src
FROM merged
WHERE (is_delete IS NULL OR NOT is_delete)
  AND (o_orderkey IS NOT NULL OR k IS NOT NULL)
"""


# --- token co-occurrence triangles ---------------------------------------

def q_token_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the token co-occurrence graph (edges = token
    pairs sharing ≥ COOC_MIN_PCT% of documents): edge/wedge/triangle
    counts and the global clustering coefficient 3·T/W — the graph-shape
    statistic behind topic-coherence and stopword-hub detection.

    Scale design: pair generation is ROW-LOCAL (each doc's sorted
    distinct-token array emits its own pairs via one nested transform —
    no doc-keyed self-join), bounded by doc length, feeding one
    map-side-combined (t1, t2) count. Triangle counting uses the
    DEGREE-ORIENTED join: each edge points from its lower-(deg, token)
    endpoint to the higher, so every out-neighborhood is O(√m) even at
    hub tokens, and each triangle is counted exactly once as
    a→b, a→c, b→c. The degree table is vocabulary-bounded and
    broadcast. All counts integer; the coefficient is the single float
    division, quantized identically on both engines."""
    docs = _t(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    arrs = docs.select(
        F.array_sort(F.array_distinct(F.split("text", " "))).alias("arr")
    )
    pairs = arrs.select(
        F.explode(
            F.flatten(
                F.transform(
                    "arr",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("arr"),
                            i + F.lit(2),
                            F.size(F.col("arr")),
                        ),
                        lambda y: F.struct(
                            x.alias("t1"), y.alias("t2")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    # The edge list feeds FIVE downstream branches (degree union ×2,
    # orientation, closure, edge count). The corpus-sized pair
    # aggregation is NOT recomputed per branch: its shuffle is identical
    # in every branch, so ReuseExchange shares it at runtime (verified:
    # 16 ReusedExchange nodes in the executed plan; an explicit .cache()
    # measured SLOWER here by serializing the branch fan-out).
    edges = (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("ndocs") * 100 >= F.lit(COOC_MIN_PCT) * F.col("n_docs"))
        .select("t1", "t2", "ndocs")
    )
    deg = (
        edges.select(F.col("t1").alias("t"))
        .unionAll(edges.select(F.col("t2").alias("t")))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: src = smaller (deg, token), dst = larger — carry dst's key
    keyed = (
        edges.join(F.broadcast(deg).withColumnRenamed("t", "t1"), "t1")
        .withColumnRenamed("deg", "d1")
        .join(
            F.broadcast(deg).withColumnRenamed("t", "t2").withColumnRenamed(
                "deg", "d2"
            ),
            "t2",
        )
    )
    a_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("t1")).otherwise(F.col("t2")).alias("src"),
        F.when(a_first, F.col("t2")).otherwise(F.col("t1")).alias("dst"),
        F.when(a_first, F.col("d2")).otherwise(F.col("d1")).alias("dd"),
    )
    e2 = oriented.select(
        F.col("src").alias("src2"),
        F.col("dst").alias("dst2"),
        F.col("dd").alias("dd2"),
    )
    wedges2 = oriented.join(e2, F.col("src") == F.col("src2")).filter(
        (F.col("dd") < F.col("dd2"))
        | ((F.col("dd") == F.col("dd2")) & (F.col("dst") < F.col("dst2")))
    )
    closing = oriented.select(
        F.col("src").alias("cv"), F.col("dst").alias("cw")
    )
    tri = wedges2.join(
        closing,
        (F.col("dst") == F.col("cv")) & (F.col("dst2") == F.col("cw")),
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / F.lit(2))
            .cast("long")
            .alias("n_wedges"),
        )
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri)
    )
    clustering = F.when(
        F.col("n_wedges") > 0,
        F.floor(
            (F.lit(3) * F.col("n_triangles")) / F.col("n_wedges") * 10000
            + F.lit(0.5)
        )
        / 10000,
    )
    return stats.select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        clustering.alias("global_clustering"),
    )


ORACLE_TOKEN_TRIANGLES = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), pairs AS (
  SELECT a.t AS t1, b.t AS t2
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
), edges AS (
  SELECT t1, t2, count(*) AS ndocs FROM pairs GROUP BY t1, t2
  HAVING count(*) * 100 >= {COOC_MIN_PCT} * (SELECT count(*) FROM documents)
), deg AS (
  SELECT t, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT t1 AS t FROM edges UNION ALL SELECT t2 AS t FROM edges
  ) GROUP BY t
), keyed AS (
  SELECT e.t1, e.t2, d1.deg AS d1, d2.deg AS d2,
         (d1.deg < d2.deg OR (d1.deg = d2.deg AND e.t1 < e.t2)) AS a_first
  FROM edges e
  JOIN deg d1 ON d1.t = e.t1
  JOIN deg d2 ON d2.t = e.t2
), oriented AS (
  SELECT CASE WHEN a_first THEN t1 ELSE t2 END AS src,
         CASE WHEN a_first THEN t2 ELSE t1 END AS dst,
         CASE WHEN a_first THEN d2 ELSE d1 END AS dd
  FROM keyed
), tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM oriented w1 JOIN oriented w2
    ON w1.src = w2.src
   AND (w1.dd < w2.dd OR (w1.dd = w2.dd AND w1.dst < w2.dst))
  WHERE EXISTS (
    SELECT 1 FROM oriented c WHERE c.src = w1.dst AND c.dst = w2.dst
  )
), stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
         (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
         (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
         (SELECT n_triangles FROM tri) AS n_triangles
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0 THEN
         floor((3 * n_triangles) / n_wedges * 10000 + 0.5) / 10000
       END AS global_clustering
FROM stats
"""


# --- Holt linear smoothing ----------------------------------------------


def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential level/trend + 24h forecast per event type
    (operators/timeseries.holt_linear_hourly; recursive-CTE oracle).
    See the operator docstring for the float-parity argument."""
    from pleiades_spark.operators.timeseries import holt_linear_hourly

    return holt_linear_hourly(_t(spark, sf_dir, "events"))


ORACLE_HOLT_LINEAR = """
WITH RECURSIVE hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(round(sum(value) * 100, 0) AS BIGINT) AS hv
  FROM events GROUP BY event_type, h
), ordered AS (
  SELECT event_type, hv / 100.0 AS y,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hourly
), rec AS (
  SELECT event_type, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.rn,
         0.5 * o.y + 0.5 * (r.l + r.b) AS l,
         0.5 * ((0.5 * o.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b AS b
  FROM rec r JOIN ordered o
    ON o.event_type = r.event_type AND o.rn = r.rn + 1
), last AS (
  SELECT event_type, rn, l, b,
         row_number() OVER (PARTITION BY event_type ORDER BY rn DESC) AS rk
  FROM rec
)
SELECT event_type, rn AS n_hours,
       floor(l * 10000 + 0.5) / 10000 AS level,
       floor(b * 10000 + 0.5) / 10000 AS trend,
       floor((l + 24.0 * b) * 10000 + 0.5) / 10000 AS forecast_24h
FROM last WHERE rk = 1
"""


# --- last-touch channel attribution ----------------------------------------


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the most
    recent PRIOR non-purchase event (the "channel") of the same user;
    per-channel credited conversions + revenue. The marketing-analytics
    sibling of funnel_conversion, same one-shuffle discipline.

    Plan: running last non-purchase event_type over the growing
    [unboundedPreceding, -1] frame with ignorenulls (incremental O(n) —
    the shrinking-frame variant is the CLAUDE.md O(n²) trap), filter to
    purchases, one tiny per-channel agg riding the same user_id
    partitioning's output.
    """
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touched = ev.select("user_id", "ts", "event_id", "event_type", "value")
    touched = touched.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        touched.filter(
            (F.col("event_type") == "purchase") & F.col("channel").isNotNull()
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("value"), 4).alias("credited_value"),
        )
    )


ORACLE_ATTRIBUTION_LAST_TOUCH = """
WITH touched AS (
  SELECT user_id, ts, event_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
       round(sum(value), 4) AS credited_value
FROM touched
WHERE event_type = 'purchase' AND channel IS NOT NULL
GROUP BY channel
"""


# --- A/B experiment readout (Welch's t) -----------------------------------

# Experiment salt: prefixing the unit id before hashing gives every
# experiment an independent pseudo-random split from the same user
# population (the standard hash-based bucketing used by large A/B
# platforms; re-salting = re-randomizing).
AB_SALT = "exp1:"


def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash-based 50/50 variant
    assignment per user, then per event_type a Welch's unequal-variance
    t-test on `value` — sample sizes, arm means, t statistic and
    Welch–Satterthwaite degrees of freedom.

    The experimentation layer every event pipeline grows: the reference
    stops at counter rollups (pkg/aggregator/); this adds the readout a
    product team runs on the same stream.

    Float parity (repo invariant): `value` has 2-decimal fixture values,
    so all moments are EXACT integer-cent sums (n, Σc, Σc²) — the only
    float ops are the final divisions/sqrt in identical textual order on
    both engines, then the floor quantizer. t and df are scale-invariant,
    so computing them in cents equals computing them in units.

    Integer width: the per-arm SUMS stay comfortably in int64, but their
    second-order combinations do not — (Σc)² overflows long already at
    sf10 (4·10⁹ cents squared; caught by the sf10 bench, round 7) — so
    n·Σc² − (Σc)² is computed in decimal(38,0) on the Spark side and
    HUGEINT in DuckDB (both exact), cast to double only for the final
    division chain.

    Plan: one map-side-combined groupBy(event_type) with conditional
    aggregation — the two arms pivot inside ONE shuffle of 6 long
    columns; no join, no second pass. Assignment is a per-row md5 (JVM
    codegen); at 100 TB this is a single pass + a |types|-row reduce.
    """
    ev = _t(spark, sf_dir, "events")
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "event_type", arm.alias("arm"), cents.alias("c"),
        (cents * cents).alias("c2"),
    )
    return _welch_from_base(base)


def ab_arm_col() -> "F.Column":
    """Deterministic 50/50 arm for a row's user_id (0=control)."""
    return h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2


def ab_cents_col() -> "F.Column":
    """Exact integer-cent image of the value column."""
    return F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")


def welch_moment_aggs() -> list:
    """The six per-type arm-moment aggregates over (arm, c, c²) rows —
    a commutative monoid, so the SAME aggregation runs batch (one
    shuffle) or streaming (update-mode incremental state)."""
    is_c = F.col("arm") == 0
    return [
        F.sum(F.when(is_c, F.lit(1)).otherwise(F.lit(0))).alias("n_c"),
        F.sum(F.when(is_c, F.col("c")).otherwise(F.lit(0))).alias("s_c"),
        F.sum(F.when(is_c, F.col("c2")).otherwise(F.lit(0))).alias("ss_c"),
        F.sum(F.when(~is_c, F.lit(1)).otherwise(F.lit(0))).alias("n_t"),
        F.sum(F.when(~is_c, F.col("c")).otherwise(F.lit(0))).alias("s_t"),
        F.sum(F.when(~is_c, F.col("c2")).otherwise(F.lit(0))).alias("ss_t"),
    ]


def _welch_from_base(base: DataFrame, extra_aggs=(), extra_cols=()) -> DataFrame:
    """Shared Welch core: (event_type, arm, c, c²) rows → per-type arm
    moments in one conditional-agg shuffle → t / Satterthwaite df.
    ab_winsorized reuses it on the capped metric (extra_aggs/extra_cols
    pass its cap column through); streaming_ab_welch reuses welch_stats
    on its incrementally-maintained moment state."""
    g = base.groupBy("event_type").agg(*welch_moment_aggs(), *extra_aggs)
    return welch_stats(g, extra_cols=extra_cols)


def welch_stats(g: DataFrame, extra_cols=()) -> DataFrame:
    """t / Satterthwaite df from a (event_type, n_c, s_c, ss_c, n_t,
    s_t, ss_t) moment frame — however those moments were maintained."""
    n_c, s_c, ss_c = F.col("n_c"), F.col("s_c"), F.col("ss_c")
    n_t, s_t, ss_t = F.col("n_t"), F.col("s_t"), F.col("ss_t")
    # Sample variance from exact integer moments: (n·Σc² − (Σc)²)/n/(n−1).
    # Guarded per arm (ANSI divide-by-zero): a NULL variance propagates
    # NULL through a/b and the t/df CASEs without tripping the divides.
    # The moment combination runs in decimal(38,0) — (Σc)² overflows
    # int64 at sf10 already.
    d = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    var_c = F.when(
        n_c > 1,
        (d(n_c) * d(ss_c) - d(s_c) * d(s_c)).cast("double") / n_c / (n_c - 1),
    )
    var_t = F.when(
        n_t > 1,
        (d(n_t) * d(ss_t) - d(s_t) * d(s_t)).cast("double") / n_t / (n_t - 1),
    )
    g = g.withColumns({"var_c": var_c, "var_t": var_t})
    a = F.col("var_c") / n_c  # per-arm squared standard error
    b = F.col("var_t") / n_t
    g = g.withColumns({"a": a, "b": b})
    ok = (n_c > 1) & (n_t > 1)
    t_stat = F.when(
        ok & (F.col("a") + F.col("b") > 0),
        _quantize4(
            (s_c / n_c - s_t / n_t) / F.sqrt(F.col("a") + F.col("b"))
        ),
    )
    df_welch = F.when(
        ok & (F.col("a") + F.col("b") > 0),
        _quantize4(
            (F.col("a") + F.col("b")) * (F.col("a") + F.col("b"))
            / (F.col("a") * F.col("a") / (n_c - 1)
               + F.col("b") * F.col("b") / (n_t - 1))
        ),
    )
    return g.select(
        "event_type",
        n_c.alias("n_control"),
        n_t.alias("n_treatment"),
        F.when(n_c > 0, _quantize4(s_c / n_c / 100)).alias("mean_control"),
        F.when(n_t > 0, _quantize4(s_t / n_t / 100)).alias("mean_treatment"),
        t_stat.alias("t_stat"),
        df_welch.alias("df_welch"),
        *extra_cols,
    )


_AB_ARM_SQL = "({h} % 2)".format(
    h=h32_sql(f"'{AB_SALT}' || CAST(user_id AS VARCHAR)"))

def _welch_oracle(pre_ctes: str, base_select: str,
                  extra_g: str = "", extra_sel: str = "",
                  extra_out: str = "") -> str:
    """DuckDB twin of :func:`_welch_from_base` — shared by ab_welch and
    ab_winsorized so the two oracles cannot drift."""
    return f"""
WITH {pre_ctes}base AS (
  {base_select}
), g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s_c,
         CAST(sum(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS ss_c,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s_t,
         CAST(sum(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS ss_t
         {extra_g}
  FROM base GROUP BY event_type
), v AS (
  SELECT *,
         CAST(CAST(n_c AS HUGEINT) * ss_c - CAST(s_c AS HUGEINT) * s_c
              AS DOUBLE) / n_c / (n_c - 1) AS var_c,
         CAST(CAST(n_t AS HUGEINT) * ss_t - CAST(s_t AS HUGEINT) * s_t
              AS DOUBLE) / n_t / (n_t - 1) AS var_t
  FROM g
), se AS (
  SELECT *, var_c / n_c AS a, var_t / n_t AS b FROM v
)
SELECT event_type, n_control, n_treatment, mean_control, mean_treatment,
       t_stat, df_welch{extra_out}
FROM (
  SELECT event_type, n_c AS n_control, n_t AS n_treatment,
         CASE WHEN n_c > 0 THEN {QUANTIZE4_SQL.format(x='s_c / n_c / 100')}
         END AS mean_control,
         CASE WHEN n_t > 0 THEN {QUANTIZE4_SQL.format(x='s_t / n_t / 100')}
         END AS mean_treatment,
         CASE WHEN n_c > 1 AND n_t > 1 AND a + b > 0 THEN
           {QUANTIZE4_SQL.format(x='(s_c / n_c - s_t / n_t) / sqrt(a + b)')}
         END AS t_stat,
         CASE WHEN n_c > 1 AND n_t > 1 AND a + b > 0 THEN
           {QUANTIZE4_SQL.format(
               x='(a + b) * (a + b) / (a * a / (n_c - 1) + b * b / (n_t - 1))')}
         END AS df_welch
         {extra_sel}
  FROM se
)
"""


_AB_BASE_SQL = f"""SELECT event_type, {_AB_ARM_SQL} AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events"""

ORACLE_AB_WELCH = _welch_oracle("", _AB_BASE_SQL)


def q_ab_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion conversion z-test — the workhorse A/B statistic:
    did the treatment change the fraction of users who purchase? Per
    arm: assigned users, converters (≥1 purchase event), conversion
    rate; pooled-variance normal approximation
    z = (p_c − p_t)/√(p̂(1−p̂)(1/n_c + 1/n_t)) and the relative lift.

    Everything derives from four BIGINT counts, so parity is trivial —
    the float ops (rates, pooled p̂, the z denominator) run in identical
    textual order and quantize at 4 decimals.

    Plan: one per-user shuffle (user_id grain: arm + converted flag via
    max(CASE)) then a single global conditional aggregate (1 row). At
    100 TB: one real shuffle, map-side combined on both phases.
    """
    ev = _t(spark, sf_dir, "events")
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    per_user = (
        ev.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", F.lit(1))
                .otherwise(F.lit(0))
            ).alias("conv")
        )
        .select(arm.alias("arm"), "conv")
    )
    is_c = F.col("arm") == 0
    g = per_user.agg(
        F.sum(F.when(is_c, F.lit(1)).otherwise(F.lit(0))).alias("n_c"),
        F.sum(F.when(is_c, F.col("conv")).otherwise(F.lit(0))).alias("x_c"),
        F.sum(F.when(~is_c, F.lit(1)).otherwise(F.lit(0))).alias("n_t"),
        F.sum(F.when(~is_c, F.col("conv")).otherwise(F.lit(0))).alias("x_t"),
    )
    n_c, x_c, n_t, x_t = (F.col(c) for c in ("n_c", "x_c", "n_t", "x_t"))
    g = g.withColumns({
        "p_c": F.when(n_c > 0, x_c / n_c),
        "p_t": F.when(n_t > 0, x_t / n_t),
        "pp": F.when(n_c + n_t > 0, (x_c + x_t) / (n_c + n_t)),
    })
    se2 = (
        F.col("pp") * (1 - F.col("pp")) * (1.0 / n_c + 1.0 / n_t)
    )
    g = g.withColumn(
        "se2", F.when((n_c > 0) & (n_t > 0), se2)
    )
    z = F.when(
        F.col("se2") > 0,
        _quantize4((F.col("p_c") - F.col("p_t")) / F.sqrt(F.col("se2"))),
    )
    lift = F.when(
        F.col("p_c") > 0,
        _quantize4((F.col("p_t") - F.col("p_c")) / F.col("p_c") * 100),
    )
    return g.select(
        n_c.alias("n_control"), x_c.alias("conv_control"),
        n_t.alias("n_treatment"), x_t.alias("conv_treatment"),
        _quantize4(F.col("p_c")).alias("rate_control"),
        _quantize4(F.col("p_t")).alias("rate_treatment"),
        z.alias("z_stat"),
        lift.alias("lift_pct"),
    )


def q_ab_quantile_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — what the mean hides: per-arm EXACT
    p50/p90 of the metric per event_type and their treatment−control
    differences. A treatment that moves the tail but not the median (or
    vice versa) shows up here and nowhere in ab_welch.

    Percentiles are the same integer rule as everywhere in this repo
    (pv = min{v : 100·W(v) ≥ p·W_tot}, two-phase bucket refinement from
    operators/robust — no raw-row sort), keyed by (event_type, arm);
    differences are integer-cent subtractions divided by 100 at the end.

    Plan: distinct-value collapse (event_type, arm, cents → weight),
    bounded cumulative windows on that tiny grain, a |types|·2-row
    pivot. One fact shuffle at any SF.
    """
    from pleiades_spark.operators.robust import grouped_exact_percentiles

    ev = _t(spark, sf_dir, "events")
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    raw = ev.select("event_type", arm.alias("arm"), cents.alias("c"))
    per_v = raw.groupBy("event_type", "arm", "c").agg(
        F.count(F.lit(1)).alias("w")
    )
    pct = grouped_exact_percentiles(
        per_v, ["event_type", "arm"], "c", "w", [50, 90]
    )

    def pick(a: int, p: int):
        return F.min(
            F.when((F.col("arm") == a) & (F.col("p") == p), F.col("pv"))
        )

    g = pct.groupBy("event_type").agg(
        pick(0, 50).alias("p50c"), pick(1, 50).alias("p50t"),
        pick(0, 90).alias("p90c"), pick(1, 90).alias("p90t"),
    )
    return g.select(
        "event_type",
        _quantize4(F.col("p50c") / 100).alias("p50_control"),
        _quantize4(F.col("p50t") / 100).alias("p50_treatment"),
        _quantize4((F.col("p50t") - F.col("p50c")) / 100).alias("qte_p50"),
        _quantize4(F.col("p90c") / 100).alias("p90_control"),
        _quantize4(F.col("p90t") / 100).alias("p90_treatment"),
        _quantize4((F.col("p90t") - F.col("p90c")) / 100).alias("qte_p90"),
    )


ORACLE_AB_QUANTILE_EFFECT = f"""
WITH base AS (
  {_AB_BASE_SQL}
), per_v AS (
  SELECT event_type, arm, c, CAST(count(*) AS BIGINT) AS w
  FROM base GROUP BY event_type, arm, c
), cum AS (
  SELECT event_type, arm, c, w,
         sum(w) OVER (PARTITION BY event_type, arm ORDER BY c ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY event_type, arm) AS tot
  FROM per_v
), px AS (
  SELECT event_type, arm,
         CAST(min(CASE WHEN 100 * cw >= 50 * tot THEN c END) AS BIGINT)
           AS p50,
         CAST(min(CASE WHEN 100 * cw >= 90 * tot THEN c END) AS BIGINT)
           AS p90
  FROM cum GROUP BY event_type, arm
), g AS (
  SELECT event_type,
         CAST(min(CASE WHEN arm = 0 THEN p50 END) AS BIGINT) AS p50c,
         CAST(min(CASE WHEN arm = 1 THEN p50 END) AS BIGINT) AS p50t,
         CAST(min(CASE WHEN arm = 0 THEN p90 END) AS BIGINT) AS p90c,
         CAST(min(CASE WHEN arm = 1 THEN p90 END) AS BIGINT) AS p90t
  FROM px GROUP BY event_type
)
SELECT event_type,
       {QUANTIZE4_SQL.format(x='p50c / 100')} AS p50_control,
       {QUANTIZE4_SQL.format(x='p50t / 100')} AS p50_treatment,
       {QUANTIZE4_SQL.format(x='(p50t - p50c) / 100')} AS qte_p50,
       {QUANTIZE4_SQL.format(x='p90c / 100')} AS p90_control,
       {QUANTIZE4_SQL.format(x='p90t / 100')} AS p90_treatment,
       {QUANTIZE4_SQL.format(x='(p90t - p90c) / 100')} AS qte_p90
FROM g
"""


ORACLE_AB_PROPORTION = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id
), armed AS (
  SELECT {_AB_ARM_SQL} AS arm, conv FROM per_user
), g AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_c,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_t
  FROM armed
), p AS (
  SELECT *,
         CASE WHEN n_c > 0 THEN x_c / n_c END AS p_c,
         CASE WHEN n_t > 0 THEN x_t / n_t END AS p_t,
         CASE WHEN n_c + n_t > 0 THEN (x_c + x_t) / (n_c + n_t) END AS pp
  FROM g
), s AS (
  SELECT *,
         CASE WHEN n_c > 0 AND n_t > 0 THEN
           pp * (1 - pp) * (1.0 / n_c + 1.0 / n_t)
         END AS se2
  FROM p
)
SELECT n_c AS n_control, x_c AS conv_control,
       n_t AS n_treatment, x_t AS conv_treatment,
       {QUANTIZE4_SQL.format(x='p_c')} AS rate_control,
       {QUANTIZE4_SQL.format(x='p_t')} AS rate_treatment,
       CASE WHEN se2 > 0 THEN
         {QUANTIZE4_SQL.format(x='(p_c - p_t) / sqrt(se2)')}
       END AS z_stat,
       CASE WHEN p_c > 0 THEN
         {QUANTIZE4_SQL.format(x='(p_t - p_c) / p_c * 100')}
       END AS lift_pct
FROM s
"""


# Winsorization percentile: cap the metric at the POOLED per-type p99
# (arm-independent, so capping cannot introduce a between-arm bias).
WINSOR_P = 99


def q_ab_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized Welch readout — the outlier-robust production variant:
    the metric is capped at the pooled per-type p99 BEFORE the t-test,
    the standard guard against a handful of whale users deciding the
    experiment. Same output as ab_welch plus the applied cap.

    The cap is the EXACT integer percentile pv = min{v : 100·W(v) ≥
    99·W_tot} from operators/robust.grouped_exact_percentiles (two-phase
    bucket refinement — no raw-row sort, no constant-cardinality window
    trap), computed pooled across arms. Pure integer comparisons, so the
    Spark cap and the oracle's cumulative-rule cap agree exactly; the
    capped metric stays integer cents, so the whole ab_welch parity
    story carries over unchanged (shared _welch_from_base core).

    Plan: the value-grain weight table (event_type, cents → w) is the
    same distinct-value collapse ab_mannwhitney rides (a few thousand
    rows per type at ANY SF); the cap table is |types| rows broadcast
    back onto the fact scan; then ONE conditional-agg shuffle as
    ab_welch. Requires a non-negative metric (cents ≥ 0) — same contract
    as grouped_exact_percentiles.
    """
    from pleiades_spark.operators.robust import grouped_exact_percentiles

    ev = _t(spark, sf_dir, "events")
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    raw = ev.select("event_type", arm.alias("arm"), cents.alias("c"))
    per_v = raw.groupBy("event_type", "c").agg(F.count(F.lit(1)).alias("w"))
    cap = grouped_exact_percentiles(
        per_v, ["event_type"], "c", "w", [WINSOR_P]
    ).select("event_type", F.col("pv").alias("cap"))
    capped = (
        raw.join(F.broadcast(cap), "event_type")
        .withColumn("c", F.least(F.col("c"), F.col("cap")))
        .withColumn("c2", F.col("c") * F.col("c"))
    )
    return _welch_from_base(
        capped,
        extra_aggs=[F.min("cap").alias("capc")],
        extra_cols=[_quantize4(F.col("capc") / 100).alias("winsor_cap")],
    )


_WINSOR_PRE_SQL = f"""raw AS (
  {_AB_BASE_SQL}
), per_v AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS w
  FROM raw GROUP BY event_type, c
), cum AS (
  SELECT event_type, c, w,
         sum(w) OVER (PARTITION BY event_type ORDER BY c ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY event_type) AS tot
  FROM per_v
), capt AS (
  SELECT event_type,
         CAST(min(CASE WHEN 100 * cw >= {WINSOR_P} * tot THEN c END)
              AS BIGINT) AS cap
  FROM cum GROUP BY event_type
), """

ORACLE_AB_WINSORIZED = _welch_oracle(
    _WINSOR_PRE_SQL,
    "SELECT r.event_type, r.arm, least(r.c, p.cap) AS c, p.cap AS cap\n"
    "  FROM raw r JOIN capt p ON r.event_type = p.event_type",
    extra_g=", CAST(min(cap) AS BIGINT) AS capc",
    extra_sel=f", {QUANTIZE4_SQL.format(x='capc / 100')} AS winsor_cap",
    extra_out=", winsor_cap",
)


def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13):
    per-user pre-period spend is the covariate, post-period spend the
    metric, θ = cov(x,y)/var(x) pooled across arms, and the per-arm
    adjusted mean is mean_y − θ·(mean_x_arm − mean_x_pooled). Reports
    the variance-reduction rate too (r², the fraction CUPED removes).

    The pre/post cut is the midpoint of the observed time range —
    computed by a tiny min/max aggregate broadcast onto the fact scan
    (one extra pass; a production deployment reads the cut from table
    stats or the experiment config instead). Users without pre (or
    post) activity keep x=0 (y=0): intent-to-treat, no dropped rows.

    Float parity: per-user x,y are exact integer cents, arm moments are
    exact BIGINT sums, and var(y−θx) is expanded in CLOSED FORM —
    var_y − cov²/var_x — so no order-dependent double accumulation ever
    happens; moment combinations (N·Σxy − Σx·Σy …) are computed in
    decimal(38,0)/HUGEINT (both exact) because their magnitudes square
    past int64 at scale, then divided as doubles in identical textual
    order. θ and r² are scale-invariant, so cents == units for them.

    Plan: two passes over events (cut scalar, then per-user rollup —
    user_id shuffle), a |users|→2-row arm aggregate, pooled moments via
    a window over the TWO-row arm frame (bounded, no sort). At 100 TB:
    one real shuffle (user_id), everything after is 2 rows.
    """
    ev = _t(spark, sf_dir, "events")
    e = F.floor(F.unix_timestamp("ts")).cast("long")
    cut_row = ev.agg(
        F.floor((F.min(e) + F.max(e)) / 2).cast("long").alias("cut")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "user_id", e.alias("es"), cents.alias("cents")
    ).crossJoin(F.broadcast(cut_row))
    per_user = base.groupBy("user_id").agg(
        F.sum(F.when(F.col("es") < F.col("cut"), F.col("cents"))
              .otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(F.col("es") >= F.col("cut"), F.col("cents"))
              .otherwise(F.lit(0))).alias("y"),
    )
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    # Second-order moments widen to decimal(38,0) BEFORE the sum: per-user
    # cent totals squared then summed over users blow past int64 at large
    # SF (the round-7 ab_welch ARITHMETIC_OVERFLOW class — widening only
    # the already-summed arm aggregate is too late). First-order sx/sy
    # stay long (Σcents fits int64, CLAUDE.md invariant). The oracle's
    # twin sums are native HUGEINT, uncast.
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    armed = per_user.select(arm.alias("arm"), "x", "y").groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
    )
    pool = W.partitionBy()  # 2-row frame: pooled moments, no sort
    d38 = lambda c: F.sum(c).over(pool).cast("decimal(38,0)")  # noqa: E731
    armed = armed.withColumns({
        "nn": d38("n"), "tx": d38("sx"), "ty": d38("sy"),
        "txy": d38("sxy"), "txx": d38("sxx"), "tyy": d38("syy"),
        "pn": F.sum("n").over(pool), "px": F.sum("sx").over(pool),
    })
    num = (F.col("nn") * F.col("txy") - F.col("tx") * F.col("ty")).cast("double")
    dx = (F.col("nn") * F.col("txx") - F.col("tx") * F.col("tx")).cast("double")
    dy = (F.col("nn") * F.col("tyy") - F.col("ty") * F.col("ty")).cast("double")
    armed = armed.withColumns({"num": num, "dx": dx, "dy": dy})
    theta = F.when(F.col("dx") > 0, F.col("num") / F.col("dx"))
    armed = armed.withColumn("theta", theta)
    mean_y = F.col("sy") / F.col("n") / 100
    adj = (
        F.col("sy") / F.col("n")
        - F.col("theta") * (F.col("sx") / F.col("n") - F.col("px") / F.col("pn"))
    ) / 100
    r2 = F.when(
        (F.col("dx") > 0) & (F.col("dy") > 0),
        (F.col("num") / F.col("dx")) * (F.col("num") / F.col("dy")),
    )
    return armed.select(
        F.when(F.col("arm") == 0, F.lit("control"))
        .otherwise(F.lit("treatment")).alias("arm"),
        F.col("n").alias("n_users"),
        _quantize4(F.col("sx") / F.col("n") / 100).alias("mean_pre"),
        _quantize4(mean_y).alias("mean_metric"),
        F.when(F.col("theta").isNotNull(), _quantize4(adj))
        .otherwise(_quantize4(mean_y)).alias("mean_metric_cuped"),
        _quantize4(F.col("theta")).alias("theta"),
        _quantize4(r2 * 100).alias("var_reduction_pct"),
    )


ORACLE_AB_CUPED = f"""
WITH cut_row AS (
  SELECT CAST(floor((min(floor(epoch(ts))) + max(floor(epoch(ts)))) / 2)
              AS BIGINT) AS cut
  FROM events
), per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN floor(epoch(ts)) < cut
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN floor(epoch(ts)) >= cut
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events CROSS JOIN cut_row
  GROUP BY user_id
), armed AS (
  SELECT {_AB_ARM_SQL} AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM per_user GROUP BY arm
), pooled AS (
  SELECT *,
         CAST(sum(n) OVER () AS HUGEINT) AS nn,
         CAST(sum(sx) OVER () AS HUGEINT) AS tx,
         CAST(sum(sy) OVER () AS HUGEINT) AS ty,
         CAST(sum(sxy) OVER () AS HUGEINT) AS txy,
         CAST(sum(sxx) OVER () AS HUGEINT) AS txx,
         CAST(sum(syy) OVER () AS HUGEINT) AS tyy,
         CAST(sum(n) OVER () AS BIGINT) AS pn,
         CAST(sum(sx) OVER () AS BIGINT) AS px
  FROM armed
), d AS (
  SELECT *,
         CAST(nn * txy - tx * ty AS DOUBLE) AS num,
         CAST(nn * txx - tx * tx AS DOUBLE) AS dx,
         CAST(nn * tyy - ty * ty AS DOUBLE) AS dy,
         CASE WHEN CAST(nn * txx - tx * tx AS DOUBLE) > 0 THEN
           CAST(nn * txy - tx * ty AS DOUBLE)
           / CAST(nn * txx - tx * tx AS DOUBLE)
         END AS theta
  FROM pooled
)
SELECT CASE WHEN arm = 0 THEN 'control' ELSE 'treatment' END AS arm,
       n AS n_users,
       {QUANTIZE4_SQL.format(x='sx / n / 100')} AS mean_pre,
       {QUANTIZE4_SQL.format(x='sy / n / 100')} AS mean_metric,
       CASE WHEN theta IS NOT NULL THEN
         {QUANTIZE4_SQL.format(
             x='(sy / n - theta * (sx / n - px / pn)) / 100')}
       ELSE {QUANTIZE4_SQL.format(x='sy / n / 100')}
       END AS mean_metric_cuped,
       {QUANTIZE4_SQL.format(x='theta')} AS theta,
       CASE WHEN dx > 0 AND dy > 0 THEN
         {QUANTIZE4_SQL.format(x='(num / dx) * (num / dy) * 100')}
       END AS var_reduction_pct
FROM d
"""


# |z| beyond ±3.2905 ≈ two-sided p < 0.001, the standard SRM alarm bar
# (Fabijan et al., KDD'19 diagnoses). Frozen literal shared by both
# engines; the comparison happens on the already-quantized z.
SRM_Z_BAR = 3.2905


def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check: the guardrail run BEFORE reading any
    A/B result. Distinct users per arm per event_type (and overall via
    CUBE), the normal approximation to the 50/50 binomial
    z = (n_c − n_t)/√(n_c + n_t), and the p<0.001 alarm flag. A healthy
    hash split stays |z| < 3.29; anything else means the assignment or
    logging is broken and the Welch/CUPED readouts are void.

    Plan: one distinct-user expand (count(DISTINCT CASE) under CUBE —
    Spark plans the standard two-phase distinct expand, map-side
    partial first), grouping-set rows bounded by |types|+1. One pass,
    one shuffle family at 100 TB.
    """
    ev = _t(spark, sf_dir, "events")
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    base = ev.select("event_type", arm.alias("arm"), "user_id")
    g = base.cube("event_type").agg(
        F.countDistinct(
            F.when(F.col("arm") == 0, F.col("user_id"))
        ).alias("n_control"),
        F.countDistinct(
            F.when(F.col("arm") == 1, F.col("user_id"))
        ).alias("n_treatment"),
        F.grouping("event_type").alias("gflag"),
    )
    z = _quantize4(
        (F.col("n_control") - F.col("n_treatment"))
        / F.sqrt(F.col("n_control") + F.col("n_treatment"))
    )
    g = g.withColumn("srm_z", z)
    return g.select(
        F.when(F.col("gflag") == 1, F.lit("ALL"))
        .otherwise(F.col("event_type")).alias("scope"),
        "n_control",
        "n_treatment",
        "srm_z",
        (F.abs(F.col("srm_z")) > SRM_Z_BAR).alias("srm_flag"),
    )


ORACLE_AB_SRM = f"""
WITH base AS (
  SELECT event_type, {_AB_ARM_SQL} AS arm, user_id FROM events
), g AS (
  SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END
           AS scope,
         CAST(count(DISTINCT CASE WHEN arm = 0 THEN user_id END) AS BIGINT)
           AS n_control,
         CAST(count(DISTINCT CASE WHEN arm = 1 THEN user_id END) AS BIGINT)
           AS n_treatment
  FROM base GROUP BY CUBE (event_type)
)
SELECT scope, n_control, n_treatment,
       {QUANTIZE4_SQL.format(
           x='(n_control - n_treatment) / sqrt(n_control + n_treatment)')}
         AS srm_z,
       abs({QUANTIZE4_SQL.format(
           x='(n_control - n_treatment) / sqrt(n_control + n_treatment)')})
         > {SRM_Z_BAR} AS srm_flag
FROM g
"""


def q_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test per event_type — the nonparametric
    twin of ab_welch for skewed metrics (revenue-like values where the
    t-test's normality story is weak): U statistic for the control arm,
    tie-corrected normal approximation z.

    Exact-integer rank trick: ranks are computed on the VALUE-GROUP
    grain, not per row. For a tie group with c rows starting at rank r
    the average rank is r + (c−1)/2, so the DOUBLED average rank
    2r + c − 1 is an integer — every rank sum, U (×2) and the tie term
    Σ(t³−t) stay exact integers (decimal(38,0)/HUGEINT for the
    second-order combos, which scale as N² and t³); the only float ops
    are the final σ/z division in identical textual order on both
    engines.

    Plan: groupBy (event_type, cents) collapses the fact table to the
    distinct-value grain (map-side combined — value has 2 decimals, so
    this is a few thousand rows per type no matter the SF), a running
    cumsum window per event_type over that TINY frame, and a final
    per-type agg that reuses the window's partitioning (2 exchanges
    total, the second bounded by |types|·|distinct cents|).
    """
    ev = _t(spark, sf_dir, "events")
    arm = h32(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select("event_type", arm.alias("arm"), cents.alias("c"))
    byval = base.groupBy("event_type", "c").agg(
        F.sum(F.when(F.col("arm") == 0, F.lit(1)).otherwise(F.lit(0)))
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.lit(1)).otherwise(F.lit(0)))
        .alias("n1"),
    ).withColumn("t", F.col("n0") + F.col("n1"))
    w = (
        W.partitionBy("event_type").orderBy(F.col("c").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # first rank of this tie group = (rows at smaller values) + 1
    byval = byval.withColumn(
        "dr", 2 * (F.sum("t").over(w) - F.col("t") + 1) + F.col("t") - 1
    )
    # Second-order moment combos run in decimal(38,0) / HUGEINT (the
    # ab_welch sf10 overflow lesson): rank sums scale as N², the tie
    # term as t³ — both past int64 on a 10⁹-row-per-type corpus.
    d = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    g = byval.groupBy("event_type").agg(
        F.sum("n0").alias("n0"),
        F.sum("n1").alias("n1"),
        F.sum(d(F.col("n0")) * F.col("dr")).alias("r0d"),  # 2·rank-sum
        F.sum(d(F.col("t")) * F.col("t") * F.col("t") - F.col("t"))
        .alias("tie"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    nn = n0 + n1
    # 2·U₀ = 2·R₀ − n₀(n₀+1); z numerator 2U₀ − n₀n₁ stays exact.
    u2 = F.col("r0d") - d(n0) * (n0 + 1)
    g = g.withColumns({"u2": u2, "num": u2 - d(n0) * n1})
    sigma2 = (
        (d(n0) * n1).cast("double")
        * ((nn + 1)
           - F.col("tie").cast("double") / (d(nn) * (nn - 1)).cast("double"))
        / 12
    )
    g = g.withColumn(
        "sigma2", F.when((n0 > 0) & (n1 > 0) & (nn > 1), sigma2)
    )
    z = F.when(
        F.col("sigma2") > 0,
        _quantize4(F.col("num").cast("double") / 2 / F.sqrt(F.col("sigma2"))),
    )
    return g.select(
        "event_type",
        n0.alias("n_control"),
        n1.alias("n_treatment"),
        (F.col("u2").cast("double") / 2).alias("u_control"),
        z.alias("z_stat"),
    )


ORACLE_AB_MANNWHITNEY = f"""
WITH base AS (
  SELECT event_type, {_AB_ARM_SQL} AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), byval AS (
  SELECT event_type, c,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM base GROUP BY event_type, c
), ranked AS (
  SELECT *, n0 + n1 AS t,
         2 * (CAST(sum(n0 + n1) OVER (PARTITION BY event_type ORDER BY c ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              - (n0 + n1) + 1) + (n0 + n1) - 1 AS dr
  FROM byval
), g AS (
  SELECT event_type,
         CAST(sum(n0) AS BIGINT) AS n0, CAST(sum(n1) AS BIGINT) AS n1,
         sum(CAST(n0 AS HUGEINT) * dr) AS r0d,
         sum(CAST(t AS HUGEINT) * t * t - t) AS tie
  FROM ranked GROUP BY event_type
), u AS (
  SELECT *, r0d - CAST(n0 AS HUGEINT) * (n0 + 1) AS u2,
         r0d - CAST(n0 AS HUGEINT) * (n0 + 1)
             - CAST(n0 AS HUGEINT) * n1 AS num,
         CASE WHEN n0 > 0 AND n1 > 0 AND n0 + n1 > 1 THEN
           CAST(CAST(n0 AS HUGEINT) * n1 AS DOUBLE)
           * ((n0 + n1 + 1)
              - CAST(tie AS DOUBLE)
                / CAST(CAST(n0 + n1 AS HUGEINT) * (n0 + n1 - 1) AS DOUBLE))
           / 12
         END AS sigma2
  FROM g
)
SELECT event_type, n0 AS n_control, n1 AS n_treatment,
       CAST(u2 AS DOUBLE) / 2 AS u_control,
       CASE WHEN sigma2 > 0 THEN
         {QUANTIZE4_SQL.format(x='CAST(num AS DOUBLE) / 2 / sqrt(sigma2)')}
       END AS z_stat
FROM u
"""


QUERIES = [
    Query("ab_welch", q_ab_welch, ORACLE_AB_WELCH,
          "hash-split A/B readout: Welch's t + Satterthwaite df per type"),
    Query("ab_cuped", q_ab_cuped, ORACLE_AB_CUPED,
          "CUPED variance-reduced readout: pooled theta, closed-form r2"),
    Query("ab_srm", q_ab_srm, ORACLE_AB_SRM,
          "sample-ratio-mismatch guardrail: per-type + overall CUBE"),
    Query("ab_mannwhitney", q_ab_mannwhitney, ORACLE_AB_MANNWHITNEY,
          "Mann-Whitney U rank-sum per type, tie-corrected z, exact ranks"),
    Query("ab_winsorized", q_ab_winsorized, ORACLE_AB_WINSORIZED,
          "p99-winsorized Welch readout (outlier-robust production form)"),
    Query("ab_proportion", q_ab_proportion, ORACLE_AB_PROPORTION,
          "two-proportion conversion z-test with pooled variance + lift"),
    Query("ab_quantile_effect", q_ab_quantile_effect,
          ORACLE_AB_QUANTILE_EFFECT,
          "per-arm exact p50/p90 quantile treatment effects per type"),
    Query("hybrid_rrf_retrieval", q_hybrid_rrf_retrieval, _oracle_hybrid_rrf(),
          "reciprocal-rank fusion of BM25 relevance + quality prior top-10s"),
    Query("bm25_retrieval", q_bm25_retrieval, ORACLE_BM25_RETRIEVAL,
          "Okapi BM25 top-k retrieval, integer micro-unit score sums"),
    Query("attribution_last_touch", q_attribution_last_touch,
          ORACLE_ATTRIBUTION_LAST_TOUCH,
          "last-touch channel attribution for purchases (running ignorenulls)"),
    Query("hourly_autocorr", q_hourly_autocorr, ORACLE_HOURLY_AUTOCORR,
          "hourly-count ACF at lags 1-3, exact integer moments"),
    Query("cusum_changepoint", q_cusum_changepoint, ORACLE_CUSUM_CHANGEPOINT,
          "one-sided CUSUM changepoint via prefix-sum closed form"),
    Query("pagerank_types", q_pagerank_types, ORACLE_PAGERANK_TYPES,
          "integer-unit PageRank power iteration over type transitions"),
    Query("token_triangles", q_token_triangles, ORACLE_TOKEN_TRIANGLES,
          "degree-oriented triangle census of the co-occurrence graph"),
    Query("holt_linear", q_holt_linear, ORACLE_HOLT_LINEAR,
          "Holt double-exponential level/trend + 24h forecast per type"),
    Query("type_crosscorr", q_type_crosscorr, ORACLE_TYPE_CROSSCORR,
          "pairwise Pearson correlation of hourly type series"),
    Query("cdc_apply", q_cdc_apply, ORACLE_CDC_APPLY,
          "MERGE-INTO semantics: last-writer-wins upsert+delete apply"),
    Query("seasonal_anomalies", q_seasonal_anomalies, ORACLE_SEASONAL_ANOMALIES,
          "top-k |residual| hours per type after seasonal adjustment"),
    Query("rolling_kmv_users", q_rolling_kmv_users, ORACLE_ROLLING_KMV_USERS,
          "rolling 7-day distinct users: exact vs mergeable KMV sketch"),
    Query("lsh_recall_audit", q_lsh_recall_audit, ORACLE_LSH_RECALL_AUDIT,
          "LSH recall vs bounded exact ground truth on a fixed sample"),
    Query("token_communities", q_token_communities, ORACLE_TOKEN_COMMUNITIES,
          "synchronous label-propagation communities, 3 unrolled rounds"),
    Query("kfold_splits", q_kfold_splits, ORACLE_KFOLD_SPLITS,
          "deterministic k-fold CV assignment + per-fold balance rollup"),
]
