"""Behavioral tests for the round-5 analytics queries — synthetic series
with KNOWN answers, beyond the fixture-replay oracle gate.

Each test stages a tiny hand-built events/documents parquet dir (the
queries load through catalog.load, so the staged files use the
TIMESTAMP-micros vintage) and asserts the statistic the query claims to
compute, on inputs where the right answer is computable by hand.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _stage_events(spark, tmp_path, rows):
    """rows: (event_id, epoch_s, user_id, event_type, value)."""
    d = str(tmp_path / "fx")
    df = spark.createDataFrame(
        [
            (eid, dt.datetime.fromtimestamp(ts, tz=UTC).replace(tzinfo=None),
             uid, et, float(v), "{}")
            for eid, ts, uid, et, v in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _stage_documents(spark, tmp_path, texts):
    d = str(tmp_path / "fx")
    df = spark.createDataFrame(
        [(i, "en", "test", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, source string, text string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_funnel_ordering_semantics_hand_built(spark, tmp_path):
    """The round-6 single-shuffle funnel must preserve the ORDERED
    semantics on corner cases the aggregate-only form gets wrong:
    a click BEFORE the first view doesn't count, a click at the SAME ts
    as the view doesn't count (strict >), and the purchase must follow
    the first QUALIFYING click, not just any click."""
    from pleiades_spark.plans.pleiades import q_funnel_conversion

    rows = [
        # u1: click(10) view(20) click(30) purchase(40) — full funnel,
        #     the pre-view click must be ignored, 30 is the qualifying one
        (1, 10, 1, "click", 0), (2, 20, 1, "view", 0),
        (3, 30, 1, "click", 0), (4, 40, 1, "purchase", 0),
        # u2: view and click at the SAME ts → click not strictly after
        (5, 100, 2, "view", 0), (6, 100, 2, "click", 0),
        # u3: purchase between view and the only qualifying click —
        #     view(10) purchase(20) click(30): no purchase AFTER click
        (7, 10, 3, "view", 0), (8, 20, 3, "purchase", 0),
        (9, 30, 3, "click", 0),
        # u4: clicks only — no view, nothing counts
        (10, 10, 4, "click", 0), (11, 20, 4, "click", 0),
    ]
    d = _stage_events(spark, tmp_path, rows)
    out = q_funnel_conversion(spark, d).collect()[0]
    assert out["n_view_users"] == 3        # u1, u2, u3
    assert out["n_click_after_view"] == 2  # u1 (click@30), u3 (click@30)
    assert out["n_full_funnel"] == 1       # only u1


def test_attribution_last_touch_hand_built(spark, tmp_path):
    """Purchases credit the most recent PRIOR non-purchase event; a
    purchase with no prior touch is dropped; back-to-back purchases both
    credit the same last touch."""
    from pleiades_spark.plans.analytics import q_attribution_last_touch

    rows = [
        (1, 10, 1, "view", 0), (2, 20, 1, "click", 0),
        (3, 30, 1, "purchase", 5.0),   # credits click
        (4, 40, 1, "purchase", 7.0),   # still credits click (purchase
                                       # at 30 is not a touch)
        (5, 10, 2, "purchase", 9.0),   # no prior touch → dropped
        (6, 20, 2, "view", 0),
        (7, 30, 2, "purchase", 1.0),   # credits view
    ]
    d = _stage_events(spark, tmp_path, rows)
    got = {
        r["channel"]: (r["n_conversions"], r["credited_value"])
        for r in q_attribution_last_touch(spark, d).collect()
    }
    assert got == {"click": (2, 12.0), "view": (1, 1.0)}


def test_cusum_finds_injected_level_shift(spark, tmp_path):
    """20 hours at value-rate 1 event/h, then 20 hours at 3 events/h: the
    one-sided CUSUM of hourly counts must peak at the LAST hour (drift
    keeps accumulating after the shift), and max_cusum must equal the
    hand-computed closed form."""
    from pleiades_spark.plans.analytics import q_cusum_changepoint

    rows, eid = [], 0
    for h in range(40):
        for k in range(1 if h < 20 else 3):
            rows.append((eid, 3600 * h + 60 * k, 1, "click", 1.0))
            eid += 1
    d = _stage_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in q_cusum_changepoint(spark, d).collect()}
    r = out["click"]
    # mean = 2: prefix of (x-mean) is -1 per early hour, +1 per late hour
    # → minimum prefix −20 at hour 19, peak drift at the final hour
    assert r["n_hours"] == 40
    assert r["changepoint_hour"] == 39
    assert r["max_cusum"] == pytest.approx(20.0)


def test_pagerank_uniform_on_symmetric_chain(spark, tmp_path):
    """A symmetric 2-cycle a↔b: ranks must be equal, and total mass
    ≈ 1 (up to deterministic integer flooring loss)."""
    from pleiades_spark.plans.analytics import q_pagerank_types

    rows = []
    for i in range(10):
        rows.append((2 * i, 3600 * i, 1, "a" if i % 2 == 0 else "b", 1.0))
    d = _stage_events(spark, tmp_path, rows)
    out = q_pagerank_types(spark, d).collect()
    ranks = {r["event_type"]: r["rank_u"] for r in out}
    assert set(ranks) == {"a", "b"}
    assert ranks["a"] == ranks["b"]
    total = sum(ranks.values())
    assert abs(total - 1_000_000_000) < 100  # flooring loss only


def test_bm25_rare_term_outranks(spark, tmp_path):
    """Two docs differing only in one rare query term: the doc with the
    rare term must rank first (higher idf → higher score)."""
    from pleiades_spark.plans.analytics import q_bm25_retrieval

    base = "join hash scan filter row batch"
    texts = [base + " dup", base] + ["filler words only here"] * 8
    d = _stage_documents(spark, tmp_path, texts)
    out = q_bm25_retrieval(spark, d).collect()
    assert out[0]["doc_id"] == 0
    assert out[0]["score"] > out[1]["score"]


def test_holt_linear_converges_on_linear_series(spark, tmp_path):
    """On hourly sums following y = 10 + 2h the Holt trend converges
    toward 2 and the forecast extrapolates level + 24·trend."""
    from pleiades_spark.plans.analytics import q_holt_linear

    rows, eid = [], 0
    for h in range(200):
        rows.append((eid, 3600 * h, 1, "a", 10.0 + 2.0 * h))
        eid += 1
    d = _stage_events(spark, tmp_path, rows)
    r = q_holt_linear(spark, d).collect()[0]
    assert r["n_hours"] == 200
    assert r["trend"] == pytest.approx(2.0, abs=0.01)
    assert r["forecast_24h"] == pytest.approx(r["level"] + 24 * r["trend"], abs=0.001)


def test_autocorr_perfect_period_two(spark, tmp_path):
    """Hourly counts alternating 1,3,1,3…: ACF at lag 2 must be +1, at
    lag 1 must be −1 (exact integer moments, quantized)."""
    from pleiades_spark.plans.analytics import q_hourly_autocorr

    rows, eid = [], 0
    for h in range(60):
        for k in range(1 if h % 2 == 0 else 3):
            rows.append((eid, 3600 * h + 60 * k, 1, "a", 1.0))
            eid += 1
    d = _stage_events(spark, tmp_path, rows)
    out = {r["lag_h"]: r["acf"] for r in q_hourly_autocorr(spark, d).collect()}
    assert out[1] == pytest.approx(-1.0)
    assert out[2] == pytest.approx(1.0)


def test_crosscorr_sign(spark, tmp_path):
    """Type b moves WITH a, type c moves AGAINST a: corr(a,b) = +1,
    corr(a,c) = −1 on the shared hours."""
    from pleiades_spark.plans.analytics import q_type_crosscorr

    rows, eid = [], 0
    for h in range(40):
        hi = h % 2 == 0
        for k in range(1 if hi else 3):
            rows.append((eid, 3600 * h + 60 * k, 1, "a", 1.0)); eid += 1
        for k in range(2 if hi else 6):
            rows.append((eid, 3600 * h + 60 * k, 2, "b", 1.0)); eid += 1
        for k in range(5 if hi else 1):
            rows.append((eid, 3600 * h + 60 * k, 3, "c", 1.0)); eid += 1
    d = _stage_events(spark, tmp_path, rows)
    out = {(r["t1"], r["t2"]): r["corr"]
           for r in q_type_crosscorr(spark, d).collect()}
    assert out[("a", "b")] == pytest.approx(1.0)
    assert out[("a", "c")] == pytest.approx(-1.0)
    assert out[("b", "c")] == pytest.approx(-1.0)


def test_triangles_on_handbuilt_graph(spark, tmp_path):
    """4 tokens; doc set engineered so the co-occurrence graph (≥60% of
    docs) is exactly a 4-cycle plus one chord: 5 edges, 2 triangles,
    wedges = Σ d(d−1)/2 = 1+3+1+3 = 8 → clustering 0.75."""
    from pleiades_spark.plans.analytics import q_token_triangles

    # 10 docs, edge ⇔ pair co-occurs in ≥6 (60%). Pair counts:
    # ab=6, ad=6, bc=6, cd=6, bd=8, ac=5 → the 4-cycle a-b-c-d plus the
    # bd chord; ac misses the threshold by one.
    docs = (
        ["a b c d"] * 5 + ["a b d"] + ["b c d"] + ["b d"] + ["a", "c"]
    )
    d = _stage_documents(spark, tmp_path, docs)
    r = q_token_triangles(spark, d).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 5, 2)
    assert r["n_wedges"] == 8
    assert r["global_clustering"] == pytest.approx(0.75)


def test_analytics_queries_survive_empty_events(spark, tmp_path):
    """Zero-row events: every event-driven analytics query must return
    an empty frame (no ANSI division errors, no crashes) — the guards
    (d1>0, n_wedges>0, per-row div) must never evaluate on empty input."""
    from pleiades_spark.plans.analytics import (
        q_cusum_changepoint,
        q_holt_linear,
        q_hourly_autocorr,
        q_pagerank_types,
        q_rolling_kmv_users,
        q_type_crosscorr,
    )

    d = _stage_events(spark, tmp_path, [])
    for q in (q_cusum_changepoint, q_holt_linear, q_hourly_autocorr,
              q_pagerank_types, q_rolling_kmv_users, q_type_crosscorr):
        assert q(spark, d).count() == 0, q.__name__


def test_analytics_degenerate_single_hour(spark, tmp_path):
    """One event, one hour: CUSUM yields S=0 at the only hour, Holt
    yields trend 0 and forecast == level, ACF/crosscorr produce no rows
    (no pairs), PageRank produces no rows (no transitions)."""
    from pleiades_spark.plans.analytics import (
        q_cusum_changepoint,
        q_holt_linear,
        q_hourly_autocorr,
        q_pagerank_types,
    )

    d = _stage_events(spark, tmp_path, [(0, 3600, 1, "a", 5.0)])
    r = q_cusum_changepoint(spark, d).collect()[0]
    assert (r["n_hours"], r["max_cusum"]) == (1, 0.0)
    h = q_holt_linear(spark, d).collect()[0]
    assert h["trend"] == 0.0 and h["forecast_24h"] == h["level"]
    assert q_hourly_autocorr(spark, d).count() == 0
    # one node, no transitions: rank collapses to the teleport floor
    # 125000000 div 1 (the damped term contributes nothing)
    pr = q_pagerank_types(spark, d).collect()
    assert len(pr) == 1 and pr[0]["rank_u"] == 125_000_000


def test_ab_welch_matches_independent_computation(spark, tmp_path):
    """Welch readout vs an independently coded t/df on hand-built data:
    the test recomputes the hash split in pure Python (md5 prefix) and
    Welch's statistic with the textbook formula over plain floats."""
    import hashlib
    import math

    from pleiades_spark.plans.analytics import AB_SALT, q_ab_welch

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    # 20 users, values uid-dependent so the arms genuinely differ.
    rows, vals = [], {0: [], 1: []}
    for uid in range(20):
        v = round(1.0 + 0.37 * uid, 2)
        rows.append((uid, 3600 + uid, uid, "click", v))
        vals[arm(uid)].append(v)
    assert min(len(vals[0]), len(vals[1])) >= 2  # both arms populated
    d = _stage_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in q_ab_welch(spark, d).collect()}
    r = got["click"]

    def welch(c, t):
        mc, mt = sum(c) / len(c), sum(t) / len(t)
        vc = sum((x - mc) ** 2 for x in c) / (len(c) - 1)
        vt = sum((x - mt) ** 2 for x in t) / (len(t) - 1)
        a, b = vc / len(c), vt / len(t)
        tt = (mc - mt) / math.sqrt(a + b)
        df = (a + b) ** 2 / (a * a / (len(c) - 1) + b * b / (len(t) - 1))
        return tt, df

    tt, df = welch(vals[0], vals[1])
    assert r["n_control"] == len(vals[0])
    assert r["n_treatment"] == len(vals[1])
    assert abs(r["mean_control"] - sum(vals[0]) / len(vals[0])) < 1e-3
    assert abs(r["t_stat"] - tt) < 1e-3
    assert abs(r["df_welch"] - df) < 1e-3


def test_ab_welch_degenerate_arm_is_null(spark, tmp_path):
    """A type observed by only ONE user (single arm, n=1) must yield
    NULL t/df and a mean only for the populated arm."""
    from pleiades_spark.plans.analytics import q_ab_welch

    d = _stage_events(spark, tmp_path, [(0, 3600, 7, "solo", 5.0)])
    r = q_ab_welch(spark, d).collect()[0]
    assert r["t_stat"] is None and r["df_welch"] is None
    assert (r["n_control"] + r["n_treatment"]) == 1
    assert (r["mean_control"] is None) != (r["mean_treatment"] is None)


def test_ab_cuped_matches_independent_computation(spark, tmp_path):
    """CUPED readout vs plain-Python textbook CUPED on hand-built data:
    pre/post cut at the (min+max)/2 epoch midpoint, theta = cov/var
    pooled, adjusted mean = mean_y - theta*(mean_x_arm - mean_x_pool)."""
    import hashlib

    from pleiades_spark.plans.analytics import AB_SALT, q_ab_cuped

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    # 16 users, two events each: one pre (t=1000+uid), one post
    # (t=9000+uid); epoch midpoint = ((1000)+(9015))//2 land all first
    # events pre, all second events post. Covariate correlates with the
    # metric (y = 2x + arm-dependent lift + wiggle).
    rows, eid = [], 0
    users = {}
    for uid in range(16):
        x = round(2.0 + 0.31 * uid, 2)
        y = round(2 * x + (1.5 if arm(uid) else 0.0) + 0.07 * (uid % 3), 2)
        rows.append((eid, 1000 + uid, uid, "click", x)); eid += 1
        rows.append((eid, 9000 + uid, uid, "click", y)); eid += 1
        users[uid] = (x, y)
    d = _stage_events(spark, tmp_path, rows)
    got = {r["arm"]: r for r in q_ab_cuped(spark, d).collect()}

    xs = [users[u][0] for u in users]
    ys = [users[u][1] for u in users]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (n - 1)
    vx = sum((a - mx) ** 2 for a in xs) / (n - 1)
    theta = cov / vx
    for label, a in (("control", 0), ("treatment", 1)):
        sub = [users[u] for u in users if arm(u) == a]
        m_x = sum(s[0] for s in sub) / len(sub)
        m_y = sum(s[1] for s in sub) / len(sub)
        adj = m_y - theta * (m_x - mx)
        r = got[label]
        assert r["n_users"] == len(sub)
        assert abs(r["mean_pre"] - m_x) < 1e-3
        assert abs(r["mean_metric"] - m_y) < 1e-3
        assert abs(r["mean_metric_cuped"] - adj) < 1e-3
        assert abs(r["theta"] - theta) < 1e-3
    # y tracks x strongly by construction: CUPED must remove most
    # variance, and the adjusted arm gap should stay near the true lift
    assert got["control"]["var_reduction_pct"] > 80.0
    gap = (got["treatment"]["mean_metric_cuped"]
           - got["control"]["mean_metric_cuped"])
    assert abs(gap - 1.5) < 0.25


def test_ab_srm_flags_forced_mismatch(spark, tmp_path):
    """Stage users drawn ONLY from control-hashing ids: the overall z
    must exceed the p<0.001 bar and raise srm_flag; a balanced staging
    must not."""
    import hashlib

    from pleiades_spark.plans.analytics import AB_SALT, q_ab_srm

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    controls = [u for u in range(200) if arm(u) == 0][:12]
    rows = [(i, 3600 + i, u, "click", 1.0) for i, u in enumerate(controls)]
    d = _stage_events(spark, tmp_path, rows)
    r = {x["scope"]: x for x in q_ab_srm(spark, d).collect()}["ALL"]
    # 12 vs 0: z = 12/sqrt(12) = 3.4641 > 3.2905
    assert r["n_control"] == 12 and r["n_treatment"] == 0
    assert r["srm_flag"] is True

    both = ([u for u in range(200) if arm(u) == 0][:6]
            + [u for u in range(200) if arm(u) == 1][:6])
    rows = [(i, 3600 + i, u, "click", 1.0) for i, u in enumerate(both)]
    d2 = _stage_events(spark, tmp_path, rows)
    r2 = {x["scope"]: x for x in q_ab_srm(spark, d2).collect()}["ALL"]
    assert r2["srm_flag"] is False and r2["srm_z"] == 0.0


def test_ab_mannwhitney_matches_independent_computation(spark, tmp_path):
    """MW readout vs a plain-Python rank-sum with average ranks and the
    textbook tie-corrected sigma, on data with deliberate ties."""
    import hashlib
    import math

    from pleiades_spark.plans.analytics import AB_SALT, q_ab_mannwhitney

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    # 24 users, values cycle over 6 levels -> heavy ties across arms
    rows, sample = [], {0: [], 1: []}
    for uid in range(24):
        v = [1.0, 1.0, 2.5, 2.5, 2.5, 7.0][uid % 6]
        rows.append((uid, 3600 + uid, uid, "click", v))
        sample[arm(uid)].append(v)
    assert min(len(sample[0]), len(sample[1])) >= 2
    d = _stage_events(spark, tmp_path, rows)
    r = {x["event_type"]: x for x in q_ab_mannwhitney(spark, d).collect()}
    got = r["click"]

    allv = sorted(sample[0] + sample[1])
    n = len(allv)
    # average rank per value
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    r0 = sum(ranks[v] for v in sample[0])
    n0, n1 = len(sample[0]), len(sample[1])
    u0 = r0 - n0 * (n0 + 1) / 2
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    tie_term = sum(t ** 3 - t for t in ties.values())
    sigma2 = n0 * n1 * ((n + 1) - tie_term / (n * (n - 1))) / 12
    z = (u0 - n0 * n1 / 2) / math.sqrt(sigma2)
    assert got["n_control"] == n0 and got["n_treatment"] == n1
    assert abs(got["u_control"] - u0) < 1e-9
    assert abs(got["z_stat"] - z) < 1e-3


def test_ab_mannwhitney_all_equal_values_null_z(spark, tmp_path):
    """Every value identical: one tie group, sigma collapses to 0 ->
    z NULL, U still defined."""
    from pleiades_spark.plans.analytics import q_ab_mannwhitney

    rows = [(i, 3600 + i, i, "click", 4.0) for i in range(10)]
    d = _stage_events(spark, tmp_path, rows)
    got = q_ab_mannwhitney(spark, d).collect()[0]
    assert got["z_stat"] is None


def test_ab_winsorized_caps_outlier_and_matches_p99_rule(spark, tmp_path):
    """One whale user in one arm: the winsorized readout must cap it at
    the pooled p99 (exact integer rule), pull that arm's mean toward the
    bulk, and leave the other arm untouched."""
    import hashlib

    from pleiades_spark.plans.analytics import (
        AB_SALT, q_ab_welch, q_ab_winsorized,
    )

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    treat = [u for u in range(300) if arm(u) == 1]
    ctrl = [u for u in range(300) if arm(u) == 0]
    uids = ctrl[:50] + treat[:50]
    rows = [(i, 3600 + i, u, "click", 10.0 + (i % 7) * 0.5)
            for i, u in enumerate(uids)]
    whale = treat[50]
    rows.append((len(rows), 9000, whale, "click", 100000.0))
    d = _stage_events(spark, tmp_path, rows)

    raw = {r["event_type"]: r for r in q_ab_welch(spark, d).collect()}["click"]
    win = {r["event_type"]: r
           for r in q_ab_winsorized(spark, d).collect()}["click"]
    # p99 rule on 101 rows: cap = min{v : 100*W(v) >= 99*101} -> the
    # 100th smallest value = the largest NON-whale value (13.0)
    vals = sorted(10.0 + (i % 7) * 0.5 for i in range(100))
    assert win["winsor_cap"] == vals[-1]
    assert win["n_treatment"] == raw["n_treatment"] == 51
    # whale inflated the raw treatment mean; the capped one sits in the bulk
    assert raw["mean_treatment"] > 1000
    assert win["mean_treatment"] < 15
    assert win["mean_control"] == raw["mean_control"]  # no whale in control
    # and the capped t is finite/sane where the raw one is whale-dominated
    assert abs(win["t_stat"]) < 30


def test_ab_proportion_matches_hand_computation(spark, tmp_path):
    """Conversion z-test vs plain-Python pooled-variance formula."""
    import hashlib
    import math

    from pleiades_spark.plans.analytics import AB_SALT, q_ab_proportion

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    # every 3rd control user converts; every 2nd treatment user converts
    rows, eid = [], 0
    stats = {0: [0, 0], 1: [0, 0]}  # arm -> [n, converters]
    ctrl = [u for u in range(200) if arm(u) == 0][:30]
    treat = [u for u in range(200) if arm(u) == 1][:30]
    for i, u in enumerate(ctrl + treat):
        a = arm(u)
        stats[a][0] += 1
        rows.append((eid, 3600 + eid, u, "view", 1.0)); eid += 1
        if (a == 0 and i % 3 == 0) or (a == 1 and i % 2 == 0):
            stats[a][1] += 1
            rows.append((eid, 7200 + eid, u, "purchase", 5.0)); eid += 1
    d = _stage_events(spark, tmp_path, rows)
    r = q_ab_proportion(spark, d).collect()[0]
    (n_c, x_c), (n_t, x_t) = stats[0], stats[1]
    assert (r["n_control"], r["conv_control"]) == (n_c, x_c)
    assert (r["n_treatment"], r["conv_treatment"]) == (n_t, x_t)
    p_c, p_t = x_c / n_c, x_t / n_t
    pp = (x_c + x_t) / (n_c + n_t)
    z = (p_c - p_t) / math.sqrt(pp * (1 - pp) * (1 / n_c + 1 / n_t))
    assert abs(r["z_stat"] - z) < 1e-3
    assert abs(r["lift_pct"] - (p_t - p_c) / p_c * 100) < 1e-2


def test_ab_quantile_effect_sees_tail_only_shift(spark, tmp_path):
    """Treatment multiplies only the top decile: qte_p90 must move,
    qte_p50 must stay ~0 — the distributional signal ab_welch's mean
    smears and this readout isolates."""
    import hashlib

    from pleiades_spark.plans.analytics import AB_SALT, q_ab_quantile_effect

    def arm(uid):
        h = int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[:8], 16)
        return h % 2

    ctrl = [u for u in range(400) if arm(u) == 0][:100]
    treat = [u for u in range(400) if arm(u) == 1][:100]
    rows, eid = [], 0
    for us, tail_boost in ((ctrl, 1.0), (treat, 3.0)):
        for i, u in enumerate(us):
            v = 10.0 + (i % 100) * 0.1          # 10.0 .. 19.9 uniform-ish
            if i % 100 >= 85:                   # top 15% only (p90 inside)
                v = v * tail_boost
            rows.append((eid, 3600 + eid, u, "click", round(v, 2)))
            eid += 1
    d = _stage_events(spark, tmp_path, rows)
    r = {x["event_type"]: x
         for x in q_ab_quantile_effect(spark, d).collect()}["click"]
    # medians identical (both arms' mid-distribution untouched) while the
    # p90 effect is the full 3x boost — exactly the signal the mean smears
    assert r["p50_control"] == r["p50_treatment"]
    assert r["qte_p50"] == 0.0
    assert r["p90_treatment"] > 2.5 * r["p90_control"]
    assert r["qte_p90"] > 30
