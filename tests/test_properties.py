"""Property-based tests (hypothesis): pure-Python models vs the engine.

The SSE roundtrip runs entirely driver-side (cheap, many examples); the
Spark expression properties batch each example into one job and cap
example counts to keep the suite fast.
"""

import hashlib

from hypothesis import given, settings, strategies as st

from pleiades_spark.functions.hashing import MINHASH_P, MINHASH_PERMS
from pleiades_spark.sources.sse import SSEEvent, parse_sse_lines

# --- SSE wire roundtrip ----------------------------------------------------

_id_text = st.text(
    st.characters(blacklist_characters="\r\n", blacklist_categories=("Cs",)),
    max_size=40,
).filter(lambda s: not s.startswith(" "))
_data_line = st.text(
    st.characters(blacklist_characters="\r\n", blacklist_categories=("Cs",)),
    max_size=60,
).filter(lambda s: not s.startswith(" "))


@st.composite
def sse_events(draw):
    return SSEEvent(
        id=draw(_id_text),
        type=draw(st.sampled_from(["", "message", "custom"])),
        data=draw(st.lists(_data_line, min_size=1, max_size=4)),
    )


def to_wire(events):
    lines = []
    for ev in events:
        if ev.id:
            lines.append(f"id: {ev.id}")
        if ev.type:
            lines.append(f"event: {ev.type}")
        for d in ev.data:
            lines.append(f"data: {d}")
        lines.append("")
    return lines


@given(st.lists(sse_events(), min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)  # CI box may be CPU-saturated
def test_sse_wire_roundtrip(events):
    parsed = list(parse_sse_lines(to_wire(events)))
    assert len(parsed) == len(events)
    for got, want in zip(parsed, events):
        assert got.id == want.id
        assert got.type == want.type
        assert got.data == want.data


# --- Spark expression twins vs Python models --------------------------------

_word = st.text(st.sampled_from("abcdefg"), min_size=1, max_size=6)
_doc = st.lists(_word, min_size=1, max_size=30).map(" ".join)


def _py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return [text]
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_minhash(text: str) -> list[int]:
    hs = [_py_h32(s) for s in _py_shingles(text)]
    return [min((a * h + b) % MINHASH_P for h in hs) for a, b in MINHASH_PERMS]


@given(st.lists(_doc, min_size=1, max_size=12))
@settings(max_examples=12, deadline=None)
def test_word_shingles_match_python_model(spark, docs):
    from pyspark.sql import functions as F

    from pleiades_spark.functions.text import word_shingles

    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = [r.sh for r in df.select(word_shingles(F.col("text")).alias("sh")).collect()]
    assert got == [_py_shingles(d) for d in docs]


@given(st.lists(_doc, min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_minhash_signature_matches_python_model(spark, docs):
    from pyspark.sql import functions as F

    from pleiades_spark.functions.text import word_shingles
    from pleiades_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = [
        list(r.sig)
        for r in df.select(
            minhash_signature(word_shingles(F.col("text"))).alias("sig")
        ).collect()
    ]
    assert got == [_py_minhash(d) for d in docs]


@given(st.lists(st.text(max_size=20), min_size=1, max_size=20))
@settings(max_examples=10, deadline=None)
def test_h32_matches_python_md5(spark, strings):
    from pyspark.sql import functions as F

    from pleiades_spark.functions.hashing import h32

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r.h for r in df.select(h32(F.col("s")).alias("h")).collect()]
    assert got == [_py_h32(s) for s in strings]


_langs = st.sampled_from(["en", "de", "es", "fr", "zh"])


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), _langs),
        min_size=2, max_size=40, unique_by=lambda t: t[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_temperature_mixture_invariants(spark, rows):
    """Weights sum to 1, rates capped at 1, realized sample bounded by
    the threshold semantics, lut covers exactly the observed langs."""
    from pyspark.sql import functions as F

    from pleiades_spark.operators.corpus import temperature_mixture

    docs = spark.createDataFrame(
        [(i, lang, f"text {i}") for i, lang in rows],
        "doc_id long, lang string, text string",
    )
    sampled, lut = temperature_mixture(docs, budget=20)
    lut_rows = lut.collect()
    assert {r.lang for r in lut_rows} == {lang for _, lang in rows}
    assert abs(sum(r.weight for r in lut_rows) - 1.0) < 1e-9
    assert all(0 <= r.r10k < 10_000 and r.n_epochs >= 0 for r in lut_rows)
    # epoch accounting: every doc of a lang appears exactly n_epochs or
    # n_epochs+1 times in the up-sampled output
    from collections import Counter

    per_lang_epochs = {r.lang: r.n_epochs for r in lut_rows}
    copies = Counter((r.lang, r.doc_id) for r in sampled.collect())
    for (lang, _), c in copies.items():
        assert c in (per_lang_epochs[lang], per_lang_epochs[lang] + 1)
    # selection is the deterministic hash bucket — rerun is identical
    ids1 = sorted(r.doc_id for r in sampled.collect())
    ids2 = sorted(r.doc_id for r in temperature_mixture(docs, budget=20)[0].collect())
    assert ids1 == ids2


@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=30, unique=True),
    st.lists(st.integers(0, 500), min_size=1, max_size=30, unique=True),
    st.sets(st.integers(0, 500), max_size=10),
)
@settings(max_examples=10, deadline=None)
def test_snapshot_diff_partitions_ids(spark, old_ids, new_ids, changed):
    """Every id appears exactly once; statuses match set algebra."""
    from pleiades_spark.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(i, f"text {i}") for i in old_ids], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, f"text {i} v2" if i in changed else f"text {i}") for i in new_ids],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    o, n = set(old_ids), set(new_ids)
    assert set(got) == o | n
    for i in o | n:
        if i not in o:
            assert got[i] == "added"
        elif i not in n:
            assert got[i] == "removed"
        elif i in changed:
            assert got[i] == "changed"
        else:
            assert got[i] == "unchanged"


# --- round-5 analytics math ----------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=200))
def test_cusum_closed_form_equals_recurrence(xs):
    """The Spark plan computes S_t = P_t − min(0, min_{j≤t} P_j) with two
    windows; the definition is the recurrence S_t = max(0, S_{t−1} + v_t).
    They must agree on every prefix for any integer series (the identity
    q_cusum_changepoint's correctness rests on)."""
    n, tot = len(xs), sum(xs)
    vs = [n * x - tot for x in xs]
    s_rec, p, mn = 0, 0, 0
    for v in vs:
        s_rec = max(0, s_rec + v)
        p += v
        mn = min(mn, p)
        assert s_rec == p - min(mn, 0)


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4), st.integers(1, 50)),
        min_size=1,
        max_size=20,
    )
)
def test_pagerank_integer_iteration_bounds(edges):
    """Python model of q_pagerank_types' integer update: every rank stays
    ≥ the teleport floor, total mass never exceeds the scale, and the
    deterministic flooring loss per iteration is bounded by one unit per
    floor op (≤ 2·N + |E|)."""
    from collections import defaultdict

    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n_map = defaultdict(int)
    for a, b, w in edges:
        n_map[(a, b)] += w
    out = defaultdict(int)
    for (a, _), w in n_map.items():
        out[a] += w
    N = len(nodes)
    scale = 1_000_000_000
    base = (scale // 8) // N
    r = {v: scale // N for v in nodes}
    for _ in range(5):
        s = defaultdict(int)
        for (a, b), w in n_map.items():
            s[b] += (r[a] * w) // out[a]
        r = {v: base + (7 * s[v]) // 8 for v in nodes}
        total = sum(r.values())
        assert all(rv >= base for rv in r.values())
        assert total <= scale
        # flooring can lose at most 1 unit per integer division plus the
        # teleport remainder: N divisions for base, N for the 7/8 damp,
        # |E| for contributions (each scaled by ≤7/8 damping), plus the
        # mass parked on dangling nodes (no outgoing edges) which the
        # update intentionally drops — exclude graphs with dangling mass
        # from the tight bound.
        if all(v in out for v in nodes):
            assert total >= scale - 8 * (2 * N + len(n_map) + 1)


@given(
    st.integers(1, 100),   # tf
    st.integers(1, 1000),  # dl
    st.integers(1, 999),   # df < n_docs
)
def test_bm25_term_score_monotone_in_tf(tf, dl, df):
    """The per-term BM25 score must increase strictly with tf and
    decrease with document length (the two properties the ranking
    relies on), for any idf > 0."""
    import math

    n_docs, tot_tokens = 1000, 50000
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(tf_, dl_):
        norm = 0.25 + 0.75 * ((dl_ * n_docs) / tot_tokens)
        return idf * (tf_ * 2.25) / (tf_ + 1.25 * norm)

    assert score(tf + 1, dl) > score(tf, dl)
    assert score(tf, dl + 100) < score(tf, dl)


# --- Welch core: decimal-widened moment math vs pure Python ----------------

_cents = st.integers(min_value=-10**8, max_value=10**8)


@given(
    c=st.lists(_cents, min_size=2, max_size=12),
    t=st.lists(_cents, min_size=2, max_size=12),
)
@settings(max_examples=12, deadline=None)
def test_welch_stats_matches_python_at_any_magnitude(spark, c, t):
    """welch_stats must agree with the textbook formula computed in pure
    Python — including cent magnitudes (±10⁸ per row) whose squared sums
    overflow int64, the exact regression the sf10 bench caught. Moments
    are fed as a literal frame, so hypothesis drives the decimal(38,0)
    combination path directly."""
    import math

    from pleiades_spark.plans.analytics import welch_stats

    g = spark.createDataFrame(
        [(
            "x",
            len(c), sum(c), sum(v * v for v in c),
            len(t), sum(t), sum(v * v for v in t),
        )],
        "event_type string, n_c long, s_c long, ss_c long,"
        " n_t long, s_t long, ss_t long",
    )
    r = welch_stats(g).collect()[0]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    a, b = var(c) / len(c), var(t) / len(t)
    if a + b <= 0:
        assert r["t_stat"] is None and r["df_welch"] is None
        return
    tt = (sum(c) / len(c) - sum(t) / len(t)) / math.sqrt(a + b)
    df = (a + b) ** 2 / (a * a / (len(c) - 1) + b * b / (len(t) - 1))
    # quantized to 4 decimals on huge magnitudes: compare relatively
    assert abs(r["t_stat"] - tt) <= max(1e-3, abs(tt) * 1e-6)
    assert abs(r["df_welch"] - df) <= max(1e-3, abs(df) * 1e-6)
    assert abs(r["mean_control"] - sum(c) / len(c) / 100) <= max(
        1e-3, abs(sum(c) / len(c) / 100) * 1e-9
    )
