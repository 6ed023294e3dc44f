"""N-night persisted star-index lifecycle (round 13, verdict item #2):
multi-night rolls stay LINEAR in corpus size, the artifact is marker-
protected, compaction preserves content while collapsing file counts,
and the dedup-nightly CLI drives the whole lifecycle end-to-end.
"""

import glob
import json
import os

from pyspark.sql import functions as F

from pleiades_spark.functions.hashing import LSH_BANDS


def _doc_slices(spark, n_groups=5, per_group=12, singles=60, n_slices=4):
    """Copy groups spread round-robin across slices (every night brings
    new members of existing groups AND fresh singletons)."""
    slices = [[] for _ in range(n_slices)]
    for g in range(n_groups):
        base = " ".join(f"g{g}w{i}" for i in range(80))
        for c in range(per_group):
            text = f"{base} t{g}x{c}"
            slices[c % n_slices].append((g * 100 + c, text))
    for i in range(singles):
        slices[i % n_slices].append(
            (10_000 + i, " ".join(f"u{i}v{j}" for j in range(60)))
        )
    return [
        spark.createDataFrame(
            [(i, t, len(t)) for i, t in s],
            "doc_id long, text string, n_chars long",
        )
        for s in slices
    ], [len(s) for s in slices]


def test_three_night_roll_linearity_and_compaction(spark, tmp_path):
    from pleiades_spark.operators.dedup import (
        compact_reps_index,
        doc_dedup_reps_from_index,
        write_reps_index,
    )

    dfs, sizes = _doc_slices(spark)
    idx = [str(tmp_path / f"idx{k}") for k in range(4)]
    write_reps_index(dfs[0], idx[0], 0.6)
    assert os.path.isfile(os.path.join(idx[0], "_INDEX_OK"))

    counts = []
    res = None
    for night in (1, 2, 3):
        res = doc_dedup_reps_from_index(
            dfs[night], idx[night - 1], 0.6, out_index_path=idx[night]
        )
        n = res.count()
        assert n == sum(sizes[: night + 1])  # every id assigned once
        assert os.path.isfile(os.path.join(idx[night], "_INDEX_OK"))
        d = spark.read.parquet(f"{idx[night]}/doc_ids").count()
        e = spark.read.parquet(f"{idx[night]}/edges").count()
        b = spark.read.parquet(f"{idx[night]}/band_index").count()
        h = spark.read.parquet(f"{idx[night]}/rep_hsets").count()
        assert d == n
        counts.append((d, e, b, h))

    # LINEARITY: every table bounded by corpus size × LSH_BANDS (edges
    # and buckets are at most one per (doc, band); rep hsets at most one
    # per bucket) — the growth audit the round-12 verdict asked for.
    for d, e, b, h in counts:
        assert e <= d * LSH_BANDS
        assert b <= d * LSH_BANDS
        assert h <= b
    # monotone coverage growth night over night
    assert counts[0][0] < counts[1][0] < counts[2][0]

    # night-3 semantics: copy groups split across ALL FOUR slices are
    # fully merged; clusters never mix groups (edge-verified precision)
    final = {r.doc_id: r.rep_id for r in res.collect()}
    for g in range(5):
        assert len({final[g * 100 + c] for c in range(12)}) == 1
    by_rep: dict = {}
    for did, rep in final.items():
        by_rep.setdefault(rep, []).append(did)
    for members in by_rep.values():
        groups = {m // 100 for m in members if m < 10_000}
        assert len(groups) <= 1

    # COMPACTION: content-identical, file counts collapse to the size
    # target (tiny tables → exactly 1 file each), marker written last
    comp = str(tmp_path / "idxc")
    written = compact_reps_index(spark, idx[3], comp)
    assert set(written) == {"band_index", "edges", "rep_hsets", "doc_ids"}
    assert os.path.isfile(os.path.join(comp, "_INDEX_OK"))
    for t, n in written.items():
        assert n == 1
        assert len(glob.glob(f"{comp}/{t}/*.parquet")) == 1
        assert len(glob.glob(f"{idx[3]}/{t}/*.parquet")) >= 1
    # a night-4 increment against compacted vs original: identical
    inc = spark.createDataFrame(
        [(g * 100 + 90, " ".join(f"g{g}w{i}" for i in range(80)) + " n4")
         for g in range(5)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    a = {r.doc_id: r.rep_id
         for r in doc_dedup_reps_from_index(inc, idx[3], 0.6).collect()}
    c = {r.doc_id: r.rep_id
         for r in doc_dedup_reps_from_index(inc, comp, 0.6).collect()}
    assert a == c


def test_compact_embedding_index_preserves_meta(spark, tmp_path):
    from pleiades_spark.operators.dedup import (
        compact_reps_index,
        embedding_dedup_reps_from_index,
        write_emb_reps_index,
    )

    rows = []
    for g in range(4):
        base = [((g * 31 + j) % 13) - 6.0 for j in range(16)]
        for c in range(6):
            rows.append((g * 10 + c, [x + 0.01 * c for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    old = emb.filter(F.col("vec_id") % 2 == 1)
    new = emb.filter(F.col("vec_id") % 2 == 0)
    idx, comp = str(tmp_path / "eidx"), str(tmp_path / "eidxc")
    write_emb_reps_index(old, idx, 0.9, rows_bits=8)
    written = compact_reps_index(spark, idx, comp)
    assert set(written) == {"meta", "band_index", "edges", "rep_vecs", "vec_ids"}
    assert (
        spark.read.parquet(f"{comp}/meta").collect()[0]["rows_bits"] == 8
    )
    a = {r.vec_id: r.rep_id
         for r in embedding_dedup_reps_from_index(new, idx, 0.9).collect()}
    c = {r.vec_id: r.rep_id
         for r in embedding_dedup_reps_from_index(new, comp, 0.9).collect()}
    assert a == c


def test_torn_index_rejected(spark, tmp_path):
    """A marker-less (torn / pre-marker-vintage) index fails fast with
    the rebuild instruction — for the nightly readers AND compaction."""
    import pytest

    from pleiades_spark.operators.dedup import (
        compact_reps_index,
        doc_dedup_reps_from_index,
        write_reps_index,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} " * 30, 90) for i in range(8)],
        "doc_id long, text string, n_chars long",
    )
    idx = str(tmp_path / "idx")
    write_reps_index(docs, idx, 0.6)
    os.remove(os.path.join(idx, "_INDEX_OK"))  # simulate the torn roll
    with pytest.raises(ValueError, match="_INDEX_OK"):
        doc_dedup_reps_from_index(docs, idx, 0.6)
    with pytest.raises(ValueError, match="_INDEX_OK"):
        compact_reps_index(spark, idx, str(tmp_path / "c"))


def test_dedup_nightly_cli_end_to_end(spark, tmp_path, capsys):
    """bootstrap → nightly roll (+assignments out) → compact, all through
    the CLI personality (the cmd_corpus e2e pattern)."""
    from pleiades_spark.cli import build_parser

    dfs, sizes = _doc_slices(spark, n_groups=3, per_group=8, singles=24,
                             n_slices=2)
    base_pq = str(tmp_path / "base.parquet")
    inc_pq = str(tmp_path / "inc.parquet")
    dfs[0].write.parquet(base_pq)
    dfs[1].write.parquet(inc_pq)
    idx0, idx1, idxc = (str(tmp_path / d) for d in ("i0", "i1", "ic"))
    out = str(tmp_path / "assigns.parquet")
    parser = build_parser()

    args = parser.parse_args(
        ["dedup-nightly", "--bootstrap", "--in", base_pq, "--index", idx0]
    )
    assert args.fn(args) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mode"] == "bootstrap" and stats["n_ids"] == sizes[0]

    args = parser.parse_args(
        ["dedup-nightly", "--in", inc_pq, "--index", idx0,
         "--roll", idx1, "--out", out]
    )
    assert args.fn(args) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mode"] == "nightly"
    assert stats["n_ids"] == sum(sizes)
    assert 0 < stats["n_clusters"] < stats["n_ids"]
    assert spark.read.parquet(out).count() == sum(sizes)

    args = parser.parse_args(
        ["dedup-nightly", "--compact", "--index", idx1, "--roll", idxc]
    )
    assert args.fn(args) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mode"] == "compact"
    assert set(stats["files"]) == {"band_index", "edges", "rep_hsets", "doc_ids"}
