"""Scale-up fixture generator: replicate an SF directory K× with key
shifts that preserve referential integrity (VERDICT r01 next-round #9 —
an sf1 scaling bench needs sf1 data, and /root/testdata is read-only).

    python tools/gen_scale_fixture.py /root/testdata/sf0.1 testdata_sf1 10

Design (mirrors how TPC-H scales):
  * region/nation stay fixed (real dims don't grow with volume);
  * every fact/entity table is unioned K times, copy i shifting each key
    column by i·stride — the SAME shift lands on both sides of every FK
    (orders.o_custkey and customer.c_custkey, etc.), so join fan-outs are
    identical to the source SF and scaling should be ~linear;
  * event timestamps are left alone: day cardinality is a property of
    the collection window, not the volume (10× events/day, same days);
  * document text gets a per-copy token suffix for copies > 0 — without
    it every doc would have K-1 exact twins and the dedup queries would
    measure a 45×-pairs corpus, not a 10×-rows one;
  * embeddings get deterministic per-copy perturbation (direction, not
    scale — cosine is scale-invariant) for the same reason.

Copy 0 is bit-identical to the source, so id-anchored query constants
(query vectors vec_id < 5, point lookups) keep their originals.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STRIDES = {
    "c_custkey": 10**7,
    "s_suppkey": 10**6,
    "p_partkey": 10**7,
    "o_orderkey": 10**8,
    "o_custkey": 10**7,
    "l_orderkey": 10**8,
    "l_partkey": 10**7,
    "l_suppkey": 10**6,
    "event_id": 10**8,
    "user_id": 10**7,
    "doc_id": 10**7,
    "vec_id": 10**7,
}

FIXED_DIMS = ("region", "nation")
SCALED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _mutated_text(cpy, pct: int):
    """Token-level edits at ~pct % — the REALISTIC near-dup text mode
    (round 13, verdict item #3). Each token of copy i independently
    gets a per-copy suffix when a deterministic hash of (doc_id,
    position, copy) falls under pct; two copies of one base doc then
    share a token iff NEITHER side edited it, so with 3-word shingles
    the expected cross-copy shingle Jaccard is s/(2−s), s=(1−p)⁶:
    p=5 % → ≈0.60 (at the dedup threshold — hard mode), p=3 % → ≈0.71.
    Suffix mode (the default) rewrites EVERY token, so no shingle
    survives across copies and the scaled corpora never stressed
    doc_dedup_reps' verify/CC stages under true text multiplicity
    (BENCH_SF100.md headline). xxhash64 is fine here — fixture
    generation is not an oracle-replayed domain."""
    toks = F.split(F.col("text"), " ")
    edited = F.transform(
        toks,
        lambda t, j: F.when(
            F.pmod(F.xxhash64(F.col("doc_id"), j, cpy), 100) < pct,
            F.concat(t, F.lit("zw"), cpy.cast("string")),
        ).otherwise(t),
    )
    return F.array_join(edited, " ")


def _one_copy(
    df: DataFrame, table: str, i: int, doc_mode: str = "suffix",
    mutate_pct: int = 5,
) -> DataFrame:
    if i == 0:
        return df
    for col in df.columns:
        if col in STRIDES:
            df = df.withColumn(col, F.col(col) + F.lit(i * STRIDES[col]))
    if table == "documents":
        if doc_mode == "mutate":
            new_text = _mutated_text(F.lit(i).cast("bigint"), mutate_pct)
        else:
            # suffix every token → no shingle survives across copies
            new_text = F.regexp_replace(F.col("text"), r"(\S+)", f"$1zw{i}")
        df = df.withColumn("text", new_text).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if table == "embeddings":
        # deterministic direction perturbation; keeps FLOAT[] schema
        df = df.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: x
                + (
                    F.pmod(F.col("vec_id") * 131 + j * 31 + F.lit(i * 17), F.lit(97))
                    / 97.0
                    - 0.5
                )
                * 0.05,
            ).cast("array<float>"),
        )
    return df


def _all_copies_wide(
    df: DataFrame, table: str, k: int, doc_mode: str = "suffix",
    mutate_pct: int = 5,
) -> DataFrame:
    """Vectorized equivalent of the unionAll-of-_one_copy loop for LARGE
    k (the sf100 probe's k=1000 would otherwise build a 1000-branch
    union plan): one explode(sequence) per source row, shifts computed
    from the _copy column. Produces the same values as the loop —
    keys shift FIRST (so the embedding perturbation sees the shifted
    vec_id, exactly like _one_copy's column order), copy 0 stays
    bit-identical via the when() guards; _copy multiplications run in
    bigint (999 × 10⁸ overflows int under ANSI)."""
    out = df.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_copy"),
    )
    cpy = F.col("_copy").cast("bigint")
    for col in df.columns:
        if col in STRIDES:
            out = out.withColumn(
                col, F.col(col) + cpy * F.lit(STRIDES[col]).cast("bigint")
            )
    if table == "documents":
        if doc_mode == "mutate":
            changed = _mutated_text(cpy, mutate_pct)
        else:
            changed = F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1zw"), F.col("_copy").cast("string")),
            )
        out = out.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(changed),
            # guard n_chars like text: copy 0 must stay bit-identical even
            # if the source fixture's n_chars ever disagrees with
            # length(text) (ADVICE r9)
        ).withColumn(
            "n_chars",
            F.when(F.col("_copy") == 0, F.col("n_chars")).otherwise(
                F.length("text").cast("long")
            ),
        )
    if table == "embeddings":
        perturbed = F.transform(
            F.col("embedding"),
            lambda x, j: x
            + (
                F.pmod(
                    F.col("vec_id") * 131 + j * 31 + F.col("_copy") * 17,
                    F.lit(97),
                )
                / 97.0
                - 0.5
            )
            * 0.05,
        ).cast("array<float>")
        out = out.withColumn(
            "embedding",
            F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                perturbed
            ),
        )
    return out.drop("_copy")


def scale_table(
    spark: SparkSession, src: str, out: str, table: str, k: int,
    doc_mode: str = "suffix", mutate_pct: int = 5,
) -> int:
    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    if table in FIXED_DIMS:
        scaled = df
    else:
        # Fail fast on stride collisions: scaling an ALREADY-SCALED
        # fixture reuses the same shift space, so copy i of source-copy
        # j lands on key + (i+j)·stride — multiplicity up to k, NOT k
        # distinct keys. (Round-8 discovery: sf1→sf10 produced a "sf10"
        # with only 19 % distinct keys; join fan-outs were ~5× true
        # sf10. Always scale from the BASE fixture: sf0.1 → k=100.)
        keyed = [c for c in df.columns if c in STRIDES]
        if keyed:
            maxes = df.agg(
                *[F.max(F.col(c)).alias(c) for c in keyed]
            ).collect()[0]
            for c in keyed:
                if maxes[c] is not None and maxes[c] >= STRIDES[c]:
                    raise SystemExit(
                        f"{table}.{c}: max {maxes[c]} >= stride "
                        f"{STRIDES[c]} — input is already a scaled "
                        f"fixture; copy shifts would collide. Scale "
                        f"from the base fixture with a larger k instead."
                    )
        if k > 100:
            scaled = _all_copies_wide(df, table, k, doc_mode, mutate_pct)
        else:
            scaled = _one_copy(df, table, 0, doc_mode, mutate_pct)
            for i in range(1, k):
                scaled = scaled.unionAll(
                    _one_copy(df, table, i, doc_mode, mutate_pct)
                )
    dest = os.path.join(out, f"{table}.parquet")
    # repartition: multi-file output like a real warehouse table (and the
    # downstream scans parallelize without relying on parquet row groups)
    n_out = 1 if table in FIXED_DIMS else max(4, min(32, k * 2))
    scaled.repartition(n_out).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest).count()


def main() -> None:
    # --mutate-docs[=PCT] anywhere on the line selects the near-dup text
    # mode (token-level edits, default 5 % ≈ 0.6 cross-copy Jaccard)
    doc_mode, mutate_pct = "suffix", 5
    pos = []
    for a in sys.argv[1:]:
        if a.startswith("--mutate-docs"):
            doc_mode = "mutate"
            if "=" in a:
                mutate_pct = int(a.split("=", 1)[1])
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            pos.append(a)
    src = pos[0] if len(pos) > 0 else "/root/testdata/sf0.1"
    out = pos[1] if len(pos) > 1 else "testdata_sf1"
    k = int(pos[2]) if len(pos) > 2 else 10
    # optional 4th arg: comma-separated table subset (dims always copied)
    # — the sf100 probe only needs events/documents/embeddings; skipping
    # lineitem/orders keeps the fourth-decade fixture ~3 GB, not 18 GB
    subset = set(pos[3].split(",")) if len(pos) > 3 else None
    if subset is not None and (unknown := subset - set(SCALED)):
        raise SystemExit(f"unknown table(s) in subset: {sorted(unknown)}")

    from pleiades_spark.session import get_spark

    spark = get_spark("gen_scale_fixture")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table in FIXED_DIMS + SCALED:
        if subset is not None and table in SCALED and table not in subset:
            continue
        n = scale_table(spark, src, out, table, k, doc_mode, mutate_pct)
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
