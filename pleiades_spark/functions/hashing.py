"""Cross-engine deterministic hashing.

Sketch-based operators (MinHash, SimHash, fingerprinting) are normally
impossible to oracle-check because every engine ships a different hash
function. Here the base hash is derived from md5 — identical in Spark and
DuckDB — so the ENTIRE sketch pipeline (signatures, bands, candidate
pairs) is reproducible in the oracle, giving the dedup operators the same
full-strength hash-match gate as plain SQL queries.

h32(s) = first 8 hex chars of md5(s) parsed as an integer ∈ [0, 2^32).
Permutation hashes h_i(s) = (a_i * h32(s) + b_i) mod P with P = 2^31 - 1
and a_i < 2^20 keep every intermediate < 2^63 (no overflow under Spark
ANSI mode or DuckDB).

Scale note: md5 is marginally slower than xxhash64, but it is a JVM
built-in evaluated inside whole-stage codegen — no Python crossing. For a
pure-Spark deployment where oracle parity is not needed, swap H32_SPARK
for xxhash64 and everything else stands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for permutation hashes (Mersenne prime 2^31 - 1).
MINHASH_P = 2_147_483_647

# Fixed permutation parameters (a, b) — generated once from a seeded PRNG,
# frozen as literals so Spark and DuckDB share them. a < 2^20 bounds
# a * h32 < 2^52.
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (370440, 550468), (918772, 707105), (264925, 652466), (962222, 921966),
    (731400, 121936), (646415, 317244), (91977, 434126), (313373, 817678),
    (506645, 120835), (579818, 437641), (683, 738083), (973541, 135221),
)

NUM_PERM = len(MINHASH_PERMS)  # 12
LSH_BANDS = 4
LSH_ROWS = 3  # NUM_PERM = LSH_BANDS * LSH_ROWS; threshold ≈ (1/4)^(1/3) ≈ 0.63


def h32(col: Column) -> Column:
    """32-bit deterministic hash of a string column (md5-derived, JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_prod(col: Column) -> Column:
    """Production 32-bit hash: xxhash64 (JVM intrinsic, whole-stage
    codegen) folded to the low 32 bits — ∈ [0, 2^32), same range contract
    as :func:`h32`, so every downstream perm/bitmap works unchanged.

    ~an order of magnitude cheaper per row than md5 (no hex round-trip,
    no cryptographic rounds). NOT reproducible in DuckDB — use only where
    the oracle does not need to replay the hash itself (e.g. Bloom-prune
    followed by an exact verify join: no false negatives ⇒ the final
    answer is hash-family-independent). Gate queries that replay sketch
    ERROR cell-for-cell (CMS, KMV, MinHash) must stay on md5-h32
    (CLAUDE.md invariant)."""
    return F.xxhash64(col).bitwiseAND(F.lit(0xFFFFFFFF))


def h32_sql(expr: str) -> str:
    """DuckDB twin of :func:`h32`."""
    return f"CAST('0x' || substring(md5({expr}), 1, 8) AS BIGINT)"


def perm_hash(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation of a pre-computed h32 value."""
    return (F.lit(a) * hash_col + F.lit(b)) % F.lit(MINHASH_P)


def perm_hash_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * {expr} + {b}) % {MINHASH_P})"


# --- signed random projections (cosine LSH) --------------------------------
#
# Hyperplane components are derived from md5 of "srp-<plane>-<dim>" at
# import time and FROZEN as float literals, so the Spark plan and the
# DuckDB oracle consume the exact same doubles (h/2^31 - 1 is a division
# by a power of two — exact in binary, and repr() round-trips it).
# Mirrors the reference's sketch determinism strategy; cf. the MinHash
# permutation table above.

SRP_DIM = 64       # fixture embedding dimensionality
SRP_PLANES_N = 16  # sign bits per vector (gate configuration)
SRP_BANDS = 4
SRP_ROWS = 4       # SRP_PLANES_N = SRP_BANDS * SRP_ROWS

# SCALING RULE: a band key of r bits yields only 2^r buckets, so candidate
# volume grows as n²/2^r — r must scale with the corpus: r ≈ log2(n / B)
# for a target bucket size B. The 4-bit gate config suits the 500-5000
# vector fixtures; the bench/scale path uses 8-bit bands (srp_planes(32)),
# and a 100 TB corpus wants r ≈ 24-32 plus the hot-bucket cap.


def _srp_component(plane: int, dim: int) -> float:
    import hashlib

    h = int(hashlib.md5(f"srp-{plane}-{dim}".encode()).hexdigest()[:8], 16)
    return h / 2**31 - 1.0  # uniform in [-1, 1)


def srp_planes(n: int, dim: int = SRP_DIM) -> tuple[tuple[float, ...], ...]:
    """First ``n`` frozen hyperplanes (md5-derived, any count, identical
    doubles on both engines — see module docstring)."""
    return tuple(
        tuple(_srp_component(p, d) for d in range(dim)) for p in range(n)
    )


SRP_PLANES: tuple[tuple[float, ...], ...] = srp_planes(SRP_PLANES_N)
