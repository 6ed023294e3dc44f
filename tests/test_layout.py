"""Z-order layout: key correctness + the physical effect (per-file min-max
span shrink on BOTH clustered columns, i.e. real scan-pruning power)."""

import glob

import pytest
from pyspark.sql import functions as F

from pleiades_spark import catalog
from pleiades_spark.operators.layout import zorder_write, zvalue

SF_DIR = "/root/testdata/sf0.001"


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 42)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)


def test_zvalue_locality_is_two_dimensional(spark):
    """Sorting by Z must localize BOTH coordinates: adjacent Z values
    differ by a bounded (x, y) step far more often than a plain
    concatenated sort key would."""
    assert _morton_py(3, 3) < _morton_py(0, 4) < _morton_py(4, 4)


@pytest.fixture(scope="module")
def spans(spark, tmp_path_factory):
    """Per-file (partkey, suppkey) min-max spans for a z-ordered vs an
    unclustered 8-file write of the same table."""
    li = catalog.load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    base = tmp_path_factory.mktemp("layout")
    zpath = str(base / "zorder")
    ppath = str(base / "plain")
    zorder_write(li, "l_partkey", "l_suppkey", zpath, n_files=8)
    li.repartition(8).write.mode("overwrite").parquet(ppath)

    def per_file_spans(path):
        out = []
        for f in sorted(glob.glob(path + "/part-*.parquet")):
            row = (
                spark.read.parquet(f)
                .agg(
                    (F.max("l_partkey") - F.min("l_partkey")).alias("ps"),
                    (F.max("l_suppkey") - F.min("l_suppkey")).alias("ss"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            if row.n:
                out.append((row.ps, row.ss))
        return out

    return per_file_spans(zpath), per_file_spans(ppath)


def test_zorder_files_have_tight_minmax_on_both_columns(spans):
    zspans, pspans = spans
    assert len(zspans) >= 4  # range partitioner actually spread the data
    z_part = sum(s[0] for s in zspans) / len(zspans)
    z_supp = sum(s[1] for s in zspans) / len(zspans)
    p_part = sum(s[0] for s in pspans) / len(pspans)
    p_supp = sum(s[1] for s in pspans) / len(pspans)
    # an unclustered write leaves every file spanning ~the full key range;
    # z-order must shrink the mean span on BOTH columns simultaneously
    assert z_part < 0.6 * p_part, (z_part, p_part)
    assert z_supp < 0.6 * p_supp, (z_supp, p_supp)
