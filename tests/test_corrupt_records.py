"""§1.3 schema-tolerance: malformed events are kept and counted.

The reference logs parse failures but still counts the event toward
pleiades_total (aggregator.go:34-40). Engine equivalents, both tested:
PERMISSIVE json reads with a corrupt-record column (file sources), and
from_json null-structs still firing the unconditional counter (stream
parse — covered in test_recentchange too).
"""

from pyspark.sql import functions as F, types as T


def test_permissive_json_keeps_corrupt_rows(spark, tmp_path):
    path = str(tmp_path / "events.json")
    lines = [
        '{"wiki": "hewiki", "type": "edit"}',
        "this is not json at all {",
        '{"wiki": "enwiki", "type": "new"}',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    schema = T.StructType(
        [
            T.StructField("wiki", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    rows = df.collect()
    assert len(rows) == 3  # malformed row retained, not dropped
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["wiki"] is None
    # every row — including the corrupt one — counts toward total,
    # while the dimension counter only fires for parsed rows
    agg = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("wiki").alias("with_wiki"),
    ).collect()[0]
    assert (agg["total"], agg["with_wiki"]) == (3, 2)


def test_failfast_mode_rejects_corrupt(spark, tmp_path):
    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        f.write('{"wiki": "x"}\nnot json {\n')
    schema = T.StructType([T.StructField("wiki", T.StringType())])
    df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    try:
        df.collect()
        raise AssertionError("expected FAILFAST to raise")
    except Exception as e:  # noqa: BLE001
        assert "Malformed" in str(e) or "FAILFAST" in str(e)
