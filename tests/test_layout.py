import os

import pytest
from pyspark.sql import functions as F

from pandance_spark.functions.layout import write_zordered, zorder_by, zorder_key


def _zkey(vals, mins, maxs, bits):
    """Reference Morton interleave in plain Python."""
    key, n, top = 0, len(vals), (1 << bits) - 1
    for j, (v, lo, hi) in enumerate(zip(vals, mins, maxs)):
        span = hi - lo
        v = max(0, min(v - lo, span))
        rank = (v * top) // span if span else 0
        for i in range(bits):
            key |= ((rank >> i) & 1) << (i * n + j)
    return key


def test_zorder_key_matches_reference(spark):
    rows = [(i, (i * 37) % 1000, (i * 91) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = {
        r["id"]: r["__zorder"]
        for r in zorder_by(df, ["x", "y"], bits=8).collect()
    }
    mins = [min(r[1] for r in rows), min(r[2] for r in rows)]
    maxs = [max(r[1] for r in rows), max(r[2] for r in rows)]
    for i, x, y in rows:
        assert out[i] == _zkey([x, y], mins, maxs, 8)


def test_zorder_clusters_both_dims(spark):
    # chunks of the z-sorted order must be tighter on y than an
    # x-only sort (the whole point of the layout)
    import statistics

    rows = [(i, (i * 37) % 1000, (i * 91) % 500) for i in range(200)]
    mins = [0, 0]
    maxs = [max(r[1] for r in rows), max(r[2] for r in rows)]

    def spread(sorted_rows, dim):
        per = len(sorted_rows) // 10
        return statistics.mean(
            (
                max(r[dim] for r in sorted_rows[g * per : (g + 1) * per])
                - min(r[dim] for r in sorted_rows[g * per : (g + 1) * per])
            )
            / maxs[dim - 1]
            for g in range(10)
        )

    by_z = sorted(rows, key=lambda r: _zkey([r[1], r[2]], mins, maxs, 8))
    by_x = sorted(rows, key=lambda r: r[1])
    assert spread(by_z, 2) < spread(by_x, 2)  # y tight under z-order
    assert spread(by_z, 1) < 0.7              # x still far from full-width


def test_zorder_guards(spark):
    df = spark.createDataFrame([(1, 1.5)], ["a", "b"])
    with pytest.raises(ValueError):
        zorder_by(df, ["b"])  # non-integral column
    with pytest.raises(ValueError):
        zorder_key([F.col("a")], [0], [10], bits=0)
    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 4, [0] * 4, [10] * 4, bits=16)  # 64 bits
    with pytest.raises(ValueError):
        zorder_key([F.col("a")], [0], [1 << 45], bits=16)  # 2^53 overflow
    # clamp: out-of-range values pin to the ends, never corrupt the key
    out = (
        spark.createDataFrame([(5,), (-100,), (900,)], ["a"])
        .select(zorder_key([F.col("a")], [0], [10], bits=4).alias("k"))
        .collect()
    )
    ks = sorted(r["k"] for r in out)
    assert ks[0] == 0 and ks[-1] == 15  # clamped to rank 0 / top


def test_write_zordered_roundtrip(spark, tmp_path):
    rows = [(i, (i * 37) % 1000, (i * 91) % 500) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    path = os.path.join(str(tmp_path), "z")
    write_zordered(df, path, ["x", "y"], n_files=4, bits=8)
    back = spark.read.parquet(path)
    assert back.columns == ["id", "x", "y"]  # key column dropped
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_zorder_null_and_empty_semantics(spark, tmp_path):
    # review fixes: NULL in any clustered column -> NULL key (never
    # silently clamped to the top rank); empty input still writes
    from pandance_spark.functions.layout import (
        write_zordered,
        zorder_by,
        zorder_key,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 10)], "id int, a int"
    )
    out = {
        r["id"]: r["k"]
        for r in df.select(
            "id", zorder_key([F.col("a")], [0], [10], bits=4).alias("k")
        ).collect()
    }
    assert out[2] is None
    assert out[3] == 15 and out[1] is not None and out[1] != 15

    # empty input: writes an empty dataset instead of raising
    empty = df.filter("id > 99").select("id", "a")
    path = os.path.join(str(tmp_path), "empty")
    write_zordered(empty, path, ["a"], n_files=1)
    assert spark.read.parquet(path).count() == 0

    # pre-existing key column: explicit error, no silent data loss
    with pytest.raises(ValueError):
        zorder_by(df.withColumnRenamed("a", "__zorder"), ["__zorder"])


def test_plan_output_partitions_and_write_sized(spark, tmp_path):
    from pandance_spark.functions.layout import (
        compact_files,
        plan_output_partitions,
        write_sized,
    )
    import os

    df = spark.range(200_000).selectExpr(
        "id", "CAST(id AS STRING) AS s", "id * 2.5 AS v"
    )
    # fragment the source: many tiny files
    frag = str(tmp_path / "frag")
    df.repartition(64).write.parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32

    src = spark.read.parquet(frag)
    n_planned = plan_output_partitions(src, target_bytes=1 << 20)
    assert n_planned >= 1
    # compaction collapses the fragments into the planned count
    dst = str(tmp_path / "compact")
    n = compact_files(spark, frag, dst, target_file_bytes=1 << 20,
                      compression_ratio=1.0)
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == n and n < n_frag

    with pytest.raises(ValueError, match="target_bytes"):
        plan_output_partitions(src, target_bytes=0)
    with pytest.raises(ValueError, match="min_partitions"):
        plan_output_partitions(src, min_partitions=0)
    # write_sized returns the partition count it used
    out2 = str(tmp_path / "sized")
    assert write_sized(src, out2, 1 << 20, 1.0) == n
