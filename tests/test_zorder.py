"""Z-order keys vs a pure-Python Morton reference; layout locality
(file skipping) vs a linear sort; catalog cluster_table rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.functions.zorder import (
    quantize,
    quantize_sql,
    zorder_key,
    zorder_key_sql,
)
from news_please_spark.state import SnapshotCatalog


def py_morton(qs, bits):
    key = 0
    k = len(qs)
    for i, q in enumerate(qs):
        for b in range(bits):
            key |= ((q >> b) & 1) << (b * k + i)
    return key


def py_quant(x, lo, hi, bits):
    x = min(max(x, lo), hi)
    return ((x - lo) * ((1 << bits) - 1)) // (hi - lo)


def test_key_matches_python(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.zk
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], 6).alias("zk")
        ).collect()
    }
    assert got == {(x, y): py_morton([x, y], 6) for x, y in rows}


def test_quantize_matches_python_and_clamps(spark):
    vals = [-5, 0, 1, 17, 99, 100, 250]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r.q
        for r in df.select(quantize(F.col("v"), 0, 100, 8).alias("q"))
        .orderBy("v")
        .collect()
    ]
    assert got == [py_quant(v, 0, 100, 8) for v in sorted(vals)]


def test_sql_images_match(spark):
    import duckdb

    rows = [(x, y) for x in range(0, 300, 13) for y in range(0, 300, 17)]
    df = spark.createDataFrame(rows, "x long, y long")
    sdf = df.select(
        "x",
        "y",
        zorder_key(
            [quantize(F.col("x"), 0, 299, 7), quantize(F.col("y"), 0, 299, 7)],
            7,
        ).alias("zk"),
    )
    got = {(r.x, r.y): r.zk for r in sdf.collect()}
    zsql = zorder_key_sql(
        [quantize_sql("x", 0, 299, 7), quantize_sql("y", 0, 299, 7)], 7
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (x, y): zk
        for x, y, zk in con.sql(f"SELECT x, y, {zsql} FROM t").fetchall()
    }
    assert got == want


def test_zorder_layout_skips_files_linear_cannot(spark, tmp_path):
    # 64x64 grid; a thin-y box predicate: a linear-by-x layout matches
    # rows in every file, the z-ordered layout confines them to a few
    n, bits, files = 64, 6, 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    zk = zorder_key([F.col("x"), F.col("y")], bits)
    (
        df.withColumn("_zk", zk)
        .repartitionByRange(files, "_zk")
        .sortWithinPartitions("_zk")
        .drop("_zk")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "zord"))
    )
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "linear"))
    )

    def touched(path):
        return (
            spark.read.parquet(path)
            .filter((F.col("y") >= 8) & (F.col("y") <= 11))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z, lin = touched(str(tmp_path / "zord")), touched(str(tmp_path / "linear"))
    assert lin >= files - 1  # y-predicate defeats the x-sorted layout
    assert z <= files // 2  # but maps to a bounded set of curve ranges


def test_cluster_table_rewrite_row_identical(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") * 37 % 64).alias("x"),
        (F.col("id") * 11 % 64).alias("y"),
    )
    tx = cat.begin()
    tx.write_table("pts", df)
    s0 = tx.commit()
    zk = zorder_key([F.col("x"), F.col("y")], 6)
    s1 = cat.cluster_table(spark, "pts", zk, n_files=4)
    assert s1 == s0 + 1
    assert cat.read_meta(s1)["op"] == "cluster"
    before = sorted(map(tuple, cat.read_table(spark, "pts", s0).collect()))
    after = sorted(map(tuple, cat.read_table(spark, "pts", s1).collect()))
    assert before == after


def test_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("x")], 63)
    with pytest.raises(ValueError):
        zorder_key([], 4)
    with pytest.raises(ValueError):
        quantize(F.col("x"), 5, 5, 4)
    with pytest.raises(ValueError):
        quantize(F.col("x"), 0, 1 << 40, 16)
    with pytest.raises(ValueError):
        zorder_key_sql(["x"] * 4, 16)
