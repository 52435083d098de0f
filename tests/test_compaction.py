"""Small-file compaction sink: file-count reduction, row fidelity,
clustering tightness, and atomic swap semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_etl_spark.sinks.compaction import _parquet_files, compact_parquet


def _write_fragmented(spark, path, n_files=40, rows=4000):
    # simulate a streaming/upsert-fed table: many tiny files, rows of
    # each key scattered across every file
    (
        spark.range(rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("payload"),
        )
        .repartition(n_files)  # round-robin: every file spans full key range
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    t = str(tmp_path / "frag")
    _write_fragmented(spark, t)
    before = spark.read.parquet(t)
    before_rows = sorted((r.k, r.payload) for r in before.collect())
    assert len(_parquet_files(t)) == 40

    stats = compact_parquet(spark, t, target_file_bytes=1 << 30)
    assert stats.files_before == 40
    assert stats.files_after == 1
    assert stats.rows == 4000

    after = sorted((r.k, r.payload) for r in spark.read.parquet(t).collect())
    assert after == before_rows


def test_compaction_clustering_tightens_file_ranges(spark, tmp_path):
    """With cluster_by, each output file covers a disjoint narrow key
    range (range-repartition + in-file sort), so min/max pruning can
    skip whole files — the property that makes clustering pay at
    100 TB."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "clustered")
    _write_fragmented(spark, t)

    # pre-compaction: every file spans ~the whole key range
    wide = [
        (pq.read_table(f, columns=["k"]).column("k").to_pylist())
        for f in _parquet_files(t)
    ]
    assert all(max(ks) - min(ks) > 3000 for ks in wide if ks)

    compact_parquet(
        spark, t, target_file_bytes=10 * 1024, cluster_by=["k"]
    )
    files = _parquet_files(t)
    assert len(files) > 1  # small target → several clustered files
    ranges = sorted(
        (min(ks), max(ks))
        for f in files
        if (ks := pq.read_table(f, columns=["k"]).column("k").to_pylist())
    )
    # disjoint, ordered ranges: file i's max < file i+1's min
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo
    # fidelity
    assert spark.read.parquet(t).count() == 4000


def test_compaction_skips_nothing_on_single_file(spark, tmp_path):
    t = str(tmp_path / "one")
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(t)
    stats = compact_parquet(spark, t, target_file_bytes=1 << 30)
    assert stats.files_before == 1
    assert stats.files_after == 1
    assert spark.read.parquet(t).count() == 10


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    """Z-order clustering on (x, y): per-file spans shrink on BOTH
    columns vs the unclustered layout (lexicographic would only serve
    x). Grid: 64×64 points, uniform."""
    import pyarrow.parquet as pq

    from git_etl_spark.sinks.compaction import compact_parquet_zorder

    t = str(tmp_path / "zz")
    (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(30)  # scattered small files, full-range spans
        .write.mode("overwrite")
        .parquet(t)
    )

    def spans(col):
        out = []
        for f in _parquet_files(t):
            vals = pq.read_table(f, columns=[col]).column(col).to_pylist()
            if vals:
                out.append(max(vals) - min(vals))
        return out

    assert min(spans("x")) > 55 and min(spans("y")) > 55  # pre: all wide

    stats = compact_parquet_zorder(spark, t, ["x", "y"], target_file_bytes=3 * 1024)
    assert stats.files_after > 4
    sx, sy = spans("x"), spans("y")
    # every file now covers a narrow rectangle in both dims
    assert sum(sx) / len(sx) < 32 and sum(sy) / len(sy) < 32, (sx, sy)
    assert spark.read.parquet(t).count() == 4096
