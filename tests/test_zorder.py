"""Z-order clustered writes (sinks/zorder.py): Morton code correctness
and the actual data-skipping payoff, measured from parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ffi_export_etl_spark.sinks.zorder import morton_code, zorder_write


def _interleave(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_morton_code_matches_python_interleave(spark):
    rows = [(3, 5), (0, 0), (255, 1), (170, 85), (7, 200)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", morton_code([F.col("x"), F.col("y")], bits=8)
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave([x, y], 8), (x, y)


def _files_overlapping(path: str, pred: dict[str, tuple[float, float]]) -> int:
    """Count part files whose footer min/max intersects every (lo, hi)
    range in ``pred`` — the set a stats-pruning reader must touch."""
    hit = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.num_columns)
        }
        overlaps = True
        for col, (lo, hi) in pred.items():
            fmin = min(
                md.row_group(g).column(cols[col]).statistics.min
                for g in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(g).column(cols[col]).statistics.max
                for g in range(md.num_row_groups)
            )
            if fmax < lo or fmin > hi:
                overlaps = False
                break
        if overlaps:
            hit += 1
    return hit


def test_zorder_write_skips_on_both_dimensions(spark, sf_small, tmp_path):
    """The point of z-ordering: after a single-column sort, a selective
    filter on the OTHER column overlaps every file; after z-ordering
    both, narrow filters on EITHER column (and 2-D boxes) overlap only
    a fraction of the files. Same data, same file count — only the
    layout differs."""
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16

    sorted_path = str(tmp_path / "sorted_by_partkey")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    z_path = str(tmp_path / "zorder")
    zorder_write(
        li, z_path, ["l_partkey", "l_suppkey"], bits=8, num_files=n_files
    )

    pk_hi = li.agg(F.max("l_partkey")).first()[0]
    sk_hi = li.agg(F.max("l_suppkey")).first()[0]
    # narrow slice on each dimension (~1/8 of the value range)
    pk_band = (1, max(2, pk_hi // 8))
    sk_band = (1, max(2, sk_hi // 8))

    # sanity: both layouts hold identical data
    z_df = spark.read.parquet(z_path)
    assert z_df.count() == li.count()
    box = (
        (F.col("l_partkey") >= pk_band[0])
        & (F.col("l_partkey") <= pk_band[1])
        & (F.col("l_suppkey") >= sk_band[0])
        & (F.col("l_suppkey") <= sk_band[1])
    )
    assert z_df.filter(box).count() == li.filter(box).count()

    # single-column sort: the off-sort dimension cannot skip at all
    s_on_suppkey = _files_overlapping(sorted_path, {"l_suppkey": sk_band})
    z_on_suppkey = _files_overlapping(z_path, {"l_suppkey": sk_band})
    z_on_partkey = _files_overlapping(z_path, {"l_partkey": pk_band})
    z_on_box = _files_overlapping(
        z_path, {"l_partkey": pk_band, "l_suppkey": sk_band}
    )
    assert s_on_suppkey == n_files  # sorted layout reads everything
    assert z_on_suppkey < n_files  # z-order skips on the same filter
    assert z_on_partkey < n_files  # ... and still skips on the other dim
    assert z_on_box <= min(z_on_suppkey, z_on_partkey)


def test_zorder_caller_cuts_skip_the_sketch_pass(spark, tmp_path):
    """Precomputed cut points (the cluster-scale path) produce a valid
    clustered layout without the approxQuantile action."""
    rows = [(i % 97, (i * 7) % 89, i) for i in range(2000)]
    df = spark.createDataFrame(rows, ["a", "b", "payload"])
    cuts = {
        "a": [float(c) for c in range(0, 97, 7)],
        "b": [float(c) for c in range(0, 89, 7)],
    }
    path = str(tmp_path / "cuts")
    zorder_write(df, path, ["a", "b"], bits=4, num_files=8, cuts=cuts)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert set(back.columns) == {"a", "b", "payload"}
    assert _files_overlapping(path, {"a": (0, 6)}) < 8
    assert _files_overlapping(path, {"b": (0, 6)}) < 8
