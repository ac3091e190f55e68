"""Z-order layout: Morton-code math, normalization, and the actual
data-skipping payoff — per-file footer stats after zorder_write must
bound tight boxes that a conjunctive range filter can prune."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.layout import normalize_to_bits, zorder_value, zorder_write


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_value_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y", zorder_value(["x", "y"], bits=3).alias("z")).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 3), (r["x"], r["y"])


def test_zorder_value_three_columns(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    z = df.select(zorder_value(["a", "b", "c"], bits=2).alias("z")).first()["z"]
    # a=01: bit0 -> pos 0; b=10: bit1 -> pos 4; c=11: bits0,1 -> pos 2, 5
    assert z == (1 << 0) + (1 << 4) + (1 << 2) + (1 << 5)


def test_zorder_value_rejects_overflow():
    with pytest.raises(ValueError):
        zorder_value(["a", "b", "c", "d"], bits=16)


def test_normalize_clamps_and_buckets(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (-5.0,), (120.0,)], "v double")
    out = [r[0] for r in df.select(normalize_to_bits("v", 0.0, 100.0, bits=8)).collect()]
    assert out[0] == 0 and out[2] == 255 and out[3] == 0 and out[4] == 255
    assert out[1] == 127  # floor(50 * 255 / 100)


def _file_boxes(path: str, xcol: str, ycol: str):
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        xi, yi = names.index(xcol), names.index(ycol)
        xlo = min(md.row_group(g).column(xi).statistics.min for g in range(md.num_row_groups))
        xhi = max(md.row_group(g).column(xi).statistics.max for g in range(md.num_row_groups))
        ylo = min(md.row_group(g).column(yi).statistics.min for g in range(md.num_row_groups))
        yhi = max(md.row_group(g).column(yi).statistics.max for g in range(md.num_row_groups))
        boxes.append((xlo, xhi, ylo, yhi))
    return boxes


def test_zorder_write_enables_file_pruning(spark, tmp_path):
    # 64x64 grid, both dims uniform: the worst case for 1-D sorting
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_x")
    zorder_write(df, zpath, ["x", "y"], bits=6, num_files=16,
                 bounds={"x": (0, 63), "y": (0, 63)})
    # strawman: clustered on x only — great x stats, useless y stats
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(spath)

    def overlapping(boxes, qx, qy):
        return sum(
            1 for (xlo, xhi, ylo, yhi) in boxes
            if not (xhi < qx[0] or xlo > qx[1] or yhi < qy[0] or ylo > qy[1])
        )

    zboxes = _file_boxes(zpath, "x", "y")
    sboxes = _file_boxes(spath, "x", "y")
    assert len(zboxes) >= 8  # the range partitioner actually split the curve

    # a quadrant query on y alone: x-sorted layout prunes nothing
    z_hits = overlapping(zboxes, (0, 63), (0, 15))
    s_hits = overlapping(sboxes, (0, 63), (0, 15))
    assert s_hits == len(sboxes)
    assert z_hits <= len(zboxes) // 2, (z_hits, len(zboxes))

    # a corner box query prunes most z-files
    z_corner = overlapping(zboxes, (0, 15), (0, 15))
    assert z_corner <= max(2, len(zboxes) // 4), (z_corner, len(zboxes))

    # layout is a permutation, not a transformation
    assert spark.read.parquet(zpath).count() == 64 * 64
    got = spark.read.parquet(zpath).groupBy().agg(F.sum("x"), F.sum("y")).first()
    assert got[0] == 64 * sum(range(64)) and got[1] == 64 * sum(range(64))
