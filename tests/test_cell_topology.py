"""S2 topology columns vs the numpy kernels, incl. negative-id faces 4-5."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import cells as C


@pytest.mark.spark
def test_s2_parent_column_matches_numpy(spark):
    rng = np.random.RandomState(3)
    lat = rng.uniform(-85, 85, 300)
    lng = rng.uniform(-180, 180, 300)
    cell12 = C.s2_cell_id(lat, lng, level=12)
    # faces 4-5 produce negative int64 ids — the regression this test pins
    assert (cell12 < 0).any() and (cell12 > 0).any()
    df = spark.createDataFrame(
        [(int(i), int(c)) for i, c in enumerate(cell12)], "i long, cell long")
    for lvl in (4, 6, 10):
        got = {r.i: r.p for r in
               df.withColumn("p", C.s2_parent_column(F.col("cell"), lvl)).collect()}
        want = C.s2_parent(cell12, lvl)
        for i in range(len(cell12)):
            assert got[i] == int(want[i]), (lvl, i)
        # a parent must equal encoding the same point directly at that level
        direct = C.s2_cell_id(lat, lng, level=lvl)
        assert (want == direct).all()


@pytest.mark.spark
def test_s2_range_contains_descendants(spark):
    rng = np.random.RandomState(9)
    lat = rng.uniform(-85, 85, 100)
    lng = rng.uniform(-180, 180, 100)
    fine = C.s2_cell_id(lat, lng, level=14)
    coarse = C.s2_cell_id(lat, lng, level=6)
    df = spark.createDataFrame(
        [(int(f), int(c)) for f, c in zip(fine, coarse)],
        "fine long, coarse long")
    lo, hi = C.s2_range_columns(F.col("coarse"), 6)
    out = df.select((F.col("fine").between(lo, hi)).alias("inside")).collect()
    assert all(r.inside for r in out)


def test_s2_parent_sql_twin_matches():
    import duckdb

    rng = np.random.RandomState(5)
    lat = rng.uniform(-85, 85, 200)
    lng = rng.uniform(-180, 180, 200)
    cells = C.s2_cell_id(lat, lng, level=12)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({int(c)})" for c in cells) + ") v(cell)")
    got = [r[0] for r in con.execute(
        f"SELECT {C.s2_parent_sql('cell', 6)} FROM t").fetchall()]
    want = C.s2_parent(cells, 6)
    assert got == [int(w) for w in want]
