"""Native (codegen) kernels match their numpy twins: S2, H3, PIP mask."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import cells as C
from mvt_wrangler_spark.operators import filters as FL
from mvt_wrangler_spark.sources.fixtures import default_filter_geojson
from tests.oracle import pipeline_oracle as PO


@pytest.fixture(scope="module")
def pts_df(spark):
    rng = random.Random(99)
    rows = [(i, rng.uniform(-179.9, 179.9), rng.uniform(-84.9, 84.9)) for i in range(2000)]
    # pin a few face/edge-adjacent points
    rows += [(9000 + j, lon, lat) for j, (lon, lat) in enumerate(
        [(0.0, 0.0), (90.0, 0.0), (0.0, 89.0), (180.0 - 1e-9, 0.0), (-45.0, 35.26),
         (139.76, 35.68), (-74.0, 40.71)])]
    return rows, spark.createDataFrame(rows, "id long, lon double, lat double")


@pytest.mark.spark
def test_s2_native_matches_numpy(spark, pts_df):
    rows, df = pts_df
    for level in (4, 12, 30):
        out = C.with_s2_cell_native(df, level=level, lat="lat", lng="lon", out="s2")
        got = {r.id: r.s2 for r in out.select("id", "s2").collect()}
        lats = np.array([r[2] for r in rows])
        lons = np.array([r[1] for r in rows])
        want = C.s2_cell_id(lats, lons, level)
        mism = [i for i, r in enumerate(rows) if got[r[0]] != want[i]]
        assert not mism, (level, mism[:5])


@pytest.mark.spark
def test_h3_native_matches_numpy(spark, pts_df):
    rows, df = pts_df
    for res in (0, 7, 13):
        out = C.with_h3_cell_native(df, res=res, lat="lat", lng="lon", out="h3")
        got = {r.id: r.h3 for r in out.select("id", "h3").collect()}
        lats = np.array([r[2] for r in rows])
        lons = np.array([r[1] for r in rows])
        want = C.h3_cell(lats, lons, res)
        mism = [i for i, r in enumerate(rows) if got[r[0]] != want[i]]
        # F.round is half-up, np.round half-even: exact-.5 hex boundaries may
        # differ; none should occur for random doubles
        assert not mism, (res, mism[:5])


@pytest.mark.spark
def test_filter_mask_native_matches_udf(spark, pts_df):
    rows, df = pts_df
    prog = FL.FilterProgram.from_geojson(default_filter_geojson())
    native = {r.id: r.m for r in df.select(
        "id", FL.filter_mask_native(prog, F.col("lon"), F.col("lat")).alias("m")).collect()}
    udf = {r.id: r.m for r in df.select(
        "id", FL.filter_mask_column(spark, prog, F.col("lon"), F.col("lat")).alias("m")).collect()}
    assert native == udf
    masks = PO.filter_masks(
        [{"image_id": r[0], "lon": r[1], "lat": r[2]} for r in rows], prog)
    for r in rows:
        assert native[r[0]] == masks[r[0]]
    assert sum(1 for v in native.values() if v & 0b11) >= 2  # pinned metro points hit
    assert all(v & 0b100 for v in native.values())  # global polygon covers all

@pytest.mark.spark
def test_materialize_barrier_limits_expression_inlining(spark):
    """The +floor(rand*0) barrier in filter_mask_native relies on Catalyst
    NOT constant-folding rand*0 and not substituting nondeterministic
    projections. Pin that: with the barrier, the polygon math appears at
    most once per downstream consumer in the optimized plan; without it,
    CollapseProject inlines strictly more copies. If a Spark upgrade
    changes either behavior, this fails and the barrier needs the
    replacement idiom (explicit projection barrier / localCheckpoint)."""
    from pyspark.sql import functions as F

    from mvt_wrangler_spark.operators import filters as FL
    from mvt_wrangler_spark.sources.fixtures import default_filter_geojson

    prog = FL.FilterProgram.from_geojson(default_filter_geojson())
    probe = repr(float(prog.features[0].polygons[0].exterior[0][0]))
    df = spark.range(100).select(
        (F.col("id") * 1.0).alias("lon"), (F.col("id") * 0.5).alias("lat"),
        F.lit("pois").alias("layer"),
        F.create_map(F.lit("name"), F.lit("x"),
                     F.lit("name:fr"), F.lit("y")).alias("tags"))
    counts = {}
    for mat in (False, True):
        mask = FL.filter_mask_native(prog, F.col("lon"), F.col("lat"), materialize=mat)
        out = FL.apply_tag_filter(
            FL.apply_feature_filter(df.withColumn("filter_mask", mask), prog), prog)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        counts[mat] = plan.count(probe)
    assert counts[True] >= 1              # the math is still in the plan
    assert counts[True] <= 2              # at most once per consumer
    assert counts[True] < counts[False]   # barrier strictly reduces inlining
