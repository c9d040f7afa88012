"""The reference's whole workflow on real archives: PMTiles in -> decode MVT
-> spatial+attribute filter program -> re-encode -> PMTiles out — the Spark
mirror of /root/reference/tests/integration_test.rs (which runs the binary on
a fixture archive and asserts no `name:fr` property survives)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import tiling
from mvt_wrangler_spark.operators import filters as FL
from mvt_wrangler_spark.operators import tile_encode as TE
from mvt_wrangler_spark.sources import images as I
from mvt_wrangler_spark.sources import pmtiles as P
from mvt_wrangler_spark.sources.fixtures import default_filter_geojson

Z = 5


@pytest.mark.spark
def test_archive_filter_archive_roundtrip(spark, tmp_path):
    # --- build the input archive (points with the reference-style tag set)
    df = I.synthetic_images(spark, 600, with_pixels=False, partitions=3)
    assigned = tiling.assign_tiles(df, z=Z)
    in_path = str(tmp_path / "in.pmtiles")
    P.write_pmtiles(TE.encode_tiles(assigned), in_path, metadata={"name": "in"})

    # --- read + decode: every encoded feature comes back
    tiles = P.read_pmtiles(spark, in_path)
    feats = TE.decode_tiles(tiles)
    n_in = feats.count()
    assert n_in == 600
    assert {r.layer for r in feats.select("layer").distinct().collect()} \
        <= {"pois", "buildings", "roads"}
    # decoded tags carry the reference-style keys incl. name:fr / pgf:name:ja
    one = feats.filter(F.map_contains_key("tags", "name:fr")).count()
    assert one == 600

    # --- transform: reconstruct lon/lat from tile-local coords, run the
    # 3-feature fixture program (feature drop rules + global tag prune)
    fx = F.col("x") + F.element_at("pxs", 1) / 4096.0
    fy = F.col("y") + F.element_at("pys", 1) / 4096.0
    feats = feats.withColumn("lon", tiling.tile_lon(fx, Z)).withColumn(
        "lat", tiling.tile_lat(fy, Z))
    prog = FL.FilterProgram.from_geojson(default_filter_geojson())
    masked = feats.withColumn(
        "filter_mask", FL.filter_mask_native(prog, F.col("lon"), F.col("lat")))
    surv = FL.apply_feature_filter(masked, prog)
    surv = FL.apply_tag_filter(surv, prog)

    # --- re-encode -> output archive (surrogate ids: MVT ids were omitted
    # for the non-numeric image_ids; ordering just needs determinism)
    surv = surv.withColumn(
        "image_id",
        F.concat_ws("_", "tile_id", F.element_at("pxs", 1).cast("int"),
                    F.element_at("pys", 1).cast("int"), F.col("layer")))
    surv = surv.withColumn("px", F.element_at("pxs", 1)).withColumn(
        "py", F.element_at("pys", 1))
    out_path = str(tmp_path / "out.pmtiles")
    P.write_pmtiles(TE.encode_tiles(surv.drop("geom_type", "pxs", "pys")),
                    out_path, metadata={"name": "out"})

    # --- assertions in the reference integration test's spirit
    back = TE.decode_tiles(P.read_pmtiles(spark, out_path))
    n_out = back.count()
    assert 0 < n_out < n_in  # metro-1 pois / metro-2 buildings were dropped
    keys = {k for r in back.select(F.map_keys("tags").alias("ks")).collect()
            for k in r.ks}
    assert "name:fr" not in keys            # the reference's headline assert
    assert not any(k.startswith("pgf:name:") for k in keys)
    assert {"name", "name:ja", "name:en", "kind"} <= keys  # keep-list survives
    # survivors kept their full keep-list tag set
    n_full = back.filter(F.map_contains_key("tags", "name:ja")
                         & F.map_contains_key("tags", "name:en")).count()
    assert n_full == n_out

    # parity with the in-memory pipeline, evaluated on the SAME quantized
    # coordinates the archive carries (MVT geometry is integer tile-local,
    # so lon/lat reconstruct to the pixel grid — the reference shares this)
    mem = tiling.assign_tiles(df, z=Z)
    qx = F.col("x") + F.round("px") / 4096.0
    qy = F.col("y") + F.round("py") / 4096.0
    mem = mem.withColumn("qlon", tiling.tile_lon(qx, Z)).withColumn(
        "qlat", tiling.tile_lat(qy, Z))
    mem_masked = mem.withColumn(
        "filter_mask", FL.filter_mask_native(prog, F.col("qlon"), F.col("qlat")))
    mem_surv = FL.apply_tag_filter(FL.apply_feature_filter(mem_masked, prog), prog)
    assert mem_surv.count() == n_out
