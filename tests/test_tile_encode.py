"""Per-tile blob encode: dictionary first-seen order, determinism, ordered sink."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import tiling
from mvt_wrangler_spark.operators import multimodal as MM
from mvt_wrangler_spark.operators import tile_encode as TE
from mvt_wrangler_spark.sources import images as I


def test_blob_dictionary_first_seen_order():
    pdf = pd.DataFrame({
        "image_id": ["a", "b", "c"],
        "layer": ["pois", "pois", "roads"],
        "tags": [{"kind": "park", "name": "x"}, {"kind": "park"}, {"kind": "road"}],
        "px": [1.0, 2.0, 3.0], "py": [4.0, 5.0, 6.0],
    })
    doc = TE.decode_tile_blob(TE._encode_tile_blob(pdf))
    assert [ly["name"] for ly in doc["layers"]] == ["pois", "roads"]
    pois = doc["layers"][0]
    # first-seen order: 'a' sorted-tag-keys = [kind, name] -> keys [kind, name]
    assert pois["keys"] == ["kind", "name"]
    assert pois["values"] == ["park", "x"]  # dedup: b reuses "park" (idx 0)
    assert pois["features"][1]["tags"] == [0, 0]
    assert pois["features"][0]["tags"] == [0, 0, 1, 1]
    # determinism
    assert TE._encode_tile_blob(pdf) == TE._encode_tile_blob(pdf)


@pytest.mark.spark
def test_encode_tiles_and_ordered_archive(spark, tmp_path):
    df = I.synthetic_images(spark, 400, with_pixels=False, partitions=3)
    assigned = tiling.assign_tiles(df, z=5)
    tiles = TE.encode_tiles(assigned)
    rows = tiles.collect()
    assert sum(r.n_features for r in rows) == 400
    # every blob decodes; feature count matches
    for r in rows[:20]:
        doc = TE.decode_tile_blob(r.data)
        assert sum(len(ly["features"]) for ly in doc["layers"]) == r.n_features
    # ordered archive: per output file, tile_id non-decreasing
    path = str(tmp_path / "archive")
    TE.write_archive(tiles, path, n_partitions=4)
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert files
    ranges = []
    for fn in files:
        t = pq.read_table(fn, columns=["tile_id"]).to_pandas()["tile_id"]
        if len(t):
            assert t.is_monotonic_increasing
            ranges.append((t.iloc[0], t.iloc[-1]))
    # range partitioning: file ranges don't interleave
    for (a0, a1), (b0, b1) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert a1 <= b0


@pytest.mark.spark
def test_multimodal_stubs_and_frame_sampling(spark):
    import numpy as np

    # pcm16 decode works; other codecs raise NotImplementedError
    pcm = (np.sin(np.linspace(0, 6.28, 100)) * 20000).astype("<i2").tobytes()
    wave = MM.decode_audio(pcm, "pcm16")
    assert wave.shape == (100,) and abs(float(wave.max()) - 20000 / 32768) < 1e-3
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"...", "mp3")
    with pytest.raises(NotImplementedError):
        MM.decode_video_frame(b"...", "h264", 0)

    media = spark.createDataFrame(
        [(f"vid{i}", 3500 + i * 1000) for i in range(8)],
        "media_id string, duration_ms long")
    frames = MM.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["vid0"]) == 3 and len(by_id["vid7"]) == 10
    again = {(r.media_id, r.frame_idx): r.mean_luma for r in MM.sample_frames(media).collect()}
    for r in frames:
        assert again[(r.media_id, r.frame_idx)] == r.mean_luma  # deterministic


@pytest.mark.spark
def test_encode_tiles_general_geometries_and_raw_compression(spark):
    """LineString/Polygon features round-trip through the MVT blob; raw
    (uncompressed) storage decodes via magic sniffing."""
    rows = [
        ("a", "feats", {"kind": "road"}, "LineString", [0.0, 100.0, 200.0], [0.0, 50.0, 40.0]),
        ("b", "feats", {"kind": "park"}, "Polygon", [10.0, 110.0, 60.0], [10.0, 10.0, 90.0]),
        ("c", "feats", {"kind": "poi"}, "Point", [42.0], [24.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, layer string, tags map<string,string>, "
        "geom_type string, xs array<double>, ys array<double>",
    ).withColumn("lon", F.lit(0.5)).withColumn("lat", F.lit(0.5))
    assigned = tiling.assign_tiles(df, z=3, with_local=False)
    for comp in ("gzip", "none"):
        tiles = TE.encode_tiles(assigned, compression=comp).collect()
        assert len(tiles) == 1 and tiles[0].n_features == 3
        doc = TE.decode_tile_blob(tiles[0].data)
        feats = {None: []}
        ly = doc["layers"][0]
        by_type = {f["type"]: f for f in ly["features"]}
        assert set(by_type) == {"Point", "LineString", "Polygon"}
        assert by_type["LineString"]["geom"] == [0, 0, 100, 50, 200, 40]
        assert by_type["Polygon"]["geom"] == [10, 10, 110, 10, 60, 90]
        assert by_type["Point"]["geom"] == [42, 24]
        assert ly["keys"] == ["kind"]
        # raw blob must NOT be gzip; gzip blob must be
        is_gz = bytes(tiles[0].data)[:2] == b"\x1f\x8b"
        assert is_gz == (comp == "gzip")
