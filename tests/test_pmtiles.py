"""PMTiles v3 archive: header golden fields, directory codec, end-to-end
write -> random-access read -> MVT decode round-trip."""

from __future__ import annotations

import gzip
import struct

import pytest

from mvt_wrangler_spark.sources import pmtiles as P


def test_directory_codec_roundtrip():
    entries = [(85, 0, 10, 1), (86, 10, 20, 3), (90, 10, 20, 1), (95, 30, 5, 1)]
    assert P.decode_directory(P.encode_directory(entries)) == entries


def test_header_pack_unpack_golden():
    h = P.Header(root_offset=127, root_len=42, meta_offset=169, meta_len=9,
                 leaf_offset=178, leaf_len=0, data_offset=178, data_len=1000,
                 addressed_tiles=7, tile_entries=5, tile_contents=4,
                 min_zoom=3, max_zoom=10)
    buf = h.pack()
    assert len(buf) == 127
    assert buf[:7] == b"PMTiles" and buf[7] == 3
    # spot-check a couple of fixed offsets from the public spec
    assert struct.unpack("<Q", buf[8:16])[0] == 127      # root dir offset
    assert struct.unpack("<Q", buf[56:64])[0] == 178     # tile data offset
    assert buf[96] == 1 and buf[97] == P.COMPRESSION_GZIP
    assert buf[99] == P.TILETYPE_MVT
    assert buf[100] == 3 and buf[101] == 10
    assert P.Header.unpack(buf) == h


@pytest.mark.spark
def test_pmtiles_write_read_roundtrip(spark, tmp_path):
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import tile_encode as TE
    from mvt_wrangler_spark.sources import images as I

    df = I.synthetic_images(spark, 500, with_pixels=False, partitions=3)
    assigned = tiling.assign_tiles(df, z=5)
    tiles = TE.encode_tiles(assigned)
    want = {r.tile_id: (bytes(r.data), r.n_features) for r in tiles.collect()}

    path = str(tmp_path / "out.pmtiles")
    stats = P.write_pmtiles(tiles, path, metadata={"name": "t", "n": 500})
    assert stats["tiles"] == len(want)

    rd = P.PMTilesReader(path)
    assert rd.metadata() == {"name": "t", "n": 500}
    assert rd.header.min_zoom == 5 and rd.header.max_zoom == 5
    assert sorted(rd.tile_ids()) == sorted(want)
    # every tile random-access reads back byte-identical and MVT-decodes
    for tid, (blob, nf) in want.items():
        got = rd.get_tile(tid)
        assert got == blob
        doc = TE.decode_tile_blob(got)
        assert sum(len(ly["features"]) for ly in doc["layers"]) == nf
    assert rd.get_tile(max(want) + 12345) is None


@pytest.mark.spark
def test_pmtiles_dedup_and_runs(spark, tmp_path):
    """Identical blobs share storage; contiguous identical ids run-length."""
    import pandas as pd
    from pyspark.sql import functions as F

    blob = gzip.compress(b"same", 6)
    rows = [(5, i, 0, 1000 + i, 1, bytearray(blob)) for i in range(8)]
    tiles = spark.createDataFrame(
        rows, "z int, x bigint, y bigint, tile_id bigint, n_features bigint, data binary")
    path = str(tmp_path / "dedup.pmtiles")
    stats = P.write_pmtiles(tiles, path)
    assert stats["tiles"] == 8
    assert stats["unique_blobs"] == 1          # content stored once
    assert stats["entries"] == 1               # one run-length-8 entry
    rd = P.PMTilesReader(path)
    assert rd.entries[0][3] == 8
    for i in range(8):
        assert rd.get_tile(1000 + i) == blob
