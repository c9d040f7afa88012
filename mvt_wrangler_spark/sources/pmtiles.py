"""PMTiles v3 archive writer/reader — the reference's actual container format.

The reference reads and writes PMTiles archives via the pmtiles crate
(/root/reference/src/lib.rs:68 open, :83-95 writer config + finalize); this
module implements the PUBLIC PMTiles v3 spec (header + varint directories +
clustered data section) so the engine's sorted tile table can be exported to
a real `.pmtiles` file a PMTiles client can serve, and existing archives can
be read back.

Spark-scale story: the distributed archive IS the range-partitioned parquet
tile table (tile_encode.write_archive / SnapshotTable); PMTiles is a SERVING
format — a single file assembled in one ordered pass. write_pmtiles streams
the sorted tiles through the driver with toLocalIterator (one partition in
memory at a time, never a full collect), appending blobs to the data section
while accumulating the (small) directory. Identical consecutive blobs
deduplicate via run-length entries; identical non-consecutive blobs share
one data offset (clustered + deduplicated, as the spec encourages).

Layout written: 127-byte header | gzip'd root directory | gzip'd JSON
metadata | tile data. Root-only directories (no leaf split): entries stay in
memory; fine into the millions of tiles. The reader rejects leaf-directory
archives explicitly rather than misreading them.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import struct
from dataclasses import dataclass

HEADER_LEN = 127
MAGIC = b"PMTiles"
COMPRESSION_NONE, COMPRESSION_GZIP = 1, 2
TILETYPE_MVT = 1


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def encode_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """Entries: (tile_id, offset, length, run_length), sorted by tile_id.
    Spec layout: count | tile_id deltas | run_lengths | lengths | offsets
    (offset field = 0 when this entry starts at prev offset+length, else
    offset+1)."""
    out = bytearray(_uvarint(len(entries)))
    last_id = 0
    for tid, _, _, _ in entries:
        out += _uvarint(tid - last_id)
        last_id = tid
    for _, _, _, rl in entries:
        out += _uvarint(rl)
    for _, _, ln, _ in entries:
        out += _uvarint(ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out += _uvarint(0)
        else:
            out += _uvarint(off + 1)
    return bytes(out)


def decode_directory(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_uvarint(buf, 0)
    ids, rls, lns, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_uvarint(buf, pos)
        last += d
        ids.append(last)
    for _ in range(n):
        v, pos = _read_uvarint(buf, pos)
        rls.append(v)
    for _ in range(n):
        v, pos = _read_uvarint(buf, pos)
        lns.append(v)
    for i in range(n):
        v, pos = _read_uvarint(buf, pos)
        if v == 0:
            offs.append(offs[i - 1] + lns[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(ids, offs, lns, rls))


@dataclass
class Header:
    root_offset: int = 0
    root_len: int = 0
    meta_offset: int = 0
    meta_len: int = 0
    leaf_offset: int = 0
    leaf_len: int = 0
    data_offset: int = 0
    data_len: int = 0
    addressed_tiles: int = 0
    tile_entries: int = 0
    tile_contents: int = 0
    clustered: bool = True
    internal_compression: int = COMPRESSION_GZIP
    tile_compression: int = COMPRESSION_GZIP
    tile_type: int = TILETYPE_MVT
    min_zoom: int = 0
    max_zoom: int = 0
    min_lon_e7: int = -1800000000
    min_lat_e7: int = -850000000
    max_lon_e7: int = 1800000000
    max_lat_e7: int = 850000000
    center_zoom: int = 0
    center_lon_e7: int = 0
    center_lat_e7: int = 0

    def pack(self) -> bytes:
        return (
            MAGIC + bytes([3])
            + struct.pack(
                "<11Q", self.root_offset, self.root_len, self.meta_offset,
                self.meta_len, self.leaf_offset, self.leaf_len,
                self.data_offset, self.data_len, self.addressed_tiles,
                self.tile_entries, self.tile_contents)
            + bytes([1 if self.clustered else 0, self.internal_compression,
                     self.tile_compression, self.tile_type,
                     self.min_zoom, self.max_zoom])
            + struct.pack("<4i", self.min_lon_e7, self.min_lat_e7,
                          self.max_lon_e7, self.max_lat_e7)
            + bytes([self.center_zoom])
            + struct.pack("<2i", self.center_lon_e7, self.center_lat_e7)
        )

    @staticmethod
    def unpack(buf: bytes) -> "Header":
        assert buf[:7] == MAGIC, "not a PMTiles archive"
        assert buf[7] == 3, f"unsupported PMTiles version {buf[7]}"
        q = struct.unpack("<11Q", buf[8:96])
        flags = buf[96:102]
        i4 = struct.unpack("<4i", buf[102:118])
        cz = buf[118]
        c2 = struct.unpack("<2i", buf[119:127])
        return Header(*q, bool(flags[0]), flags[1], flags[2], flags[3],
                      flags[4], flags[5], *i4, cz, *c2)


def write_pmtiles(tiles_df, path: str, metadata: dict | None = None,
                  tile_compression: int = COMPRESSION_GZIP) -> dict:
    """Write a PMTiles v3 archive from a tiles DataFrame
    (z, x, y, tile_id, data) — blobs as stored (gzip'd MVT from
    encode_tiles). One ordered pass: repartitionByRange + per-file sort gives
    globally ascending tile_ids through toLocalIterator; blobs stream to the
    data section, directory entries accumulate in memory.

    Returns summary stats. Mirrors the reference's writer setup + finalize
    (src/lib.rs:82-95, processing.rs:98-121)."""
    sorted_df = (tiles_df.select("z", "x", "y", "tile_id", "data")
                 .repartitionByRange(max(tiles_df.sparkSession.sparkContext
                                         .defaultParallelism, 8), "tile_id")
                 .sortWithinPartitions("tile_id"))
    entries: list[tuple[int, int, int, int]] = []
    blob_offsets: dict[bytes, tuple[int, int]] = {}  # sha1 -> (offset, len)
    data = bytearray()
    zmin, zmax = 99, 0
    n_addressed = 0
    last_id = -1
    for row in sorted_df.toLocalIterator():
        tid = row.tile_id
        assert tid > last_id, "tile ids must be strictly ascending/unique"
        last_id = tid
        blob = bytes(row.data)
        digest = hashlib.sha1(blob).digest()
        n_addressed += 1
        zmin, zmax = min(zmin, row.z), max(zmax, row.z)
        if entries and digest in blob_offsets \
                and blob_offsets[digest][0] == entries[-1][1] \
                and entries[-1][0] + entries[-1][3] == tid:
            # identical blob contiguous in id space: extend the run
            tid0, off, ln, rl = entries[-1]
            entries[-1] = (tid0, off, ln, rl + 1)
            continue
        if digest in blob_offsets:
            off, ln = blob_offsets[digest]  # deduplicated content
        else:
            off, ln = len(data), len(blob)
            data += blob
            blob_offsets[digest] = (off, ln)
        entries.append((tid, off, ln, 1))

    root = gzip.compress(encode_directory(entries), 6, mtime=0)
    meta = gzip.compress(json.dumps(metadata or {}, separators=(",", ":")).encode(),
                         6, mtime=0)
    hdr = Header(
        root_offset=HEADER_LEN, root_len=len(root),
        meta_offset=HEADER_LEN + len(root), meta_len=len(meta),
        leaf_offset=HEADER_LEN + len(root) + len(meta), leaf_len=0,
        data_offset=HEADER_LEN + len(root) + len(meta), data_len=len(data),
        addressed_tiles=n_addressed, tile_entries=len(entries),
        tile_contents=len(blob_offsets), clustered=True,
        tile_compression=tile_compression,
        min_zoom=zmin if entries else 0, max_zoom=zmax if entries else 0,
    )
    with open(path, "wb") as f:
        f.write(hdr.pack())
        f.write(root)
        f.write(meta)
        f.write(data)
    return {"tiles": n_addressed, "entries": len(entries),
            "unique_blobs": len(blob_offsets), "bytes": HEADER_LEN + len(root) + len(meta) + len(data)}


def read_pmtiles(spark, path: str):
    """PMTiles archive -> tiles DataFrame (z, x, y, tile_id, data) — the S1+S2
    scan: the (small) directory parses driver-side, then blob fetches
    DISTRIBUTE (entries become a DataFrame; executors range-read the shared
    file — local FS in this sandbox, network/object storage on a cluster,
    same seam). Run-length entries expand to one row per tile; z/x/y derive
    from the inverse Hilbert walk."""
    import numpy as np
    import pandas as pd

    rd = PMTilesReader(path)
    data_off = rd.header.data_offset
    edf = spark.createDataFrame(
        rd.entries, "tile_id bigint, off bigint, len bigint, run bigint")

    def _fetch(pdfs):
        from ..functions.tiling import tile_id_to_zxy

        with open(path, "rb") as f:
            for pdf in pdfs:
                tids: list[int] = []
                blobs: list[bytes] = []
                for tid, off, ln, run in pdf.itertuples(index=False):
                    f.seek(data_off + int(off))
                    blob = f.read(int(ln))
                    for kk in range(int(run)):
                        tids.append(int(tid) + kk)
                        blobs.append(blob)
                z, x, y = tile_id_to_zxy(np.array(tids, dtype=np.int64))
                yield pd.DataFrame({
                    "z": z.astype("int32"), "x": x, "y": y,
                    "tile_id": np.array(tids, dtype=np.int64), "data": blobs,
                })

    n = max(spark.sparkContext.defaultParallelism, 8)
    return edf.repartition(n).mapInPandas(
        _fetch, "z int, x bigint, y bigint, tile_id bigint, data binary")


class PMTilesReader:
    """Random-access reader (S2 analog: fetch one tile's blob by id)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self.header = Header.unpack(f.read(HEADER_LEN))
            if self.header.leaf_len:
                raise NotImplementedError("leaf directories not supported")
            f.seek(self.header.root_offset)
            root = f.read(self.header.root_len)
        if self.header.internal_compression == COMPRESSION_GZIP:
            root = gzip.decompress(root)
        self.entries = decode_directory(root)

    def metadata(self) -> dict:
        with open(self.path, "rb") as f:
            f.seek(self.header.meta_offset)
            raw = f.read(self.header.meta_len)
        if self.header.internal_compression == COMPRESSION_GZIP:
            raw = gzip.decompress(raw)
        return json.loads(raw)

    def get_tile(self, tile_id: int) -> bytes | None:
        """Binary search over directory entries (run-length aware)."""
        lo, hi = 0, len(self.entries) - 1
        while lo <= hi:
            mid = (lo + hi) // 2
            tid, off, ln, rl = self.entries[mid]
            if tid <= tile_id < tid + rl:
                with open(self.path, "rb") as f:
                    f.seek(self.header.data_offset + off)
                    return f.read(ln)
            if tile_id < tid:
                hi = mid - 1
            else:
                lo = mid + 1
        return None

    def tile_ids(self) -> list[int]:
        return [tid + k for tid, _, _, rl in self.entries for k in range(rl)]
