"""Vectorized (numpy + Arrow) MVT feature decode — the S2/S3 READ path.

The scalar decoder (mvt.decode_tile) walks every byte in Python; at 100 TB a
re-process decodes every feature ever written, so the read path gets the same
treatment the encode side got (tile_encode._encode_point_features): one numpy
varint parse per Arrow batch, POINTER-JUMPED field/command walks (one
vectorized step per field/command DEPTH, not per feature), and Arrow-native
output assembly (MapArray/ListArray built from flat index arrays — zero
per-feature Python dicts or lists).

Key structural fact making this possible: an MVT Feature message is a PURE
VARINT STREAM — every field is either a varint scalar (id, type), a
length-delimited block of packed varints (tags, geometry), or the LD header
itself (varints again). So the concatenation of all feature bodies in a batch
parses as ONE varint stream, the "next field" index is computable for every
value position at once, and the walk over a million features advances them
ALL one field per vectorized step (features have ~4 fields, so ~4 steps).

Anything outside that contract (10-byte varints from >63-bit ids, fixed32/64
wire types inside a feature, command/ring structure violations) raises
VarintFallback and the caller reruns the batch through the scalar flattener
(flatten_scalar) — correctness never depends on the fast path; both paths
produce the identical flat-column contract consumed by to_record_batch.

Reference hot loop being matched: /root/reference/src/transform.rs:79-80
(decode) and :130-139 (geometry stream handling incl. Multi*).
"""

from __future__ import annotations

import gzip
from itertools import chain

import numpy as np

from . import mvt


class VarintFallback(Exception):
    """Batch contains a construct the vectorized parser doesn't cover."""


def parse_varints(arr: np.ndarray):
    """Parse a pure LEB128 varint stream: (values int64, start offsets).
    Values must fit 63 bits (<= 9 bytes)."""
    term = arr < 0x80
    if len(arr) and not term[-1]:
        raise VarintFallback("truncated varint at stream end")
    ends = np.nonzero(term)[0]
    n = len(ends)
    starts = np.empty(n, np.int64)
    if n:
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    maxlen = int(lens.max()) if n else 1
    if maxlen > 9:
        raise VarintFallback("varint exceeds 63 bits")
    payload = (arr & 0x7F).astype(np.int64)
    vals = payload[starts].copy() if n else np.empty(0, np.int64)
    for k in range(1, maxlen):
        m = lens > k
        vals[m] |= payload[starts[m] + k] << (7 * k)
    return vals, starts


def scan_layer(buf: bytes):
    """Light layer scan: dictionaries decode, features stay as byte spans.

    Returns (name, extent, keys, values, spans); values are decoded Python
    objects (the per-layer dictionary — shared by all features, so scalar
    decode here costs O(dict), not O(features))."""
    name, extent = None, 4096
    keys: list[str] = []
    values: list = []
    spans: list[tuple[int, int]] = []
    add_span = spans.append
    pos = 0
    n = len(buf)
    ru = mvt.read_uvarint
    while pos < n:
        key = buf[pos]  # field keys here are single-byte in practice
        if key < 0x80:
            pos += 1
        else:
            key, pos = ru(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = ru(buf, pos)
            if field == 5:
                extent = v
            continue
        if wire != 2:
            raise VarintFallback(f"unexpected wire type {wire} in layer")
        ln = buf[pos]
        if ln < 0x80:
            pos += 1
        else:
            ln, pos = ru(buf, pos)
        end = pos + ln
        if field == 2:
            add_span((pos, end))
        elif field == 1:
            name = buf[pos:end].decode("utf-8")
        elif field == 3:
            keys.append(buf[pos:end].decode("utf-8"))
        elif field == 4:
            values.append(mvt.decode_value(buf[pos:end]))
        pos = end
    return name, extent, keys, values, spans


def _ramp(lens: np.ndarray) -> np.ndarray:
    ends = np.cumsum(lens)
    total = int(ends[-1]) if len(ends) else 0
    return np.arange(total) - np.repeat(ends - lens, lens)


GTYPE_LUT = np.array(["Point", "MultiPoint", "LineString", "MultiLineString",
                      "Polygon", "Unknown"], dtype=object)


def _scan_blobs(blobs):
    """Blob batch -> (feature body chunks + per-feature tile/layer indices,
    per-layer dictionaries). Scalar, but O(layers + dict entries)."""
    chunks: list[bytes] = []
    body_lens: list[int] = []
    feat_tile: list[int] = []
    feat_layer: list[int] = []
    layer_names: list[str] = []
    layer_keys: list[list[str]] = []
    layer_vals: list[list] = []
    for ti, data in enumerate(blobs):
        raw = bytes(data)
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        pos = 0
        while pos < len(raw):
            key, pos = mvt.read_uvarint(raw, pos)
            if key >> 3 != 3 or key & 7 != 2:
                raise VarintFallback("unexpected top-level field in tile")
            ln, pos = mvt.read_uvarint(raw, pos)
            lbuf = raw[pos:pos + ln]
            pos += ln
            name, _, keys, values, spans = scan_layer(lbuf)
            li = len(layer_names)
            layer_names.append(name)
            layer_keys.append(keys)
            layer_vals.append(values)
            ns = len(spans)
            chunks.extend(lbuf[s:e] for s, e in spans)
            body_lens.extend(e - s for s, e in spans)
            feat_tile.extend([ti] * ns)
            feat_layer.extend([li] * ns)
    return (chunks, body_lens, feat_tile, feat_layer,
            layer_names, layer_keys, layer_vals)


def flatten_np(blobs) -> dict:
    """Decode a batch of MVT blobs into FLAT columns (no per-feature Python
    objects) — the contract consumed by to_record_batch:

      feat_tile/layer_idx (int64 per feature), layer_names,
      global_keys/global_vals (+ gk_idx/gv_idx take-indices per tag,
      tag_offsets per feature), fid/fid_has, gtype (object array),
      ring_flat/ring_offsets, ax/ay (all vertices) + vert_offsets.

    Raises VarintFallback when the batch steps outside the pure-varint
    contract; flatten_scalar produces the identical contract byte-for-byte.
    """
    (chunks, body_lens, feat_tile, feat_layer,
     layer_names, layer_keys, layer_vals) = _scan_blobs(blobs)
    nfeat = len(chunks)
    arr = np.frombuffer(b"".join(chunks), np.uint8)
    vals, starts = parse_varints(arr)
    nv, nbytes = len(vals), len(arr)

    body_ends = np.cumsum(np.asarray(body_lens, np.int64))
    # value index of the first varint starting at/after a byte offset
    fend = np.searchsorted(starts, body_ends, side="left")
    fstart = np.empty(nfeat, np.int64)
    if nfeat:
        fstart[0] = 0
        fstart[1:] = fend[:-1]
    starts_pad = np.concatenate([starts, [nbytes, nbytes]])

    # --- pointer-jumped field walk: one vectorized step per field DEPTH,
    # every op sized by the ACTIVE FEATURE set (not the value stream):
    #   scalar field (wire 0): header, value            -> c + 2
    #   LD field     (wire 2): header, len L, L payload -> first value at
    #                          byte S[c+2] + L (searchsorted on starts)
    fid = np.zeros(nfeat, np.int64)
    fid_has = np.zeros(nfeat, bool)
    ftyp = np.ones(nfeat, np.int64)
    ta = np.zeros(nfeat, np.int64)
    tb = np.zeros(nfeat, np.int64)
    ga = np.zeros(nfeat, np.int64)
    gb = np.zeros(nfeat, np.int64)
    cur = fstart.copy()
    act = np.nonzero(cur < fend)[0]
    while len(act):
        c = cur[act]
        h = vals[c]
        w = h & 7
        if not np.all((w == 0) | (w == 2)):
            raise VarintFallback("unexpected wire type in feature")
        f = h >> 3
        v1 = vals[np.minimum(c + 1, nv - 1)]
        m = (w == 0) & (f == 1)
        t = act[m]
        fid[t] = v1[m]
        fid_has[t] = True
        m = (w == 0) & (f == 3)
        ftyp[act[m]] = v1[m]
        ld_end = np.minimum(starts_pad[c + 2] + v1, nbytes)
        j_ld = np.searchsorted(starts, ld_end, side="left")
        nx = np.where(w == 0, c + 2, np.where(v1 > 0, j_ld, c + 2))
        # packed-repeated tags/geometry may legally be SPLIT across several
        # blocks (concatenation semantics); this walk holds one (start, end)
        # span per field, so a second block would silently drop the first —
        # defer such features to the scalar path, which concatenates per spec
        m = (w == 2) & (f == 2)
        if np.any(tb[act[m]] != 0):
            raise VarintFallback("repeated tags block in feature")
        ta[act[m]] = c[m] + 2
        tb[act[m]] = nx[m]
        m = (w == 2) & (f == 4)
        if np.any(gb[act[m]] != 0):
            raise VarintFallback("repeated geometry block in feature")
        ga[act[m]] = c[m] + 2
        gb[act[m]] = nx[m]
        cur[act] = nx
        act = act[nx < fend[act]]

    # --- tags: one global gather; dictionary indices shift per layer
    feat_layer_np = np.asarray(feat_layer, np.int64)
    tlen = tb - ta
    tidx = np.repeat(ta, tlen) + _ramp(tlen)
    tcodes = vals[tidx]
    kc = tcodes[0::2]
    vc = tcodes[1::2]
    klens = np.fromiter(map(len, layer_keys), np.int64, len(layer_keys))
    vlens = np.fromiter(map(len, layer_vals), np.int64, len(layer_vals))
    kbase = np.zeros(len(layer_keys) + 1, np.int64)
    vbase = np.zeros(len(layer_vals) + 1, np.int64)
    np.cumsum(klens, out=kbase[1:])
    np.cumsum(vlens, out=vbase[1:])
    ntags = tlen >> 1
    lay_r = np.repeat(feat_layer_np, ntags)
    if np.any(kc >= klens[lay_r]) or np.any(vc >= vlens[lay_r]):
        raise VarintFallback("tag code out of dictionary range")
    gk_idx = kbase[lay_r] + kc
    gv_idx = vbase[lay_r] + vc
    tag_offsets = np.zeros(nfeat + 1, np.int64)
    np.cumsum(ntags, out=tag_offsets[1:])

    # --- geometry: pointer-jumped COMMAND walk, then segmented ring/vertex math
    base1 = ftyp == 1
    cur = ga.copy()
    rows_fi, rows_cmd, rows_cnt, rows_ps = [], [], [], []
    act = np.nonzero(cur < gb)[0]
    while len(act):
        c = cur[act]
        h = vals[c]
        cmd = h & 7
        cnt = h >> 3
        keep = cmd != mvt.CMD_CLOSE
        rows_fi.append(act[keep])
        rows_cmd.append(cmd[keep])
        rows_cnt.append(cnt[keep])
        rows_ps.append(c[keep] + 1)
        cur[act] = c + 1 + np.where(cmd == mvt.CMD_CLOSE, 0, 2 * cnt)
        act = act[cur[act] < gb[act]]
    if rows_fi:
        fi_r = np.concatenate(rows_fi)
        order = np.argsort(fi_r, kind="stable")  # per-feature stream order
        fi_r = fi_r[order]
        cmd_r = np.concatenate(rows_cmd)[order]
        cnt_r = np.concatenate(rows_cnt)[order]
        ps_r = np.concatenate(rows_ps)[order]
    else:
        fi_r = cmd_r = cnt_r = ps_r = np.empty(0, np.int64)
    if not np.all((cmd_r == mvt.CMD_MOVE) | (cmd_r == mvt.CMD_LINE)):
        raise VarintFallback("unexpected geometry command")
    is_move = cmd_r == mvt.CMD_MOVE
    b1_r = base1[fi_r] if len(fi_r) else np.empty(0, bool)
    start_flag = is_move & ~b1_r
    if np.any(~is_move & b1_r):
        raise VarintFallback("LineTo in a point geometry")
    nonpoint = ~b1_r
    ringid = np.cumsum(start_flag) - 1
    if np.any(nonpoint & (ringid < 0)):
        raise VarintFallback("LineTo before MoveTo")
    n_npr = int(start_flag.sum())
    ring_len = np.bincount(ringid[nonpoint], weights=cnt_r[nonpoint],
                           minlength=n_npr).astype(np.int64) if n_npr else \
        np.empty(0, np.int64)
    emit = np.where(is_move & b1_r, cnt_r, np.where(start_flag, 1, 0))
    ring_flat = np.ones(int(emit.sum()), np.int64)
    epos = np.cumsum(emit) - emit
    if n_npr:
        ring_flat[epos[start_flag]] = ring_len[ringid[start_flag]]
    ring_cnt_pf = np.bincount(fi_r, weights=emit, minlength=nfeat).astype(np.int64)
    ring_offsets = np.zeros(nfeat + 1, np.int64)
    np.cumsum(ring_cnt_pf, out=ring_offsets[1:])
    nverts = np.bincount(fi_r, weights=cnt_r, minlength=nfeat).astype(np.int64)

    pidx = np.repeat(ps_r, 2 * cnt_r) + _ramp(2 * cnt_r)
    params = vals[pidx]
    dz = (params >> 1) ^ -(params & 1)  # unzigzag
    dx, dy = dz[0::2], dz[1::2]  # per-feature param counts are even
    voff = np.zeros(nfeat + 1, np.int64)
    np.cumsum(nverts, out=voff[1:])
    if len(dx):
        csx, csy = np.cumsum(dx), np.cumsum(dy)
        vs = voff[:-1][nverts > 0]
        reps = nverts[nverts > 0]
        ax = (csx - np.repeat(csx[vs] - dx[vs], reps)).astype(np.float64)
        ay = (csy - np.repeat(csy[vs] - dy[vs], reps)).astype(np.float64)
    else:
        ax = ay = np.empty(0, np.float64)

    gcode = np.where(base1, np.where(nverts > 1, 1, 0),
                     np.where(ftyp == 2, np.where(ring_cnt_pf > 1, 3, 2),
                              np.where(ftyp == 3, 4, 5)))
    return {
        "feat_tile": np.asarray(feat_tile, np.int64),
        "layer_idx": feat_layer_np,
        "layer_names": layer_names,
        "global_keys": list(chain.from_iterable(layer_keys)),
        "global_vals": list(chain.from_iterable(layer_vals)),
        "gk_idx": gk_idx, "gv_idx": gv_idx, "tag_offsets": tag_offsets,
        "fid": fid, "fid_has": fid_has,
        "gtype": GTYPE_LUT[gcode] if nfeat else np.empty(0, object),
        "ring_flat": ring_flat, "ring_offsets": ring_offsets,
        "ax": ax, "ay": ay, "vert_offsets": voff,
    }


def flatten_scalar(blobs) -> dict:
    """Scalar twin of flatten_np (same flat contract) — the pytest
    cross-check and the fallback for blobs outside the vectorized parser's
    pure-varint contract. Uses the per-byte mvt.decode_tile walk."""
    feat_tile: list[int] = []
    layer_idx: list[int] = []
    layer_names: list[str] = []
    global_keys: list[str] = []
    global_vals: list = []
    gk_idx: list[int] = []
    gv_idx: list[int] = []
    tag_counts: list[int] = []
    fid: list[int] = []
    fid_has: list[bool] = []
    gtype: list[str] = []
    ring_flat: list[int] = []
    ring_counts: list[int] = []
    ax: list[float] = []
    ay: list[float] = []
    vert_counts: list[int] = []
    for ti, data in enumerate(blobs):
        raw = bytes(data)
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        doc = mvt.decode_tile(raw)
        for ly in doc["layers"]:
            li = len(layer_names)
            layer_names.append(ly["name"])
            kbase, vbase = len(global_keys), len(global_vals)
            global_keys.extend(ly["keys"])
            global_vals.extend(ly["values"])
            for f in ly["features"]:
                feat_tile.append(ti)
                layer_idx.append(li)
                tg = f["tags"]
                gk_idx.extend(kbase + c for c in tg[0::2])
                gv_idx.extend(vbase + c for c in tg[1::2])
                tag_counts.append(len(tg) >> 1)
                # MVT ids are uint64; the output column is int64 — wrap ids
                # >= 2^63 two's-complement style (what a JVM long would hold)
                v = (f["id"] or 0) & ((1 << 64) - 1)
                fid.append(v - (1 << 64) if v >= 1 << 63 else v)
                fid_has.append(f["id"] is not None)
                rl = f["ring_lens"]
                nv = sum(rl)
                gname = f["type"]
                if gname == "Point" and nv > 1:
                    gname = "MultiPoint"
                elif gname == "LineString" and len(rl) > 1:
                    gname = "MultiLineString"
                gtype.append(gname)
                ring_flat.extend(rl)
                ring_counts.append(len(rl))
                ax.extend(float(v) for v in f["geom"][0::2])
                ay.extend(float(v) for v in f["geom"][1::2])
                vert_counts.append(nv)

    def offs(counts):
        o = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(np.asarray(counts, np.int64), out=o[1:])
        return o

    return {
        "feat_tile": np.asarray(feat_tile, np.int64),
        "layer_idx": np.asarray(layer_idx, np.int64),
        "layer_names": layer_names,
        "global_keys": global_keys,
        "global_vals": global_vals,
        "gk_idx": np.asarray(gk_idx, np.int64),
        "gv_idx": np.asarray(gv_idx, np.int64),
        "tag_offsets": offs(tag_counts),
        "fid": np.asarray(fid, np.int64),
        "fid_has": np.asarray(fid_has, bool),
        "gtype": np.asarray(gtype, object),
        "ring_flat": np.asarray(ring_flat, np.int64),
        "ring_offsets": offs(ring_counts),
        "ax": np.asarray(ax, np.float64),
        "ay": np.asarray(ay, np.float64),
        "vert_offsets": offs(vert_counts),
    }


def to_record_batch(flat: dict, batch, typed: bool):
    """Flat columns + the input Arrow batch (z/x/y/tile_id columns) ->
    output pyarrow.RecordBatch. All per-feature structures are assembled as
    Arrow Map/List arrays from index/offset arrays — no Python objects."""
    import pyarrow as pa

    ti = pa.array(flat["feat_tile"], pa.int64())
    cols = {c: batch.column(c).take(ti) for c in ("z", "x", "y", "tile_id")}
    lay = pa.array(flat["layer_names"], pa.string()).take(
        pa.array(flat["layer_idx"], pa.int64()))
    fid = pa.array(flat["fid"], pa.int64(), mask=~flat["fid_has"])

    keys = pa.array([str(k) for k in flat["global_keys"]], pa.string())
    gk = pa.array(flat["gk_idx"], pa.int64())
    gv = pa.array(flat["gv_idx"], pa.int64())
    raw_vals = flat["global_vals"]
    if typed:
        t = []
        s = []
        i_ = []
        f_ = []
        fs = []
        b = []
        for v in raw_vals:
            if isinstance(v, bool):
                row = (4, None, None, None, None, v)
            elif isinstance(v, int):
                row = (2, None, v, None, None, None)
            elif isinstance(v, float):
                row = (3, None, None, v, repr(v), None)
            elif v is None:
                row = (0, None, None, None, None, None)
            else:
                row = (1, str(v), None, None, None, None)
            t.append(row[0])
            s.append(row[1])
            i_.append(row[2])
            f_.append(row[3])
            fs.append(row[4])
            b.append(row[5])
        items = pa.StructArray.from_arrays(
            [pa.array(t, pa.int32()), pa.array(s, pa.string()),
             pa.array(i_, pa.int64()), pa.array(f_, pa.float64()),
             pa.array(fs, pa.string()), pa.array(b, pa.bool_())],
            names=["t", "s", "i", "f", "fs", "b"]).take(gv)
    else:
        items = pa.array([_str_value(v) for v in raw_vals], pa.string()).take(gv)
    toff = pa.array(flat["tag_offsets"].astype(np.int32))
    tags = pa.MapArray.from_arrays(toff, keys.take(gk), items)

    roff = pa.array(flat["ring_offsets"].astype(np.int32))
    rings = pa.ListArray.from_arrays(roff, pa.array(
        flat["ring_flat"].astype(np.int32)))
    voff = pa.array(flat["vert_offsets"].astype(np.int32))
    pxs = pa.ListArray.from_arrays(voff, pa.array(flat["ax"], pa.float64()))
    pys = pa.ListArray.from_arrays(voff, pa.array(flat["ay"], pa.float64()))
    return pa.RecordBatch.from_arrays(
        [cols["z"], cols["x"], cols["y"], cols["tile_id"],
         lay, fid, tags, pa.array(flat["gtype"], pa.string()), rings, pxs, pys],
        names=["z", "x", "y", "tile_id", "layer", "feature_id", "tags",
               "geom_type", "ring_lens", "pxs", "pys"])


def _str_value(v) -> str:
    return str(v)
