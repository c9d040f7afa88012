"""Multimodal columns: opaque binary payloads + typed metadata.

Images are fully implemented (sources/images.py: decode/encode/phash/PSNR in
numpy). Audio/video decode require codec libraries absent from this
environment; per the build contract they are STUBBED behind
NotImplementedError with the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — real and tested. A deterministic fake decoder
exercises the full path end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _check_on_error(on_error: str) -> str:
    """Validate at operator ENTRY (driver side): a typo like 'Skip' would
    otherwise silently behave as 'raise' deep inside an executor loop."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    return on_error


def _decode_or_none(data, fmt, w, h, on_error: str):
    """Decode, or skip corrupt payloads when on_error='skip'.

    A 10^12-row image table ALWAYS contains some corrupt blobs (truncated
    uploads, wrong-format rows); with the default on_error='raise' one bad
    row fails the Spark task (and after retries, the job). Ingest-path
    operators take on_error='skip' to drop such rows instead — the
    drop is silent per row by design (count them upstream by comparing
    output to input cardinality, or run a profile pass)."""
    from ..sources import images as I

    try:
        return I.decode(data, fmt, w, h)
    except Exception:
        if on_error == "skip":
            return None
        raise


AUDIO_META_SCHEMA = "media_id string, sample_rate int, n_samples bigint, channels int"
FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, ts_ms bigint, h int, w int, mean_luma double"
)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """Audio decode stub: no codec libs (ffmpeg/soundfile) in this env."""
    if fmt == "pcm16":  # the one fmt we CAN decode: raw little-endian PCM
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    raise NotImplementedError(
        f"audio codec {fmt!r} needs an external decoder; only raw 'pcm16' is "
        "supported in this environment")


def decode_video_frame(data: bytes, fmt: str, frame_idx: int) -> np.ndarray:
    """Video decode stub — same contract as decode_audio."""
    raise NotImplementedError(
        f"video codec {fmt!r} needs ffmpeg; the sampling plumbing below is "
        "exercised with the deterministic fake decoder")


def _fake_frames(media_id: str, n_frames: int, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic fake video: (n, h, w) luma planes derived from the id."""
    seed = np.frombuffer(media_id.encode()[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    idx = (np.arange(n_frames * h * w, dtype=np.uint64) + seed * np.uint64(2654435761))
    x = (idx ^ (idx >> np.uint64(13))) * np.uint64(0x9E3779B97F4A7C15)
    return ((x >> np.uint64(56)).astype(np.uint8)).reshape(n_frames, h, w)


def sample_frames(media_df: DataFrame, every_ms: int = 1000, fps: float = 30.0,
                  decoder=None) -> DataFrame:
    """Frame sampling over a video table (media_id, bytes, fmt, duration_ms).

    `decoder(media_id, n_frames)` -> (n, h, w) uint8 luma; defaults to the
    deterministic fake so the Spark plumbing is testable without codecs.
    Swapping in a real ffmpeg-backed decoder changes nothing Spark-side.
    """
    decoder = decoder or (lambda mid, n: _fake_frames(mid, n))

    def _sample(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "h", "w", "mean_luma")}
            for row in pdf.itertuples(index=False):
                n_frames = max(1, int(row.duration_ms // every_ms))
                frames = decoder(row.media_id, n_frames)
                for i in range(n_frames):
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(int(i * fps * every_ms / 1000.0))
                    out["ts_ms"].append(i * every_ms)
                    out["h"].append(frames.shape[1])
                    out["w"].append(frames.shape[2])
                    out["mean_luma"].append(float(frames[i].mean()))
            yield pd.DataFrame(out)

    return media_df.select("media_id", "duration_ms").mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


THUMB_SCHEMA = "image_id string, thumb binary, tw int, th int, fmt string"


def thumbnail(images_df: DataFrame, factor: int = 4, out_fmt: str = "rawz",
              on_error: str = "raise") -> DataFrame:
    """Thumbnail generation: decode -> exact integer box-downsample -> encode.

    The resize step a 10^12-image training pipeline runs on every row,
    expressed as one mapInPandas pass (Arrow batches; the per-image body is
    pure numpy — no per-pixel Python). Downsampling is an EXACT f x f box
    filter in integer arithmetic (block sum // f^2), so the result is
    bit-deterministic across engines and SQL-restatable for the contract
    oracle (q_thumb_stats). Images whose dimensions are not multiples of
    `factor` are cropped to the largest covered grid (floor(h/f)*f rows /
    cols) before pooling — the convention real pipelines use for patch grids.

    Codecs are the environment's raw/rawz/qlossy stand-ins (sources/images.py;
    no PIL/ffmpeg here) — swapping a real JPEG decode/encode into
    images.decode/encode changes nothing Spark-side. Output rows carry real
    re-encoded bytes, so downstream consumers (dedup, zonal, serving) read
    thumbnails exactly like originals.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    _check_on_error(on_error)

    from ..sources import images as I

    def _thumb(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "thumb", "tw", "th", "fmt")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = _decode_or_none(bytes(row.bytes), row.fmt, row.w, row.h,
                                     on_error)
                if px is None:
                    continue  # corrupt payload, on_error='skip'
                th, tw = row.h // factor, row.w // factor
                if th == 0 or tw == 0:
                    continue  # smaller than one block: no thumbnail
                block = px[: th * factor, : tw * factor, :].astype(np.int64)
                pooled = (
                    block.reshape(th, factor, tw, factor, 3)
                    .sum(axis=(1, 3)) // (factor * factor)
                ).astype(np.uint8)
                out["image_id"].append(row.image_id)
                out["thumb"].append(I.encode(pooled, out_fmt))
                out["tw"].append(tw)
                out["th"].append(th)
                out["fmt"].append(out_fmt)
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return images_df.select(*cols).mapInPandas(_thumb, THUMB_SCHEMA)


AHASH_SCHEMA = "image_id string, ahash long"


def ahash64(images_df: DataFrame, luma=(1, 2, 1), luma_div: int = 1,
            on_error: str = "raise") -> DataFrame:
    """64-bit average-hash (aHash) computed from the DECODED pixels — a real
    perceptual hash, unlike the synthetic table's opaque phash column.

    Classic aHash, integer-exact end to end so the contract oracle can
    restate it in SQL: crop to the largest 8x8-divisible grid, per-zone
    integer luma (r*1 + g*2 + b*1 by default) block sums, zone value
    v = sum // zone_px, global mean m = sum(v) // 64, bit_i = v_i > m
    (strict), hash = sum(bit_i << i) wrapped to signed int64. Near-identical
    images (re-encodes, small local edits, uniform brightness shifts — which
    cancel in v vs m) land within a few hamming bits, which is exactly what
    dedup.phash_hamming_pairs consumes: ahash64 |> phash_hamming_pairs is
    the engine's bytes-to-near-dup image pipeline.

    One mapInPandas pass; per-image body is pure numpy + a 64-bit assembly.
    Images smaller than 8x8 are skipped.
    """
    lr, lg, lb = luma
    _check_on_error(on_error)

    def _hash(pdfs):
        from ..sources import images as I

        for pdf in pdfs:
            out = {"image_id": [], "ahash": []}
            for row in pdf.itertuples(index=False):
                if row.bytes is None or row.w < 8 or row.h < 8:
                    continue
                px = _decode_or_none(bytes(row.bytes), row.fmt, row.w, row.h,
                                     on_error)
                if px is None:
                    continue  # corrupt payload, on_error='skip'
                px = px.astype(np.int64)
                zh, zw = row.h // 8, row.w // 8
                lum = (px[: zh * 8, : zw * 8, 0] * lr
                       + px[: zh * 8, : zw * 8, 1] * lg
                       + px[: zh * 8, : zw * 8, 2] * lb) // luma_div
                sums = lum.reshape(8, zh, 8, zw).sum(axis=(1, 3))   # (8, 8)
                v = sums // (zh * zw)
                m = int(v.sum()) // 64
                bits = (v > m).ravel()                               # i = zy*8+zx
                h = 0
                for i in range(64):
                    if bits[i]:
                        h |= 1 << i
                if h >= 1 << 63:
                    h -= 1 << 64                                     # signed wrap
                out["image_id"].append(row.image_id)
                out["ahash"].append(h)
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return images_df.select(*cols).mapInPandas(_hash, AHASH_SCHEMA)


OVERZOOM_SCHEMA = ("image_id string, child int, cbytes binary, cw int, "
                   "ch int, cfmt string")


def overzoom(images_df: DataFrame, out_fmt: str = "rawz") -> DataFrame:
    """Tile overzoom: serve z+1 children from z imagery — each parent tile
    image yields 4 children (child = qy*2 + qx), the quadrant crop
    upsampled 2x nearest-neighbor back to the parent's pixel size.

    Nearest-neighbor is the overzoom convention (no resampling invention:
    child pixel (y, x) = parent pixel (qy*h/2 + y//2, qx*w/2 + x//2)) and
    is exact integer work, so the whole chain decode -> crop -> upsample ->
    re-encode is SQL-restatable for the contract oracle (q_overzoom). One
    mapInPandas, per-image body pure numpy. Odd dimensions crop to the
    even grid first (same convention as thumbnail's patch grid).
    """
    from ..sources import images as I

    def _oz(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in
                   ("image_id", "child", "cbytes", "cw", "ch", "cfmt")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h)
                h2, w2 = row.h // 2, row.w // 2
                if h2 == 0 or w2 == 0:
                    continue
                for qy in (0, 1):
                    for qx in (0, 1):
                        quad = px[qy * h2:(qy + 1) * h2,
                                  qx * w2:(qx + 1) * w2, :]
                        up = quad.repeat(2, axis=0).repeat(2, axis=1)
                        out["image_id"].append(row.image_id)
                        out["child"].append(qy * 2 + qx)
                        out["cbytes"].append(I.encode(up, out_fmt))
                        out["cw"].append(2 * w2)
                        out["ch"].append(2 * h2)
                        out["cfmt"].append(out_fmt)
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return images_df.select(*cols).mapInPandas(_oz, OVERZOOM_SCHEMA)


MOSAIC_SCHEMA = ("parent_id string, pbytes binary, pw int, ph int, "
                 "pfmt string, n_children int")


def mosaic(children_df: DataFrame, out_fmt: str = "rawz") -> DataFrame:
    """Tile mosaic: build the z parent image from its 4 z+1 children — the
    pyramid-BUILD inverse of `overzoom` (raster analog of the vector
    pyramid_rollup; the reference builds pyramids tile-by-tile,
    src/main.rs tile iteration — here it is one grouped shuffle).

    Input columns: parent_id (z-level tile key), child (quadrant index
    qy*2 + qx), bytes, fmt, w, h. Each child is box-mean downsampled 2x
    with exact integer math (parent pixel = sum of the 2x2 child block
    // 4) and placed in its quadrant, so the whole chain is
    SQL-restatable for the contract oracle (q_mosaic). The parent keeps
    the children's pixel size. Conventions: odd child dims crop to the
    even grid (thumbnail's rule); a missing child leaves its quadrant
    zero (sparse-pyramid convention) with n_children recording how many
    contributed; children whose dims differ from the group's first
    (ordered by (child, bytes)) are skipped; a duplicate quadrant keeps
    the (child, bytes)-smallest row.

    Scale shape: ONE shuffle on the parent key — groupBy(parent_id) with a
    bounded (<= 4 element) collect_list of the child structs, then a plain
    mapInPandas over BATCHES of packed parents. The earlier
    groupBy().applyInPandas form paid one pandas-DataFrame construction +
    Python dispatch per parent (~10^5 tiny groups at sf0.1, ~10^7 at 100x);
    packing first amortizes that to one dispatch per Arrow batch while
    keeping per-task memory bounded by tile size (the list is capped by the
    4-quadrant key space). Null-bytes children are dropped before the
    shuffle (the old form dropped them inside the group — a parent with
    only null children emits no row either way).
    """
    from ..sources import images as I

    def _mo_batch(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in (
                "parent_id", "pbytes", "pw", "ph", "pfmt", "n_children")}
            for pid, kids in zip(pdf["parent_id"], pdf["__kids"]):
                # kids arrive sorted by (child, bytes, ...) via array_sort,
                # so the duplicate-quadrant keep rule stays deterministic
                parent = None
                ph = pw = 0
                n = 0
                seen: set[int] = set()
                for kid in kids:
                    h2, w2 = kid["h"] // 2, kid["w"] // 2
                    if h2 == 0 or w2 == 0:
                        continue
                    if parent is None:
                        ph, pw = h2 * 2, w2 * 2
                        parent = np.zeros((ph, pw, 3), dtype=np.uint8)
                    if ((h2 * 2, w2 * 2) != (ph, pw)
                            or not 0 <= kid["child"] <= 3
                            or kid["child"] in seen):
                        continue
                    seen.add(kid["child"])
                    qy, qx = kid["child"] // 2, kid["child"] % 2
                    px = I.decode(bytes(kid["bytes"]), kid["fmt"],
                                  kid["w"], kid["h"])
                    down = (px[:h2 * 2, :w2 * 2, :].astype(np.int64)
                            .reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) // 4)
                    parent[qy * h2:(qy + 1) * h2, qx * w2:(qx + 1) * w2, :] \
                        = down.astype(np.uint8)
                    n += 1
                if parent is None:
                    continue
                out["parent_id"].append(pid)
                out["pbytes"].append(I.encode(parent, out_fmt))
                out["pw"].append(pw)
                out["ph"].append(ph)
                out["pfmt"].append(out_fmt)
                out["n_children"].append(n)
            yield pd.DataFrame(out)

    cols = ["parent_id", "child", "bytes", "fmt", "w", "h"]
    packed = (children_df.select(*cols)
              .filter(F.col("bytes").isNotNull())
              .groupBy("parent_id")
              .agg(F.array_sort(F.collect_list(
                  F.struct("child", "bytes", "fmt", "w", "h")))
                  .alias("__kids")))
    return packed.mapInPandas(_mo_batch, MOSAIC_SCHEMA)


HILLSHADE_SCHEMA = "image_id string, shade binary, tw int, th int, fmt string"


def hillshade(dem_df: DataFrame, shift: int = 4, out_fmt: str = "rawz") -> DataFrame:
    """Terrain raster analysis: decode Terrain-RGB DEM tiles, run Horn's
    3x3 gradient kernel (the standard slope/hillshade stencil) in exact
    integer arithmetic, and re-encode the result as real image bytes.

    Elevation is unpacked Mapbox-Terrain-RGB style from the 3 channels:
    e = R*65536 + G*256 + B (the published encoding drops the -10000/0.1
    affine, which cancels in gradients anyway). Horn (1981) gradients on
    the (h-2, w-2) interior:

      gx = (e[y-1,x+1] + 2e[y,x+1] + e[y+1,x+1])
         - (e[y-1,x-1] + 2e[y,x-1] + e[y+1,x-1])
      gy = the same stencil transposed

    Output pixel packs (shade, |gx| % 256, |gy| % 256) where
    shade = min(255, (|gx| + |gy|) >> shift) — an L1 gradient magnitude,
    integer-exact (no float sqrt, so bit-identical across engines and
    SQL-restatable for the contract oracle). One mapInPandas pass, no
    shuffle: each tile is independent, so the operator scales linearly to
    any corpus size and pairs with `mosaic`/`overzoom` for pyramid DEMs.
    """
    if shift < 0:
        raise ValueError("shift must be >= 0")

    from ..sources import images as I

    def _shade(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "shade", "tw", "th", "fmt")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None or row.w < 3 or row.h < 3:
                    continue  # no interior pixels
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h).astype(np.int64)
                e = px[:, :, 0] * 65536 + px[:, :, 1] * 256 + px[:, :, 2]
                gx = ((e[:-2, 2:] + 2 * e[1:-1, 2:] + e[2:, 2:])
                      - (e[:-2, :-2] + 2 * e[1:-1, :-2] + e[2:, :-2]))
                gy = ((e[2:, :-2] + 2 * e[2:, 1:-1] + e[2:, 2:])
                      - (e[:-2, :-2] + 2 * e[:-2, 1:-1] + e[:-2, 2:]))
                ax, ay = np.abs(gx), np.abs(gy)
                shade = np.minimum((ax + ay) >> shift, 255)
                tile = np.stack([shade, ax % 256, ay % 256], axis=-1).astype(np.uint8)
                out["image_id"].append(row.image_id)
                out["shade"].append(I.encode(tile, out_fmt))
                out["tw"].append(row.w - 2)
                out["th"].append(row.h - 2)
                out["fmt"].append(out_fmt)
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return dem_df.select(*cols).mapInPandas(_shade, HILLSHADE_SCHEMA)


EQUALIZE_SCHEMA = "image_id string, eq binary, w int, h int, fmt string"


def equalize(images_df: DataFrame, out_fmt: str = "rawz") -> DataFrame:
    """Corpus-wide histogram equalization: one global 256-bin histogram
    over every decoded pixel (all channels), then a per-pixel LUT remap —
    the canonical 'global statistic -> broadcast -> per-row transform'
    shape (same two-pass plan a global contrast/normalization step runs
    at corpus scale).

    Pass 1 is a mapInPandas partial bincount (each Arrow batch emits at
    most 256 (bin, cnt) rows) + one 256-key groupBy — the collect is 256
    rows regardless of corpus size. The LUT is the classic formula
    lut[v] = (cdf[v] - cdf_min) * 255 // (total - cdf_min) with integer
    floor division (exact on both engines); a constant corpus
    (total == cdf_min) maps to 0. Pass 2 decodes, remaps through the
    closure-captured 256-byte LUT, and re-encodes real bytes.
    """
    from ..sources import images as I

    def _hist(pdfs):
        for pdf in pdfs:
            acc = np.zeros(256, dtype=np.int64)
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h)
                acc += np.bincount(px.ravel(), minlength=256)
            nz = np.nonzero(acc)[0]
            yield pd.DataFrame({"bin": nz.astype(np.int32), "cnt": acc[nz]})

    hist_rows = (images_df.select("image_id", "bytes", "fmt", "w", "h")
                 .mapInPandas(_hist, "bin int, cnt long")
                 .groupBy("bin").agg(F.sum("cnt").alias("cnt"))
                 .collect())  # bounded: <= 256 rows at any corpus size
    hist = np.zeros(256, dtype=np.int64)
    for r in hist_rows:
        hist[r["bin"]] = r["cnt"]
    cdf = np.cumsum(hist)
    total = int(cdf[-1])
    cdf_min = int(cdf[np.nonzero(hist)[0][0]]) if total else 0
    if total > cdf_min:
        lut = ((cdf - cdf_min) * 255 // (total - cdf_min)).astype(np.uint8)
    else:
        lut = np.zeros(256, dtype=np.uint8)

    def _remap(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "eq", "w", "h", "fmt")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h)
                out["image_id"].append(row.image_id)
                out["eq"].append(I.encode(lut[px], out_fmt))
                out["w"].append(row.w)
                out["h"].append(row.h)
                out["fmt"].append(out_fmt)
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return images_df.select(*cols).mapInPandas(_remap, EQUALIZE_SCHEMA)


PATCH_SCHEMA = "image_id string, gy int, gx int, patch binary, pw int, ph int, fmt string"


def extract_patches(images_df: DataFrame, patch: int = 8,
                    out_fmt: str = "rawz") -> DataFrame:
    """ViT-style patch extraction: decode -> non-overlapping patch x patch
    grid -> re-encode each patch as its own image row.

    The tokenization step of a vision-training pipeline (an image becomes
    (h//p)*(w//p) patch rows keyed by grid position), expressed as one
    mapInPandas pass: Arrow batches in, pure-numpy reshape per image (no
    per-pixel Python), real codec bytes out so downstream consumers (dedup,
    ANN over patch embeddings, shard packing) read patches exactly like
    images. Images are cropped to the largest covered grid (floor(h/p)*p)
    — the same convention as `thumbnail`. Output size fans out ~(h*w)/p²
    rows per image: partitioning by image keeps a task's working set at
    one decoded image + its patches, independent of corpus size.
    """
    if patch < 1:
        raise ValueError("patch must be >= 1")

    from ..sources import images as I

    def _patches(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "gy", "gx", "patch", "pw", "ph", "fmt")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h)
                gh, gw = row.h // patch, row.w // patch
                if gh == 0 or gw == 0:
                    continue  # smaller than one patch
                grid = (px[: gh * patch, : gw * patch, :]
                        .reshape(gh, patch, gw, patch, 3)
                        .transpose(0, 2, 1, 3, 4))  # (gy, gx, p, p, 3)
                for gy in range(gh):
                    for gx in range(gw):
                        out["image_id"].append(row.image_id)
                        out["gy"].append(gy)
                        out["gx"].append(gx)
                        out["patch"].append(I.encode(grid[gy, gx], out_fmt))
                        out["pw"].append(patch)
                        out["ph"].append(patch)
                        out["fmt"].append(out_fmt)
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return images_df.select(*cols).mapInPandas(_patches, PATCH_SCHEMA)


def caption_conflicts(pairs: DataFrame, captions: DataFrame,
                      caption_key: str = "doc_id", text_col: str = "text",
                      shingle: int = 5, num: int = 3, den: int = 10,
                      broadcast_captions: bool = True) -> DataFrame:
    """Cross-modal label-noise mining: given image near-dup PAIRS
    (id_a, id_b, hamming — e.g. phash_hamming_pairs output) and a caption
    table, flag pairs whose captions' exact shingle Jaccard < num/den.

    Near-identical images with disagreeing captions are either alt-text
    noise to drop or caption diversity to keep — a pure image dedup would
    silently keep one caption at random; this surfaces the choice. The
    caller maps image ids to caption keys beforehand (columns __ka/__kb on
    the pair rows, or identical ids).

    Plan: the caption Jaccard is a pure function of the (caption_a,
    caption_b) KEY pair, so it is computed once per DISTINCT key pair —
    slim distinct over the pair set, two equi-joins against per-caption
    DISTINCT shingle arrays (one Arrow pass), array_intersect/size column
    math (integer cross-multiplied threshold, no float) — and joined back
    to the full pair set. When many image pairs share a caption pair (the
    common case: near-dup cliques resolve to few captions; 3.58M image
    pairs -> 36 key pairs at sf0.1) this removes ~all of the per-pair
    array work; when keys are unique per image the extra distinct+join is
    one slim shuffle of the (already small) pair set. Captions broadcast
    by default; set broadcast_captions=False at caption scale for plain
    shuffle joins.
    """
    from .dedup import shingle_set_column

    docs = captions.select(F.col(caption_key).alias("__k"),
                           shingle_set_column(F.col(text_col), shingle)
                           .alias("__t"))
    if broadcast_captions:
        docs = F.broadcast(docs)
    a = docs.select(F.col("__k").alias("__ka"), F.col("__t").alias("__ta"))
    b = docs.select(F.col("__k").alias("__kb"), F.col("__t").alias("__tb"))
    if "__ka" not in pairs.columns:
        pairs = (pairs.withColumn("__ka", F.col("id_a"))
                 .withColumn("__kb", F.col("id_b")))
    common = F.size(F.array_intersect("__ta", "__tb")).cast("long")
    union = (F.size("__ta") + F.size("__tb")).cast("long") - common
    kp = (pairs.select("__ka", "__kb").distinct()
          .join(a, "__ka").join(b, "__kb")
          .select("__ka", "__kb", common.alias("n_common"),
                  union.alias("n_union")))
    return (pairs.join(kp, ["__ka", "__kb"])
            .select("id_a", "id_b", "hamming", "n_common", "n_union",
                    (F.col("n_common") * den < F.col("n_union") * num)
                    .alias("conflict")))


AUGMENT_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                  "hflip int, vflip int, ox int, oy int")


def augment(images_df: DataFrame, crop_w: int, crop_h: int, salt: int = 0,
            seed_col: str = None, out_fmt: str = "rawz") -> DataFrame:
    """Deterministic train-time augmentation: hash-seeded crop + flips.

    Every epoch-0 training pipeline augments images; doing it with rand()
    makes runs unreproducible and retried tasks produce different bytes.
    Here the parameters are a pure function of (id, salt) via the engine's
    sample_hash (vary salt per epoch for fresh-but-reproducible views):

      hflip = h mod 2,   vflip = (h div 2) mod 2,
      ox    = (h div 4) mod (w - crop_w + 1),
      oy    = (h div 4 div (w - crop_w + 1)) mod (h - crop_h + 1)

    The parameters are computed as CODEGEN COLUMNS (the hash never runs in
    Python — the mapInPandas body just applies the crop/flip it is handed,
    so the SQL twin restates parameters with sample_hash_sql bit-exactly).
    Crop happens first, flips apply to the cropped window; all three are
    pixel permutations, so the rawz re-encode is lossless and the output
    decodes to exactly the permuted source pixels. Images smaller than the
    crop are dropped (same convention as thumbnail/extract_patches).

    seed_col: long column to hash; defaults to image_id cast to long
    (fits the engine's numeric-string fixture ids; pass an explicit
    xxhash64 column for arbitrary string ids).
    """
    if crop_w < 1 or crop_h < 1:
        raise ValueError("crop dims must be >= 1")

    from ..sources import images as I
    from .sampling import sample_hash

    seed = (F.col(seed_col) if seed_col
            else F.col("image_id").cast("long"))
    # filter BEFORE deriving offsets: pmod by a zero/negative range is
    # undefined (ANSI error) for images smaller than the crop
    fit = images_df.filter((F.col("w") >= crop_w) & (F.col("h") >= crop_h))
    tmp = fit.select(
        "image_id", "bytes", "fmt", "w", "h",
        sample_hash(seed, salt).alias("__h"),
        (F.col("w") - F.lit(crop_w) + 1).cast("long").alias("__rx"),
        (F.col("h") - F.lit(crop_h) + 1).cast("long").alias("__ry"))
    # pure integer param derivation (shift/pmod/div — codegen, ANSI-safe,
    # restated 1:1 by sample_hash_sql-based twins)
    src = tmp.select(
        "image_id", "bytes", "fmt", "w", "h",
        F.col("__h").bitwiseAND(F.lit(1)).cast("int").alias("hflip"),
        F.shiftright(F.col("__h"), 1).bitwiseAND(F.lit(1)).cast("int")
        .alias("vflip"),
        F.pmod(F.shiftright(F.col("__h"), 2), F.col("__rx")).cast("int")
        .alias("ox"),
        F.pmod(F.expr("shiftright(__h, 2) div __rx"), F.col("__ry"))
        .cast("int").alias("oy"))

    def _apply(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                   "hflip", "vflip", "ox", "oy")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h)
                win = px[row.oy: row.oy + crop_h, row.ox: row.ox + crop_w, :]
                if row.vflip:
                    win = win[::-1, :, :]
                if row.hflip:
                    win = win[:, ::-1, :]
                out["image_id"].append(row.image_id)
                out["bytes"].append(I.encode(np.ascontiguousarray(win), out_fmt))
                out["w"].append(crop_w)
                out["h"].append(crop_h)
                out["fmt"].append(out_fmt)
                out["hflip"].append(row.hflip)
                out["vflip"].append(row.vflip)
                out["ox"].append(row.ox)
                out["oy"].append(row.oy)
            yield pd.DataFrame(out)

    return src.mapInPandas(_apply, AUGMENT_SCHEMA)


CONTOUR_SCHEMA = "image_id string, n_cut int, n_segments int, fp long"


def contour_cells(dem_df: DataFrame, threshold: int = None,
                  threshold_col: str = None) -> DataFrame:
    """Marching-squares contour classification over Terrain-RGB DEM tiles.

    The vector-contour step of a terrain pipeline: per 2x2 pixel cell,
    classify the 4 corners against the iso-threshold (class = 8a+4b+2c+1d,
    corner order a=NW b=NE c=SE d=SW); classes 1..14 are cut by the
    contour line. Emits per tile: n_cut (cut cells), n_segments (one per
    cut cell; saddle classes 5/10 carry two — both saddle resolutions
    agree on the COUNT, so no center-average disambiguation is needed),
    and a position-weighted class fingerprint over every cell (so the
    oracle checks the full classification grid, not just totals).

    Elevation is the Mapbox Terrain-RGB packing R*65536 + G*256 + B read
    from real codec bytes (same fixture contract as `hillshade`). The
    threshold is per-tile via threshold_col (iso-bands follow each tile's
    base elevation) or a constant. One mapInPandas pass, pure numpy
    shifted-view comparisons — no per-pixel Python. Integer compares only:
    bit-deterministic across engines.
    """
    if (threshold is None) == (threshold_col is None):
        raise ValueError("exactly one of threshold / threshold_col required")

    from ..sources import images as I

    src = dem_df.select(
        "image_id", "bytes", "fmt", "w", "h",
        (F.col(threshold_col) if threshold_col else F.lit(threshold))
        .cast("long").alias("iso_t"))

    def _contour(pdfs):
        P = 2147483647
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "n_cut", "n_segments", "fp")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h).astype(np.int64)
                elev = px[:, :, 0] * 65536 + px[:, :, 1] * 256 + px[:, :, 2]
                above = elev > int(row.iso_t)
                a = above[:-1, :-1]
                b = above[:-1, 1:]
                c = above[1:, 1:]
                d = above[1:, :-1]
                cls = 8 * a + 4 * b + 2 * c + 1 * d
                cut = (cls != 0) & (cls != 15)
                segs = cut.astype(np.int64) + ((cls == 5) | (cls == 10))
                cy, cx = np.mgrid[0: cls.shape[0], 0: cls.shape[1]]
                out["image_id"].append(row.image_id)
                out["n_cut"].append(int(cut.sum()))
                out["n_segments"].append(int(segs.sum()))
                out["fp"].append(int((cls * (cy * 29 + cx * 13 + 1)).sum() % P))
            yield pd.DataFrame(out)

    return src.mapInPandas(_contour, CONTOUR_SCHEMA)


RECON_SCHEMA = "image_id string, sse bigint, max_err int"


def recon_error(images_df: DataFrame, factor: int = 4) -> DataFrame:
    """Compression-error audit: per image, the exact integer SSE (and max
    absolute pixel error) between the original and its box-downsample ->
    nearest-neighbor-upsample reconstruction at `factor` — the quality
    number a pipeline checks before committing to a thumbnail/overzoom
    serving path (PSNR is a log of this; SSE stays integer so both engines
    agree bit-for-bit; apply the log at presentation time). Images are
    cropped to the covered grid like `thumbnail`. One mapInPandas pass,
    pure numpy; sse <= 255² * h * w fits int64 for any real image.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")

    from ..sources import images as I

    def _err(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "sse", "max_err")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h).astype(np.int64)
                th, tw = row.h // factor, row.w // factor
                if th == 0 or tw == 0:
                    continue
                block = px[: th * factor, : tw * factor, :]
                pooled = (block.reshape(th, factor, tw, factor, 3)
                          .sum(axis=(1, 3)) // (factor * factor))
                recon = np.repeat(np.repeat(pooled, factor, axis=0), factor, axis=1)
                d = block - recon
                out["image_id"].append(row.image_id)
                out["sse"].append(int((d * d).sum()))
                out["max_err"].append(int(np.abs(d).max()))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h"]
    return images_df.select(*cols).mapInPandas(_err, RECON_SCHEMA)
