"""Pure-numpy single-node oracle for the full pipeline (golden E2E analog).

Plays the Rust-binary+ogr2ogr role from the reference's integration test
(/root/reference/tests/integration_test.rs:63-137): independently computes
tile assignments, filter-feature masks, feature/tag survival, dedup keepers —
compared row-for-row against the Spark engine.
"""

from __future__ import annotations

import numpy as np

from mvt_wrangler_spark.functions import geometry as G
from mvt_wrangler_spark.operators.filters import FilterProgram
from tests.oracle import expr_oracle as O
from tests.oracle import tiling_oracle as T


def assignments(rows: list[dict], z: int) -> dict[str, tuple]:
    out = {}
    for r in rows:
        x, y = T.tile_xy(r["lon"], r["lat"], z)
        tid = T.pmtiles_tile_id(z, x, y)
        px, py = T.tile_local(r["lon"], r["lat"], z, x, y)
        out[r["image_id"]] = (z, x, y, tid, px, py)
    return out


def filter_masks(rows: list[dict], program: FilterProgram) -> dict[str, int]:
    out = {}
    for r in rows:
        mask = 0
        for i, feat in enumerate(program.features):
            for poly in feat.polygons:
                if bool(G.points_in_polygon(np.array([r["lon"]]), np.array([r["lat"]]), poly)[0]):
                    mask |= 1 << i
                    break
        out[r["image_id"]] = mask
    return out


def _resolved(feat, kind: str, layer: str):
    lf = feat.layers.get(layer)
    if lf is not None and lf.get(kind) is not None:
        return lf[kind]
    wc = feat.layers.get("*")
    if wc is not None and wc.get(kind) is not None:
        return wc[kind]
    return None


def survivors(rows: list[dict], program: FilterProgram, masks: dict[str, int]) -> dict[str, dict]:
    """Returns image_id -> {kept: bool, kept_tags: sorted tuple of keys}."""
    out = {}
    for r in rows:
        props = {k: ("string", v) for k, v in r["tags"].items()}
        mask = masks[r["image_id"]]
        removed = False
        for i, feat in enumerate(program.features):
            if not (mask & (1 << i)):
                continue
            rule = _resolved(feat, "feature", r["layer"])
            if rule is not None and O.evaluate_bool(rule, O.Context(props, None, None)):
                removed = True
                break
        if removed:
            out[r["image_id"]] = {"kept": False, "kept_tags": ()}
            continue
        kept_tags = []
        for key in r["tags"]:
            drop = False
            for i, feat in enumerate(program.features):
                if not (mask & (1 << i)):
                    continue
                rule = _resolved(feat, "tag", r["layer"])
                if rule is not None and O.evaluate_bool(rule, O.Context(props, key, None)):
                    drop = True
                    break
            if not drop:
                kept_tags.append(key)
        out[r["image_id"]] = {"kept": True, "kept_tags": tuple(sorted(kept_tags))}
    return out


def dedup_keepers(rows: list[dict], assign: dict[str, tuple]) -> set[str]:
    """min image_id per (z,x,y,phash)."""
    best: dict[tuple, str] = {}
    for r in rows:
        z, x, y, *_ = assign[r["image_id"]]
        key = (z, x, y, r["phash"])
        if key not in best or r["image_id"] < best[key]:
            best[key] = r["image_id"]
    return set(best.values())
