"""The graft's filter-program fixture: structurally identical to the
reference's 3-feature fixture (/root/reference/tests/fixtures/filter.geojson):
  1. polygon over metro-1 dropping ALL `pois` features (["boolean", true]);
  2. polygon over metro-2 dropping `buildings` features with kind=="building";
  3. a global polygon with the wildcard tag-prune rule (pgf:name:* and any
     name* key whose language capture is not in ["", "ja", "en", "2"]).
"""

from __future__ import annotations

from ..sources.images import METROS


def _box(cx: float, cy: float, r: float) -> list:
    return [[[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r], [cx - r, cy - r]]]


def default_filter_geojson() -> dict:
    m1, m2 = METROS[0], METROS[1]
    return {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": _box(m1[0], m1[1], 0.08)},
                "properties": {
                    "id": "metro1-pois",
                    "layers": {"pois": {"feature": ["boolean", True]}},
                },
            },
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": _box(m2[0], m2[1], 0.08)},
                "properties": {
                    "id": "metro2-buildings",
                    "layers": {"buildings": {"feature": ["any", ["==", ["tag", "kind"], "building"]]}},
                },
            },
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": _box(0.0, 0.0, 1000.0)},
                "properties": {
                    "id": "global-tag-prune",
                    "layers": {
                        "*": {
                            "tag": ["any",
                                    ["starts-with", ["key"], "pgf:name:"],
                                    ["all",
                                     ["starts-with", ["key"], "name"],
                                     ["not", ["in",
                                              ["regex-capture", ["key"], "^name:?(.*)$", 1],
                                              ["literal", ["", "ja", "en", "2"]]]]]],
                        }
                    },
                },
            },
        ],
    }
