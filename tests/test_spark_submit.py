"""North-rule packaging contract: the job runs via `spark-submit --py-files`.

Runs the REAL spark-submit binary from the pyspark distribution with the
engine shipped only as a zip (scripts/make_pyfiles_zip.py) and the launcher
(scripts/submit_job.py) as the primary resource, from a cwd that does NOT
contain the package and with PYTHONPATH scrubbed — so the import can only be
satisfied by --py-files, exactly like a cluster submit where executors have
no code pre-installed. Reference CLI surface: /root/reference/src/lib.rs:12-37.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("spark-submit binary not available")


def _write_images_parquet(path: str, n: int = 400) -> None:
    """Tiny images table matching the north-rule input shape
    (image_id, bytes, w, h, fmt, caption, phash) + lon/lat/kind/tags."""
    ids = np.arange(n, dtype=np.int64)
    rng = (ids * 6364136223846793005 + 1442695040888963407) & ((1 << 63) - 1)
    lon = (rng % 360_000) / 1000.0 - 180.0
    lat = ((rng // 360_000) % 160_000) / 1000.0 - 80.0
    phash = rng % (n // 4)  # forced collisions so dedup does work
    kinds = ["road", "building", "water", "park"]
    tbl = pa.table({
        "image_id": pa.array([f"img{i:012d}" for i in ids], pa.string()),
        "bytes": pa.array([bytes([i % 251]) * 16 for i in ids], pa.binary()),
        "w": pa.array(np.full(n, 4, dtype=np.int32)),
        "h": pa.array(np.full(n, 4, dtype=np.int32)),
        "fmt": pa.array(["raw"] * n),
        "caption": pa.array([f"caption {i}" for i in ids]),
        "phash": pa.array(phash, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "kind": pa.array([kinds[i % 4] for i in ids]),
        "tags": pa.array(
            [[("kind", kinds[i % 4]), ("name", f"n{i}")] for i in ids],
            pa.map_(pa.string(), pa.string()),
        ),
    })
    pq.write_table(tbl, path)


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles_zip import build_zip

    zip_path = build_zip(str(tmp_path / "mvt_wrangler_spark.zip"), repo_root=REPO)
    launcher = tmp_path / "submit_job.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "submit_job.py"), launcher)
    src = tmp_path / "images.parquet"
    _write_images_parquet(str(src))
    out = tmp_path / "out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [_spark_submit_bin(), "--master", "local[4]",
         "--py-files", zip_path, str(launcher),
         str(src), str(out), "--master", "local[4]",
         "--zoom", "6", "--buckets", "4", "--job-id", "submit-e2e",
         "-n", "submit-smoke"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["rows_out"] > 0
    assert (out / "CURRENT").exists()
    meta = json.loads((out / "metadata.json").read_text())
    assert meta["name"] == "submit-smoke"
    assert meta["job_id"] == "submit-e2e"
    # the ordered sink committed real bucket data under the snapshot root
    # (layout: data/<job_id>/__bucket=<b>/*.parquet, catalog.py)
    files = list((out / "data").rglob("*.parquet"))
    assert files, "no committed parquet under out/data"
    assert (out / "stats").exists() and (out / "pyramid").exists()
