"""Package mvt_wrangler_spark for `spark-submit --py-files`.

The north rule runs jobs as
  spark-submit --master <...> --py-files mvt_wrangler_spark.zip submit_job.py <args>
on a multi-executor cluster: the zip lands on every executor's PYTHONPATH and
on the driver's, so nothing needs to be installed cluster-side. This helper
builds that zip (pure-source package — no data files, no compiled artifacts).

Usage: python scripts/make_pyfiles_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "mvt_wrangler_spark"


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(PKG, os.path.relpath(full, src))
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "mvt_wrangler_spark.zip"
    print(build_zip(out))
