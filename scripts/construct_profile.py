"""Construction-vs-execution profile of every bench-timed query.

For each query: time fn(spark, sf_dir) (DataFrame CONSTRUCTION — driver-side
plan building, py4j round trips, plus any eager checkpoints the operator
runs) separately from the noop-sink action (EXECUTION). Both passes are
repeated; the second construction pass shows the steady-state driver cost
the warm bench reading pays.

Usage: python scripts/construct_profile.py [sf_dir] [query ...]
Writes a JSON table to stdout (one line per query) sorted by warm construct.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def main() -> None:
    from mvt_wrangler_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="construct-profile",
        extra={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    unknown = ONLY - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")
    names = [n for n in qs if not ONLY or n in ONLY]
    rows = []
    for name in names:
        fn = qs[name]
        try:
            t0 = time.time()
            df = fn(spark, SF_DIR)
            c_cold = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            x_cold = time.time() - t0
            t0 = time.time()
            df2 = fn(spark, SF_DIR)
            c_warm = time.time() - t0
            t0 = time.time()
            df2.write.format("noop").mode("overwrite").save()
            x_warm = time.time() - t0
        except Exception as ex:  # noqa: BLE001
            rows.append({"q": name, "err": str(ex)[:120]})
            continue
        rows.append({"q": name, "c_cold": round(c_cold, 2),
                     "x_cold": round(x_cold, 2), "c_warm": round(c_warm, 2),
                     "x_warm": round(x_warm, 2)})
        print(f"[{name}] c={c_cold:.2f}/{c_warm:.2f} x={x_cold:.2f}/{x_warm:.2f}",
              file=sys.stderr, flush=True)
    rows.sort(key=lambda r: -r.get("c_warm", 0))
    print(json.dumps(rows, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
