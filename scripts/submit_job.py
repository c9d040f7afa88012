"""spark-submit primary resource for the engine's CLI job.

spark-submit takes a script file (not `-m package.module`), so this thin
launcher is the submitted file; the engine itself ships via
`--py-files mvt_wrangler_spark.zip` (build with scripts/make_pyfiles_zip.py):

  spark-submit --master local[32] \
      --py-files mvt_wrangler_spark.zip \
      submit_job.py <in.parquet|snapshot-root> <out-root> \
      [--filter f.geojson] [--zoom Z] [--job-id J] [--pmtiles out.pmtiles] ...

All arguments are forwarded to mvt_wrangler_spark.cli verbatim (reference CLI
surface: /root/reference/src/lib.rs:12-37). Re-running with the same --job-id
resumes from the staged write (checkpoint/resume, G10).
"""

from mvt_wrangler_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
