"""Table profiling (ANALYZE-style column statistics).

The statistics surface every engine exposes before query planning and
every data pipeline runs at ingest: per column — row count, null count,
EXACT distinct count, min and max. One row per profiled column, values
canonicalized to strings so heterogeneous column types share one output
schema (and so both engines render identically: int64 and string are
format-stable; float columns are rejected — their string forms differ
between engines and exact profiling of floats is the wrong tool anyway).

Plan shape: ONE aggregate pass over the table computing all columns'
stats together (count/min/max fold into a single partial-agg; the exact
count_distincts make Catalyst plan an Expand — input amplified by the
number of profiled columns). That trade is documented: at 100 TB profile
few columns per pass, or swap count_distinct for approx_count_distinct
(HLL) when exactness isn't required — the oracle contract here pins the
exact path. The single aggregate row then explodes to per-column rows
driver-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLOATY = ("float", "double", "decimal")


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n, n_null, n_distinct, min_s, max_s) per requested column."""
    types = dict(df.dtypes)
    for c in cols:
        if any(t in types.get(c, "") for t in _FLOATY):
            raise ValueError(
                f"column {c!r} is {types.get(c)}: float/decimal min/max do "
                "not render identically across engines — profile int, "
                "string, or date columns")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    items = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n"),
            (F.col("__n") - F.col(f"__cnt_{c}")).cast("long").alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_s"),
            F.col(f"__max_{c}").alias("max_s"))
        for c in cols])
    return row.select(F.explode(items).alias("p")).select("p.*")


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin: one UNION ALL branch per column (same values; the
    oracle does not need the single-pass plan, only the semantics)."""
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS column,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_s,
       CAST(max({c}) AS VARCHAR) AS max_s
FROM {table}""")
    return "\nUNION ALL\n".join(parts)
