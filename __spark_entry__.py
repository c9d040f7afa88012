"""Driver contract for the spark-graft builder (PySpark target).

Every implemented operator from SURVEY.md §2 gets a queries() entry; each
SQL-expressible one gets an oracle_sql() twin the driver runs on DuckDB over
the same parquet. Spatial queries synthesize deterministic points from
lineitem keys (pure integer math — bit-identical in both engines; see
mvt_wrangler_spark/sources/points.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Z = 10  # zoom used by the oracle-checked tiling queries


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.sources.points import synth_points

    return synth_points(spark, sf_dir)


def _spread(df: DataFrame) -> DataFrame:
    """Spread a tiny id set across the cluster before per-row Python work.

    The image queries derive a few-thousand-row id table via distinct();
    AQE's partition coalescing sees a few KB and collapses the exchange to
    ONE partition — which then runs the whole downstream mapInPandas chain
    (pixel gen, codec, stats) on a single core (measured: every image query
    executed its Python stages as 1 task at sf0.1). Round-robin repartition
    with an explicit count is exempt from AQE coalescing (hash repartition
    is NOT — verified on this Spark build), and the count scales with the
    session's parallelism rather than a constant, so the fix holds from
    local[8] to a 1000-executor cluster. 2x parallelism keeps the Python
    stage balanced when per-row cost varies (codec mix)."""
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism * 2)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.functions import tiling

    pts = _points(spark, sf_dir)
    return tiling.assign_tiles(pts, z=Z, with_local=False).select("id", "z", "x", "y", "tile_id")


def q_tile_assign_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass multi-zoom assignment (z 4..10): one Hilbert pass at max
    zoom, coarser zooms derived by shifts (hierarchical curve property)."""
    from mvt_wrangler_spark.functions import tiling

    pts = _points(spark, sf_dir)
    return tiling.assign_tiles_multi(pts, z_min=4, z_max=Z).select(
        "id", "z", "x", "y", "tile_id")


def q_tile_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.functions import tiling

    pts = _points(spark, sf_dir)
    out = tiling.assign_tiles(pts, z=Z, with_local=True)
    return out.select(
        "id",
        F.round("px", 4).alias("px_r"),
        F.round("py", 4).alias("py_r"),
    )


def q_archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S3 in the gate: points -> assign -> REAL MVT blob encode ->
    vectorized mapInArrow decode -> values. The oracle restates the input,
    so any write- or read-path corruption (dictionary codes, varint bytes,
    geometry stream, tag rebuild) breaks the hash.

    px/py pre-round with floor(+0.5) so the encoder's np.rint sees
    integer-valued doubles (rint is half-EVEN; floor(+0.5) is the one
    formulation both engines state identically)."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import tile_encode as TE

    # synthetic lineitem has duplicate (orderkey, linenumber) keys -> id
    # collisions; full-row distinct is deterministic (dup rows identical)
    pts = _points(spark, sf_dir).distinct()
    a = tiling.assign_tiles(pts, z=Z, with_local=True)
    a = a.select(
        F.col("id").alias("image_id"), "z", "x", "y", "tile_id", "layer",
        F.create_map(F.lit("kind"), F.col("kind")).alias("tags"),
        F.floor(F.col("px") + 0.5).cast("double").alias("px"),
        F.floor(F.col("py") + 0.5).cast("double").alias("py"),
    )
    dec = TE.decode_tiles(TE.encode_tiles(a))
    return dec.select(
        F.col("feature_id").alias("id"), "z", "x", "y", "layer",
        F.element_at("pxs", 1).alias("px"),
        F.element_at("pys", 1).alias("py"),
        F.element_at("tags", F.lit("kind")).alias("kind"),
    )


def q_pyramid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import rollup as R

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=Z, with_local=False)
    base = pts.groupBy("z", "x", "y").agg(F.count(F.lit(1)).alias("n_rows"))
    return R.pyramid_rollup(base, base_z=Z, min_z=0)


def q_tile_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import rollup as R

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=Z, with_local=False)
    stats = R.tile_stats(pts.withColumn("bytes", F.lit(None).cast("binary")),
                         n_salt=8, salt_col="id")
    return stats.select("z", "x", "y", "n_rows")


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I of per-tile point counts (queen weights) at zoom Z:
    one scalar row answering 'is point density spatially clustered?'.
    All distributed aggregates are exact integer sums; see rollup.morans_i."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import rollup as R

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=Z, with_local=False)
    counts = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt"))
    return R.morans_i(counts)


def q_hot_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-score per zoom-Z tile (queen weights incl.
    self). Exact integer aggregates; pinned double evaluation order."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import rollup as R

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=Z, with_local=False)
    counts = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt"))
    return R.getis_ord_gi(counts)


def q_tile_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heatmap smoothing of zoom-8 tile counts with the 5x5 binomial
    kernel, run SEPARABLY (two 1-D passes, 10 stencil rows/tile instead of
    25 — rollup.tile_smooth); the oracle applies the non-separated 2-D
    kernel, so the factorization itself is what the hash checks."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import rollup as R

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=8, with_local=False)
    counts = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt"))
    return R.tile_smooth(counts)


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from mvt_wrangler_spark.functions import geometry as G
    from mvt_wrangler_spark.operators import joins as J
    from mvt_wrangler_spark.sources.points import PIP_POLYGONS

    pts = _points(spark, sf_dir)
    polys = [(pid, G.Polygon(np.array(v))) for pid, v in PIP_POLYGONS]
    return J.broadcast_pip_join(spark, pts.select("id", "lon", "lat"), polys).select("id", "admin_id")


def q_pip_join_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result contract as pip_join, via the NON-broadcast scale path
    (operators/joins.py partitioned_pip_join): polygon tile-cover equi-join +
    salted cogrouped exact refine — the regime for polygon layers too large
    to broadcast (reference only ever broadcasts its filter geometries,
    data.rs:189-230; this is the 100 TB generalization). The SAME half-plane
    DuckDB oracle as pip_join checks it, so broadcast and partitioned paths
    are pinned to one contract."""
    import numpy as np

    from mvt_wrangler_spark.operators import joins as J
    from mvt_wrangler_spark.sources.points import PIP_POLYGONS

    pts = _points(spark, sf_dir)
    rows = [(pid, [np.asarray(v, dtype=float)[:, 0].tolist()],
                  [np.asarray(v, dtype=float)[:, 1].tolist()])
            for pid, v in PIP_POLYGONS]
    polys = spark.createDataFrame(
        rows, "admin_id string, xs array<array<double>>, ys array<array<double>>")
    return J.partitioned_pip_join(
        pts.select("id", "lon", "lat"), polys, z=6,
        poly_id_col="admin_id", n_salt=4).select("id", "admin_id")


def q_intersects_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact geometry x geometry intersects join (J2 generalized): mixed
    Point/LineString/Polygon features vs broadcast admin polygons
    (transform.rs:130-143 semantics). SQL twin states the same sign-product
    crossing formula term for term."""
    import numpy as np

    from mvt_wrangler_spark.functions import geometry as G
    from mvt_wrangler_spark.operators import joins as J
    from mvt_wrangler_spark.sources.points import PIP_POLYGONS, synth_geoms

    feats = synth_geoms(spark, sf_dir)
    polys = [(pid, G.Polygon(np.array(v))) for pid, v in PIP_POLYGONS]
    return J.broadcast_intersects_join(spark, feats, polys).select(
        "id", "geom_type", "admin_id")


def q_intersects_join_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result contract as intersects_join via the NON-broadcast path
    (operators/joins.py partitioned_intersects_join): both-side tile covers,
    slim pair dedup before arrays move, salted cogrouped exact refine.
    Shares intersects_join's sign-product DuckDB oracle, pinning broadcast
    and partitioned intersects to one contract."""
    import numpy as np

    from mvt_wrangler_spark.operators import joins as J
    from mvt_wrangler_spark.sources.points import PIP_POLYGONS, synth_geoms

    feats = synth_geoms(spark, sf_dir)
    rows = [(pid, [np.asarray(v, dtype=float)[:, 0].tolist()],
                  [np.asarray(v, dtype=float)[:, 1].tolist()])
            for pid, v in PIP_POLYGONS]
    polys = spark.createDataFrame(
        rows, "admin_id string, xs array<array<double>>, ys array<array<double>>")
    return J.partitioned_intersects_join(
        feats, polys, z=5, poly_id_col="admin_id", n_salt=16).select(
        "id", "geom_type", "admin_id")


def q_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 live: a ["type"]-based DSL rule over non-point features — drop
    LineStrings whose geometry intersects the filter polygon."""
    from mvt_wrangler_spark.operators import filters as FL
    from mvt_wrangler_spark.sources.points import PIP_POLYGONS, synth_geoms

    ring = [list(v) for v in PIP_POLYGONS[0][1]]
    ring.append(ring[0])
    prog = FL.FilterProgram.from_geojson({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {"layers": {"*": {"feature": ["==", ["type"], "LineString"]}}},
        }],
    })
    feats = synth_geoms(spark, sf_dir).withColumn("layer", F.lit("feats")).withColumn(
        "tags", F.map_from_arrays(F.array().cast("array<string>"),
                                  F.array().cast("array<string>")))
    masked = feats.withColumn(
        "filter_mask",
        FL.geom_filter_mask_column(spark, prog, F.col("geom_type"),
                                   F.col("xs"), F.col("ys")))
    surv = FL.apply_feature_filter(masked, prog, geom_type_col="geom_type")
    return surv.select("id", "geom_type")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.operators import joins as J

    pts = _points(spark, sf_dir)
    queries = spark.createDataFrame(
        [("q0", 139.76, 35.68), ("q1", -74.0, 40.71), ("q2", 10.5, -20.25)],
        "query_id string, lon double, lat double",
    )
    out = J.knn_join(pts.withColumn("id", F.col("id").cast("string")), queries, k=4, data_id="id")
    return out.select("query_id", "rank", F.col("neighbor_id").cast("long").alias("neighbor_id"), "dist2")


def q_knn_join_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both-sides-distributed kNN (salted cell join, expanding-ring rounds) —
    globally EXACT, so it shares the brute-force oracle with knn_join."""
    from mvt_wrangler_spark.operators import joins as J

    pts = _points(spark, sf_dir)
    queries = spark.createDataFrame(
        [("q0", 139.76, 35.68), ("q1", -74.0, 40.71), ("q2", 10.5, -20.25)],
        "query_id string, lon double, lat double",
    )
    out = J.knn_join_cells(pts.withColumn("id", F.col("id").cast("string")),
                           queries, k=4, z=7, data_id="id", n_salt=4)
    return out.select("query_id", "rank",
                      F.col("neighbor_id").cast("long").alias("neighbor_id"), "dist2")


def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import dedup as D

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=Z, with_local=False)
    return D.phash_dedup(pts, keys=("z", "x", "y", "phash"), order_col="id").select(
        "id", "x", "y", "phash")


def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Program parse -> PIP mask -> compiled feature filter -> dedup."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import dedup as D
    from mvt_wrangler_spark.operators import filters as FL
    from mvt_wrangler_spark.sources.points import PIP_POLYGONS

    ring = [list(v) for v in PIP_POLYGONS[2][1]]
    ring.append(ring[0])
    program = FL.FilterProgram.from_geojson({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {"layers": {"*": {"feature": ["==", ["tag", "kind"], "building"]}}},
        }],
    })
    pts = _points(spark, sf_dir).withColumn("tags", F.create_map(F.lit("kind"), F.col("kind")))
    masked = pts.withColumn(
        "filter_mask", FL.filter_mask_native(program, F.col("lon"), F.col("lat")))
    surv = FL.apply_feature_filter(masked, program)
    surv = tiling.assign_tiles(surv, z=Z, with_local=False)
    # agg-based dedup: downstream needs only the keeper id per (tile, phash),
    # so shuffle 4 key columns + min(id) instead of full rows through a
    # window (min id == the row_number()=1 keeper; identical result set)
    agg = D.phash_dedup_agg(surv, keys=("z", "x", "y", "phash"), order_col="id")
    return agg.select(F.col("keeper_id").alias("id"), "x", "y", "phash")


def q_tag_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_filter with the reference fixture's global tag-prune rule."""
    from mvt_wrangler_spark.operators import expr as E
    from mvt_wrangler_spark.operators import filters as FL
    from mvt_wrangler_spark.sources.fixtures import default_filter_geojson

    prog = FL.FilterProgram.from_geojson(default_filter_geojson())
    pts = _points(spark, sf_dir).withColumn(
        "tags",
        F.create_map(
            F.lit("name"), F.col("kind"),
            F.lit("name:ja"), F.col("kind"),
            F.lit("name:fr"), F.col("kind"),
            F.lit("pgf:name:ja"), F.col("kind"),
            F.lit("kind"), F.col("kind"),
        ),
    ).withColumn("filter_mask", F.lit(4).cast("long"))  # global rule applies
    out = FL.apply_tag_filter(pts, prog)
    # scalar (not array) output: the driver's canonicalizer can't hash lists
    return out.select(
        "id", F.concat_ws(",", F.array_sort(F.map_keys("tags"))).alias("kept_keys"))


def q_expr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compiled DSL program over part-table tags."""
    from mvt_wrangler_spark.operators import expr as E

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    tagged = part.withColumn(
        "tags",
        F.create_map(
            F.lit("brand"), F.col("p_brand"),
            F.lit("type"), F.col("p_type"),
            F.lit("size"), F.col("p_size").cast("string"),
        ),
    )
    prog = ["all",
            ["in", ["tag", "brand"], ["literal", ["Brand#13", "Brand#11", "Brand#25"]]],
            ["regex-match", ["tag", "type"], "ECONOMY|PROMO"],
            # not-in: FILTERING.md:25-26 doc-parity op (operators/expr.py)
            ["not-in", ["string", ["tag", "size"]],
             ["literal", ["15", "25", "35", "45"]]],
            ["not", ["starts-with", ["tag", "size"], "1"]],
            [">", ["tag", "size"], "2"]]
    ctx = E.ColumnContext(tags=F.col("tags"))
    return tagged.filter(E.compile_expr(prog, ctx)).select("p_partkey")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase event picks up the value of the
    user's most recent click at-or-before it (inclusive ties, LEFT
    semantics). Spark side is the union-stream + running-last window
    operator (joins.asof_join — ONE key shuffle, no range-join pair
    blowup); the oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — an
    independent implementation of the same semantics, not a restatement of
    ours. The right side is deduped to unique (user_id, ts) with max value
    first, making the winner deterministic in both engines."""
    from mvt_wrangler_spark.operators.joins import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts").agg(F.max("value").alias("v")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    out = asof_join(purchases, clicks, on="user_id",
                    left_time="ts", right_time="ts", value_cols=["v"])
    return out.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").alias("purchase_value"),
        F.col("v_r").alias("last_click_value"))


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window agg (streaming-shaped, batch-checked)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"),
                   F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("total"))
        .select("event_type", "window_start", "n", "total")
    )


def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.exact_dedup(docs, on="text", order_col="doc_id").select("doc_id")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.operators import text as T

    return T.text_stats(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic (deterministic formula, both engines)."""
    from mvt_wrangler_spark.operators import text as T

    return T.lang_id(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document (pure codegen
    regexp_count; identical regex semantics pinned on both engines)."""
    from mvt_wrangler_spark.operators import text as T

    return T.token_counts(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, the count of its
    distinct 8-gram shingles appearing anywhere in the eval split
    (doc_id % 37 == 3). Broadcast eval shingle set + one groupBy shuffle."""
    from mvt_wrangler_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = F.pmod("doc_id", F.lit(37)) == 3
    return T.decontaminate(docs.filter(~ev), docs.filter(ev), shingle=8)


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 salient terms by the exact-integer tf-idf surrogate
    tf * (N - df) (text.tfidf_topk): explode -> tf groupBy -> df window ->
    1-row broadcast N -> per-doc top-k window, ties broken on term."""
    from mvt_wrangler_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return T.tfidf_topk(docs, k=5)


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-boilerplate detection: per doc, distinct 12-gram shingles
    occurring in >= 4 distinct docs (header/footer/template chrome). One
    Arrow shingle pass, doc frequency via a window over the shingle key
    (no self-join, no recomputed subtree), one groupBy(id)."""
    from mvt_wrangler_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return T.boilerplate_stats(docs, shingle=12, min_docs=4)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-line fraction,
    duplicate-line char fraction, top word bigram + covered fraction."""
    from mvt_wrangler_spark.operators import text as T

    return T.repetition_stats(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII count + redaction (emails / IPv4 / phones); the redacted text is
    an output column so every replacement sits under the value hash."""
    from mvt_wrangler_spark.operators import text as T

    return T.pii_scrub(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist curation value-checked end to end: deterministic
    URL-bearing text is built from point ids (identical string algebra on
    both engines), URLs -> hosts -> registrable domains are regex-extracted,
    and a broadcast blocklist join yields per-doc (n_urls, n_blocked, keep).
    Every 11th doc carries no URL (exercises the left-join keep path)."""
    from mvt_wrangler_spark.operators import text as T

    ids = _points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(29)) == 2).distinct()
    i = F.col("id")
    s1 = F.concat(F.lit("https://www.shop"), F.pmod(i, F.lit(5)),
                  F.lit(".example"), F.pmod(i, F.lit(7)),
                  F.lit(".com/item/"), i)
    s2 = F.concat(F.lit("http://cdn"), F.pmod(i, F.lit(3)),
                  F.lit(".assets"), F.pmod(i, F.lit(4)),
                  F.lit(".net:8080/f/"), i)
    text = F.when(F.pmod(i, F.lit(11)) == 0, F.lit("no links today"))\
            .when(F.pmod(i, F.lit(2)) == 0,
                  F.concat(F.lit("buy at "), s1, F.lit(" and "), s2, F.lit(" now")))\
            .otherwise(F.concat(F.lit("see "), s1, F.lit(" today")))
    docs = ids.select(i.alias("doc_id"), text.alias("text"))
    blocked = spark.createDataFrame(
        [("example0.com",), ("example3.com",), ("example6.com",),
         ("assets1.net",), ("assets3.net",)], ["domain"])
    return T.blocklist_scrub(docs, blocked)


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by term frequency (+ doc
    frequency), global top-k as TakeOrderedAndProject — no full sort."""
    from mvt_wrangler_spark.operators import text as T

    return T.vocab_topk(spark.read.parquet(f"{sf_dir}/documents.parquet"), k=100)


def q_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: exact dedup + repetition + PII +
    length + language gates composed into one keep/drop verdict with a
    priority-ordered drop reason (dup > repetitive > pii > short > lang).
    The corpus is spiked deterministically (identical algebra on both
    engines) so every gate fires: +1e6 ids are exact duplicates, +2e6 ids
    carry an email, +3e6 ids are one line repeated three times. Each
    signal is the SAME operator the standalone contract queries check; the
    oracle composes the corresponding SQL twins as CTEs over the spiked
    corpus."""
    from mvt_wrangler_spark.operators import dedup as D
    from mvt_wrangler_spark.operators import text as T

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    d = F.col("doc_id")
    dups = base.filter(d % 10 == 0).select((d + 1000000).alias("doc_id"), "text")
    piis = base.filter(d % 17 == 0).select(
        (d + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" contact bob@spam.io now")).alias("text"))
    ln = F.concat(F.lit("repeat me "), d.cast("string"))
    reps = base.filter(d % 13 == 0).select(
        (d + 3000000).alias("doc_id"),
        F.concat(ln, F.lit("\n"), ln, F.lit("\n"), ln).alias("text"))
    docs = base.unionAll(dups).unionAll(piis).unionAll(reps)
    # pin the spiked corpus: it feeds SIX consumers (the id spine + five
    # signal operators), and un-pinned each consumer re-ran the 4-branch
    # scan+spike union — 24 parquet scans in the plan, i.e. six full corpus
    # passes at scale. One materialized pass is what a real curation
    # pipeline does with its staged corpus.
    docs = docs.localCheckpoint(eager=True)

    keeper = (D.exact_dedup(docs, on="text", order_col="doc_id")
              .select("doc_id").withColumn("__k", F.lit(1)))
    tok = T.token_counts(docs).select("doc_id", "n_ws_tokens")
    rep = T.repetition_stats(docs).select("doc_id", "dup_line_frac")
    pii = T.pii_scrub(docs).select("doc_id", "has_pii")
    lang = T.lang_id(docs)
    j = (docs.select("doc_id").join(keeper, "doc_id", "left")
         .join(tok, "doc_id").join(rep, "doc_id")
         .join(pii, "doc_id").join(lang, "doc_id"))
    reason = (F.when(F.col("__k").isNull(), "dup")
              .when(F.col("dup_line_frac") > 0.3, "repetitive")
              .when(F.col("has_pii"), "pii")
              .when(F.col("n_ws_tokens") < 20, "short")
              .when(F.col("lang_pred") == "unk", "lang"))
    return j.select("doc_id", reason.isNull().alias("keep"),
                    reason.alias("reason"))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force integer-quantized dot-product top-k (ANN baseline)."""
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    prod = F.zip_with(
        "embedding", "qemb",
        lambda x, y: F.round(x.cast("double") * 1000).cast("long")
        * F.round(y.cast("double") * 1000).cast("long"),
    )
    score = F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "rank", F.col("vec_id").alias("neighbor_id"), "score")
    )


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN scale path: sign-LSH coarse cells + hamming-1 probes +
    exact integer rank within candidates (no cartesian stage)."""
    from mvt_wrangler_spark.operators.joins import ann_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_topk_lsh(emb, k=5)


def q_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full S2 (level 12) + H3-style (res 7) cell ids from unit-sphere xyz
    via the FUSED vectorized-numpy pandas UDF (one Arrow pass emits both
    cells) — with a BIT-EXACT DuckDB twin (the from-xyz encoders are
    trig-free: divide/sqrt/int ops only, all IEEE-exact). The native
    codegen column twins remain pytest-covered (bit-equal on sampled
    points) but lost the bench head-to-head: the unrolled Hilbert chain
    exceeds JIT method limits and drops to interpreted eval (round-4
    honest-timing finding), while the numpy kernel walks the curve through
    a chunked 4096-entry lookup table (6 gathers for 30 levels)."""
    from pyspark.sql import functions as F

    from mvt_wrangler_spark.functions import cells as C
    from mvt_wrangler_spark.sources.points import synth_xyz

    pts = synth_xyz(spark, sf_dir)
    out = pts.withColumn(
        "__cells",
        C.cells_from_xyz_column(F.col("x"), F.col("y"), F.col("z"),
                                level=12, res=7))
    return out.select("id", F.col("__cells.s2_cell").alias("s2_cell"),
                      F.col("__cells.h3_cell").alias("h3_cell"))


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view -> click -> purchase per user: greedy
    first-match walk (earliest view, earliest click strictly after it,
    earliest purchase after that) with int64-packed (ts, event_id) order
    keys — one min-aggregate + one user-key join per step
    (operators/events.py)."""
    from mvt_wrangler_spark.operators.events import funnel

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          # sparsify: the synthetic fixture gives every user ~13 events per
          # type, so the unfiltered funnel converts 100% — 1/7 of events
          # leaves ~2 per (user, type) and all reached levels occur
          .filter(F.pmod("event_id", F.lit(7)) == 0))
    return funnel(ev, ["view", "click", "purchase"])


def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination tile flows: consecutive-event tile transitions
    per user (events located by a deterministic event-id hash, tiles via
    the real z4 mercator math, packed x*16+y), counted per (from, to).
    One user-key lag window ordered by the total (ts, event_id) order +
    one groupBy — operators/events.od_matrix."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators.events import od_matrix

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid, uid = F.col("event_id"), F.col("user_id")
    lon = (F.pmod(eid * 7919 + uid, F.lit(360000)) - 180000).cast("double") / 1000.0
    lat = (F.pmod(eid * 104729 + uid, F.lit(170000)) - 85000).cast("double") / 1000.0
    located = ev.select(
        "user_id", "ts", "event_id",
        (tiling.tile_x(lon, 4) * 16 + tiling.tile_y(lat, 4)).alias("tile"))
    return od_matrix(located)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — lag + cumulative-sum windows."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # exact integer microseconds
    gap = us - F.lag(us).over(w)
    bounded = ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0))
    sess = bounded.withColumn("session_n", F.sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_n")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "session_start", "n_events")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality heuristics: token stats + stopword/punct ratios."""
    from mvt_wrangler_spark.operators import text as T

    return T.quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_distinct_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-phash count per tile (dedup audit)."""
    from mvt_wrangler_spark.functions import tiling

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=6, with_local=False)
    return pts.groupBy("x", "y").agg(F.countDistinct("phash").alias("n_phash"))


def q_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per type (ranking window)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", "value")
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (quantized, exact integer test,
    cos > 0.4 — the synthetic embeddings' near-dup band).

    Vectorized int64-matmul against the broadcast quantized matrix; exact
    same results as the per-pair SQL oracle (integers all the way).
    """
    from mvt_wrangler_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, id_col="vec_id", vec_col="embedding",
                                   quant=100, cos_num=16, cos_den=100)


def _tile_encode_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points with a variable tag map: 'kind' always, 'name' on 1/3 of rows —
    so per-tile dictionaries have real first-seen-order content to check."""
    from mvt_wrangler_spark.functions import tiling

    pts = _points(spark, sf_dir)
    full = F.create_map(
        F.lit("kind"), F.col("kind"),
        F.lit("name"), F.concat(F.lit("n"), F.pmod(F.col("id"), F.lit(997))),
    )
    has_name = F.pmod(F.col("id"), F.lit(3)) == 0
    pts = pts.withColumn(
        "tags", F.map_filter(full, lambda k, v: (k != F.lit("name")) | has_name))
    pts = pts.withColumn("image_id", F.col("id").cast("string"))
    return tiling.assign_tiles(pts, z=6)


def q_tile_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archive encoder's per-(tile, layer) dictionaries as flat columns:
    keys/values in FIRST-SEEN order (transform.rs:174-191 A1 semantics),
    computed by the same _layer_dictionaries the MVT blob encoder uses. The
    blob bytes themselves are pytest-pinned (golden bytes + decode round-trip)."""
    from mvt_wrangler_spark.operators import tile_encode as TE

    return TE.tile_dictionary_stats(_tile_encode_input(spark, sf_dir)).select(
        "x", "y", "tile_id", "layer", "n_features", "n_keys", "n_values",
        "keys_joined", "values_joined")


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs: mod-P minhash banding with hot-bucket cap;
    the oracle replicates bucketing + join + cap exactly in SQL."""
    from mvt_wrangler_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.minhash_lsh_candidates(docs, num_hashes=16, bands=4, shingle=5,
                                    max_bucket=1000)


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/joins.py interval_join):
    every event vs deterministic ad-exposure-style windows derived from the
    click events ([ts, ts + (event_id%7+1) min]). Bucketed equi-join + exact
    refine — NO BroadcastNestedLoopJoin in the plan (gate-audited); the
    DuckDB oracle is the naive inequality join, an independent
    implementation that checks cover completeness at bucket edges."""
    from mvt_wrangler_spark.operators.joins import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(F.col("event_id").alias("pid"), us.alias("t"))
    iv = (ev.filter(F.col("event_type") == "click")
            .select(F.col("event_id").alias("interval_id"), us.alias("lo"),
                    (us + (F.col("event_id") % 7 + 1) * 60_000_000).alias("hi")))
    out = interval_join(pts, iv, point_col="t", start_col="lo", end_col="hi",
                        bucket_width=600_000_000)  # 10-min buckets
    return out.select("pid", "interval_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via the AllPairs prefix filter +
    PPJoin position filter (slim candidate join, arrays re-attached
    post-dedup). t=0.8 is the realistic exact-dedup operating point; at low
    thresholds a boilerplate corpus degenerates toward all-pairs (9.7M of
    12.5M pairs were candidates at t=0.4/sf0.1 — inherent to EXACT Jaccard;
    minhash_lsh is the low-threshold scale path). The DuckDB oracle is a
    BRUTE-FORCE cross join — an independent implementation that adversarially
    verifies the two filters' completeness."""
    from mvt_wrangler_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                 shingle=5, threshold=0.8)


def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed embedding near-dup (the >1e6-vector scale path):
    bucket equi-join candidates + exact int64 cosine refine, no N^2 stage."""
    from mvt_wrangler_spark.operators.dedup import embedding_neardup_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_lsh(emb, id_col="vec_id", vec_col="embedding",
                                 quant=100, cos_num=16, cos_den=100)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """62-bit SimHash fingerprint per document (two mod-P 31-bit hash
    streams; bit-identical SQL twin)."""
    from mvt_wrangler_spark.operators.dedup import simhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", simhash64(F.col("text"), shingle=4).alias("simhash"))


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster->vector zonal assignment, value-checked end to end: images are
    synthesized with an algebraic pixel formula, ENCODED to real bytes
    (raw / zlib / lossy-quantized codecs), decoded back by the engine and
    block-reduced to zone stats — while the oracle brute-forces the same
    formula (with the quantization model for the lossy fmt) in SQL. Exercises
    S3 decode + the zonal kernel under the driver's value hash, not just
    pytest."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import zonal as Z
    from mvt_wrangler_spark.sources import images as I

    W, H = 24, 16
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(37)) == 3).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": [],
                    "z": [], "x": [], "y": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                px = ((int(i) * 31 + yy * 7 + xx * 13 + cc * 5) % 256).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
                rows["z"].append(0)
                rows["x"].append(0)
                rows["y"].append(0)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(
        gen, "image_id string, bytes binary, fmt string, w int, h int, "
             "z int, x bigint, y bigint")
    out = Z.zonal_stats(imgs, gx=2, gy=2)
    return out.select(
        F.col("image_id").cast("long").alias("id"), "zone", "n_px",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"))


def q_thumb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail generation value-checked end to end: algebraic-formula images
    are encoded to real bytes (raw/rawz/qlossy), the engine decodes, box-
    downsamples 4x in exact integer arithmetic, re-encodes the thumbnail
    (rawz), and the check decodes those thumbnail BYTES back into per-image
    channel means + a position-weighted fingerprint over every thumbnail
    pixel. The oracle brute-forces the same block-sum // 16 pooling (with the
    lossy quantization model) in SQL — so decode, pooling, and the thumbnail
    codec round-trip all sit under the driver's value hash."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H, FCT = 24, 16, 4
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(41)) == 5).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                px = ((int(i) * 31 + yy * 7 + xx * 13 + cc * 5) % 256).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    thumbs = M.thumbnail(imgs, factor=FCT, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        n_blk = (H // FCT) * (W // FCT)
        for pdf in pdfs:
            rows = {"id": [], "mean_r": [], "mean_g": [], "mean_b": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.thumb), row.fmt, row.tw, row.th).astype(np.int64)
                g = _grids.get((row.th, row.tw))
                if g is None:
                    g = _grids.setdefault((row.th, row.tw),
                                          np.mgrid[0:row.th, 0:row.tw, 0:3])
                zy, zx, cc = g
                fp = int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum() % 2147483647)
                rows["id"].append(int(row.image_id))
                for col, c in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                    rows[col].append(round(float(t[:, :, c].sum()) / n_blk, 6))
                rows["fp"].append(fp)
            yield pd.DataFrame(rows)

    return thumbs.mapInPandas(
        stats, "id long, mean_r double, mean_g double, mean_b double, fp long")


def q_patch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction value-checked end to end: algebraic
    images (24x16, the thumb_stats formula) are encoded to real bytes
    (raw/rawz/qlossy cycling by id), the engine decodes and splits each
    into an 8x8 patch grid re-encoded as rawz patch rows, and the check
    decodes those PATCH BYTES back into per-patch channel sums + a
    patch-local position-weighted fingerprint. The oracle restates the
    pixel formula (incl. the qlossy quantization model) and the grid
    arithmetic in SQL, so decode, grid split, and the patch codec
    round-trip all sit under the driver's value hash."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H, P = 24, 16, 8
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(47)) == 9).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                px = ((int(i) * 31 + yy * 7 + xx * 13 + cc * 5) % 256).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    patches = M.extract_patches(imgs, patch=P, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        for pdf in pdfs:
            rows = {"id": [], "gy": [], "gx": [],
                    "sum_r": [], "sum_g": [], "sum_b": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.patch), row.fmt, row.pw, row.ph).astype(np.int64)
                g = _grids.get((row.ph, row.pw))
                if g is None:
                    g = _grids.setdefault((row.ph, row.pw),
                                          np.mgrid[0:row.ph, 0:row.pw, 0:3])
                zy, zx, cc = g
                rows["id"].append(int(row.image_id))
                rows["gy"].append(int(row.gy))
                rows["gx"].append(int(row.gx))
                for col, c in (("sum_r", 0), ("sum_g", 1), ("sum_b", 2)):
                    rows[col].append(int(t[:, :, c].sum()))
                rows["fp"].append(int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum()
                                      % 2147483647))
            yield pd.DataFrame(rows)

    return patches.mapInPandas(
        stats,
        "id long, gy int, gx int, sum_r long, sum_g long, sum_b long, fp long")


def q_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-error audit value-checked end to end: algebraic 24x16
    images -> real codec bytes -> exact integer SSE + max |err| between
    the original and its 4x box-down -> nearest-up reconstruction
    (multimodal.recon_error). The oracle restates pixels (incl. qlossy),
    block pooling, and the per-pixel squared error in SQL."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H = 24, 16
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(61)) == 17).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                px = ((int(i) * 31 + yy * 7 + xx * 13 + cc * 5) % 256).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    out = M.recon_error(imgs, factor=4)
    return out.select(F.col("image_id").cast("long").alias("id"),
                      "sse", "max_err")


def q_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour classification over Terrain-RGB DEM tiles
    (the hillshade fixture: elev = (id*13 + y²*3 + x²*2 + y*x*5) % 2^20
    packed R*65536+G*256+B, encoded to real raw/rawz/qlossy bytes). The
    iso-threshold is PER TILE — each tile's base elevation (id*13 % 2^20)
    + 1700, mid of the intra-tile relief — attached as a codegen column,
    so every non-quantized tile actually gets cut. Output: cut-cell count,
    segment count (saddles carry 2), and a position-weighted class
    fingerprint over the full (h-1)x(w-1) cell grid. The oracle restates
    elevation (incl. the qlossy per-channel model), the per-tile
    threshold, the 4-corner classification, and the saddle rule in SQL."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H = 24, 16
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(59)) == 13).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx = np.mgrid[0:H, 0:W]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                elev = (int(i) * 13 + yy * yy * 3 + xx * xx * 2 + yy * xx * 5) % (1 << 20)
                px = np.stack([elev // 65536, (elev // 256) % 256, elev % 256],
                              axis=-1).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    dem = imgs.withColumn(
        "iso", F.pmod(F.col("image_id").cast("long") * 13, F.lit(1 << 20)) + 1700)
    out = M.contour_cells(dem, threshold_col="iso")
    return out.select(F.col("image_id").cast("long").alias("id"),
                      "n_cut", "n_segments", "fp")


def q_augment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic augmentation value-checked end to end: algebraic 24x16
    images -> real codec bytes -> hash-seeded 16x12 crop + h/v flips
    (multimodal.augment; parameters are sample_hash codegen columns) ->
    rawz re-encode; the check decodes the AUGMENTED BYTES into per-channel
    sums (crop-window evidence — flips are permutations) + a
    position-weighted fingerprint (orientation evidence) and echoes the
    parameters. The oracle restates sample_hash, the offset/flip
    derivation, the source-coordinate permutation, and the qlossy model in
    SQL — augmentation is reproducible BECAUSE a second engine can
    recompute it."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H, CW, CH = 24, 16, 16, 12
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(53)) == 11).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                px = ((int(i) * 31 + yy * 7 + xx * 13 + cc * 5) % 256).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    aug = M.augment(imgs, crop_w=CW, crop_h=CH, salt=0, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        for pdf in pdfs:
            rows = {"id": [], "hflip": [], "vflip": [], "ox": [], "oy": [],
                    "sum_r": [], "sum_g": [], "sum_b": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.bytes), row.fmt, row.w, row.h).astype(np.int64)
                g = _grids.get((row.h, row.w))
                if g is None:
                    g = _grids.setdefault((row.h, row.w),
                                          np.mgrid[0:row.h, 0:row.w, 0:3])
                zy, zx, cc = g
                rows["id"].append(int(row.image_id))
                for k in ("hflip", "vflip", "ox", "oy"):
                    rows[k].append(int(getattr(row, k)))
                for col, c in (("sum_r", 0), ("sum_g", 1), ("sum_b", 2)):
                    rows[col].append(int(t[:, :, c].sum()))
                rows["fp"].append(int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum()
                                      % 2147483647))
            yield pd.DataFrame(rows)

    return aug.mapInPandas(
        stats, "id long, hflip int, vflip int, ox int, oy int, "
               "sum_r long, sum_g long, sum_b long, fp long")


def q_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain-RGB hillshade value-checked end to end: algebraic DEM tiles
    (elev = (id*13 + y*y*3 + x*x*2 + y*x*5) % 2^20, packed R*65536+G*256+B)
    are encoded to real bytes (raw/rawz/qlossy), the engine decodes, runs
    Horn's 3x3 integer gradient stencil, packs (shade, |gx|%256, |gy|%256)
    and re-encodes; the check decodes those SHADE BYTES back into per-tile
    mean/max shade + a position-weighted fingerprint over every output
    pixel. The oracle restates elevation unpack (incl. the qlossy
    per-channel quantization model), both gradients, the shift-4 L1 shade,
    and the output packing in SQL."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H = 24, 16
    ids = _spread(_points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(43)) == 7).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx = np.mgrid[0:H, 0:W]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                elev = (int(i) * 13 + yy * yy * 3 + xx * xx * 2 + yy * xx * 5) % (1 << 20)
                px = np.stack([elev // 65536, (elev // 256) % 256, elev % 256],
                              axis=-1).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    shades = M.hillshade(imgs, shift=4, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        for pdf in pdfs:
            rows = {"id": [], "mean_shade": [], "max_shade": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.shade), row.fmt, row.tw, row.th).astype(np.int64)
                g = _grids.get((row.th, row.tw))
                if g is None:
                    g = _grids.setdefault((row.th, row.tw),
                                          np.mgrid[0:row.th, 0:row.tw, 0:3])
                zy, zx, cc = g
                fp = int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum() % 2147483647)
                rows["id"].append(int(row.image_id))
                rows["mean_shade"].append(
                    round(float(t[:, :, 0].sum()) / (row.th * row.tw), 6))
                rows["max_shade"].append(int(t[:, :, 0].max()))
                rows["fp"].append(fp)
            yield pd.DataFrame(rows)

    return shades.mapInPandas(
        stats, "id long, mean_shade double, max_shade long, fp long")


def q_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide histogram equalization value-checked end to end: skewed
    algebraic images (v = u^2 for u = (id*7 + y*3 + x + c*5) % 16) are
    encoded to real bytes, the engine computes ONE global 256-bin histogram
    (bounded 256-row collect), remaps every pixel through the integer CDF
    LUT, re-encodes, and the check decodes the equalized BYTES into
    per-image mean + fingerprint. The oracle restates histogram, cumsum
    LUT (window sum), and remap in SQL — including the qlossy per-channel
    quantization model on the input side."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W, H = 16, 8
    # no _spread here: the 16x8 fixture's per-image Python is so light that
    # the two-pass operator (histogram + remap both re-read the gen) pays
    # more in repartition exchanges + task scheduling than the parallelism
    # returns (A/B at sf0.1: 1.43 s vs 2.5-3.1 s median with _spread)
    ids = _points(spark, sf_dir).select("id").filter(F.pmod("id", F.lit(47)) == 9).distinct()

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                u = (int(i) * 7 + yy * 3 + xx + cc * 5) % 16
                px = (u * u).astype(np.uint8)  # skewed: 16 clumped levels
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    eq = M.equalize(imgs, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        for pdf in pdfs:
            rows = {"id": [], "mean_eq": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.eq), row.fmt, row.w, row.h).astype(np.int64)
                g = _grids.get((row.h, row.w))
                if g is None:
                    g = _grids.setdefault((row.h, row.w),
                                          np.mgrid[0:row.h, 0:row.w, 0:3])
                zy, zx, cc = g
                fp = int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum() % 2147483647)
                rows["id"].append(int(row.image_id))
                rows["mean_eq"].append(round(float(t.sum()) / (row.h * row.w * 3), 6))
                rows["fp"].append(fp)
            yield pd.DataFrame(rows)

    return eq.mapInPandas(stats, "id long, mean_eq double, fp long")


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup by phash hamming banding, value-checked bit-for-bit:
    synthesize 62-bit phashes in pure integer column math (cluster base =
    two mod-P halves packed nonneg; each member XOR-flips one id-derived
    bit, so same-cluster pairs sit at hamming 2), then run the lossless
    band-join + popcount refine. The oracle restates bands, join, star
    fallback, and refine in SQL (phash_hamming_sql)."""
    from mvt_wrangler_spark.operators.dedup import GOLD, P31, phash_hamming_pairs

    ids = (_points(spark, sf_dir).select("id")
           .filter(F.pmod("id", F.lit(5)) < 2).distinct())
    c = F.expr("id div 5")
    h1 = F.pmod(c * F.lit(GOLD) + 11, F.lit(P31))
    h2 = F.pmod(c * F.lit(1779033703) + 7, F.lit(P31))
    flip = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 62 AS INT))")
    ph = ids.select("id", (h1 * F.lit(2 ** 31) + h2).bitwiseXOR(flip).alias("phash"))
    return phash_hamming_pairs(ph, id_col="id", phash_col="phash",
                               k=3, bands=4, max_bucket=1000)


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k with the LEARNED coarse quantizer (k-means IVF): probes the
    n_probe nearest learned cells, exact integer dot-product rank. Same rank
    convention as ann_topk / ann_topk_lsh; oracle reuses the unrolled Lloyd
    CTEs and reproduces the identical result set."""
    from mvt_wrangler_spark.operators.cluster import ann_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_topk_ivf(emb, k=5, n_clusters=4, n_probe=2, n_iter=2,
                        quant=100, n_queries=3)


def _ahash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, ahash) for the image fixture: algebraic images (pairs share a
    cluster formula; the odd member gets a +45 bump in one cluster-chosen
    zone) -> real codec encode -> ahash64 (decode, 8x8 integer luma
    pooling, mean-threshold bits). Shared by the pair and cluster
    queries so both stay on one bytes->hash stage."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators.dedup import phash_hamming_pairs
    from mvt_wrangler_spark.operators.multimodal import ahash64
    from mvt_wrangler_spark.sources import images as I

    W, H = 24, 16
    ids = _spread(_points(spark, sf_dir).select("id")
                  .filter((F.pmod("id", F.lit(5)) < 2)
                          & (F.pmod(F.expr("id div 5"), F.lit(8)) == 0))
                  .distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                i = int(i)
                cl, b = i // 5, i % 5
                px = (cl * 31 + yy * 7 + xx * 13 + cc * 5) % 200
                if b == 1:  # localized bump in one cluster-chosen zone
                    zy0, zx0 = cl % 8, (cl // 8) % 8
                    px = px + 45 * ((yy // 2 == zy0) & (xx // 3 == zx0))
                fmt = fmts[i % 3]
                rows["image_id"].append(str(i))
                rows["bytes"].append(I.encode(px.astype(np.uint8), fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "image_id string, bytes binary, fmt string, w int, h int")
    # Materialize (id, ahash) ONCE per invocation: consumers reference it
    # several times (hamming_keepers joins df twice; the banding operators
    # re-materialize only their own slim projection), and an
    # un-materialized reference re-runs the whole scan->gen->codec->ahash
    # chain. 16 bytes/row — the guide §8 proxy shape. localCheckpoint,
    # NOT cache(): CacheManager matches by canonicalized plan, so a cache
    # would be silently reused by the NEXT invocation of the same query
    # (cross-run result reuse the bench rules forbid); the checkpoint
    # re-materializes every run. Repartition-down first: the Python chain
    # runs wide (_spread), but downstream consumers are slim
    # row-count-bounded joins, and reading 2x-parallelism checkpoint
    # blocks per reference costs more task scheduling than 16-byte rows
    # justify.
    par = max(8, spark.sparkContext.defaultParallelism // 4)
    return (ahash64(imgs)
            .select(F.col("image_id").cast("long").alias("id"), "ahash")
            .repartition(par)
            .localCheckpoint())


def q_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's full bytes-to-near-dup image chain under one value hash
    (see _ahash_df for the bytes->decode->ahash stages). The oracle restates
    pixels, luma, pooling, the 64-bit assembly (HUGEINT wrap), and the
    entire hamming join in SQL."""
    from mvt_wrangler_spark.operators.dedup import phash_hamming_pairs

    ph = _ahash_df(spark, sf_dir)
    return phash_hamming_pairs(ph, id_col="id", phash_col="ahash",
                               k=3, bands=4, max_bucket=1000)


def q_caption_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal label-noise mining for image+caption training rows: find
    pairs whose IMAGES are near-identical (bytes -> ahash -> hamming <= 3
    band pairs, the _ahash_df chain) but whose CAPTIONS disagree (exact
    5-gram shingle Jaccard < 0.3, integer cross-multiplied — no float).
    Same-image-different-caption rows are either alt-text noise to drop or
    caption diversity to keep — either way the pipeline must SEE them;
    pure near-dup dedup would silently keep one caption at random.

    Captions come from the documents table keyed doc_id = image id mod 500.
    Plan: the banded hamming join produces the (small) pair set; caption
    shingle sets attach via two joins on the caption key (broadcast here —
    pairs and the caption dim are both tiny next to the corpus; at caption
    scale it's the same equi-join, shuffled); intersection/union are
    array_intersect/size on the already-distinct sorted shingle arrays."""
    from mvt_wrangler_spark.operators.dedup import phash_hamming_pairs
    from mvt_wrangler_spark.operators.multimodal import caption_conflicts

    pairs = (phash_hamming_pairs(_ahash_df(spark, sf_dir), id_col="id",
                                 phash_col="ahash", k=3, bands=4,
                                 max_bucket=1000)
             .withColumn("__ka", F.pmod("id_a", F.lit(500)))
             .withColumn("__kb", F.pmod("id_b", F.lit(500))))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return caption_conflicts(pairs, docs, shingle=5, num=3, den=10)


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs closed into CLUSTERS — the step pairwise dedup cannot
    skip: image bytes -> ahash -> hamming band pairs (q_image_ahash_neardup)
    -> transitive closure, yielding (member_id, cluster_rep, cluster_size)
    with the deterministic min-id keeper. Computed via
    phash_hamming_clusters — the hash-collapsed closure proven (and
    pytest-pinned) EQUAL to pair_clusters(phash_hamming_pairs(...)) but
    never materializing the quadratic identical-hash pair set (13,154
    images collapse to 82 distinct hashes at sf0.1). The oracle is
    UNCHANGED: the full image-level ahash pair SQL closed with a
    recursive-CTE reachability walk — an independent restatement that
    adversarially checks the collapse."""
    from mvt_wrangler_spark.operators.dedup import phash_hamming_clusters

    ph = _ahash_df(spark, sf_dir)
    return phash_hamming_clusters(ph, id_col="id", phash_col="ahash",
                                  k=3, bands=4, max_bucket=1000)


def q_image_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-curation pipeline composed end to end (the image twin of
    curate_e2e): bytes -> ahash -> hamming near-dup CLUSTERS -> keep one
    deterministic representative per cluster -> gate the keeper's caption
    (token-count window 10..60 and language != 'unk'). Each stage is the
    same operator its standalone contract query checks; the oracle
    composes the full recursive-closure SQL with the token/lang twins.
    This is the query a VLM-corpus builder runs nightly: visual dedup
    first (captions differ across near-dups — see caption_conflicts),
    then text-quality gates on the survivor."""
    from mvt_wrangler_spark.operators import text as T
    from mvt_wrangler_spark.operators.dedup import hamming_keepers

    keep = hamming_keepers(_ahash_df(spark, sf_dir), id_col="id",
                           phash_col="ahash", k=3, bands=4, max_bucket=1000)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cap = (T.token_counts(docs).select("doc_id", "n_ws_tokens")
           .join(T.lang_id(docs).select("doc_id", "lang_pred"), "doc_id"))
    j = (keep.withColumn("doc_id", F.pmod("id", F.lit(500)))
         .join(F.broadcast(cap), "doc_id"))
    kept = (F.col("n_ws_tokens").between(10, 60)
            & (F.col("lang_pred") != "unk"))
    return j.select("id", "cluster_size",
                    F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
                    "lang_pred", kept.alias("kept"))


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-Lloyd k-means over the embeddings table, bit-exact: quantized
    vectors, deterministic min-id init, integer argmin with lowest-centroid
    ties, floor-divided centroid updates, empty clusters inherit. The oracle
    unrolls the SAME two iterations in SQL (cluster.kmeans_sql)."""
    from mvt_wrangler_spark.operators.cluster import kmeans_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_assign(emb, k=4, n_iter=2, quant=100)


def q_bytes_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup over RAW BYTES — the first dedup any image
    pipeline runs. Images whose ids share a seed (id//106 over the id%53==11
    selection) produce byte-identical raw blobs; groups key on
    md5(lower(hex(bytes))) so the oracle can rebuild the exact byte stream
    from the pixel formula (printf %02x per byte in row-major order) and md5
    the same string — binary content hashing under the value gate."""
    import numpy as np
    import pandas as pd

    W, H = 8, 6
    ids = _spread(_points(spark, sf_dir).select("id")
                  .filter(F.pmod("id", F.lit(53)) == 11).distinct())

    def gen(pdfs):
        for pdf in pdfs:
            rows = {"id": [], "bytes": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                i = int(i)
                seed = i // 106
                px = ((seed * 37 + yy * 11 + xx * 17 + cc * 23) % 256).astype(np.uint8)
                rows["id"].append(i)
                rows["bytes"].append(px.tobytes())
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(gen, "id long, bytes binary")
    return (imgs.select("id", F.md5(F.lower(F.hex("bytes"))).alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min("id").alias("keeper_id")))


def q_tile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantiles of the z8 tile-size distribution — the skew diagnosis
    every hot-tile salting decision starts from. Quantile = value at rank
    ceil(q*n/100) over (cnt, x, y)-ordered tile counts (integer rank math,
    deterministic ties). Rank comes from metrics.with_global_rank
    (range-repartition + per-partition offsets), so no task ever holds the
    whole tile universe — the shape is zoom-independent (a plain global
    window would push up to 268M z14 tile aggregates through one reducer)."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.functions.metrics import with_global_rank

    pts = _points(spark, sf_dir)
    sizes = (tiling.assign_tiles(pts, z=8, with_local=False)
             .groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt")))
    ranked = with_global_rank(sizes, ["cnt", "x", "y"])
    tot = sizes.agg(F.count(F.lit(1)).alias("n"))
    targets = (tot.select(F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q"), "n")
               .withColumn("target", F.expr("(q * n + 99) div 100")))
    return (targets.join(ranked, targets["target"] == ranked["rn"])
            .select(F.col("q").cast("int").alias("q"),
                    F.col("cnt").cast("long").alias("tile_cnt")))


def q_revenue_by_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic analytical join co-existing with the spatial ops: customers
    become deterministic points, orders aggregate to per-customer revenue
    (DECIMAL(18,2) sums — exact, order-independent, hash-stable across
    engines), the two shuffle-join on custkey, and the result rolls up per
    z5 tile. Customers without orders count with zero revenue."""
    from mvt_wrangler_spark.functions import tiling

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ck = F.col("c_custkey")
    cpts = cust.select(
        ck.alias("custkey"),
        ((F.pmod(ck * 7919, F.lit(360000)) - 180000).cast("double") / 1000.0).alias("lon"),
        ((F.pmod(ck * 104729, F.lit(170000)) - 85000).cast("double") / 1000.0).alias("lat"))
    assigned = tiling.assign_tiles(cpts, z=5, with_local=False)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"),
        F.count(F.lit(1)).alias("n_ord"))
    j = assigned.join(rev, assigned["custkey"] == rev["o_custkey"], "left")
    return j.groupBy("z", "x", "y").agg(
        F.sum(F.coalesce(F.col("rev_d"), F.lit(0).cast("decimal(18,2)")))
        .cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.coalesce(F.col("n_ord"), F.lit(0))).cast("long").alias("n_orders"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling position-weighted fingerprint mod 2^31-1 (SQL-foldable)."""
    from mvt_wrangler_spark.operators import text as T

    return T.doc_fingerprint(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_geom_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature ring measures in tile-local INTEGER coordinates (the MVT
    wire space) + the drop-tiny-polygons filter every tile simplifier
    applies at low zooms. Rings are synthesized per orderkey (vertices =
    lineitems ordered by linenumber, coords = integer hashes mod 4096);
    shoelace 2A, exact-rational centroid, Σ squared segment lengths, and
    bbox are integer polynomials — bit-exact vs the DuckDB window twin,
    order-of-summation independent. Plan: one shuffle (groupBy orderkey
    with partial collect), then pure codegen zip_with/aggregate math."""
    from mvt_wrangler_spark.functions import measures as M

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    v = li.select(
        ok.alias("gkey"), ln.alias("vord"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).alias("vx"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).alias("vy"))
    rings = (v.groupBy("gkey")
             .agg(F.array_sort(F.collect_list(F.struct("vord", "vx", "vy")))
                  .alias("vs"))
             .filter(F.size("vs") >= 3)
             .select("gkey", F.col("vs.vx").alias("xs"),
                     F.col("vs.vy").alias("ys")))
    xs, ys = F.col("xs"), F.col("ys")
    cx, cy, den = M.centroid_nums(xs, ys)
    minx, miny, maxx, maxy = M.bbox_cols(xs, ys)
    out = rings.select(
        "gkey",
        F.size("xs").cast("long").alias("n_vertices"),
        M.shoelace_area2(xs, ys).alias("area2"),
        cx.alias("cx_num"), cy.alias("cy_num"), den.alias("den"),
        M.perimeter2_sum(xs, ys).alias("perim2"),
        M.polyline_len2_sum(xs, ys).alias("len2_open"),
        minx.alias("minx"), miny.alias("miny"),
        maxx.alias("maxx"), maxy.alias("maxy"))
    return out.filter(F.col("area2") >= 32)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (2 fixed-point iterations) over the
    customer<->supplier trade graph (distinct pairs via lineitem x orders,
    symmetric edges; node ids disambiguated as cust*2 / supp*2+1). Every
    contribution is an integer floor-divide and every update an exact
    int64 sum — bit-identical across engines and partitionings, unlike
    float PageRank (operators/graph.py)."""
    from mvt_wrangler_spark.operators.graph import pagerank_int

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pairs = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
             .select((F.col("o_custkey") * 2).alias("c"),
                     (F.col("l_suppkey") * 2 + 1).alias("s"))
             .distinct())
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionByName(pairs.select(F.col("s").alias("src"),
                                       F.col("c").alias("dst"))))
    return pagerank_int(edges, iters=2)


def q_winding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring-winding normalization (force CCW before encode): signed
    shoelace decides, F.reverse flips — zero shuffle past the ring build.
    Output pins the BEFORE sign, the flip flag, and position-weighted
    fingerprints of the AFTER vertex sequence (so a wrong or double
    reversal breaks the hash); the oracle restates the flip as a reversed
    position index in the window twin."""
    from mvt_wrangler_spark.functions import measures as M

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    v = li.select(
        ok.alias("gkey"), ln.alias("vord"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).alias("vx"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).alias("vy"))
    rings = (v.groupBy("gkey")
             .agg(F.array_sort(F.collect_list(F.struct("vord", "vx", "vy")))
                  .alias("vs"))
             .filter(F.size("vs") >= 3)
             .select("gkey", F.col("vs.vx").alias("xs"),
                     F.col("vs.vy").alias("ys")))
    sign = M.shoelace_area2_signed(F.col("xs"), F.col("ys"))
    out = M.normalize_winding(
        rings.withColumn("sign_before", F.signum(sign).cast("int")))
    idx = F.sequence(F.lit(0), F.size("xs") - 1)
    P = 2147483647
    fp = lambda arr, m: F.pmod(
        F.aggregate(
            F.zip_with(F.col(arr), idx, lambda val, i: val * (i * m + 1)),
            F.lit(0).cast("long"), lambda acc, t: acc + t),
        F.lit(P))
    return out.select("gkey", "sign_before", "was_reversed",
                      fp("xs", 29).alias("fp_x"), fp("ys", 13).alias("fp_y"))


def q_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-8 + Bing quadkey per point — the two remaining mainstream
    cell systems alongside H3/S2/tile_id. Pure single-pass codegen (bit
    spread chained through withColumns, base32/base4 digit concat);
    bit-identical DuckDB twin."""
    from mvt_wrangler_spark.functions import geocodes as GC
    from mvt_wrangler_spark.functions import tiling

    pts = _points(spark, sf_dir)
    d = GC.with_geohash(pts, "lon", "lat", precision=8)
    d = d.withColumn("qk", GC.quadkey(tiling.tile_x(F.col("lon"), Z),
                                      tiling.tile_y(F.col("lat"), Z), Z))
    return d.select("id", "geohash", "qk")


def q_cell_cover_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical S2 cover join: regions are SETS OF COARSE CELLS (level-5
    parents of a deterministic point subset), points join by truncating
    their level-12 cell to the region level — an equi-join on bit
    arithmetic, zero geometry at join time. This is the spatial-join shape
    that survives 100 TB: the cover set broadcasts, the fact side never
    shuffles on geometry. Parent truncation is exact int64 shift/add, so
    the DuckDB twin is bit-identical."""
    from mvt_wrangler_spark.functions import cells as C
    from mvt_wrangler_spark.sources.points import synth_xyz

    pts = synth_xyz(spark, sf_dir)
    d = pts.withColumn(
        "__cells",
        C.cells_from_xyz_column(F.col("x"), F.col("y"), F.col("z"),
                                level=12, res=7))
    d = d.select("id", F.col("__cells.s2_cell").alias("s2"))
    d = d.withColumn("p5", C.s2_parent_column(F.col("s2"), 5))
    # pin the slim (id, s2, p5) proxy: un-pinned, the cell-encode UDF ran
    # FOUR times — the region (build) side and the probe side each embed the
    # whole encode chain, and on each side the inferred isnotnull(p5) join
    # filter pushed below the projection duplicates the ArrowEvalPython
    # (guide §4.4; asNondeterministic would instead block the region
    # filter's pushdown to the scan). 24 B/row — one encode pass at any
    # scale.
    d = d.localCheckpoint(eager=True)
    regions = (d.filter(F.pmod(F.col("id"), F.lit(29)) == 0)
               .select(F.col("p5").alias("rcell")).distinct())
    return (d.join(F.broadcast(regions), d.p5 == regions.rcell)
            .select("id", "p5"))


def q_tile_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-tile sampling: deterministic hash Bernoulli prefilter
    (zero-shuffle, reproducible across runs/retries/cluster sizes — unlike
    rand()) then exactly-k-per-tile stratified pick. The per-tile cap is
    how a curation job stops dense metro tiles from dominating a training
    set."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import sampling as S

    pts = _points(spark, sf_dir)
    d = tiling.assign_tiles(pts, z=6, with_local=False)
    d = S.hash_sample(d, 0.5, id_col="id")
    return (S.stratified_topk(d, ["x", "y"], k=3, id_col="id")
            .select("id", "x", "y", "rn"))


def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled class centroids over the 64-dim embeddings: one codegen
    aggregate per dimension (64 sums + count per group, full map-side
    partial agg — no explode, no Python), integer-quantized so the sums
    are exact and order-independent."""
    from mvt_wrangler_spark.operators.cluster import group_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return group_centroids(emb, dim=64, keys=["label"])


def q_clip_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sutherland–Hodgman ring clip to a (buffered) tile box + MVT grid
    snap — the geometry step of building a tile from scratch. One
    mapInPandas, no shuffle beyond the ring assembly; the DuckDB twin
    unrolls the same four half-plane passes with identical float
    expression order, and the grid snap makes the compared area an exact
    integer."""
    from mvt_wrangler_spark.operators import clip as CL

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    # dropDuplicates: the synthetic lineitem contains repeated
    # (orderkey, linenumber) rows; duplicate seq values make the ring's
    # edge order ambiguous (the SQL twin's window would interleave the two
    # tied edges' emissions differently than the collected array)
    v = li.select(
        ok.alias("gkey"), ln.alias("vord"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).alias("vx"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).alias("vy"))
    v = v.dropDuplicates(["gkey", "vord"])
    rings = (v.groupBy("gkey")
             .agg(F.array_sort(F.collect_list(F.struct("vord", "vx", "vy")))
                  .alias("vs"))
             .filter(F.size("vs") >= 3)
             .select("gkey",
                     F.transform(F.col("vs.vx"),
                                 lambda c: c.cast("double")).alias("xs"),
                     F.transform(F.col("vs.vy"),
                                 lambda c: c.cast("double")).alias("ys")))
    # AQE coalesces the ring-assembly exchange to a couple of partitions
    # (~MBs), which would run the per-ring Python clip nearly single-core
    return CL.clip_rings(_spread(rings), 512.0, 512.0, 3584.0, 3584.0,
                         snap=16)


def q_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas–Peucker at tolerance 64 tile-units over integer polylines —
    integer-exact split test (cross² > eps²·len²), so the recursive-CTE
    DuckDB twin reproduces the kept-vertex SET exactly. One mapInPandas
    after ring assembly; output is (gkey, kept_seq) positions."""
    from mvt_wrangler_spark.operators import simplify as SI

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    v = li.select(
        ok.alias("gkey"), ln.alias("vord"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).alias("vx"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).alias("vy"))
    v = v.dropDuplicates(["gkey", "vord"])
    rings = (v.groupBy("gkey")
             .agg(F.array_sort(F.collect_list(F.struct("vord", "vx", "vy")))
                  .alias("vs"))
             .filter(F.size("vs") >= 3)
             .select("gkey", F.col("vs.vx").alias("xs"),
                     F.col("vs.vy").alias("ys")))
    return SI.simplify_lines(rings, eps=64)


def q_overzoom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile overzoom value-checked end to end: algebraic 16x16 parent tiles
    are encoded to real bytes (fmt cycles raw/rawz/qlossy), the engine
    decodes, quadrant-crops, 2x nearest-neighbor upsamples, re-encodes —
    and the check decodes the CHILD bytes into per-channel pixel sums plus
    a position-weighted fingerprint over every child pixel. The oracle
    regenerates the child pixels from the parent formula (child (y,x) =
    parent (qy*8 + y//2, qx*8 + x//2)) with the qlossy quant model, so
    decode, crop, upsample, and the codec round-trip all sit under the
    value hash."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W = H = 16
    ids = _spread(_points(spark, sf_dir).select("id")
                  .filter(F.pmod("id", F.lit(37)) == 3).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                px = ((int(i) * 31 + yy * 7 + xx * 13 + cc * 5) % 256).astype(np.uint8)
                fmt = fmts[int(i) % 3]
                rows["image_id"].append(str(int(i)))
                rows["bytes"].append(I.encode(px, fmt))
                rows["fmt"].append(fmt)
                rows["w"].append(W)
                rows["h"].append(H)
            yield pd.DataFrame(rows)

    imgs = ids.mapInPandas(
        gen, "image_id string, bytes binary, fmt string, w int, h int")
    children = M.overzoom(imgs, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        for pdf in pdfs:
            rows = {"id": [], "child": [], "sum_r": [], "sum_g": [],
                    "sum_b": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.cbytes), row.cfmt,
                             row.cw, row.ch).astype(np.int64)
                g = _grids.get((row.ch, row.cw))
                if g is None:
                    g = _grids.setdefault((row.ch, row.cw),
                                          np.mgrid[0:row.ch, 0:row.cw, 0:3])
                zy, zx, cc = g
                fp = int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum()
                         % 2147483647)
                rows["id"].append(int(row.image_id))
                rows["child"].append(int(row.child))
                for col, c in (("sum_r", 0), ("sum_g", 1), ("sum_b", 2)):
                    rows[col].append(int(t[:, :, c].sum()))
                rows["fp"].append(fp)
            yield pd.DataFrame(rows)

    return children.mapInPandas(
        stats,
        "id long, child int, sum_r long, sum_g long, sum_b long, fp long")


def q_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster pyramid BUILD value-checked end to end (inverse of
    q_overzoom): 4 algebraic 16x16 children per parent (fmt cycles
    raw/rawz/qlossy by (id+child)%3) are encoded to real bytes, the
    engine decodes, 2x integer box-mean downsamples each child, mosaics
    the quadrants into the parent, re-encodes — and the check decodes
    the PARENT bytes into per-channel pixel sums plus a
    position-weighted fingerprint. The oracle regenerates parent pixels
    from the child formula (parent (py,px) = floor-mean of the 2x2 child
    block at quadrant (py//8, px//8)) with the qlossy quant model, so
    decode, downsample, quadrant placement, and both codec round-trips
    all sit under the value hash."""
    import numpy as np
    import pandas as pd

    from mvt_wrangler_spark.operators import multimodal as M
    from mvt_wrangler_spark.sources import images as I

    W = H = 16
    ids = _spread(_points(spark, sf_dir).select("id")
                  .filter(F.pmod("id", F.lit(41)) == 5).distinct())

    def gen(pdfs):
        fmts = ["raw", "rawz", "qlossy"]
        for pdf in pdfs:
            rows = {"parent_id": [], "child": [], "bytes": [], "fmt": [],
                    "w": [], "h": []}
            yy, xx, cc = np.mgrid[0:H, 0:W, 0:3]  # hoisted: per-row mgrid alloc dominated the loop
            for i in pdf["id"].to_numpy(dtype=np.int64):
                for q in range(4):
                    px = ((int(i) * 31 + q * 11 + yy * 7 + xx * 13 + cc * 5)
                          % 256).astype(np.uint8)
                    rows["parent_id"].append(str(int(i)))
                    rows["child"].append(q)
                    rows["bytes"].append(I.encode(px, fmts[(int(i) + q) % 3]))
                    rows["fmt"].append(fmts[(int(i) + q) % 3])
                    rows["w"].append(W)
                    rows["h"].append(H)
            yield pd.DataFrame(rows)

    kids = ids.mapInPandas(
        gen, "parent_id string, child int, bytes binary, fmt string, "
             "w int, h int")
    parents = M.mosaic(kids, out_fmt="rawz")

    def stats(pdfs, _grids={}):  # per-process mgrid memo (noqa: B006 — intentional)
        for pdf in pdfs:
            rows = {"id": [], "n_children": [], "sum_r": [], "sum_g": [],
                    "sum_b": [], "fp": []}
            for row in pdf.itertuples(index=False):
                t = I.decode(bytes(row.pbytes), row.pfmt,
                             row.pw, row.ph).astype(np.int64)
                g = _grids.get((row.ph, row.pw))
                if g is None:
                    g = _grids.setdefault((row.ph, row.pw),
                                          np.mgrid[0:row.ph, 0:row.pw, 0:3])
                zy, zx, cc = g
                fp = int((t * (zy * 29 + zx * 13 + cc * 7 + 1)).sum()
                         % 2147483647)
                rows["id"].append(int(row.parent_id))
                rows["n_children"].append(int(row.n_children))
                for col, c in (("sum_r", 0), ("sum_g", 1), ("sum_b", 2)):
                    rows[col].append(int(t[:, :, c].sum()))
                rows["fp"].append(fp)
            yield pd.DataFrame(rows)

    return parents.mapInPandas(
        stats, "id long, n_children int, sum_r long, sum_g long, "
               "sum_b long, fp long")


def q_clip_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liang–Barsky line clip to the tile box — pure codegen end to end
    (each segment clips independently: per-row t-parameter math, no
    Python, no recursion; the only exchange is the lead() window that
    forms segments). Endpoints floor-snap to the MVT subpixel grid, so
    the compare is integer-exact; the twin uses identical expression
    order for bit-equal t values."""
    from pyspark.sql import Window

    from mvt_wrangler_spark.operators import clip as CL

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    v = li.select(
        ok.alias("gkey"), ln.alias("vord"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).cast("double").alias("x1"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).cast("double").alias("y1"))
    v = v.dropDuplicates(["gkey", "vord"])
    w = Window.partitionBy("gkey").orderBy("vord")
    seg = (v.withColumns({
        "seq": F.row_number().over(w).cast("long"),
        "x2": F.lead("x1").over(w), "y2": F.lead("y1").over(w)})
        .filter(F.col("x2").isNotNull()))
    return (CL.clip_segments(seg, 512.0, 512.0, 3584.0, 3584.0, snap=16)
            .select("gkey", "seq", "qx1", "qy1", "qx2", "qy2"))


def q_tile_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic webdataset-style sharding: per z6 tile, rows pack
    into ~64 KB shards in id order (shard = exclusive prefix-sum of the
    synthetic byte size DIV shard_bytes) — one key shuffle + window
    cumsum, integer-exact, stable across runs and cluster sizes."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import sampling as S

    pts = _points(spark, sf_dir)
    d = tiling.assign_tiles(pts, z=6, with_local=False)
    d = d.withColumn("nbytes", F.pmod(F.col("id") * 2654435761, F.lit(8192))
                     + F.lit(1024))
    return (S.assign_shards(d, ["x", "y"], "nbytes", 65536, id_col="id")
            .select("id", "x", "y", "nbytes", "shard"))


def q_rtree_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial index build: features (synthetic integer bboxes around the
    standard points) Hilbert-packed into 256-feature R-tree leaves keyed
    by the PMTiles tile id, leaf MBR + count per leaf. The Spark side
    ranks via the distributed range-partitioner global rank; the oracle
    uses a plain global row_number — same total order, different plan
    (operators/index.py)."""
    from mvt_wrangler_spark.operators.index import pack_rtree_leaves

    return pack_rtree_leaves(_rtree_feats(spark, sf_dir), leaf_size=256)


_RT_QBOX = (100000, 40000, 140000, 80000)  # shared by query + oracle


def _rtree_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvt_wrangler_spark.functions import tiling

    pts = tiling.assign_tiles(_points(spark, sf_dir), z=Z, with_local=False)
    i = F.col("id")
    ok2, ln2 = F.expr("id DIV 8"), F.pmod(i, F.lit(8))
    px = F.pmod(ok2 * 7919 + ln2 * 104729, F.lit(360000))
    py = F.pmod(ok2 * 104729 + ln2 * 7919, F.lit(170000))
    w = F.pmod(i * 131 + 7, F.lit(64)) + 1
    h = F.pmod(i * 52379 + 11, F.lit(64)) + 1
    return pts.select(
        "id", "tile_id",
        (px - w).alias("minx"), (py - h).alias("miny"),
        (px + w).alias("maxx"), (py + h).alias("maxy"))


def q_rtree_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-path bbox query: build leaves, prune by MBR overlap, refine
    survivors — lossless by construction, and the ORACLE is a direct
    full-scan bbox filter, so the driver hash proves the pruning loses no
    feature (operators/index.rtree_probe)."""
    from mvt_wrangler_spark.operators.index import rtree_probe

    return rtree_probe(_rtree_feats(spark, sf_dir), leaf_size=256,
                       qbox=_RT_QBOX)


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-access shard manifest over the tile_shards packing: per row,
    shard + in-shard sequence number + byte offsets — the loader index for
    seek-to-sample-k training reads. One key shuffle; the within-shard
    windows refine the same partitioning (sampling.shard_manifest)."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.operators import sampling as S

    pts = _points(spark, sf_dir)
    d = tiling.assign_tiles(pts, z=6, with_local=False)
    d = d.withColumn("nbytes", F.pmod(F.col("id") * 2654435761, F.lit(8192))
                     + F.lit(1024))
    m = S.shard_manifest(d, ["x", "y"], "nbytes", 65536, id_col="id")
    return m.select("id", "x", "y", "nbytes", "shard", "seq",
                    "byte_start", "byte_end")


def q_spatial_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-radius single-linkage spatial clustering (DBSCAN min_pts=1):
    points collapse into sub-eps cells (same-cell => within eps by
    construction), cell-pair candidates via a half-stencil HASH join
    (never a distance cross-join) with bbox gap tests that connect or
    drop most pairs for free, integer-exact dist² refine on borderline
    pairs only, large-star/small-star closure over the CELL graph,
    singletons preserved — merge-duplicate-pins at 10^12 scale.
    Pure DataFrame ops end to end, no Python."""
    from mvt_wrangler_spark.operators.spatial_cluster import grid_cluster

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    pts = li.select(
        (ok * 8 + ln).alias("id"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).alias("px"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).alias("py"))
    return grid_cluster(pts, eps=16)


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment over documents: the
    row's split is a pure function of (doc_id, salt) — one codegen CASE
    next to the scan, zero shuffle, stable under data growth / retries /
    cluster size (rand()-based splits break all three). Group-level
    contamination guards fall out by hashing the group id instead."""
    from mvt_wrangler_spark.operators import sampling as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = S.assign_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                       id_col="doc_id", salt=7)
    return d.select("doc_id", "split")


def q_dwithin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-band join: every (hospital, shop) point pair within 500
    milli-degrees — the fixed-radius two-table join (ST_DWithin) next to
    kNN (fixed count) and grid_cluster (self radius). Coordinates are the
    synth_points integer milli-degrees SHIFTED non-negative (+180000 /
    +85000 fold into the pmod), eps-grid cell equi-join + 9-stencil probe
    side, exact integer d² refine — each pair emitted exactly once, no
    distinct, no cross join."""
    from mvt_wrangler_spark.operators.joins import dwithin_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    pts = li.select(
        (ok * 8 + ln).alias("id"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(360000)).alias("px"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(170000)).alias("py"),
        F.pmod(ok + ln, F.lit(6)).alias("k6"))
    left = (pts.filter(F.col("k6") == 3)
            .select(F.col("id").alias("a_id"), "px", "py"))
    right = (pts.filter(F.col("k6") == 4)
             .select(F.col("id").alias("b_id"), "px", "py"))
    return dwithin_join(left, right, eps=500)


def q_ring_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGC-style ring simplicity check over the geom_measures rings: count
    proper crossings + improper touches between NON-ADJACENT edges of each
    ring (a bowtie or a vertex-on-edge spike makes even-odd vs winding
    fills disagree — simplifiers must drop/repair before encoding). Exact
    int64 orientation tests; candidate pairs come from a per-(ring, cell)
    grid-bucket self-join instead of O(k²) all-pairs — see
    operators/overlay.py. DuckDB twin brute-forces the pairs with the same
    integer predicate, so the bucketing itself is what's under test."""
    from mvt_wrangler_spark.operators.overlay import ring_validity

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    v = li.select(
        ok.alias("gkey"), ln.alias("vord"),
        F.pmod(ok * 7919 + ln * 104729, F.lit(4096)).alias("vx"),
        F.pmod(ok * 104729 + ln * 7919, F.lit(4096)).alias("vy"))
    rings = (v.groupBy("gkey")
             .agg(F.array_sort(F.collect_list(F.struct("vord", "vx", "vy")))
                  .alias("vs"))
             .filter(F.size("vs") >= 3)
             .select("gkey", F.col("vs.vx").alias("xs"),
                     F.col("vs.vy").alias("ys")))
    return ring_validity(rings)


def q_line_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line/line overlay join: proper crossings between two layers of short
    integer segments (road×road grade crossings), aggregated to crossing
    counts per left segment. The join is cell-bucketed (cell 64 = max
    segment extent, so each bbox covers <= 4 cells) + distinct + exact
    integer orientation test — never an all-pairs shape. Segments are
    synthesized from lineitem keys: anchor = hash mod 4096, endpoint =
    anchor + (hash mod 129 - 64) clamped to the tile box; layers are the
    id mod 16 == 2 / == 11 slices (disjoint (orderkey parity, linenumber)
    classes) to keep the oracle's pair volume bounded. The sf0.001 lattice
    is mutually avoiding (0 crossings); sf0.01 has ~2.3k."""
    from mvt_wrangler_spark.operators.overlay import segment_cross_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    sid = (ok * 8 + ln).alias("id")
    ax = F.pmod(ok * 7919 + ln * 104729, F.lit(4096))
    ay = F.pmod(ok * 104729 + ln * 7919, F.lit(4096))
    bx = F.greatest(F.lit(0).cast("long"), F.least(
        F.lit(4095).cast("long"),
        ax + F.pmod(ok * 131 + ln * 7919, F.lit(129)) - 64))
    by = F.greatest(F.lit(0).cast("long"), F.least(
        F.lit(4095).cast("long"),
        ay + F.pmod(ok * 52379 + ln * 31337, F.lit(129)) - 64))
    segs = li.select(sid, ax.alias("ax"), ay.alias("ay"),
                     bx.alias("bx"), by.alias("by"))
    a = segs.filter(F.pmod(F.col("id"), F.lit(16)) == 2)
    b = segs.filter(F.pmod(F.col("id"), F.lit(16)) == 11)
    x = segment_cross_join(a, b, cell_size=64)
    return x.groupBy("a_id").agg(F.count("*").alias("n_cross"))


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling of the orders table (row/null/exact
    distinct counts + min/max) in ONE aggregate pass, exploded to
    per-column rows (operators/profile.py; float columns rejected by
    design — engine string forms differ)."""
    from mvt_wrangler_spark.operators.profile import profile

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return profile(orders, ["o_orderkey", "o_custkey", "o_orderstatus",
                            "o_orderdate", "o_orderpriority"])


def q_dedup_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: every member of a near-dup
    CLUSTER inherits the split of the cluster representative (singletons
    hash their own id) — the contamination guard without which near-dups
    of a test document leak into train. Composition: minhash LSH pairs ->
    pair_clusters -> singleton left join -> assign_split(rep) (all the
    same operators their standalone queries check; split salt differs
    from every sampling salt per the assign_split doc)."""
    from mvt_wrangler_spark.operators import dedup as D
    from mvt_wrangler_spark.operators import sampling as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.minhash_lsh_candidates(docs, num_hashes=16, bands=4,
                                     shingle=5, max_bucket=1000)
    cl = D.pair_clusters(pairs)
    m = (docs.select("doc_id")
         .join(cl, F.col("doc_id") == F.col("member_id"), "left")
         .select("doc_id", F.coalesce("cluster_rep", "doc_id").alias("rep")))
    out = S.assign_split(m, {"train": 0.9, "val": 0.05, "test": 0.05},
                         id_col="rep", salt=11)
    return out.select("doc_id", "rep", "split")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full spatial pipeline at sf0.001 -> per-tile stats."""
    return q_pipeline_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "geom_measures": q_geom_measures,
        "augment_stats": q_augment_stats,
        "contour": q_contour,
        "recon_error": q_recon_error,
        "hillshade": q_hillshade,
        "equalize": q_equalize,
        "caption_conflicts": q_caption_conflicts,
        "image_curate_e2e": q_image_curate_e2e,
        "tile_sample": q_tile_sample,
        "embed_centroids": q_embed_centroids,
        "clip_tile": q_clip_tile,
        "simplify": q_simplify,
        "overzoom": q_overzoom,
        "mosaic": q_mosaic,
        "clip_lines": q_clip_lines,
        "tile_shards": q_tile_shards,
        "spatial_cluster": q_spatial_cluster,
        "dataset_split": q_dataset_split,
        "ring_valid": q_ring_valid,
        "line_cross": q_line_cross,
        "boilerplate": q_boilerplate,
        "dwithin_join": q_dwithin_join,
        "tfidf_topk": q_tfidf_topk,
        "winding": q_winding,
        "pagerank": q_pagerank,
        "funnel": q_funnel,
        "od_matrix": q_od_matrix,
        "dedup_safe_split": q_dedup_safe_split,
        "profile": q_profile,
        "phash_neardup": q_phash_neardup,
        "kmeans_assign": q_kmeans_assign,
        "ann_topk_ivf": q_ann_topk_ivf,
        "image_ahash_neardup": q_image_ahash_neardup,
        "neardup_clusters": q_neardup_clusters,
        "tile_quantiles": q_tile_quantiles,
        "revenue_by_tile": q_revenue_by_tile,
        "bytes_dedup": q_bytes_dedup,
        "tile_encode": q_tile_encode,
        "simhash": q_simhash,
        "doc_fingerprint": q_doc_fingerprint,
        "geocode": q_geocode,
        "cell_cover_join": q_cell_cover_join,
        "tile_assign": q_tile_assign,
        "tile_assign_multi": q_tile_assign_multi,
        "tile_local": q_tile_local,
        "archive_roundtrip": q_archive_roundtrip,
        "pyramid_rollup": q_pyramid_rollup,
        "tile_stats_salted": q_tile_stats_salted,
        "morans_i": q_morans_i,
        "hot_tiles": q_hot_tiles,
        "tile_smooth": q_tile_smooth,
        "shard_manifest": q_shard_manifest,
        "rtree_pack": q_rtree_pack,
        "rtree_probe": q_rtree_probe,
        "pip_join": q_pip_join,
        "pip_join_partitioned": q_pip_join_partitioned,
        "intersects_join_partitioned": q_intersects_join_partitioned,
        "intersects_join": q_intersects_join,
        "type_filter": q_type_filter,
        "knn_join": q_knn_join,
        "knn_join_cells": q_knn_join_cells,
        "phash_dedup": q_phash_dedup,
        "pipeline_e2e": q_pipeline_e2e,
        "tag_filter": q_tag_filter,
        "expr_filter": q_expr_filter,
        "events_window": q_events_window,
        "asof_join": q_asof_join,
        "interval_join": q_interval_join,
        "docs_exact_dedup": q_docs_exact_dedup,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "token_count": q_token_count,
        "decontaminate": q_decontaminate,
        "repetition_stats": q_repetition_stats,
        "pii_scrub": q_pii_scrub,
        "blocklist_scrub": q_blocklist_scrub,
        "curate_e2e": q_curate_e2e,
        "vocab_topk": q_vocab_topk,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "minhash_lsh": q_minhash_lsh,
        "ngram_jaccard": q_ngram_jaccard,
        "cell_encode": q_cell_encode,
        "sessionize": q_sessionize,
        "quality_score": q_quality_score,
        "distinct_phash": q_distinct_phash,
        "topk_events": q_topk_events,
        "embed_neardup": q_embed_neardup,
        "embed_neardup_lsh": q_embed_neardup_lsh,
        "zonal_stats": q_zonal_stats,
        "thumb_stats": q_thumb_stats,
        "patch_stats": q_patch_stats,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from mvt_wrangler_spark.functions.tiling import (
        frac_tile_x_sql,
        frac_tile_y_sql,
        pmtiles_tile_id_sql,
        tile_x_sql,
        tile_y_sql,
    )
    from mvt_wrangler_spark.sources.points import (
        PIP_POLYGONS,
        POINTS_SQL,
        halfplane_sql,
    )

    pts = f"__pts AS ({POINTS_SQL})"
    xy = (f"__xy AS (SELECT id, phash, lon, lat, kind, CAST({Z} AS INT) AS z, "
          f"{tile_x_sql('lon', Z)} AS x, {tile_y_sql('lat', Z)} AS y FROM __pts)")

    ctes, last, tid = pmtiles_tile_id_sql(Z, "x", "y", "__xy")
    tile_assign = (
        "WITH " + ",\n".join([pts, xy] + ctes)
        + f" SELECT id, z, x, y, {tid} AS tile_id FROM {last}"
    )

    from mvt_wrangler_spark.operators.index import pack_rtree_leaves_sql

    _rt_px = "(((id // 8)*7919 + (id % 8)*104729) % 360000 + 360000) % 360000"
    _rt_py = "(((id // 8)*104729 + (id % 8)*7919) % 170000 + 170000) % 170000"
    _rt_w = "((id*131 + 7) % 64 + 64) % 64 + 1"
    _rt_h = "((id*52379 + 11) % 64 + 64) % 64 + 1"
    rtree_src = (
        "WITH " + ",\n".join([pts, xy] + ctes)
        + f""" SELECT id, {tid} AS tile_id,
       {_rt_px} - ({_rt_w}) AS minx, {_rt_py} - ({_rt_h}) AS miny,
       {_rt_px} + ({_rt_w}) AS maxx, {_rt_py} + ({_rt_h}) AS maxy
FROM {last}""")
    rtree_pack = pack_rtree_leaves_sql(rtree_src, leaf_size=256)
    # probe oracle = DIRECT full-scan bbox filter (no index, no leaves):
    # hash equality proves the Spark index path is lossless
    _qx0, _qy0, _qx1, _qy1 = _RT_QBOX
    rtree_probe = f"""
SELECT id, minx, miny, maxx, maxy FROM ({rtree_src}) __rq
WHERE minx <= {_qx1} AND maxx >= {_qx0}
  AND miny <= {_qy1} AND maxy >= {_qy0}
"""

    # multi-zoom: same one-Hilbert-pass arithmetic as assign_tiles_multi
    tile_assign_multi = (
        "WITH " + ",\n".join([pts, xy] + ctes)
        + f""" SELECT id, CAST(zz.z AS INT) AS z, x >> ({Z} - zz.z) AS x,
       y >> ({Z} - zz.z) AS y,
       ((CAST(1 AS BIGINT) << (2 * zz.z)) - 1) // 3 + (d >> (2 * ({Z} - zz.z))) AS tile_id
FROM {last}, generate_series(4, {Z}) zz(z)"""
    )

    # archive_roundtrip: encode->decode must reproduce the (distinct) input —
    # the oracle restates it (same floor(+0.5) pre-round, transcendental
    # 1-ulp floor-boundary risk shared with tile_assign's tile_y)
    pts_d = f"__pts AS (SELECT DISTINCT * FROM ({POINTS_SQL}))"
    xy_l = (f"__xy AS (SELECT id, layer, lon, lat, kind, CAST({Z} AS INT) AS z, "
            f"{tile_x_sql('lon', Z)} AS x, {tile_y_sql('lat', Z)} AS y FROM __pts)")
    archive_roundtrip = f"""
WITH {pts_d}, {xy_l}
SELECT id, z, x, y, layer,
       CAST(floor(({frac_tile_x_sql('lon', Z)} - x) * 4096.0 + 0.5) AS DOUBLE) AS px,
       CAST(floor(({frac_tile_y_sql('lat', Z)} - y) * 4096.0 + 0.5) AS DOUBLE) AS py,
       kind
FROM __xy
"""

    tile_local = f"""
WITH {pts}, {xy}
SELECT id,
       round(({frac_tile_x_sql('lon', Z)} - x) * 4096.0, 4) AS px_r,
       round(({frac_tile_y_sql('lat', Z)} - y) * 4096.0, 4) AS py_r
FROM __xy
"""

    levels = []
    for z in range(Z, -1, -1):
        s = Z - z
        levels.append(
            f"SELECT CAST({z} AS INT) AS z, x >> {s} AS x, y >> {s} AS y, "
            f"CAST(count(*) AS BIGINT) AS n_rows FROM __xy GROUP BY 2, 3"
        )
    pyramid = "WITH " + ",\n".join([pts, xy]) + " " + "\nUNION ALL\n".join(levels)

    tile_stats = (
        "WITH " + ",\n".join([pts, xy])
        + " SELECT z, x, y, CAST(count(*) AS BIGINT) AS n_rows FROM __xy GROUP BY 1,2,3"
    )

    morans = f"""
WITH {pts}, {xy},
__t AS (SELECT x, y, count(*) AS c FROM __xy GROUP BY 1, 2),
__g AS (SELECT count(*) AS n, sum(c) AS t, sum(c*c) AS q FROM __t),
__nb AS (
  SELECT t1.c AS ci, t1.x + o.dx AS nx, t1.y + o.dy AS ny
  FROM __t t1, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
__p AS (
  SELECT count(*) AS s0, sum(ci * t2.c) AS p, sum(ci + t2.c) AS s1
  FROM __nb JOIN __t t2 ON nx = t2.x AND ny = t2.y)
SELECT CAST(n AS BIGINT) AS n_tiles, CAST(s0 AS BIGINT) AS s0,
       CASE WHEN s0 * (n*q - t*t) <> 0
            THEN round(CAST(n*n*p - n*t*s1 + t*t*s0 AS DOUBLE)
                       / CAST(s0 * (n*q - t*t) AS DOUBLE), 6)
       END AS morans_i
FROM __g, __p
"""

    from mvt_wrangler_spark.operators.rollup import tile_smooth_sql

    tile_smooth = tile_smooth_sql(
        f"SELECT x, y, count(*) AS cnt FROM ("
        f"WITH {pts} SELECT {tile_x_sql('lon', 8)} AS x, "
        f"{tile_y_sql('lat', 8)} AS y FROM __pts) __txy GROUP BY 1, 2")

    hot_tiles = f"""
WITH {pts}, {xy},
__t AS (SELECT x, y, count(*) AS c FROM __xy GROUP BY 1, 2),
__g AS (SELECT count(*) AS n, sum(c) AS t, sum(c*c) AS q FROM __t),
__hood AS (
  SELECT t1.x + o.dx AS x, t1.y + o.dy AS y, sum(t1.c) AS sumw, count(*) AS w
  FROM __t t1, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)
  GROUP BY 1, 2)
SELECT t.x, t.y, CAST(t.c AS BIGINT) AS cnt, CAST(h.w AS BIGINT) AS w_i,
       CASE WHEN sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(t2.t AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(t2.t AS DOUBLE) / CAST(n AS DOUBLE)))
                 * sqrt((CAST(n AS DOUBLE) * CAST(h.w AS DOUBLE)
                         - CAST(h.w AS DOUBLE) * CAST(h.w AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0)) > 0
            THEN round((CAST(h.sumw AS DOUBLE)
                        - (CAST(t2.t AS DOUBLE) / CAST(n AS DOUBLE))
                          * CAST(h.w AS DOUBLE))
                       / (sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                               - (CAST(t2.t AS DOUBLE) / CAST(n AS DOUBLE))
                                 * (CAST(t2.t AS DOUBLE) / CAST(n AS DOUBLE)))
                          * sqrt((CAST(n AS DOUBLE) * CAST(h.w AS DOUBLE)
                                  - CAST(h.w AS DOUBLE) * CAST(h.w AS DOUBLE))
                                 / (CAST(n AS DOUBLE) - 1.0))), 6)
       END AS gi_star
FROM __t t JOIN __hood h ON t.x = h.x AND t.y = h.y, __g t2
"""

    pip_arms = "\nUNION ALL\n".join(
        f"SELECT id, '{pid}' AS admin_id FROM __pts WHERE {halfplane_sql(pid, v)}"
        for pid, v in PIP_POLYGONS
    )
    pip_join = f"WITH {pts} {pip_arms}"

    from mvt_wrangler_spark.sources.points import GEOMS_SQL, geom_intersects_sql

    ij_arms = "\nUNION ALL\n".join(
        f"SELECT id, geom_type, '{pid}' AS admin_id FROM __g WHERE {geom_intersects_sql(pid, v)}"
        for pid, v in PIP_POLYGONS
    )
    intersects_join = f"WITH __g AS ({GEOMS_SQL})\n{ij_arms}"

    adm_a = PIP_POLYGONS[0]
    type_filter = (
        f"WITH __g AS ({GEOMS_SQL}) SELECT id, geom_type FROM __g "
        f"WHERE NOT (geom_type = 'LineString' AND {geom_intersects_sql(*adm_a)})"
    )

    knn_qs = "(VALUES ('q0', 139.76, 35.68), ('q1', -74.0, 40.71), ('q2', 10.5, -20.25)) AS q(query_id, qlon, qlat)"
    knn = f"""
WITH {pts},
__d AS (SELECT q.query_id, p.id AS neighbor_id,
               (p.lon - q.qlon)*(p.lon - q.qlon) + (p.lat - q.qlat)*(p.lat - q.qlat) AS dist2
        FROM __pts p, {knn_qs}),
__r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, neighbor_id ASC) AS rank FROM __d)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, dist2 FROM __r WHERE rank <= 4
"""

    dedup = f"""
WITH {pts}, {xy},
__r AS (SELECT id, x, y, phash,
               row_number() OVER (PARTITION BY z, x, y, phash ORDER BY id ASC) AS rn
        FROM __xy)
SELECT id, x, y, phash FROM __r WHERE rn = 1
"""

    hexc = halfplane_sql(*PIP_POLYGONS[2])
    pipeline = f"""
WITH {pts},
__surv AS (SELECT * FROM __pts WHERE NOT (kind = 'building' AND ({hexc}))),
__xy AS (SELECT id, phash, CAST({Z} AS INT) AS z, {tile_x_sql('lon', Z)} AS x,
                {tile_y_sql('lat', Z)} AS y FROM __surv),
__r AS (SELECT id, x, y, phash,
               row_number() OVER (PARTITION BY z, x, y, phash ORDER BY id ASC) AS rn
        FROM __xy)
SELECT id, x, y, phash FROM __r WHERE rn = 1
"""

    # tile_encode: replicate the encoder's first-seen-order dictionaries in
    # SQL — key order = (first feature containing the key, key asc within
    # that feature's sorted iteration); value order = (first feature, first
    # key at that feature). Matches _layer_dictionaries' factorize exactly.
    ctes6, last6, tid6 = pmtiles_tile_id_sql(6, "x", "y", "__t0")
    tile_encode = f"""
WITH {pts},
__t0 AS (SELECT id, CAST(id AS VARCHAR) AS image_id, layer, kind,
                {tile_x_sql('lon', 6)} AS x, {tile_y_sql('lat', 6)} AS y,
                'n' || CAST(id % 997 AS VARCHAR) AS nameval,
                (id % 3) = 0 AS has_name
         FROM __pts),
{",".join(ctes6)},
__t AS (SELECT *, {tid6} AS tile_id FROM {last6}),
__r AS (SELECT x, y, tile_id, layer, kind, nameval, has_name,
               row_number() OVER (PARTITION BY x, y, layer ORDER BY image_id) AS rn
        FROM __t),
__e AS (
  SELECT x, y, layer, rn, 'kind' AS key, kind AS val FROM __r
  UNION ALL
  SELECT x, y, layer, rn, 'name' AS key, nameval AS val FROM __r WHERE has_name),
__k AS (SELECT x, y, layer, key, min(rn) AS frn FROM __e GROUP BY 1, 2, 3, 4),
__kj AS (SELECT x, y, layer, CAST(count(*) AS INT) AS n_keys,
                string_agg(key, ',' ORDER BY frn, key) AS keys_joined
         FROM __k GROUP BY 1, 2, 3),
__vf AS (SELECT x, y, layer, val, min(rn) AS frn FROM __e GROUP BY 1, 2, 3, 4),
__v2 AS (SELECT e.x, e.y, e.layer, e.val, v.frn, min(e.key) AS fkey
         FROM __e e JOIN __vf v
           ON e.x = v.x AND e.y = v.y AND e.layer = v.layer
          AND e.val = v.val AND e.rn = v.frn
         GROUP BY 1, 2, 3, 4, 5),
__vj AS (SELECT x, y, layer, CAST(count(*) AS INT) AS n_values,
                string_agg(val, ',' ORDER BY frn, fkey) AS values_joined
         FROM __v2 GROUP BY 1, 2, 3),
__nf AS (SELECT x, y, tile_id, layer, CAST(count(*) AS BIGINT) AS n_features
         FROM __r GROUP BY 1, 2, 3, 4)
SELECT __nf.x, __nf.y, __nf.tile_id, __nf.layer, n_features, n_keys, n_values,
       keys_joined, values_joined
FROM __nf JOIN __kj USING (x, y, layer) JOIN __vj USING (x, y, layer)
"""

    # tag_filter: the fixture's global tag-prune rule RESTATED in SQL and
    # actually evaluated per key (self-checking oracle — VERDICT r2 item 7):
    # drop key if starts_with 'pgf:name:', or starts_with 'name' with a
    # language capture outside the keep list ('', 'ja', 'en', '2').
    tag_filter = f"""
WITH {pts},
__keys AS (SELECT unnest(['kind','name','name:ja','name:fr','pgf:name:ja']) AS k),
__kept AS (
  SELECT string_agg(k, ',' ORDER BY k) AS kept FROM __keys
  WHERE NOT (starts_with(k, 'pgf:name:')
             OR (starts_with(k, 'name')
                 AND regexp_extract(k, '^name:?(.*)$', 1) NOT IN ('', 'ja', 'en', '2')))
)
SELECT id, kept AS kept_keys FROM __pts, __kept"""

    expr_filter = """
SELECT p_partkey FROM part
WHERE p_brand IN ('Brand#13', 'Brand#11', 'Brand#25')
  AND regexp_matches(p_type, 'ECONOMY|PROMO')
  AND CAST(p_size AS VARCHAR) NOT IN ('15', '25', '35', '45')
  AND NOT starts_with(CAST(p_size AS VARCHAR), '1')
  AND CAST(p_size AS VARCHAR) > '2'
"""

    interval_join = """
WITH __iv AS (
  SELECT event_id AS interval_id, epoch_us(ts) AS lo,
         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS hi
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id AS pid, __iv.interval_id
FROM events e JOIN __iv ON epoch_us(e.ts) >= __iv.lo AND epoch_us(e.ts) <= __iv.hi
"""

    asof_join = """
WITH __r AS (
  SELECT user_id, ts, max(value) AS v
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
__l AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT __l.event_id, __l.user_id, epoch_us(__l.ts) AS ts_us,
       __l.value AS purchase_value, __r.v AS last_click_value
FROM __l ASOF LEFT JOIN __r
  ON __l.user_id = __r.user_id AND __l.ts >= __r.ts
"""

    events_window = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""

    docs_dedup = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
  FROM documents) WHERE rn = 1
"""

    text_stats = r"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_raw,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS INT) AS n_punct
FROM documents
"""

    lang_id = """
WITH h AS (
  SELECT doc_id,
         (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5.0
       + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3.0
       + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) / 5.0 AS en
  FROM documents)
SELECT doc_id, CASE WHEN en >= 3 THEN 'en' WHEN en >= 1 THEN 'en-ish' ELSE 'unk' END AS lang_pred
FROM h
"""

    from mvt_wrangler_spark.operators.text import (boilerplate_stats_sql,
                                                   decontaminate_sql,
                                                   pii_scrub_sql,
                                                   repetition_stats_sql,
                                                   token_counts_sql,
                                                   vocab_topk_sql)
    token_count_sql_str = token_counts_sql("documents")
    boilerplate_sql_str = boilerplate_stats_sql("documents", shingle=12,
                                                min_docs=4)
    from mvt_wrangler_spark.operators.text import tfidf_topk_sql

    tfidf_sql_str = tfidf_topk_sql("documents", k=5)
    decontaminate_sql_str = decontaminate_sql(
        "documents", shingle=8, eval_pred="doc_id % 37 = 3")
    repetition_stats_sql_str = repetition_stats_sql("documents")
    pii_scrub_sql_str = pii_scrub_sql("documents")

    ann = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
p AS (SELECT e.vec_id, q.qid,
             list_sum(list_transform(generate_series(1, 64),
                      i -> CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                         * CAST(round(CAST(q.qe[i] AS DOUBLE) * 1000) AS BIGINT))) AS score
      FROM embeddings e, q WHERE e.vec_id != q.qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rank FROM p)
SELECT qid, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, CAST(score AS BIGINT) AS score
FROM r WHERE rank <= 5
"""

    sessionize = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS session_n FROM g)
SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_n
"""

    def _hs_elev(dy: int, dx: int) -> str:
        """Elevation at interior-neighbor (i+dy, j+dx) for the hillshade
        oracle, with the qlossy per-channel quantization model applied when
        fsel = 2 (same model as the thumb oracle)."""
        y = f"(i+{dy})" if dy else "i"
        x = f"(j+{dx})" if dx else "j"
        v = f"((id*13 + {y}*{y}*3 + {x}*{x}*2 + {y}*{x}*5) % 1048576)"
        q = (f"((({v}) // 65536) // 4 * 4 + 2) * 65536"
             f" + (((({v}) // 256) % 256) // 4 * 4 + 2) * 256"
             f" + ((({v}) % 256) // 4 * 4 + 2)")
        return f"(CASE WHEN fsel = 2 THEN {q} ELSE {v} END)"

    hillshade = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 43 = 7),
__g AS (
  SELECT id, fsel, i.i AS i, j.j AS j
  FROM __ids, generate_series(1, 14) i(i), generate_series(1, 22) j(j)),
__grad AS (
  SELECT id, i, j,
         ({_hs_elev(-1, 1)} + 2*{_hs_elev(0, 1)} + {_hs_elev(1, 1)})
       - ({_hs_elev(-1, -1)} + 2*{_hs_elev(0, -1)} + {_hs_elev(1, -1)}) AS gx,
         ({_hs_elev(1, -1)} + 2*{_hs_elev(1, 0)} + {_hs_elev(1, 1)})
       - ({_hs_elev(-1, -1)} + 2*{_hs_elev(-1, 0)} + {_hs_elev(-1, 1)}) AS gy
  FROM __g),
__px AS (
  SELECT id, i - 1 AS zy, j - 1 AS zx,
         least((abs(gx) + abs(gy)) // 16, 255) AS shade,
         abs(gx) % 256 AS axm, abs(gy) % 256 AS aym
  FROM __grad)
SELECT id, round(CAST(sum(shade) AS DOUBLE) / 308, 6) AS mean_shade,
       CAST(max(shade) AS BIGINT) AS max_shade,
       CAST(sum(shade * (zy*29 + zx*13 + 1) + axm * (zy*29 + zx*13 + 8)
                + aym * (zy*29 + zx*13 + 15)) % 2147483647 AS BIGINT) AS fp
FROM __px GROUP BY 1
"""

    _spiked_docs = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' contact bob@spam.io now'
  FROM documents WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 3000000,
         'repeat me ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'repeat me ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'repeat me ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 13 = 0"""
    curate_e2e = f"""
WITH __docs AS ({_spiked_docs}),
__keep AS (
  SELECT doc_id, 1 AS k FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM __docs) WHERE rn = 1),
__tok AS ({token_counts_sql('__docs')}),
__rep AS ({repetition_stats_sql('__docs')}),
__pii AS ({pii_scrub_sql('__docs')}),
__lang AS (
  SELECT doc_id,
         CASE WHEN en >= 3 THEN 'en' WHEN en >= 1 THEN 'en-ish' ELSE 'unk'
         END AS lang_pred
  FROM (SELECT doc_id,
          (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
        + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3
        + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) / 5 AS en
        FROM __docs)),
__r AS (
  SELECT d.doc_id,
         CASE WHEN k.k IS NULL THEN 'dup'
              WHEN r.dup_line_frac > 0.3 THEN 'repetitive'
              WHEN p.has_pii THEN 'pii'
              WHEN t.n_ws_tokens < 20 THEN 'short'
              WHEN l.lang_pred = 'unk' THEN 'lang'
         END AS reason
  FROM __docs d LEFT JOIN __keep k USING (doc_id)
       JOIN __tok t USING (doc_id) JOIN __rep r USING (doc_id)
       JOIN __pii p USING (doc_id) JOIN __lang l USING (doc_id))
SELECT doc_id, reason IS NULL AS keep, reason FROM __r
"""

    from mvt_wrangler_spark.operators.text import REG_DOMAIN_RE, URL_RE

    _shop = ("'https://www.shop' || CAST(id % 5 AS VARCHAR) || '.example' || "
             "CAST(id % 7 AS VARCHAR) || '.com/item/' || CAST(id AS VARCHAR)")
    _cdn = ("'http://cdn' || CAST(id % 3 AS VARCHAR) || '.assets' || "
            "CAST(id % 4 AS VARCHAR) || '.net:8080/f/' || CAST(id AS VARCHAR)")
    blocklist_scrub_sql = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id FROM __pts WHERE id % 29 = 2),
__d AS (
  SELECT id AS doc_id,
         CASE WHEN id % 11 = 0 THEN 'no links today'
              WHEN id % 2 = 0 THEN 'buy at ' || {_shop} || ' and ' || {_cdn} || ' now'
              ELSE 'see ' || {_shop} || ' today'
         END AS text
  FROM __ids),
__u AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '{URL_RE}', 1)) AS host FROM __d),
__dom AS (SELECT doc_id, regexp_extract(host, '{REG_DOMAIN_RE}', 1) AS domain FROM __u),
__bl AS (SELECT * FROM (VALUES ('example0.com'), ('example3.com'),
                               ('example6.com'), ('assets1.net'),
                               ('assets3.net')) b(domain)),
__pd AS (
  SELECT doc_id, count(*) AS n_urls, count(b.domain) AS n_blocked
  FROM __dom d LEFT JOIN __bl b USING (domain) GROUP BY 1)
SELECT d.doc_id, CAST(coalesce(n_urls, 0) AS BIGINT) AS n_urls,
       CAST(coalesce(n_blocked, 0) AS BIGINT) AS n_blocked,
       coalesce(n_blocked, 0) = 0 AS keep
FROM __d d LEFT JOIN __pd USING (doc_id)
"""

    equalize_sql = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 47 = 9),
__px AS (
  SELECT id, i.i AS i, j.j AS j, c.c AS c,
         CASE WHEN fsel = 2
              THEN (((id*7 + i.i*3 + j.j + c.c*5) % 16) * ((id*7 + i.i*3 + j.j + c.c*5) % 16)) // 4 * 4 + 2
              ELSE ((id*7 + i.i*3 + j.j + c.c*5) % 16) * ((id*7 + i.i*3 + j.j + c.c*5) % 16)
         END AS v
  FROM __ids, generate_series(0, 7) i(i), generate_series(0, 15) j(j),
       generate_series(0, 2) c(c)),
__h AS (SELECT v AS bin, count(*) AS cnt FROM __px GROUP BY 1),
__cdf AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cdf FROM __h),
__tot AS (SELECT sum(cnt) AS total, (SELECT min(cdf) FROM __cdf) AS cdfmin FROM __h),
__lut AS (
  SELECT bin, CASE WHEN total > cdfmin
                   THEN (cdf - cdfmin) * 255 // (total - cdfmin) ELSE 0
              END AS e
  FROM __cdf, __tot)
SELECT id,
       round(CAST(sum(e) AS DOUBLE) / 384, 6) AS mean_eq,
       CAST(sum(e * (i*29 + j*13 + c*7 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __px JOIN __lut ON v = bin
GROUP BY 1
"""

    quality = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS nospace,
         (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
       + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) / 5 AS stop_hits
  FROM documents)
SELECT doc_id, n_tokens,
       round(CAST(nospace AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
       round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stop_ratio
FROM t
"""

    distinct_phash = (
        "WITH " + f"__pts AS ({POINTS_SQL}), "
        + f"__xy AS (SELECT phash, {tile_x_sql('lon', 6)} AS x, {tile_y_sql('lat', 6)} AS y FROM __pts) "
        + "SELECT x, y, CAST(count(DISTINCT phash) AS BIGINT) AS n_phash FROM __xy GROUP BY 1, 2"
    )

    topk_events = """
SELECT event_type, CAST(rank AS INT) AS rank, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events) WHERE rank <= 3
"""

    embed_neardup = """
WITH e AS (SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS q
           FROM embeddings),
p AS (SELECT a.id AS id_a, b.id AS id_b,
             list_sum(list_transform(generate_series(1, 64), i -> a.q[i] * b.q[i])) AS score,
             list_sum(list_transform(generate_series(1, 64), i -> a.q[i] * a.q[i])) AS na,
             list_sum(list_transform(generate_series(1, 64), i -> b.q[i] * b.q[i])) AS nb
      FROM e a, e b WHERE a.id < b.id)
SELECT id_a, id_b FROM p WHERE score > 0 AND score * score * 100 > 16 * na * nb
"""

    # zonal: brute-force the pixel formula per (id, i, j); qlossy decodes to
    # mid-rise 4-step quantization (v//4*4 + 2) — same as images.encode
    zonal = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 37 = 3),
__px AS (
  SELECT id, i.i, j.j,
         ((i.i * 2) // 16) * 2 + (j.j * 2) // 24 AS zone,
         CASE WHEN fsel = 2 THEN ((id*31 + i.i*7 + j.j*13) % 256) // 4 * 4 + 2
              ELSE (id*31 + i.i*7 + j.j*13) % 256 END AS r,
         CASE WHEN fsel = 2 THEN ((id*31 + i.i*7 + j.j*13 + 5) % 256) // 4 * 4 + 2
              ELSE (id*31 + i.i*7 + j.j*13 + 5) % 256 END AS g,
         CASE WHEN fsel = 2 THEN ((id*31 + i.i*7 + j.j*13 + 10) % 256) // 4 * 4 + 2
              ELSE (id*31 + i.i*7 + j.j*13 + 10) % 256 END AS b
  FROM __ids, generate_series(0, 15) i(i), generate_series(0, 23) j(j))
SELECT id, CAST(zone AS INT) AS zone, CAST(count(*) AS BIGINT) AS n_px,
       round(CAST(sum(r) AS DOUBLE) / count(*), 6) AS mean_r,
       round(CAST(sum(g) AS DOUBLE) / count(*), 6) AS mean_g,
       round(CAST(sum(b) AS DOUBLE) / count(*), 6) AS mean_b
FROM __px GROUP BY 1, 2
"""

    # thumbnail: brute-force the same pixel formula, then the exact integer
    # box pooling (4x4 block SUM // 16) and the position-weighted fingerprint
    # the Spark side computes from the DECODED thumbnail bytes
    thumb = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 41 = 5),
__px AS (
  SELECT id, i.i AS i, j.j AS j, c.c AS c,
         CASE WHEN fsel = 2
              THEN ((id*31 + i.i*7 + j.j*13 + c.c*5) % 256) // 4 * 4 + 2
              ELSE (id*31 + i.i*7 + j.j*13 + c.c*5) % 256 END AS v
  FROM __ids, generate_series(0, 15) i(i), generate_series(0, 23) j(j),
       generate_series(0, 2) c(c)),
__blk AS (
  SELECT id, i // 4 AS zy, j // 4 AS zx, c, CAST(sum(v) // 16 AS BIGINT) AS tv
  FROM __px GROUP BY 1, 2, 3, 4)
SELECT id,
       round(CAST(sum(CASE WHEN c = 0 THEN tv ELSE 0 END) AS DOUBLE) / 24, 6) AS mean_r,
       round(CAST(sum(CASE WHEN c = 1 THEN tv ELSE 0 END) AS DOUBLE) / 24, 6) AS mean_g,
       round(CAST(sum(CASE WHEN c = 2 THEN tv ELSE 0 END) AS DOUBLE) / 24, 6) AS mean_b,
       CAST(sum(tv * (zy*29 + zx*13 + c*7 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __blk GROUP BY 1
"""

    patch_stats = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 47 = 9),
__ppx AS (
  SELECT id, i.i AS i, j.j AS j, c.c AS c,
         CASE WHEN fsel = 2
              THEN ((id*31 + i.i*7 + j.j*13 + c.c*5) % 256) // 4 * 4 + 2
              ELSE (id*31 + i.i*7 + j.j*13 + c.c*5) % 256 END AS v
  FROM __ids, generate_series(0, 15) i(i), generate_series(0, 23) j(j),
       generate_series(0, 2) c(c))
SELECT id, CAST(i // 8 AS INT) AS gy, CAST(j // 8 AS INT) AS gx,
       CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(sum(v * ((i % 8)*29 + (j % 8)*13 + c*7 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __ppx GROUP BY 1, 2, 3
"""

    from mvt_wrangler_spark.operators.sampling import sample_hash_sql

    def _elev_sql(y: str, x: str) -> str:
        """Terrain-RGB elevation at (y, x) incl. the qlossy channel model."""
        e = f"((id*13 + ({y})*({y})*3 + ({x})*({x})*2 + ({y})*({x})*5) % 1048576)"
        r, g, b = f"({e} // 65536)", f"(({e} // 256) % 256)", f"({e} % 256)"
        return (f"(CASE WHEN id % 3 = 2 THEN ({r}//4*4+2)*65536 + ({g}//4*4+2)*256 + ({b}//4*4+2) "
                f"ELSE {e} END)")

    _corner = "CASE WHEN {e} > iso THEN 1 ELSE 0 END"
    contour = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, (id*13 % 1048576) + 1700 AS iso
          FROM __pts WHERE id % 59 = 13),
__cls AS (
  SELECT id, y.y AS cy, x.x AS cx,
         8*{_corner.format(e=_elev_sql('y.y', 'x.x'))}
       + 4*{_corner.format(e=_elev_sql('y.y', 'x.x + 1'))}
       + 2*{_corner.format(e=_elev_sql('y.y + 1', 'x.x + 1'))}
       + 1*{_corner.format(e=_elev_sql('y.y + 1', 'x.x'))} AS cls
  FROM __ids, generate_series(0, 14) y(y), generate_series(0, 22) x(x))
SELECT id,
       CAST(sum(CASE WHEN cls NOT IN (0, 15) THEN 1 ELSE 0 END) AS INT) AS n_cut,
       CAST(sum(CASE WHEN cls IN (0, 15) THEN 0
                     WHEN cls IN (5, 10) THEN 2 ELSE 1 END) AS INT) AS n_segments,
       CAST(sum(cls * (cy*29 + cx*13 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __cls GROUP BY id
"""

    _aug_hash = sample_hash_sql("id", salt=0)
    augment_stats = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 53 = 11),
__par AS (
  SELECT id, fsel,
         CAST(h & 1 AS INT) AS hflip,
         CAST((h >> 1) & 1 AS INT) AS vflip,
         CAST((h >> 2) % 9 AS INT) AS ox,
         CAST(((h >> 2) // 9) % 5 AS INT) AS oy
  FROM (SELECT id, fsel, {_aug_hash} AS h FROM __ids)),
__apx AS (
  SELECT id, hflip, vflip, ox, oy, y.y AS y, x.x AS x, c.c AS c,
         oy + CASE WHEN vflip = 1 THEN 11 - y.y ELSE y.y END AS sy,
         ox + CASE WHEN hflip = 1 THEN 15 - x.x ELSE x.x END AS sx
  FROM __par, generate_series(0, 11) y(y), generate_series(0, 15) x(x),
       generate_series(0, 2) c(c)),
__av AS (
  SELECT id, hflip, vflip, ox, oy, y, x, c,
         CASE WHEN id % 3 = 2
              THEN ((id*31 + sy*7 + sx*13 + c*5) % 256) // 4 * 4 + 2
              ELSE (id*31 + sy*7 + sx*13 + c*5) % 256 END AS v
  FROM __apx)
SELECT id, hflip, vflip, ox, oy,
       CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(sum(v * (y*29 + x*13 + c*7 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __av GROUP BY 1, 2, 3, 4, 5
"""

    recon_error = f"""
WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel FROM __pts WHERE id % 61 = 17),
__rpx AS (
  SELECT id, i.i AS i, j.j AS j, c.c AS c,
         CASE WHEN fsel = 2
              THEN ((id*31 + i.i*7 + j.j*13 + c.c*5) % 256) // 4 * 4 + 2
              ELSE (id*31 + i.i*7 + j.j*13 + c.c*5) % 256 END AS v
  FROM __ids, generate_series(0, 15) i(i), generate_series(0, 23) j(j),
       generate_series(0, 2) c(c)),
__rpool AS (
  SELECT id, i // 4 AS zy, j // 4 AS zx, c, CAST(sum(v) // 16 AS BIGINT) AS pv
  FROM __rpx GROUP BY 1, 2, 3, 4)
SELECT p.id,
       CAST(sum((p.v - q.pv) * (p.v - q.pv)) AS BIGINT) AS sse,
       CAST(max(abs(p.v - q.pv)) AS INT) AS max_err
FROM __rpx p JOIN __rpool q
  ON q.id = p.id AND q.zy = p.i // 4 AND q.zx = p.j // 4 AND q.c = p.c
GROUP BY 1
"""

    # exact tile-size quantiles: value at rank ceil(q*n/100) with (cnt, x, y)
    # tie-break, integer rank target in both engines
    tile_quantiles = f"""
WITH __pts AS ({POINTS_SQL}),
__xy8 AS (SELECT {tile_x_sql('lon', 8)} AS x, {tile_y_sql('lat', 8)} AS y FROM __pts),
__t AS (SELECT x, y, count(*) AS cnt FROM __xy8 GROUP BY 1, 2),
__r AS (SELECT cnt, row_number() OVER (ORDER BY cnt ASC, x ASC, y ASC) AS rn FROM __t),
__n AS (SELECT count(*) AS n FROM __t)
SELECT CAST(q.q AS INT) AS q, CAST(r.cnt AS BIGINT) AS tile_cnt
FROM (VALUES (50), (90), (99)) q(q), __n, __r r
WHERE r.rn = (q.q * __n.n + 99) // 100
"""

    # revenue by tile: DECIMAL(18,2) sums are exact and order-independent in
    # both engines (the double-sum nondeterminism trap), customers without
    # orders keep zero revenue via the left join
    revenue_by_tile = f"""
WITH __c AS (
  SELECT c_custkey AS custkey,
         CAST((c_custkey*7919 % 360000 + 360000) % 360000 - 180000 AS DOUBLE) / 1000.0 AS lon,
         CAST((c_custkey*104729 % 170000 + 170000) % 170000 - 85000 AS DOUBLE) / 1000.0 AS lat
  FROM customer),
__cxy AS (SELECT custkey, CAST(5 AS INT) AS z,
                 {tile_x_sql('lon', 5)} AS x, {tile_y_sql('lat', 5)} AS y FROM __c),
__rev AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d,
                 count(*) AS n_ord
          FROM orders GROUP BY 1)
SELECT z, x, y,
       CAST(sum(coalesce(rev_d, 0)) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(coalesce(n_ord, 0)) AS BIGINT) AS n_orders
FROM __cxy LEFT JOIN __rev ON custkey = o_custkey
GROUP BY 1, 2, 3
"""

    # content-hash dedup: rebuild the exact raw byte stream from the pixel
    # formula (row-major %02x hex), md5 the same lowercase-hex string
    bytes_dedup = f"""
WITH __pts AS ({POINTS_SQL}),
__im AS (SELECT DISTINCT id, id // 106 AS seed FROM __pts WHERE id % 53 = 11),
__px AS (
  SELECT id, i.i AS i, j.j AS j, c.c AS c,
         (seed*37 + i.i*11 + j.j*17 + c.c*23) % 256 AS v
  FROM __im, generate_series(0, 5) i(i), generate_series(0, 7) j(j),
       generate_series(0, 2) c(c)),
__hx AS (SELECT id, md5(string_agg(printf('%02x', v), '' ORDER BY i, j, c)) AS content_hash
         FROM __px GROUP BY id)
SELECT content_hash, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(id) AS BIGINT) AS keeper_id
FROM __hx GROUP BY 1
"""

    # phash near-dup: same integer phash synthesis, then the band/join/refine
    # restated by phash_hamming_sql — bit-identical candidate and refine path
    from mvt_wrangler_spark.operators.dedup import phash_hamming_sql

    phash_nd_src = f"""WITH __pts AS ({POINTS_SQL}),
__ids AS (SELECT DISTINCT id FROM __pts WHERE id % 5 < 2)
SELECT id,
       xor((((id // 5) * 2654435761 + 11) % 2147483647) * 2147483648
           + (((id // 5) * 1779033703 + 7) % 2147483647),
           CAST(1 AS BIGINT) << CAST(id % 62 AS INT)) AS phash
FROM __ids"""
    phash_neardup = phash_hamming_sql(phash_nd_src, k=3, bands=4, max_bucket=1000)

    # image bytes -> ahash -> hamming near-dup: restate pixels, luma pooling,
    # the 64-bit assembly (two 32-bit halves, HUGEINT combine, signed wrap),
    # then reuse the hamming-join twin verbatim
    lo_bits = ("sum(CASE WHEN v > m AND idx < 32 "
               "THEN CAST(1 AS BIGINT) << CAST(idx AS INT) ELSE 0 END)")
    hi_bits = ("sum(CASE WHEN v > m AND idx >= 32 "
               "THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INT) ELSE 0 END)")
    ahash_src = f"""WITH __pts AS ({POINTS_SQL}),
__im AS (SELECT DISTINCT id, id // 5 AS cl, id % 5 AS b, CAST(id % 3 AS INT) AS fsel
         FROM __pts WHERE id % 5 < 2 AND (id // 5) % 8 = 0),
__px AS (
  SELECT id, i.i AS i, j.j AS j, c.c AS c,
         (cl*31 + i.i*7 + j.j*13 + c.c*5) % 200
         + CASE WHEN b = 1 AND i.i // 2 = cl % 8 AND j.j // 3 = (cl // 8) % 8
                THEN 45 ELSE 0 END AS raw_v,
         fsel
  FROM __im, generate_series(0, 15) i(i), generate_series(0, 23) j(j),
       generate_series(0, 2) c(c)),
__lum AS (
  SELECT id, i, j,
         sum((CASE WHEN fsel = 2 THEN raw_v // 4 * 4 + 2 ELSE raw_v END)
             * (CASE c WHEN 1 THEN 2 ELSE 1 END)) AS lum
  FROM __px GROUP BY 1, 2, 3),
__z AS (SELECT id, (i // 2) * 8 + (j // 3) AS idx,
               CAST(sum(lum) // 6 AS BIGINT) AS v
        FROM __lum GROUP BY 1, 2),
__zm AS (SELECT __z.*, mm.m FROM __z JOIN
         (SELECT id, sum(v) // 64 AS m FROM __z GROUP BY id) mm USING (id)),
__h AS (SELECT id, CAST({hi_bits} AS HUGEINT) * 4294967296 + {lo_bits} AS h
        FROM __zm GROUP BY id)
SELECT id, CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616
                     ELSE h END AS BIGINT) AS phash
FROM __h"""
    ahash_neardup = phash_hamming_sql(ahash_src, k=3, bands=4, max_bucket=1000)

    from mvt_wrangler_spark.operators.dedup import shingle_hashes_sql_expr

    shingle_hashes_sql_expr_5gram = shingle_hashes_sql_expr("text", 5)
    # cross-modal: the same image pair set joined to caption shingle sets;
    # list_intersect over the distinct sorted shingle lists = array_intersect
    caption_conflicts = f"""
WITH __ap AS ({ahash_neardup}),
__docs AS (SELECT doc_id,
                  list_distinct({shingle_hashes_sql_expr_5gram}) AS toks
           FROM documents),
__j AS (
  SELECT p.id_a, p.id_b, p.hamming,
         CAST(length(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common,
         CAST(length(a.toks) + length(b.toks)
              - length(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union
  FROM __ap p
  JOIN __docs a ON a.doc_id = ((p.id_a % 500) + 500) % 500
  JOIN __docs b ON b.doc_id = ((p.id_b % 500) + 500) % 500)
SELECT id_a, id_b, hamming, n_common, n_union,
       n_common * 10 < n_union * 3 AS conflict
FROM __j
"""
    # pairs -> clusters: recursive-CTE reachability closure over the SAME
    # ahash pair query (pair_clusters' large-star/small-star twin)
    from mvt_wrangler_spark.operators.dedup import pair_clusters_sql

    neardup_clusters = pair_clusters_sql(ahash_neardup)

    # composed image curation: closure keepers -> caption token/lang gates
    # (the standalone twins wrapped as subqueries; lang CASE inlined below
    # must stay in sync with the lang_id oracle)
    image_curate_e2e = rf"""
SELECT k.id, k.cluster_size, CAST(t.n_ws AS BIGINT) AS n_ws_tokens,
       l.lang_pred,
       (t.n_ws BETWEEN 10 AND 60 AND l.lang_pred <> 'unk') AS kept
FROM (SELECT i.id, coalesce(c.cluster_size, 1) AS cluster_size
      FROM (SELECT id FROM ({ahash_src})) i
      LEFT JOIN ({neardup_clusters}) c ON c.member_id = i.id
      WHERE c.member_id IS NULL OR c.member_id = c.cluster_rep) k
JOIN (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_ws
      FROM documents) t
  ON t.doc_id = ((k.id % 500) + 500) % 500
JOIN (SELECT doc_id,
             CASE WHEN en >= 3 THEN 'en' WHEN en >= 1 THEN 'en-ish'
                  ELSE 'unk' END AS lang_pred
      FROM (SELECT doc_id,
                   (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5.0
                 + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3.0
                 + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) / 5.0 AS en
            FROM documents)) l
  ON l.doc_id = t.doc_id
"""

    from mvt_wrangler_spark.operators.cluster import ann_topk_ivf_sql, kmeans_sql

    kmeans_sql_oracle = kmeans_sql(k=4, n_iter=2, quant=100)
    ann_ivf_oracle = ann_topk_ivf_sql(k=5, n_clusters=4, n_probe=2,
                                      n_iter=2, quant=100, n_queries=3)

    doc_fp = """
WITH c AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(text), 1)),
                        i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)
                             * (((i - 1) % 64) + 1)) AS terms
  FROM documents)
SELECT doc_id, CAST(list_sum(terms) % 2147483647 AS BIGINT) AS fingerprint FROM c
"""

    from mvt_wrangler_spark.operators.dedup import (
        embedding_lsh_sql,
        minhash_lsh_sql,
        ngram_jaccard_sql,
        simhash_sql_expr,
    )

    from mvt_wrangler_spark.functions.cells import h3_cell_sql, s2_cell_sql
    from mvt_wrangler_spark.sources.points import XYZ_SQL

    s2_ctes, s2_last, s2_expr = s2_cell_sql(level=12, base="__xyz")
    h3_ctes, h3_last, h3_expr = h3_cell_sql(res=7, base=s2_last)
    cell_encode = (
        f"WITH __xyz AS ({XYZ_SQL}),\n" + ",\n".join(s2_ctes + h3_ctes)
        + f"\nSELECT id, {s2_expr} AS s2_cell, {h3_expr} AS h3_cell FROM {h3_last}"
    )

    from mvt_wrangler_spark.operators.joins import ann_topk_lsh_sql

    ann_lsh = ann_topk_lsh_sql(k=5)

    minhash_lsh = minhash_lsh_sql(num_hashes=16, bands=4, shingle=5, max_bucket=1000)

    from mvt_wrangler_spark.operators.profile import profile_sql

    profile_sql_str = profile_sql(
        "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_orderdate", "o_orderpriority"])

    from mvt_wrangler_spark.operators.sampling import assign_split_sql as _as_sql

    _mh_closure = pair_clusters_sql(minhash_lsh)
    dedup_safe_split = f"""
SELECT doc_id, rep, {_as_sql({'train': 0.9, 'val': 0.05, 'test': 0.05},
                             'rep', salt=11)} AS split
FROM (
  SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS rep
  FROM documents d LEFT JOIN ({_mh_closure}) c ON c.member_id = d.doc_id)
"""
    simhash = ("SELECT doc_id, " + simhash_sql_expr("text", shingle=4)
               + " AS simhash FROM documents")
    embed_lsh = embedding_lsh_sql(quant=100, cos_num=16, cos_den=100)

    from mvt_wrangler_spark.functions.measures import measures_sql

    geom_measures = f"""
WITH __v AS (
  SELECT CAST(l_orderkey AS BIGINT) AS gkey,
         CAST(l_linenumber AS BIGINT) AS vord,
         ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS vx,
         ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS vy
  FROM lineitem),
__vk AS (SELECT * FROM __v WHERE gkey IN
         (SELECT gkey FROM __v GROUP BY gkey HAVING count(*) >= 3)),
{measures_sql('__vk', 'gkey', 'vx', 'vy', 'vord')}
SELECT gkey, n_vertices, CAST(abs(a2_signed) AS BIGINT) AS area2, cx_num, cy_num,
       CAST(3*a2_signed AS BIGINT) AS den, perim2, len2_open, minx, miny, maxx, maxy
FROM __m WHERE abs(a2_signed) >= 32
"""

    winding = f"""
WITH __v AS (
  SELECT CAST(l_orderkey AS BIGINT) AS gkey,
         CAST(l_linenumber AS BIGINT) AS vord,
         ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS vx,
         ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS vy
  FROM lineitem),
__vk AS (SELECT * FROM __v WHERE gkey IN
         (SELECT gkey FROM __v GROUP BY gkey HAVING count(*) >= 3)),
{measures_sql('__vk', 'gkey', 'vx', 'vy', 'vord')},
__r AS (
  SELECT v.gkey, v.vx, v.vy,
         row_number() OVER (PARTITION BY v.gkey ORDER BY v.vord) - 1 AS rn,
         m.n_vertices AS n,
         CASE WHEN m.a2_signed < 0 THEN 1 ELSE 0 END AS revd,
         CASE WHEN m.a2_signed > 0 THEN 1 WHEN m.a2_signed < 0 THEN -1
              ELSE 0 END AS sgn
  FROM __vk v JOIN __m m ON m.gkey = v.gkey)
SELECT gkey, CAST(sgn AS INT) AS sign_before, revd = 1 AS was_reversed,
       CAST(CAST(sum(vx * ((CASE WHEN revd = 1 THEN n - 1 - rn ELSE rn END)*29 + 1)) AS BIGINT)
            % 2147483647 AS BIGINT) AS fp_x,
       CAST(CAST(sum(vy * ((CASE WHEN revd = 1 THEN n - 1 - rn ELSE rn END)*13 + 1)) AS BIGINT)
            % 2147483647 AS BIGINT) AS fp_y
FROM __r GROUP BY gkey, sgn, revd
"""

    from mvt_wrangler_spark.functions.cells import s2_parent_sql

    cover_ctes, cover_last, cover_s2 = s2_cell_sql(level=12, base="__xyz2")
    cell_cover_join = (
        f"WITH __xyz2 AS ({XYZ_SQL}),\n" + ",\n".join(cover_ctes)
        + f""",
__cp AS (SELECT id, {s2_parent_sql(f'({cover_s2})', 5)} AS p5 FROM {cover_last}),
__cr AS (SELECT DISTINCT p5 AS rcell FROM __cp WHERE id % 29 = 0)
SELECT id, p5 FROM __cp JOIN __cr ON p5 = rcell"""
    )

    from mvt_wrangler_spark.operators.sampling import sample_hash_sql

    thr = int(0.5 * 2147483647)
    tile_sample = f"""
WITH {pts},
__txy AS (SELECT id, {tile_x_sql('lon', 6)} AS x, {tile_y_sql('lat', 6)} AS y,
                 {sample_hash_sql('id')} AS h
          FROM __pts),
__s AS (SELECT id, x, y, h,
               row_number() OVER (PARTITION BY x, y ORDER BY h, id) AS rn
        FROM __txy WHERE h < {thr})
SELECT id, x, y, CAST(rn AS INT) AS rn FROM __s WHERE rn <= 3
"""

    from mvt_wrangler_spark.operators.cluster import group_centroids_sql

    embed_centroids = group_centroids_sql("embeddings", dim=64, key="label")

    from mvt_wrangler_spark.operators.clip import clip_rings_sql

    clip_tile = f"""
WITH __v AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS gkey,
         CAST(l_linenumber AS BIGINT) AS seq,
         CAST(((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS DOUBLE) AS x,
         CAST(((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS DOUBLE) AS y
  FROM lineitem),
__vk AS (SELECT * FROM __v WHERE gkey IN
         (SELECT gkey FROM __v GROUP BY gkey HAVING count(*) >= 3)),
{clip_rings_sql('__vk', 512.0, 512.0, 3584.0, 3584.0, snap=16)}
SELECT gkey, n_out, area2q FROM __clip
"""

    overzoom_sql = f"""
WITH {pts},
__ozids AS (SELECT DISTINCT id, CAST(id % 3 AS INT) AS fsel
            FROM __pts WHERE id % 37 = 3),
__cpx AS (
  SELECT id, qy.q AS qy, qx.q AS qx, y.y AS y, x.x AS x, c.c AS c,
         CASE WHEN fsel = 2
              THEN ((id*31 + (qy.q*8 + y.y//2)*7 + (qx.q*8 + x.x//2)*13 + c.c*5) % 256) // 4 * 4 + 2
              ELSE (id*31 + (qy.q*8 + y.y//2)*7 + (qx.q*8 + x.x//2)*13 + c.c*5) % 256 END AS v
  FROM __ozids, generate_series(0, 1) qy(q), generate_series(0, 1) qx(q),
       generate_series(0, 15) y(y), generate_series(0, 15) x(x),
       generate_series(0, 2) c(c))
SELECT id, CAST(qy*2 + qx AS INT) AS child,
       CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(sum(v * (y*29 + x*13 + c*7 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __cpx GROUP BY 1, 2
"""

    # mosaic: parent pixel (py,px,c) = floor-mean of the 2x2 block of child
    # q = (py//8)*2 + (px//8) at child coords ((py%8)*2+dy, (px%8)*2+dx),
    # child pixel v = (id*31 + q*11 + cy*7 + cx*13 + c*5) % 256 with the
    # qlossy quant model (v//4*4+2) when (id+q)%3 = 2 — mirrors q_mosaic's
    # generator and mosaic()'s integer box-mean exactly.
    mosaic_sql = f"""
WITH {pts},
__moids AS (SELECT DISTINCT id FROM __pts WHERE id % 41 = 5),
__ppx AS (
  SELECT id, py.y AS py, px.x AS px, c.c AS c,
         sum(CASE WHEN (id + ((py.y//8)*2 + (px.x//8))) % 3 = 2
              THEN ((id*31 + ((py.y//8)*2 + (px.x//8))*11
                     + ((py.y%8)*2 + dy.d)*7 + ((px.x%8)*2 + dx.d)*13
                     + c.c*5) % 256) // 4 * 4 + 2
              ELSE (id*31 + ((py.y//8)*2 + (px.x//8))*11
                    + ((py.y%8)*2 + dy.d)*7 + ((px.x%8)*2 + dx.d)*13
                    + c.c*5) % 256 END) // 4 AS v
  FROM __moids, generate_series(0, 15) py(y), generate_series(0, 15) px(x),
       generate_series(0, 2) c(c), generate_series(0, 1) dy(d),
       generate_series(0, 1) dx(d)
  GROUP BY 1, 2, 3, 4)
SELECT id, CAST(4 AS INT) AS n_children,
       CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(sum(v * (py*29 + px*13 + c*7 + 1)) % 2147483647 AS BIGINT) AS fp
FROM __ppx GROUP BY 1
"""

    from mvt_wrangler_spark.operators.clip import clip_segments_sql

    clip_lines = f"""
WITH __v AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS gkey,
         CAST(l_linenumber AS BIGINT) AS vord,
         CAST(((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS DOUBLE) AS x1,
         CAST(((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS DOUBLE) AS y1
  FROM lineitem),
__seg0 AS (
  SELECT gkey, CAST(row_number() OVER w AS BIGINT) AS seq, x1, y1,
         lead(x1) OVER w AS x2, lead(y1) OVER w AS y2
  FROM __v WINDOW w AS (PARTITION BY gkey ORDER BY vord)),
__segs AS (SELECT * FROM __seg0 WHERE x2 IS NOT NULL),
{clip_segments_sql('__segs', 512.0, 512.0, 3584.0, 3584.0, snap=16)}
SELECT gkey, seq, qx1, qy1, qx2, qy2 FROM __lseg
"""

    from mvt_wrangler_spark.operators.spatial_cluster import grid_cluster_sql

    spatial_cluster_pts = """
SELECT CAST(l_orderkey*8 + l_linenumber AS BIGINT) AS id,
       ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS px,
       ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS py
FROM lineitem"""
    spatial_cluster_sql = grid_cluster_sql(spatial_cluster_pts, eps=16)

    from mvt_wrangler_spark.operators.sampling import assign_split_sql

    dataset_split = f"""
SELECT doc_id,
       {assign_split_sql({'train': 0.8, 'val': 0.1, 'test': 0.1},
                         'doc_id', salt=7)} AS split
FROM documents
"""

    from mvt_wrangler_spark.operators.events import funnel_sql

    funnel_sql_str = funnel_sql(
        "(SELECT * FROM events WHERE ((event_id % 7) + 7) % 7 = 0)",
        ["view", "click", "purchase"])

    from mvt_wrangler_spark.operators.events import od_matrix_sql

    _od_lon = ("(CAST(((event_id*7919 + user_id) % 360000 + 360000) % 360000"
               " - 180000 AS DOUBLE) / 1000.0)")
    _od_lat = ("(CAST(((event_id*104729 + user_id) % 170000 + 170000) % 170000"
               " - 85000 AS DOUBLE) / 1000.0)")
    od_src = f"""
SELECT user_id, ts, event_id,
       {tile_x_sql(_od_lon, 4)}*16 + {tile_y_sql(_od_lat, 4)} AS tile
FROM events"""
    od_matrix_sql_str = od_matrix_sql(od_src)

    from mvt_wrangler_spark.operators.graph import pagerank_int_sql

    _pr_edges = """
SELECT src, dst FROM (
  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
CROSS JOIN LATERAL (VALUES (c, s), (s, c)) AS t(src, dst)"""
    pagerank_sql_str = pagerank_int_sql(_pr_edges, iters=2)

    from mvt_wrangler_spark.operators.joins import dwithin_join_sql

    def _dw_src(k6: int) -> str:
        return f"""
SELECT CAST(l_orderkey*8 + l_linenumber AS BIGINT) AS id,
       ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 360000 + 360000) % 360000 AS px,
       ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 170000 + 170000) % 170000 AS py
FROM lineitem
WHERE ((l_orderkey + l_linenumber) % 6 + 6) % 6 = {k6}"""

    dwithin_sql_str = dwithin_join_sql(_dw_src(3), _dw_src(4), eps=500)

    from mvt_wrangler_spark.operators.overlay import (
        FLAGS_SQL,
        PROPER_SQL,
        touch_sql,
    )

    # brute-force non-adjacent pair enumeration (no cell bucketing — the
    # bucketed Spark plan is exactly what's under test), same int64
    # orientation polynomials as operators/overlay.py.
    ring_valid = f"""
WITH __v AS (
  SELECT CAST(l_orderkey AS BIGINT) AS gkey,
         CAST(l_linenumber AS BIGINT) AS vord,
         ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS vx,
         ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS vy
  FROM lineitem),
__g AS (SELECT gkey, count(*) AS n FROM __v GROUP BY gkey HAVING count(*) >= 3),
__e AS (
  SELECT v.gkey,
         CAST(row_number() OVER w - 1 AS BIGINT) AS eid,
         vx AS ax, vy AS ay,
         coalesce(lead(vx) OVER w, first_value(vx) OVER wf) AS bx,
         coalesce(lead(vy) OVER w, first_value(vy) OVER wf) AS by
  FROM __v v JOIN __g USING (gkey)
  WINDOW w AS (PARTITION BY v.gkey ORDER BY vord),
         wf AS (PARTITION BY v.gkey ORDER BY vord
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
__p AS (
  SELECT a.gkey, a.ax AS p_ax, a.ay AS p_ay, a.bx AS p_bx, a.by AS p_by,
         b.ax AS q_ax, b.ay AS q_ay, b.bx AS q_bx, b.by AS q_by,
{FLAGS_SQL.format(p='a.', q='b.')}
  FROM __e a JOIN __e b ON a.gkey = b.gkey AND a.eid < b.eid
  JOIN __g g ON g.gkey = a.gkey
  WHERE b.eid - a.eid <> 1 AND NOT (a.eid = 0 AND b.eid = g.n - 1)),
__c AS (
  SELECT gkey,
         CAST(sum(CASE WHEN {PROPER_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
         CAST(sum(CASE WHEN {touch_sql('p_', 'q_')} THEN 1 ELSE 0 END) AS BIGINT) AS n_touch
  FROM __p GROUP BY gkey)
SELECT g.gkey, CAST(g.n AS BIGINT) AS n_edges,
       coalesce(c.n_cross, 0) AS n_cross,
       coalesce(c.n_touch, 0) AS n_touch,
       (coalesce(c.n_cross, 0) + coalesce(c.n_touch, 0)) = 0 AS is_simple
FROM __g g LEFT JOIN __c c USING (gkey)
"""

    # same cell-bucket candidate generation as the Spark plan (equality
    # joins only — a brute n×m inequality join would be a nested loop in
    # DuckDB), exact flags shared via FLAGS_SQL/PROPER_SQL.
    line_cross = f"""
WITH __s AS (
  SELECT CAST(l_orderkey*8 + l_linenumber AS BIGINT) AS id,
         ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS ax,
         ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS ay,
         greatest(0, least(4095,
           ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096
           + ((l_orderkey*131 + CAST(l_linenumber AS BIGINT)*7919) % 129 + 129) % 129 - 64)) AS bx,
         greatest(0, least(4095,
           ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096
           + ((l_orderkey*52379 + CAST(l_linenumber AS BIGINT)*31337) % 129 + 129) % 129 - 64)) AS by
  FROM lineitem),
__a1 AS (SELECT *, unnest(generate_series(least(ax,bx)//64, greatest(ax,bx)//64)) AS cx
         FROM __s WHERE id % 16 = 2),
__a2 AS (SELECT *, unnest(generate_series(least(ay,by)//64, greatest(ay,by)//64)) AS cy
         FROM __a1),
__b1 AS (SELECT *, unnest(generate_series(least(ax,bx)//64, greatest(ax,bx)//64)) AS cx
         FROM __s WHERE id % 16 = 11),
__b2 AS (SELECT *, unnest(generate_series(least(ay,by)//64, greatest(ay,by)//64)) AS cy
         FROM __b1),
__pp AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id,
                a.ax AS p_ax, a.ay AS p_ay, a.bx AS p_bx, a.by AS p_by,
                b.ax AS q_ax, b.ay AS q_ay, b.bx AS q_bx, b.by AS q_by
         FROM __a2 a JOIN __b2 b ON a.cx = b.cx AND a.cy = b.cy),
__f AS (SELECT a_id, b_id,
{FLAGS_SQL.format(p='p_', q='q_')}
        FROM __pp)
SELECT a_id, CAST(count(*) AS BIGINT) AS n_cross
FROM __f WHERE {PROPER_SQL} GROUP BY a_id
"""

    from mvt_wrangler_spark.operators.simplify import simplify_sql

    simplify = f"""
WITH RECURSIVE __v AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS gkey,
         CAST(l_linenumber AS BIGINT) AS seq,
         ((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 4096 + 4096) % 4096 AS x,
         ((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 4096 + 4096) % 4096 AS y
  FROM lineitem),
__vd AS (SELECT gkey,
                row_number() OVER (PARTITION BY gkey ORDER BY seq) - 1 AS i,
                x, y
         FROM __v WHERE gkey IN
         (SELECT gkey FROM __v GROUP BY gkey HAVING count(*) >= 3)),
{simplify_sql('__vd', eps=64)}
SELECT gkey, kept_seq FROM __kept
"""

    tile_shards = f"""
WITH {pts},
__ts AS (SELECT id, {tile_x_sql('lon', 6)} AS x, {tile_y_sql('lat', 6)} AS y,
                ((id * 2654435761) % 8192 + 8192) % 8192 + 1024 AS nbytes
         FROM __pts)
SELECT id, x, y, nbytes,
       coalesce(sum(nbytes) OVER (PARTITION BY x, y ORDER BY id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       // 65536 AS shard
FROM __ts
"""

    from mvt_wrangler_spark.operators.sampling import shard_manifest_sql

    _sm_inner = shard_manifest_sql(
        f"""WITH {pts}
SELECT id, {tile_x_sql('lon', 6)} AS x, {tile_y_sql('lat', 6)} AS y,
       ((id * 2654435761) % 8192 + 8192) % 8192 + 1024 AS nbytes
FROM __pts""",
        ["x", "y"], "nbytes", 65536, id_col="id")
    shard_manifest = (f"SELECT id, x, y, nbytes, shard, seq, byte_start, "
                      f"byte_end FROM ({_sm_inner}) __smf")

    from mvt_wrangler_spark.functions.geocodes import geohash_sql, quadkey_sql

    gh_ctes, gh_last, gh_expr = geohash_sql("lon", "lat", 8, "__pts")
    geocode = (
        "WITH " + ",\n".join([pts] + gh_ctes)
        + f""" SELECT id, {gh_expr} AS geohash,
       {quadkey_sql(tile_x_sql('lon', Z), tile_y_sql('lat', Z), Z)} AS qk
FROM {gh_last}"""
    )

    return {
        "tile_assign": tile_assign,
        "tile_assign_multi": tile_assign_multi,
        "cell_encode": cell_encode,
        "tile_encode": tile_encode,
        "minhash_lsh": minhash_lsh,
        "ngram_jaccard": ngram_jaccard_sql("documents", "doc_id", "text",
                                           shingle=5, threshold=0.8),
        "simhash": simhash,
        "embed_neardup_lsh": embed_lsh,
        "doc_fingerprint": doc_fp,
        "geom_measures": geom_measures,
        "geocode": geocode,
        "cell_cover_join": cell_cover_join,
        "tile_sample": tile_sample,
        "embed_centroids": embed_centroids,
        "clip_tile": clip_tile,
        "simplify": simplify,
        "overzoom": overzoom_sql,
        "mosaic": mosaic_sql,
        "clip_lines": clip_lines,
        "tile_shards": tile_shards,
        "spatial_cluster": spatial_cluster_sql,
        "dataset_split": dataset_split,
        "ring_valid": ring_valid,
        "line_cross": line_cross,
        "boilerplate": boilerplate_sql_str,
        "dwithin_join": dwithin_sql_str,
        "tfidf_topk": tfidf_sql_str,
        "winding": winding,
        "pagerank": pagerank_sql_str,
        "funnel": funnel_sql_str,
        "od_matrix": od_matrix_sql_str,
        "dedup_safe_split": dedup_safe_split,
        "profile": profile_sql_str,
        "sessionize": sessionize,
        "quality_score": quality,
        "distinct_phash": distinct_phash,
        "topk_events": topk_events,
        "embed_neardup": embed_neardup,
        "tile_local": tile_local,
        "archive_roundtrip": archive_roundtrip,
        "pyramid_rollup": pyramid,
        "tile_stats_salted": tile_stats,
        "morans_i": morans,
        "hot_tiles": hot_tiles,
        "tile_smooth": tile_smooth,
        "shard_manifest": shard_manifest,
        "rtree_pack": rtree_pack,
        "rtree_probe": rtree_probe,
        "pip_join": pip_join,
        "pip_join_partitioned": pip_join,
        "intersects_join_partitioned": intersects_join,
        "intersects_join": intersects_join,
        "type_filter": type_filter,
        "knn_join": knn,
        "knn_join_cells": knn,
        "phash_dedup": dedup,
        "pipeline_e2e": pipeline,
        "tag_filter": tag_filter,
        "expr_filter": expr_filter,
        "events_window": events_window,
        "asof_join": asof_join,
        "interval_join": interval_join,
        "docs_exact_dedup": docs_dedup,
        "text_stats": text_stats,
        "lang_id": lang_id,
        "token_count": token_count_sql_str,
        "decontaminate": decontaminate_sql_str,
        "repetition_stats": repetition_stats_sql_str,
        "pii_scrub": pii_scrub_sql_str,
        "blocklist_scrub": blocklist_scrub_sql,
        "curate_e2e": curate_e2e,
        "vocab_topk": vocab_topk_sql("documents", k=100),
        "ann_topk": ann,
        "ann_topk_lsh": ann_lsh,
        "zonal_stats": zonal,
        "thumb_stats": thumb,
        "patch_stats": patch_stats,
        "augment_stats": augment_stats,
        "contour": contour,
        "recon_error": recon_error,
        "hillshade": hillshade,
        "equalize": equalize_sql,
        "phash_neardup": phash_neardup,
        "kmeans_assign": kmeans_sql_oracle,
        "ann_topk_ivf": ann_ivf_oracle,
        "image_ahash_neardup": ahash_neardup,
        "caption_conflicts": caption_conflicts,
        "image_curate_e2e": image_curate_e2e,
        "neardup_clusters": neardup_clusters,
        "tile_quantiles": tile_quantiles,
        "revenue_by_tile": revenue_by_tile,
        "bytes_dedup": bytes_dedup,
    }
