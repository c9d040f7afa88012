"""Zonal assignment, metrics/lineage, streaming shape, CLI, dedup variants."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import metrics as M
from mvt_wrangler_spark.functions import tiling
from mvt_wrangler_spark.operators import dedup as D
from mvt_wrangler_spark.operators import zonal as Z
from mvt_wrangler_spark.sources import images as I


@pytest.mark.spark
def test_zonal_stats_matches_numpy(spark):
    df = I.synthetic_images(spark, 60, with_pixels=True, partitions=2)
    assigned = tiling.assign_tiles(df, z=10, with_local=False)
    out = Z.zonal_stats(assigned, gx=2, gy=2).collect()
    assert len(out) == 60 * 4
    by_key = {(r.image_id, r.zone): r for r in out}
    rows = {r.image_id: r for r in assigned.collect()}
    for i in (1, 2, 17, 34):
        rid = f"img{i:09d}"
        r = rows[rid]
        px = I.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        counts, means = Z._block_reduce(px, 2, 2)
        for zidx in range(4):
            got = by_key[(rid, zidx)]
            assert got.n_px == counts[zidx]
            assert abs(got.mean_r - means[zidx, 0]) < 1e-9
            assert (got.z, got.x, got.y) == (r.z, r.x, r.y)
    # pixel conservation: zones partition the image exactly
    for rid, r in rows.items():
        tot = sum(by_key[(rid, zz)].n_px for zz in range(4))
        assert tot == r.w * r.h


@pytest.mark.spark
def test_dedup_agg_matches_window(spark):
    df = I.synthetic_images(spark, 400, with_pixels=False, partitions=2)
    a = tiling.assign_tiles(df, z=6, with_local=False)
    win = {(r.z, r.x, r.y, r.phash): r.image_id
           for r in D.phash_dedup(a).select("z", "x", "y", "phash", "image_id").collect()}
    agg = {(r.z, r.x, r.y, r.phash): r.keeper_image_id
           for r in D.phash_dedup_agg(a).collect()}
    assert win == agg


@pytest.mark.spark
def test_observed_metrics_and_lineage(spark):
    df = I.synthetic_images(spark, 300, with_pixels=False, partitions=3)
    a = tiling.assign_tiles(df, z=4, with_local=False)
    # DISTINCT aggregates are disallowed in observed metrics -> approx sketch
    obs_df, obs = M.observed(a, "m", rows=F.count(F.lit(1)),
                             tiles=F.approx_count_distinct("tile_id"))
    n = obs_df.count()
    assert obs.get["rows"] == n == 300
    assert obs.get["tiles"] > 1
    lin = M.tile_lineage(a).collect()
    assert sum(r.n_rows for r in lin) == 300
    assert all(r.partition_id >= 0 for r in lin)


@pytest.mark.spark
def test_streaming_windowed_counts(spark, tmp_path):
    """Run the streaming agg via a rate-less memory stream: batch-parity check."""
    from mvt_wrangler_spark.streaming.stream import snapshot_sink, windowed_tile_counts

    src = str(tmp_path / "src")
    df = I.synthetic_images(spark, 200, with_pixels=False, partitions=2).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.xxhash64("image_id") % 7200))
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = windowed_tile_counts(stream, z=4, ts_col="ts", window="1 hour")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("tile_counts").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_rows) AS s FROM tile_counts").collect()[0].s
    assert got == 200
    # batch parity
    batch = (tiling.assign_tiles(spark.read.parquet(src), z=4)
             .groupBy(F.window("ts", "1 hour"), "z", "x", "y")
             .agg(F.count(F.lit(1)).alias("n_rows")))
    want = {(r["window"].start, r.z, r.x, r.y): r.n_rows for r in batch.collect()}
    rows = spark.sql("SELECT * FROM tile_counts").collect()
    got_map = {(r.window_start, r.z, r.x, r.y): r.n_rows for r in rows}
    assert got_map == want


def test_cli_end_to_end(tmp_path):
    """Drive the real CLI surface in a subprocess (fresh JVM)."""
    src = tmp_path / "in.parquet"
    out = tmp_path / "out"
    prog = tmp_path / "filter.geojson"
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from mvt_wrangler_spark.session import get_spark\n"
        "from mvt_wrangler_spark.sources import images as I\n"
        "s = get_spark(master='local[4]', shuffle_partitions=8)\n"
        f"I.synthetic_images(s, 400, with_pixels=False, partitions=2).write.parquet('{src}')\n"
        "s.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True, timeout=300)
    from mvt_wrangler_spark.sources.fixtures import default_filter_geojson

    prog.write_text(json.dumps(default_filter_geojson()))
    r = subprocess.run(
        [sys.executable, "-m", "mvt_wrangler_spark.cli", str(src), str(out),
         "--filter", str(prog), "--zoom", "8", "--buckets", "4",
         "--master", "local[4]", "-n", "testset", "--job-id", "t1"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows_out"] > 0 and summary["snapshot"] == 1
    meta = json.loads((out / "metadata.json").read_text())
    assert meta["name"] == "testset" and meta["zoom"] == 8
    assert (out / "CURRENT").read_text().strip() == "1"
    assert (out / "stats").exists() and (out / "pyramid").exists()


def test_cli_rejects_missing_input(tmp_path):
    from mvt_wrangler_spark.cli import main

    assert main(["/nonexistent/x.parquet", str(tmp_path / "o")]) == 2


def test_with_global_rank_matches_global_window(spark):
    """with_global_rank == a plain global-window row_number on random data,
    and its plan contains no single-partition Exchange feeding the data-side
    window (the P-row offset table is the only globally-ordered piece)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mvt_wrangler_spark.functions.metrics import with_global_rank

    rng = np.random.default_rng(3)
    rows = [(int(a), int(i)) for i, a in enumerate(rng.integers(0, 50, 4000))]
    df = spark.createDataFrame(rows, "v long, id long")

    got = with_global_rank(df, ["v", "id"], num_partitions=8)
    want = df.withColumn("rn", F.row_number().over(
        Window.orderBy("v", "id")).cast("long"))
    assert got.select("v", "id", "rn").subtract(want).count() == 0
    assert want.subtract(got.select("v", "id", "rn")).count() == 0

    # the range-partitioned frame is PINNED (localCheckpoint) so the offset
    # aggregate and the final join provably read the same partitioning —
    # range boundaries come from sampling, and exchange-reuse recomputation
    # would otherwise silently misalign offsets vs local ranks. The final
    # plan therefore reads the checkpointed RDD; the range exchange lives in
    # the checkpoint job, and no data-side SinglePartition funnel remains.
    plan = got._jdf.queryExecution().executedPlan().toString().lower()
    assert "existingrdd" in plan
    # exactly ONE SinglePartition exchange: the P-row offset table's window
    # (input-size independent); the data rows join it via broadcast
    assert plan.count("singlepartition") == 1
    assert "broadcast" in plan


@pytest.mark.spark
def test_asof_join_semantics(spark):
    """Backward as-of: inclusive ties, LEFT semantics, deterministic dup
    winner (max value struct), NULL-time rows never match."""
    from pyspark.sql import functions as F

    from mvt_wrangler_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (1, 20, 250.0),  # dup (key, t)
         (2, 50, 900.0)],
        "k long, t long, v double")
    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 1, 20), (4, 1, 25),
         (5, 2, 49), (6, 2, 50), (7, 3, 99), (8, 1, None)],
        "id long, k long, t long")
    out = {r.id: r.v_r for r in
           asof_join(left, right, on="k", left_time="t", right_time="t",
                     value_cols=["v"]).collect()}
    assert out[1] is None          # before any right row
    assert out[2] == 100.0         # inclusive >= at t=10
    assert out[3] == 250.0         # dup (1,20): max struct wins
    assert out[4] == 250.0
    assert out[5] is None
    assert out[6] == 900.0         # inclusive tie
    assert out[7] is None          # key with no right rows at all
    assert out[8] is None          # NULL left time matches nothing

    # multiple value columns ride one struct; row count preserved (LEFT)
    r2 = right.withColumn("w", F.col("v") * 2)
    got = asof_join(left, r2, on="k", left_time="t", right_time="t",
                    value_cols=["v", "w"])
    assert got.count() == left.count()
    row = {r.id: (r.v_r, r.w_r) for r in got.collect()}[3]
    assert row == (250.0, 500.0)

    # plan shape: ONE key-partitioned window, no SinglePartition funnel,
    # no join node at all
    plan = got._jdf.queryExecution().executedPlan().toString().lower()
    assert "singlepartition" not in plan
    assert "sortmergejoin" not in plan and "broadcasthashjoin" not in plan


@pytest.mark.spark
def test_interval_join_matches_bruteforce(spark):
    """Bucketed interval join == brute-force range predicate, including
    boundary-equal points, negative values, and bucket-edge values."""
    import random

    from mvt_wrangler_spark.operators.joins import interval_join

    rng = random.Random(11)
    pts = [(i, rng.randint(-500, 500)) for i in range(400)]
    pts += [(1000, -100), (1001, 0), (1002, 100)]  # exact bucket edges
    ivs = []
    for j in range(120):
        s = rng.randint(-500, 450)
        ivs.append((j, s, s + rng.randint(0, 80)))
    ivs += [(900, -100, -100), (901, 0, 0), (902, 99, 100)]  # degenerate + edge
    p = spark.createDataFrame(pts, "pid long, t long")
    iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    got = {(r.pid, r.iid) for r in interval_join(
        p, iv, point_col="t", start_col="lo", end_col="hi",
        bucket_width=50).collect()}
    want = {(pid, iid) for pid, t in pts for iid, lo, hi in ivs if lo <= t <= hi}
    assert got == want and len(want) > 500


@pytest.mark.spark
def test_interval_join_overflow_modes(spark):
    from mvt_wrangler_spark.operators.joins import interval_join

    p = spark.createDataFrame([(i, i * 10) for i in range(50)], "pid long, t long")
    iv = spark.createDataFrame(
        [(0, 40, 60), (1, -10_000, 10_000)], "iid long, lo long, hi long")
    # error mode: the wide interval (2001 buckets at width 10) trips the cap
    bad = interval_join(p, iv, point_col="t", start_col="lo", end_col="hi",
                        bucket_width=10, max_buckets_per_interval=100)
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        bad.collect()
    # broadcast mode: wide interval routed through the broadcast arm, exact
    got = {(r.pid, r.iid) for r in interval_join(
        p, iv, point_col="t", start_col="lo", end_col="hi", bucket_width=10,
        max_buckets_per_interval=100, overflow="broadcast").collect()}
    want = {(pid, iid) for pid in range(50) for iid, lo, hi in
            [(0, 40, 60), (1, -10_000, 10_000)] if lo <= pid * 10 <= hi}
    assert got == want
    # every point matches the global interval
    assert sum(1 for _, iid in got if iid == 1) == 50


def test_interval_join_rejects_bad_args(spark):
    from mvt_wrangler_spark.operators.joins import interval_join

    p = spark.createDataFrame([(1, 2)], "a long, t long")
    iv = spark.createDataFrame([(1, 2, 3)], "a long, lo long, hi long")
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(p, iv, point_col="t", start_col="lo", end_col="hi",
                      bucket_width=10)
    iv2 = spark.createDataFrame([(1, 2, 3)], "iid long, lo long, hi long")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(p, iv2, point_col="t", start_col="lo", end_col="hi",
                      bucket_width=0)


@pytest.mark.spark
def test_interval_join_null_endpoints_dropped(spark):
    """NULL-endpoint intervals never match and must NOT trip the cap guard
    (assert_true raises on NULL comparisons if they reach it)."""
    from mvt_wrangler_spark.operators.joins import interval_join

    p = spark.createDataFrame([(1, 50), (2, None)], "pid long, t long")
    iv = spark.createDataFrame(
        [(0, 40, 60), (1, None, 60), (2, 40, None), (3, None, None)],
        "iid long, lo long, hi long")
    got = {(r.pid, r.iid) for r in interval_join(
        p, iv, point_col="t", start_col="lo", end_col="hi",
        bucket_width=10, max_buckets_per_interval=5).collect()}
    assert got == {(1, 0)}


def test_morans_i_matches_bruteforce(spark):
    """Operator output equals the textbook double-loop formula, and the
    sign behaves: clustered grid -> positive, checkerboard -> negative."""
    from mvt_wrangler_spark.operators.rollup import morans_i

    def brute(cells):
        n = len(cells)
        m = sum(c for _, _, c in cells) / n
        num = den = s0 = 0
        for (x1, y1, c1) in cells:
            den += (c1 - m) ** 2
            for (x2, y2, c2) in cells:
                if (x1, y1) != (x2, y2) and abs(x1 - x2) <= 1 and abs(y1 - y2) <= 1:
                    num += (c1 - m) * (c2 - m)
                    s0 += 1
        return n, s0, (n / s0) * num / den

    def run(cells):
        df = spark.createDataFrame(cells, "x int, y int, cnt long")
        r = morans_i(df).collect()[0]
        return r["n_tiles"], r["s0"], r["morans_i"]

    # clustered: a hot 2x2 block inside a cold 4x4 grid
    clustered = [(x, y, 100 if x < 2 and y < 2 else 1)
                 for x in range(4) for y in range(4)]
    n, s0, i_ref = brute(clustered)
    ng, s0g, ig = run(clustered)
    assert (ng, s0g) == (n, s0)
    assert abs(ig - i_ref) < 1e-6 and ig > 0

    # checkerboard: alternating high/low -> negative autocorrelation
    checker = [(x, y, 10 if (x + y) % 2 == 0 else 1)
               for x in range(4) for y in range(4)]
    n, s0, i_ref = brute(checker)
    ng, s0g, ig = run(checker)
    assert (ng, s0g) == (n, s0)
    assert abs(ig - i_ref) < 1e-6 and ig < 0

    # constant field: denominator 0 -> null, not a crash
    flat = [(x, y, 5) for x in range(3) for y in range(3)]
    assert run(flat)[2] is None


def test_getis_ord_gi_matches_bruteforce(spark):
    """Gi* per tile equals the textbook formula; the hot block scores the
    highest z and cold corners score negative."""
    import math

    from mvt_wrangler_spark.operators.rollup import getis_ord_gi

    cells = [(x, y, 100 if x < 2 and y < 2 else 1)
             for x in range(5) for y in range(5)]
    df = spark.createDataFrame(cells, "x int, y int, cnt long")
    got = {(r["x"], r["y"]): r for r in getis_ord_gi(df).collect()}

    n = len(cells)
    t = sum(c for _, _, c in cells)
    q = sum(c * c for _, _, c in cells)
    m = t / n
    s = math.sqrt(q / n - m * m)
    by_xy = {(x, y): c for x, y, c in cells}
    for (x, y, c) in cells:
        hood = [by_xy[(x + dx, y + dy)] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (x + dx, y + dy) in by_xy]
        w = len(hood)
        den = s * math.sqrt((n * w - w * w) / (n - 1))
        ref = (sum(hood) - m * w) / den
        r = got[(x, y)]
        assert r["w_i"] == w
        assert abs(r["gi_star"] - ref) < 1e-6, (x, y)
    assert got[(0, 0)]["gi_star"] == max(r["gi_star"] for r in got.values())
    assert got[(4, 4)]["gi_star"] < 0


def test_funnel_greedy_first_match(spark):
    """Greedy semantics: step i matches the EARLIEST event strictly after
    step i-1's match; interleaved other events are ignored; a user whose
    purchase precedes every click does not convert; same-timestamp ties
    resolve by event_id."""
    from datetime import datetime, timezone

    from mvt_wrangler_spark.operators.events import funnel

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    rows = [
        # user 1: view(1) click(3) purchase(5), noise interleaved -> converts
        (101, t(1), 1, "view"), (102, t(2), 1, "error"),
        (103, t(3), 1, "click"), (104, t(4), 1, "view"),
        (105, t(5), 1, "purchase"),
        # user 2: purchase BEFORE any click -> reached 2 (view, click), no conv
        (201, t(1), 2, "purchase"), (202, t(2), 2, "view"),
        (203, t(3), 2, "click"),
        # user 3: view then two clicks — greedy takes the EARLIER click
        (301, t(1), 3, "view"), (302, t(2), 3, "click"),
        (303, t(4), 3, "click"), (304, t(5), 3, "purchase"),
        # user 4: same-ts tie — click at ts 1 with ids 402 < 403; both after
        # view id 400 at the same micros? view ts(0), clicks at t(1)
        (400, t(0), 4, "view"), (403, t(1), 4, "click"), (402, t(1), 4, "click"),
        (404, t(2), 4, "purchase"),
        # user 5: never views -> absent
        (501, t(1), 5, "click"), (502, t(2), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.user_id: r for r in
           funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].converted is True and got[1].reached == 3
    assert got[1].dur_us == 4_000_000
    assert got[2].converted is False and got[2].reached == 2
    assert got[2].t3_us is None and got[2].dur_us is None
    assert got[3].t2_us == got[3].t1_us + 1_000_000  # earlier click chosen
    assert got[4].t2_us is not None and got[4].converted is True


def test_od_matrix_hand_computed(spark):
    from datetime import datetime, timezone

    from mvt_wrangler_spark.operators.events import od_matrix

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    rows = [
        # user 1 path: A -> B -> B -> A  => (A,B) (B,B) (B,A)
        (1, t(0), 1, "A"), (2, t(1), 1, "B"), (3, t(2), 1, "B"), (4, t(3), 1, "A"),
        # user 2 path: A -> B  => (A,B)  (cross-user transitions never counted)
        (5, t(0), 2, "A"), (6, t(1), 2, "B"),
        # user 3: single event -> no transition
        (7, t(0), 3, "C"),
        # user 4: same-ts tie, event_id order decides: B(id 8) then A(id 9)
        (8, t(5), 4, "B"), (9, t(5), 4, "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, tile string")
    got = {(r.tile_from, r.tile_to): r.n_trips for r in od_matrix(df).collect()}
    assert got == {("A", "B"): 2, ("B", "B"): 1, ("B", "A"): 2}
    got2 = {(r.tile_from, r.tile_to): r.n_trips
            for r in od_matrix(df, drop_self_loops=True).collect()}
    assert ("B", "B") not in got2 and got2[("A", "B")] == 2


def test_profile_hand_computed(spark):
    from mvt_wrangler_spark.operators.profile import profile

    rows = [(1, "a"), (2, None), (2, "b"), (None, "a")]
    df = spark.createDataFrame(rows, "k long, s string")
    got = {r.column: r for r in profile(df, ["k", "s"]).collect()}
    assert (got["k"].n, got["k"].n_null, got["k"].n_distinct) == (4, 1, 2)
    assert (got["k"].min_s, got["k"].max_s) == ("1", "2")
    assert (got["s"].n, got["s"].n_null, got["s"].n_distinct) == (4, 1, 2)
    assert (got["s"].min_s, got["s"].max_s) == ("a", "b")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        profile(df.withColumn("f", df.k * 1.5), ["f"])


def test_sessionize_matches_native_session_window(spark):
    """Cross-validate the engine's lag+cumsum sessionization against
    Spark's built-in session_window (gap-merged sessions): same session
    count, same per-session event counts and start times at sf0.001."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    ours = {(r.user_id, r.session_start): r.n_events
            for r in e.q_sessionize(spark, "/root/testdata/sf0.001").collect()}
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    native = {(r.user_id, r.start): r.n
              for r in (ev.groupBy("user_id",
                                   F.session_window(F.col("ts").cast("timestamp"),
                                                    "30 minutes").alias("w"))
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.min("ts").alias("start"))
                        .select("user_id", "start", "n")).collect()}
    assert ours == native and len(ours) > 100


def test_tile_smooth_separable_equals_dense_kernel(spark):
    """The two-pass separable convolution equals the dense 5x5 binomial
    kernel applied by brute force over an implicit zero grid."""
    from collections import defaultdict

    from mvt_wrangler_spark.operators.rollup import _BINOM5, tile_smooth

    rows = [(10, 10, 7), (11, 10, 3), (13, 12, 1), (0, 0, 5)]
    expected = defaultdict(int)
    for x, y, c in rows:
        for dx, wx in zip((-2, -1, 0, 1, 2), _BINOM5):
            for dy, wy in zip((-2, -1, 0, 1, 2), _BINOM5):
                expected[(x + dx, y + dy)] += c * wx * wy
    df = spark.createDataFrame(rows, "x long, y long, cnt long")
    got = {(r.x, r.y): r.smooth for r in tile_smooth(df).collect()}
    assert got == dict(expected)
    # kernel mass conservation: total smooth = 256 * total count
    assert sum(got.values()) == 256 * sum(c for _, _, c in rows)


def test_pack_rtree_leaves_properties(spark):
    """Every leaf except the last holds exactly leaf_size features; MBRs
    contain all member bboxes; ordering follows the spatial key; packing
    matches a brute-force sorted replica."""
    import random

    from mvt_wrangler_spark.operators.index import pack_rtree_leaves

    rng = random.Random(3)
    rows = []
    for i in range(1000):
        x, y = rng.randrange(0, 10000), rng.randrange(0, 10000)
        w, h = rng.randrange(1, 50), rng.randrange(1, 50)
        key = (x // 100) * 1000 + y // 100  # coarse spatial key
        rows.append((i, key, x - w, y - h, x + w, y + h))
    df = spark.createDataFrame(
        rows, "id long, tile_id long, minx long, miny long, maxx long, maxy long")
    B = 64
    got = {r.leaf: r for r in pack_rtree_leaves(df, leaf_size=B).collect()}
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    for leaf, r in got.items():
        members = srt[leaf * B:(leaf + 1) * B]
        assert r.n == len(members)
        assert r.minx == min(m[2] for m in members)
        assert r.miny == min(m[3] for m in members)
        assert r.maxx == max(m[4] for m in members)
        assert r.maxy == max(m[5] for m in members)
    assert sorted(got) == list(range((1000 + B - 1) // B))
    assert all(got[leaf].n == B for leaf in range(1000 // B))


def test_rtree_probe_equals_direct_scan_and_prunes(spark):
    import random

    from mvt_wrangler_spark.operators.index import (assign_rtree_leaves,
                                                    rtree_probe)

    rng = random.Random(9)
    rows = []
    for i in range(800):
        x, y = rng.randrange(0, 10000), rng.randrange(0, 10000)
        w, h = rng.randrange(1, 40), rng.randrange(1, 40)
        rows.append((i, (x // 100) * 1000 + y // 100,
                     x - w, y - h, x + w, y + h))
    df = spark.createDataFrame(
        rows, "id long, tile_id long, minx long, miny long, maxx long, maxy long")
    q = (2000, 3000, 3500, 4500)
    got = {r.id for r in rtree_probe(df, leaf_size=32, qbox=q).collect()}
    direct = {i for (i, _, mnx, mny, mxx, mxy) in rows
              if mnx <= q[2] and mxx >= q[0] and mny <= q[3] and mxy >= q[1]}
    assert got == direct and len(direct) > 5
    # the index actually prunes: surviving leaves < total leaves
    assigned = assign_rtree_leaves(df, 32)
    hit_leaves = {r.leaf for r in assigned.collect() if r.id in direct}
    all_leaves = {r.leaf for r in assigned.collect()}
    assert len(hit_leaves) < len(all_leaves)


@pytest.mark.spark
def test_pyramid_rollup_single_agg_equals_per_level_chain(spark):
    """Pin the r07 explode + one-groupBy internals of pyramid_rollup
    against the straightforward per-level aggregation it replaced —
    random multi-column integer base, every level compared exactly."""
    from mvt_wrangler_spark.operators import rollup as R

    rng = np.random.default_rng(7)
    base_z = 5
    rows = [(int(base_z), int(x), int(y), int(n), int(b))
            for x, y, n, b in zip(
                rng.integers(0, 1 << base_z, 300),
                rng.integers(0, 1 << base_z, 300),
                rng.integers(1, 1000, 300),
                rng.integers(0, 10**9, 300))]
    # unique per tile, like the per-tile stats contract
    seen, uniq = set(), []
    for r in rows:
        if (r[1], r[2]) not in seen:
            seen.add((r[1], r[2]))
            uniq.append(r)
    base = spark.createDataFrame(
        uniq, "z int, x long, y long, n_rows long, bytes_in long")
    got = {(r.z, r.x, r.y): (r.n_rows, r.bytes_in)
           for r in R.pyramid_rollup(base, base_z=base_z, min_z=0).collect()}
    want = {}
    for z, x, y, n, b in uniq:
        for z2 in range(base_z, -1, -1):
            d = base_z - z2
            key = (z2, x >> d, y >> d)
            n0, b0 = want.get(key, (0, 0))
            want[key] = (n0 + n, b0 + b)
    assert got == want
