#!/usr/bin/env python
"""Benchmark harness: runs the headline ("bench"-tagged) catalog
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is fully executed via the noop sink (whole plan runs, no
driver collect cost). A warmup query amortizes JVM/codegen startup so
numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reciping_data_pipeline_spark.queries import all_queries
from reciping_data_pipeline_spark.session import get_spark


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _jvm_gc_ms(spark) -> int:
    """Cumulative JVM GC time (ms) across all collectors."""
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _cached_rdd_blocks(spark) -> int:
    """Number of RDDs holding storage (cache/localCheckpoint blocks) —
    the session-pollution signal: checkpoint blocks from earlier
    queries pin executor memory and inflate later timings."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _drain(spark) -> None:
    """Release dead session state between timing units: a Python GC
    drops unreferenced DataFrame handles, a JVM GC lets Spark's
    ContextCleaner unpersist their localCheckpoint RDD blocks. Without
    this, blocks from every prior query accumulate for the whole suite
    (observed r04->r05: every shared query slowed 1.4x median after
    checkpoint-heavy iterative queries joined the suite)."""
    import gc as _gc

    _gc.collect()
    spark._jvm.System.gc()


BENCH_FIXTURE_ROOT = "/tmp/spark_graft_bench_fixtures"


def _cached_fixture(tag: str, **kwargs) -> dict:
    """Seeded fixture cached on disk across bench runs (generation is
    pure-Python and must not be billed to the pipeline timing)."""
    import json as _json

    from reciping_data_pipeline_spark.pipeline import datagen

    root = os.path.join(BENCH_FIXTURE_ROOT, tag)
    meta_path = os.path.join(root, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return _json.load(f)
    fix = datagen.generate_fixture(root, **kwargs)
    fix.pop("users")
    with open(meta_path, "w") as f:
        _json.dump(fix, f)
    return fix


def bench_medallion(spark, analytics_suite: bool = True) -> dict:
    """BASELINE.md BENCH-1/2/3: bulk medallion build (~200k events, the
    reference's 1M-event bulk shape scaled 1:5), the 21-query analytics
    suite over the built Gold tables, and one ~10k-event incremental
    interval (the reference's 15-min SLO unit)."""
    import shutil
    import tempfile
    from datetime import datetime, timedelta

    from reciping_data_pipeline_spark.pipeline import analytics, runner

    out: dict = {}
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    wh_root = tempfile.mkdtemp(prefix="bench_medallion_")
    try:
        # BENCH-1: bulk backfill.
        bulk = _cached_fixture(
            "bulk_v1", seed=101, n_users=12_000, n_days=5, start=datetime(2025, 9, 1)
        )
        wh = os.path.join(wh_root, "wh_bulk")
        t0 = time.perf_counter()
        report = runner.bulk_backfill(
            spark, bulk["staging_dir"], wh, bulk["recipe_master"], datetime(2025, 9, 6),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-07 23:00:00"),
        )
        bulk_sec = round(time.perf_counter() - t0, 3)
        out["bulk_sec"] = bulk_sec
        out["bulk_events"] = report.bronze_rows
        out["bulk_events_per_sec"] = round(report.bronze_rows / bulk_sec, 1)

        # BENCH-2: 21-query analytics suite over the built Gold layer
        # in serving posture (views cached once, 21 queries amortize).
        if analytics_suite:
            analytics.register_gold_views(spark, wh, cache=True)
            t0 = time.perf_counter()
            for name in analytics.all_analytics():
                run_noop(spark.sql(analytics.sql_for(name, min_users=5, start="2025-09-01", end="2025-09-05")))
            out["analytics_21q_sec"] = round(time.perf_counter() - t0, 3)

        # BENCH-3: one ~10k-event incremental 15-min-interval batch.
        inc = _cached_fixture(
            "incr_v1", seed=102, n_users=2_600, n_days=1, start=datetime(2025, 9, 8),
            span_seconds=600,
        )
        t0 = time.perf_counter()
        runner.incremental_run(
            spark, inc["staging_dir"], wh, datetime(2025, 9, 8), datetime(2025, 9, 8) + timedelta(hours=1)
        )
        out["incremental_sec"] = round(time.perf_counter() - t0, 3)
        out["incremental_events"] = inc["n_events"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(wh_root, ignore_errors=True)
    return out


def bench_medallion_snapshot(spark) -> dict:
    """The SAME bulk + incremental medallion build under the
    manifest-committed SnapshotFormat (snapshot isolation, write-time
    column stats) instead of plain partitioned parquet — pins the
    table format's overhead: manifest commits, footer stat capture,
    and manifest-list reads must stay within a small factor of the
    directory-addressed path (VERDICT r04 #7 asks for <= 1.3x)."""
    from reciping_data_pipeline_spark.sources import writers
    from reciping_data_pipeline_spark.sources.snapshots import SnapshotFormat

    prev = writers.set_table_format(SnapshotFormat())
    try:
        return bench_medallion(spark, analytics_suite=False)
    finally:
        writers.set_table_format(prev)


def bench_snapshot_concurrency(spark, n_writers: int = 8, appends_each: int = 4) -> dict:
    """Commit throughput of the snapshot format's optimistic O_EXCL
    loop under contention: N threads append concurrently, every commit
    retries until it serializes. Reports commits/s and the retry count
    (work wasted to races) — the number that decides whether the loop
    needs backoff before anyone scales writer counts (VERDICT r05 #8).
    The race tests prove correctness; this measures the cost."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from reciping_data_pipeline_spark.sources import snapshots, writers
    from reciping_data_pipeline_spark.sources.snapshots import SnapshotFormat

    root = tempfile.mkdtemp(prefix="bench_snap_conc_")
    path = os.path.join(root, "t")
    prev = writers.set_table_format(SnapshotFormat())
    retries0 = snapshots.COMMIT_RETRIES["count"]
    try:
        writers.overwrite_table(
            spark.range(0, 1000).selectExpr("id", "id * 2 AS v"), path
        )

        def appender(i: int) -> None:
            for j in range(appends_each):
                writers.append_table(
                    spark.range(i * 10_000 + j * 100, i * 10_000 + j * 100 + 100)
                    .selectExpr("id", "id * 2 AS v"),
                    path,
                )

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_writers) as ex:
            list(ex.map(appender, range(n_writers)))
        wall = time.perf_counter() - t0
        n_commits = n_writers * appends_each
        final_version = snapshots.load_manifest(path)["version"]
        assert final_version == n_commits + 1, (final_version, n_commits)
        expected = 1000 + n_commits * 100
        assert writers.read_table(spark, path).count() == expected
        return {
            "writers": n_writers,
            "commits": n_commits,
            "wall_sec": round(wall, 3),
            "commits_per_sec": round(n_commits / wall, 1),
            "race_retries": snapshots.COMMIT_RETRIES["count"] - retries0,
        }
    finally:
        writers.set_table_format(prev)
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    bench_queries = {n: q for n, q in sorted(registry.items()) if "bench" in q.tags}

    # Pass 1 (untimed warm-up): JVM JIT, parquet footer caches, codegen
    # compilation, Python worker pool fork + numpy imports. Pass 2 is
    # the reported steady-state timing — the regime a long-running
    # cluster job operates in; cold_total records pass 1 for honesty.
    t0 = time.perf_counter()
    for q in bench_queries.values():
        run_noop(q.fn(spark, sf_dir))
    cold_total = round(time.perf_counter() - t0, 3)

    # Median of 3 timed passes per query: single-pass numbers on shared
    # hardware fluctuate up to ~2x, which falsely trips cross-round
    # regression thresholds; the median is robust to one noisy pass.
    # Per query we also record the JVM GC time its passes incurred and
    # the cached-RDD-block count at its start (session-pollution
    # telemetry), and drain dead checkpoint blocks between queries.
    _drain(spark)
    timings: dict[str, float] = {}
    gc_ms: dict[str, int] = {}
    rdd_blocks: dict[str, int] = {}
    for name, q in bench_queries.items():
        rdd_blocks[name] = _cached_rdd_blocks(spark)
        gc0 = _jvm_gc_ms(spark)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_noop(q.fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(sorted(samples)[1], 3)
        gc_ms[name] = _jvm_gc_ms(spark) - gc0
        _drain(spark)

    total = round(sum(timings.values()), 3)
    # Median of 3 medallion runs as well: the bulk build fluctuated
    # 13-24 s across same-code runs on this machine (page cache / JVM
    # contention), more than any real cross-round change.
    runs = [bench_medallion(spark) for _ in range(3)]
    medallion = {
        k: (sorted(r[k] for r in runs)[1] if isinstance(runs[0][k], float) else runs[0][k])
        for k in runs[0]
    }
    medallion["bulk_events_per_sec"] = round(
        medallion["bulk_events"] / medallion["bulk_sec"], 1
    )
    # Snapshot-format medallion: median-of-3 like the parquet block so
    # the <=1.3x format-overhead comparison isn't decided by one noisy
    # pass (bulk fluctuates up to ~2x on this shared machine).
    snap_runs = [bench_medallion_snapshot(spark) for _ in range(3)]
    medallion_snapshot = {
        k: (sorted(r[k] for r in snap_runs)[1] if isinstance(snap_runs[0][k], float) else snap_runs[0][k])
        for k in snap_runs[0]
    }
    medallion_snapshot["bulk_events_per_sec"] = round(
        medallion_snapshot["bulk_events"] / medallion_snapshot["bulk_sec"], 1
    )
    snapshot_concurrency = bench_snapshot_concurrency(spark)
    # Fresh-session control for the queries that drifted worst between
    # BENCH_r04 and BENCH_r05: re-time them in a brand-new SparkSession
    # AFTER the whole suite. In-suite time >> fresh time ⇒ the drift is
    # session pollution (accumulated state, GC, code cache), not a plan
    # regression.
    sentinels = [
        "doc_minhash_lsh_pairs",
        "user_timeseries_similarity",
        "doc_exact_dedup",
        "embed_ivf_ann",
    ]
    spark.stop()
    spark = get_spark(app_name="bench_fresh")
    spark.sparkContext.setLogLevel("ERROR")
    fresh: dict[str, float] = {}
    for name in sentinels:
        if name not in bench_queries:
            continue
        q = bench_queries[name]
        run_noop(q.fn(spark, sf_dir))  # warm-up (JIT/codegen/footers)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_noop(q.fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        fresh[name] = round(sorted(samples)[1], 3)

    rc, regressions = _regression_gate(
        timings, sf=float(sf) if sf.replace(".", "").isdigit() else sf
    )
    full_payload = {
        "metric": "catalog_bench_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "gc_ms": gc_ms,
        "rdd_blocks": rdd_blocks,
        "fresh_session": fresh,
        "regressions": regressions,
        "cold_total_sec": cold_total,
        "medallion": medallion,
        "medallion_snapshot": medallion_snapshot,
        "snapshot_concurrency": snapshot_concurrency,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver keeps only the LAST ~2000 chars of stdout; BENCH_r06
    # shipped with parsed=null because the full payload straddled that
    # tail. Persist everything to a file, then print ONE compact final
    # line guaranteed to fit the driver's tail. If even the per-query
    # map would overflow, it degrades to a pointer.
    #
    # Two files (VERDICT r11): `BENCH_FULL_latest.json` is a gitignored
    # moving pointer (every run — builder or driver — overwrites it,
    # which used to leave a committed file perpetually dirty), and a
    # run-stamped `BENCH_FULL_run_<utc>.json` (also ignored) that no
    # later run can overwrite. The artifact of record is the builder's
    # chosen stamped payload committed as `BENCH_FULL_r<N>.json` at
    # round close — immutable under driver re-runs.
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_FULL_latest.json")
    with open(full_path, "w") as f:
        json.dump(full_payload, f, indent=1)
    stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    stamped_path = os.path.join(here, f"BENCH_FULL_run_{stamp}.json")
    with open(stamped_path, "w") as f:
        json.dump(full_payload, f, indent=1)
    compact = {
        "metric": "catalog_bench_suite",
        "value": total,
        "unit": "sec",
        "queries": {n: round(s, 2) for n, s in timings.items()},
        "regressions": {n: r["ratio"] for n, r in regressions.items()},
        "medallion": {
            "bulk_sec": medallion["bulk_sec"],
            "bulk_events_per_sec": medallion["bulk_events_per_sec"],
            "incremental_sec": medallion["incremental_sec"],
            "analytics_21q_sec": medallion.get("analytics_21q_sec"),
        },
        "full": "BENCH_FULL_latest.json",
        "sf": full_payload["sf"],
    }
    # The driver parses THIS line for its per-query PERF comparison and
    # cannot read repo files — in r14 the 54-query map crossed the
    # 1800-char guard and degraded to a {"see": ...} pointer, which
    # emptied PERF's per_query/geomean/scaling (VERDICT r14 #2). Keep
    # the queries map alive by degrading optional detail first: drop
    # the regression ratios to a count, then coarsen query timings to
    # 1 dp (the gate's sub-second exemption makes 0.1 s resolution
    # sufficient for cross-round comparison). The pointer fallback
    # stays only as a never-expected last resort.
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact["regressions"] = {"n": len(regressions)}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact["queries"] = {n: round(s, 1) for n, s in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact["queries"] = {"see": "BENCH_FULL_latest.json"}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    sys.exit(rc)


def _regression_gate(
    timings: dict[str, float], sf=None, threshold: float = 1.5
) -> tuple[int, dict]:
    """Compare this run's per-query medians to the most recent committed
    BENCH_r*.json that actually carries a per-query map at the same
    scale factor (r06's artifact was tail-truncated to parsed=null, so
    the gate walks backwards instead of silently no-opping). A shared
    query slower than ``threshold``x its prior value fails the bench
    (non-zero rc) unless BENCH_NOTES.md waives it STRUCTURALLY — a
    line ``waived: <name> — <reason>``. Substring prose matches do not
    count (a note about `doc_exact_dedup_v2` must not waive
    `doc_exact_dedup`). Absolute guard: sub-second queries are exempt —
    at that size the ratio is measurement noise, not a plan change."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    prior_files = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    prior: dict[str, float] = {}
    for path in reversed(prior_files):
        try:
            with open(path) as f:
                raw = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        parsed = raw.get("parsed") or raw
        if not isinstance(parsed, dict) or not parsed.get("queries"):
            continue
        if sf is not None and parsed.get("sf") != sf:
            continue  # different scale factor: ratios are meaningless
        # r13+ compact artifacts carry a {"see": "BENCH_FULL_..."}
        # pointer instead of the per-query map; accepting it as prior
        # would silently no-op the gate (zero shared names). Only a
        # map with real numeric timings counts; the pointer's target
        # is resolved from the committed BENCH_FULL_r<N>.json sibling.
        qmap = {
            k: v
            for k, v in parsed["queries"].items()
            if isinstance(v, (int, float))
        }
        if not qmap:
            n = re.search(r"r(\d+)", os.path.basename(path)).group(1)
            sib = os.path.join(here, f"BENCH_FULL_r{n}.json")
            try:
                with open(sib) as f:
                    fraw = json.load(f)
                qmap = {
                    k: v
                    for k, v in (fraw.get("queries") or {}).items()
                    if isinstance(v, (int, float))
                }
            except (json.JSONDecodeError, OSError):
                qmap = {}
            if not qmap:
                continue
        prior = qmap
        break
    if not prior:
        return 0, {}
    waived_names: set[str] = set()
    notes_path = os.path.join(here, "BENCH_NOTES.md")
    if os.path.exists(notes_path):
        with open(notes_path) as f:
            for line in f:
                m = re.match(r"\s*[-*]?\s*waived:\s*`?([\w.]+)`?", line)
                if m:
                    waived_names.add(m.group(1))
    regressions: dict[str, dict] = {}
    rc = 0
    for name, sec in timings.items():
        prev = prior.get(name)
        if not prev or prev <= 0:
            continue
        ratio = sec / prev
        if ratio > threshold and sec >= 1.0:
            waived = name in waived_names
            regressions[name] = {
                "prior_sec": prev,
                "sec": sec,
                "ratio": round(ratio, 2),
                "waived_by_note": waived,
            }
            if not waived:
                rc = 1
    return rc, regressions


if __name__ == "__main__":
    main()
