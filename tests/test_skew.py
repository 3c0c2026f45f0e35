"""Salted-join equivalence + skew distribution."""

from __future__ import annotations

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.operators.skew import salted_inner_join


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rval"))
    plain = left.join(right, on="k")
    salted = salted_inner_join(left, right, on="k", salt_factor=8)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum(F.col("lval") + F.col("rval"))).collect()[0][0]
    b = salted.agg(F.sum(F.col("lval") + F.col("rval"))).collect()[0][0]
    assert a == b


def test_sequence_packing_shard_fans_out_single_source(spark):
    """A corpus that is 100% one source must fan the packing window out
    across n_buckets groups (per-bucket packing, not one serial task),
    and sharding must preserve the doc/token totals exactly."""
    from reciping_data_pipeline_spark.queries.corpusops import pack_sequences

    docs = spark.range(0, 5_000).select(
        F.lit("webcrawl").alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 300 + 1).alias("n_tok"),
    )
    packed = pack_sequences(docs, n_buckets=8)
    # window partition key includes the bucket: >= 8 distinct groups
    assert packed.select("bucket").distinct().count() == 8
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan and "Window" in plan
    # sharding redistributes docs among bins; totals are invariant
    unsharded = pack_sequences(docs)
    row = lambda df: df.agg(  # noqa: E731
        F.sum("n_docs").alias("docs"), F.sum("bin_tokens").alias("toks")
    ).collect()[0]
    assert tuple(row(packed)) == tuple(row(unsharded))


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 512-vertex path graph (diameter 511) must converge via pointer
    doubling in ~log2(n) rounds, not O(n), and label every vertex with
    the global min."""
    from reciping_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.range(0, 511).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats: dict = {}
    comp = connected_components(edges, max_iter=15, stats=stats)
    rows = comp.collect()
    assert len(rows) == 512
    assert {r["component"] for r in rows} == {0}
    assert stats["converged"] and stats["rounds"] <= 12


def test_connected_components_random_graph_matches_union_find(spark):
    """r14 round fusion pin: the single-join round (graph edges and
    pointer edges unioned before one shuffle join, replacing the
    two-join round) must still compute exact components — checked
    value-for-value against a driver-side union-find on a seeded
    random graph with multiple components, cycles, and isolated-ish
    chains."""
    import random

    from reciping_data_pipeline_spark.operators.dedup import connected_components

    rng = random.Random(1234)
    n = 400
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    pairs = [(a, b) for a, b in pairs if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # expected: min member id per component, only for vertices with edges
    touched = sorted({v for p in pairs for v in p})
    comp_min: dict[int, int] = {}
    for v in touched:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in touched}

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == expected


def test_connected_components_raises_without_convergence(spark):
    from reciping_data_pipeline_spark.operators.dedup import connected_components

    import pytest as _pytest

    edges = spark.range(0, 200).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2).collect()


def test_multitouch_window_form_equals_pair_join_form(spark):
    """r13 skew rewrite pin: the boundary-marker running-sum form of
    purchase_multitouch_attribution must stay bit-identical to the
    naive purchases×touches pair join it replaced (the pair join is
    quadratic per user — 4.96e11 pairs at ×300-zipf — but remains the
    cleanest executable statement of the semantics at tiny SF)."""
    from pyspark.sql import Window

    from reciping_data_pipeline_spark.queries import all_queries
    from reciping_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["touch_type"]: (r["n_touches"], r["attributed_value"])
        for r in all_queries()["purchase_multitouch_attribution"]
        .fn(spark, sf)
        .collect()
    }
    ev = load_table(spark, sf, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts"), "value"
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("tts"), F.col("event_type").alias("touch_type")
    )
    touches = p.join(t, "user_id").where(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
    )
    per = touches.withColumn("n", F.count("*").over(Window.partitionBy("event_id")))
    want = {
        r["touch_type"]: (r["n_touches"], r["attributed_value"])
        for r in per.groupBy("touch_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            (
                F.floor(
                    F.sum(
                        F.floor(F.col("value") / F.col("n") * 100000000.0 + 0.5)
                    ).cast("double")
                    / 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("attributed_value"),
        )
        .collect()
    }
    assert got == want


def test_funnel_window_form_equals_pair_join_form(spark):
    """r13 skew rewrite pin: the reversed-sort growing-frame funnel
    must equal the per-hop pair-join form (quadratic per user) it
    replaced, including same-timestamp strictness at every hop."""
    from reciping_data_pipeline_spark.queries import all_queries
    from reciping_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["day"]: (r["n_views"], r["n_clicked_1h"], r["n_purchased_1h"])
        for r in all_queries()["funnel_within_hour"].fn(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("ts").alias("vts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    s2 = (
        v.join(c, "user_id")
        .where(
            (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("event_id", "user_id", "vts")
        .agg(F.min("cts").alias("first_click"))
    )
    s3 = (
        s2.join(p, "user_id")
        .where(
            (F.col("pts") > F.col("first_click"))
            & (F.col("pts") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("_n"))
        .select("event_id")
    )
    want = {
        r["day"]: (r["n_views"], r["n_clicked_1h"], r["n_purchased_1h"])
        for r in v.join(
            s2.select("event_id", F.lit(1).alias("hit2")), "event_id", "left"
        )
        .join(s3.select("event_id", F.lit(1).alias("hit3")), "event_id", "left")
        .groupBy(F.col("vts").cast("date").cast("string").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_views"),
            F.count("hit2").cast("long").alias("n_clicked_1h"),
            F.count("hit3").cast("long").alias("n_purchased_1h"),
        )
        .collect()
    }
    assert got == want


def test_no_unbounded_following_frames_in_package():
    """Spark evaluates UNBOUNDED FOLLOWING window frames by re-scanning
    the partition remainder for every row — O(n²) per partition, a
    13-minute hang on the ×300-zipf top user (r13). Growing frames
    over the reversed sort are the O(n) equivalent; the only allowed
    use is the ENTIRE-partition frame (unboundedPreceding →
    unboundedFollowing), which Spark computes once per partition."""
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reciping_data_pipeline_spark",
    )
    offenders = []
    for root, _, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                src = f.read()
            for m in re.finditer(r"rowsBetween\(([^)]*unboundedFollowing)\)", src):
                if "unboundedPreceding" not in m.group(1):
                    offenders.append((path, m.group(0)))
    assert not offenders, offenders


def test_timeseries_similarity_clone_dedup_equals_brute_force(spark):
    """r13 ×300-uniform fix pin: with heavy series cloning (the shape
    that exhausted executor disk — every clone lands in one band and
    the pair join goes quadratic in multiplicity), the fingerprint-
    dedup + heads-expansion form must equal the brute-force top-k over
    ALL user pairs, including the k+1-smallest-ids sufficiency proof
    and the exact-0 distance for identical series."""
    import itertools
    import math

    import pandas as pd

    from reciping_data_pipeline_spark.queries.curation import (
        _user_timeseries_similarity,
    )

    # 6 base series × 40 clones each = 240 users; clone c of base s has
    # user_id = s*1000 + c, identical (day, value) series per base.
    rows = []
    for s in range(6):
        days = [f"2025-03-{d + 1:02d}" for d in range(3 + s % 3)]
        vals = [round(10.0 * (s + 1) + d * 0.25, 2) for d in range(len(days))]
        for c in range(40):
            for day, v in zip(days, vals):
                rows.append((s * 1000 + c, pd.Timestamp(day), "view", v))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(f"{td}/events.parquet")
        # dedup_series forced ON: the scale gate would route this tiny
        # fixture down the plain per-user path and never exercise the
        # fingerprint machinery under test
        got = [
            (r["user_a"], r["user_b"], r["dist"])
            for r in _user_timeseries_similarity(
                spark, td, dedup_series=True
            ).collect()
        ]
        plain = [
            (r["user_a"], r["user_b"], r["dist"])
            for r in _user_timeseries_similarity(
                spark, td, dedup_series=False
            ).collect()
        ]
    assert got == plain  # both physical forms, same answer
    # brute force in python over the same banding
    series = {}
    for uid, ts, _, v in rows:
        series.setdefault(uid, {})[str(ts.date())] = 0.0
    for uid, ts, _, v in rows:
        series[uid][str(ts.date())] = round(series[uid][str(ts.date())] + v, 4)
    users = sorted(series)
    width = 256.0  # scale floors to 1 at this row count
    def block(u):
        return math.floor(round(sum(series[u].values()), 4) / width)
    def dist(a, b):
        na2 = round(sum(v * v for v in series[a].values()), 4)
        nb2 = round(sum(v * v for v in series[b].values()), 4)
        dot = round(
            sum(series[a][d] * series[b][d] for d in series[a] if d in series[b]), 4
        )
        if series[a] == series[b]:
            return 0.0
        return round(math.sqrt(max(na2 + nb2 - 2 * dot, 0.0)), 4)
    cand = [
        (dist(a, b), a, b)
        for a, b in itertools.combinations(users, 2)
        if block(a) == block(b)
    ]
    want = [(a, b, d) for d, a, b in sorted(cand)[:20]]
    assert got == want


def test_minhash_collapse_exact_equals_uncollapsed_and_restores_recall(spark):
    """r14 docszipf fix pin: exact-clone pre-collapse in
    minhash_lsh_pairs. (1) On a clone-bearing corpus whose clusters
    fit under max_bucket, collapsed and uncollapsed forms emit the
    IDENTICAL pair set (the expansion is a pure re-keying). (2) When a
    clone cluster exceeds max_bucket, every band bucket of the cluster
    overflows and the uncollapsed form drops the whole cluster (recall
    loss the cap only WARNS about); the collapsed form keeps recall 1
    because the cluster enters banding as one representative plus its
    distinct variants."""
    import pandas as pd

    from reciping_data_pipeline_spark.operators import dedup

    words = [f"w{i}" for i in range(40)]

    def doc(did, salt=None):
        t = " ".join(words + ([salt] if salt else []))
        return (did, t)

    # template cluster: 12 exact clones + 4 salted near-dups, plus two
    # unrelated docs
    rows = [doc(i) for i in range(12)]
    rows += [doc(100 + i, f"salt{i}") for i in range(4)]
    rows += [(900, " ".join(f"x{i}y" for i in range(40))),
             (901, " ".join(f"z{i}q" for i in range(40)))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    def pairs(collapse, cap):
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.minhash_lsh_pairs(
                df, "doc_id", "text", threshold=0.5,
                max_bucket=cap, collapse_exact=collapse,
            ).collect()
        )

    # (1) cap far above the cluster: both forms identical
    assert pairs(True, 1000) == pairs(False, 1000)
    got = pairs(True, 1000)
    n = 16  # cluster size -> all C(16,2) pairs are J >= 0.9
    assert len(got) == n * (n - 1) // 2
    assert all(j == 1.0 for a, b, j in got if a < 12 and b < 12)

    # (2) cap below the cluster: uncollapsed drops EVERYTHING (all 16
    # bands bucket the cluster together), collapsed keeps recall 1
    # (13 distinct texts < cap)
    assert pairs(False, 14) == []
    assert pairs(True, 14) == got


def test_within_group_pairs_chunked_matches_direct(spark):
    """The clone-cluster re-expansion (r15): a group larger than the
    chunk must produce the exact 2-combination set via the distributed
    chunk-grid path, and the distributed rows must not all sit in one
    partition (the VERDICT r14 #7 de-skew claim)."""
    from itertools import combinations

    from reciping_data_pipeline_spark.operators.dedup import _within_group_pairs

    groups = spark.createDataFrame(
        [
            ("g1", sorted([7, 3, 11, 5, 2, 19, 13, 17, 23, 29])),  # 10 > chunk=3
            ("g2", [100, 200]),  # small path
            ("g3", [42]),  # singleton: no pairs
        ],
        "`_fp` string, `_members` array<bigint>",
    )
    got = sorted(
        (r["id_a"], r["id_b"]) for r in _within_group_pairs(groups, chunk=3).collect()
    )
    want = sorted(
        list(combinations(sorted([7, 3, 11, 5, 2, 19, 13, 17, 23, 29]), 2))
        + [(100, 200)]
    )
    assert got == want
    # the big group's chunk grid spreads over >1 task
    big_part_count = (
        _within_group_pairs(groups.where(F.size("_members") > 3), chunk=3)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert big_part_count > 1
