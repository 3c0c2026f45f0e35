"""Measured scale curve for the dedup/ANN families (SCALE.md evidence).

Builds 1x/3x/10x replicas of the sf0.1 documents/embeddings tables
(deterministic perturbed copies — distinct content, similar shingle and
vector profiles) and measures, per scale point:

- exact_dedup over the whole corpus            (expect near-linear)
- build_minhash_index over the whole corpus    (one-time, linear)
- incremental_minhash_dedup of a FIXED delta   (must track delta, not corpus)
- ivf_topk / pq_topk with a FIXED query set    (probe cost, sublinear)

Each measurement reports wall seconds (2nd run, warm) and the delta of
cumulative executor shuffle bytes (AppStatusStore executorList) — the
quantity that decides 100 TB viability. Prints a markdown table for
SCALE.md plus one JSON line.

Usage: python scripts/scale_curve.py [--sf /root/testdata/sf0.1]
       [--scales 1,3,10] [--out-dir /tmp/spark_graft_scale_curve]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from reciping_data_pipeline_spark.operators import dedup, similarity  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import load_table  # noqa: E402


def _shuffle_bytes(spark) -> int:
    it = spark._jsc.sc().statusStore().executorList(False).iterator()
    total = 0
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, build, runs: int = 2) -> tuple[float, int]:
    """(warm wall sec, shuffle byte delta of the warm run). ``build``
    returns a fresh DataFrame per call so nothing is cached between
    runs."""
    wall = 0.0
    sb = 0
    for _ in range(runs):
        b0 = _shuffle_bytes(spark)
        t0 = time.perf_counter()
        _noop(build())
        wall = time.perf_counter() - t0
        sb = _shuffle_bytes(spark) - b0
    return round(wall, 2), sb


def replicate_docs(docs, k: int):
    """k perturbed copies: shifted ids, per-copy suffix keeps every text
    distinct (no degenerate dedup) while preserving the length/shingle
    profile."""
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" s{i} "), F.col("doc_id").cast("string")).alias("text"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def replicate_vecs(emb, k: int):
    """k perturbed copies: shifted ids, deterministic per-copy offset
    rotates each vector slightly so copies are distinct directions."""

    def perturb(i: int):
        # factory, not a defaulted lambda: HOF lambdas with default args
        # are misread as the (element, index) arity by pyspark
        return lambda x, j: x + F.lit(0.02 * i) * F.cos(j.cast("double") + F.lit(float(i)))

    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform(F.col("embedding"), perturb(i)).alias("embedding"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def make_edges(docs):
    """Deterministic 4-regular-out edge set per corpus copy: dst ids
    are hashed WITHIN the copy's 10M id block, so each replica is a
    disjoint subgraph of the same shape — total work must then grow
    linearly in edges with CONSTANT iteration count (diameter does not
    grow with replication)."""
    e = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
    )
    block = (F.floor(F.col("src") / 10_000_000) * 10_000_000).cast("long")
    dst = block + F.pmod(F.xxhash64(F.col("src"), F.col("j")), F.lit(5000))
    return e.select("src", dst.alias("dst")).where(F.col("src") != F.col("dst"))


def _graph_point(spark, root: str, docs, point: dict) -> None:
    """Iterative-family measurements: 3-round PageRank and full
    connected components over the replicated disjoint graph. Claims
    under test: per-round cost (wall + shuffle) linear in |E|; CC
    round count CONSTANT across scale (disjoint copies keep the
    diameter fixed, pointer doubling keeps rounds at O(log d))."""
    from reciping_data_pipeline_spark.operators import graph as G

    edges_path = os.path.join(root, "edges.parquet")
    make_edges(docs).repartition(32).write.mode("overwrite").parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    point["n_edges"] = edges.count()
    point["pagerank_sec"], point["pagerank_shuffle"] = _timed(
        spark, lambda: G.pagerank(edges, iterations=3)
    )
    cc_stats: dict = {}

    def build_cc():
        cc_stats.clear()
        return dedup.connected_components(
            edges, "src", "dst", stats=cc_stats
        )

    point["cc_sec"], point["cc_shuffle"] = _timed(spark, build_cc)
    point["cc_rounds"] = cc_stats.get("rounds")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--out-dir", default="/tmp/spark_graft_scale_curve")
    ap.add_argument("--delta-docs", type=int, default=500)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument(
        "--families", default="dedup,ann,graph",
        help="comma subset of dedup,ann,graph to measure",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    fams = set(args.families.split(","))

    spark = get_spark(app_name="scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    base_docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    base_emb = load_table(spark, args.sf, "embeddings").select("vec_id", "embedding")

    # fixed-size workloads, identical at every scale point. Two deltas:
    # - matching: near-copies of base docs — candidates (and thus the
    #   verification work) grow with how many corpus variants exist;
    # - novel: token-REVERSED base docs (reversal destroys every 5-gram
    #   shingle) — ~zero candidates, isolating the pure index-probe
    #   cost, where the bucketed layout's exchange elision shows up.
    delta = base_docs.limit(args.delta_docs).select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
        F.concat(F.lit("delta "), F.col("text")).alias("text"),
    ).localCheckpoint()
    delta_novel = base_docs.limit(args.delta_docs).select(
        (F.col("doc_id") + F.lit(950_000_000)).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split(F.trim(F.col("text")), r"\s+"))).alias("text"),
    ).localCheckpoint()
    queries = base_emb.limit(args.queries).localCheckpoint()

    results: list[dict] = []
    for k in scales:
        root = os.path.join(args.out_dir, f"x{k}")
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        docs_path = os.path.join(root, "documents.parquet")
        emb_path = os.path.join(root, "embeddings.parquet")
        idx_path = os.path.join(root, "minhash_index.parquet")
        replicate_docs(base_docs, k).repartition(32).write.parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        n_docs, n_vecs = docs.count(), 0
        emb = None
        if "ann" in fams:
            replicate_vecs(base_emb, k).repartition(32).write.parquet(emb_path)
            emb = spark.read.parquet(emb_path)
            n_vecs = emb.count()

        point: dict = {"scale": k, "n_docs": n_docs, "n_vecs": n_vecs}
        if "graph" in fams:
            _graph_point(spark, root, docs, point)
        if "dedup" not in fams:
            results.append(point)
            print(json.dumps(point), flush=True)
            continue
        point["exact_dedup_sec"], point["exact_dedup_shuffle"] = _timed(
            spark, lambda: dedup.exact_dedup(docs, "doc_id", "text")
        )
        # one-time index build (linear in corpus, amortized over deltas)
        t0 = time.perf_counter()
        dedup.build_minhash_index(docs, "doc_id", "text").write.mode("overwrite").parquet(idx_path)
        point["index_build_sec"] = round(time.perf_counter() - t0, 2)
        index = spark.read.parquet(idx_path)
        # the claim under test: probing a FIXED delta must cost ~the
        # delta + index-join, not a corpus rescan
        point["incr_probe_sec"], point["incr_probe_shuffle"] = _timed(
            spark,
            lambda: dedup.incremental_minhash_dedup(delta, docs, index, "doc_id", "text"),
        )
        # novel delta (zero matches) against the plain vs BUCKETED index:
        # candidates vanish, so the shuffle left is the probe join itself
        # — the bucketed layout elides the index side's exchange and its
        # bytes should stop growing with the corpus
        from reciping_data_pipeline_spark.sources import bucketing

        point["novel_probe_sec"], point["novel_probe_shuffle"] = _timed(
            spark,
            lambda: dedup.incremental_minhash_dedup(delta_novel, docs, index, "doc_id", "text"),
        )
        tbl = f"scale_curve_band_index_x{k}"
        bucketing.write_bucketed(
            spark.read.parquet(idx_path), tbl, os.path.join(root, "index_bucketed"),
            ["band_idx", "band_hash"], n_buckets=32,
        )
        bindex = bucketing.read_bucketed(spark, tbl)
        point["novel_probe_bucketed_sec"], point["novel_probe_bucketed_shuffle"] = _timed(
            spark,
            lambda: dedup.incremental_minhash_dedup(delta_novel, docs, bindex, "doc_id", "text"),
        )
        if "ann" in fams:
            point["ivf_sec"], point["ivf_shuffle"] = _timed(
                spark,
                lambda: similarity.ivf_topk(emb, queries, k=5, n_cells=8 * k, nprobe=2),
            )
            point["pq_sec"], point["pq_shuffle"] = _timed(
                spark,
                lambda: similarity.pq_topk(emb, queries, dim=64, m=8, k_codes=16, k=5),
            )
        results.append(point)
        print(json.dumps(point), flush=True)

    if results and "pagerank_sec" in results[0]:
        print("\n| scale | edges | pagerank (3 it) s / MB | CC s / MB | CC rounds |")
        print("|---|---|---|---|---|")
        for p in results:
            print(
                f"| {p['scale']}x | {p['n_edges']:,} "
                f"| {p['pagerank_sec']} / {p['pagerank_shuffle'] / 1e6:.1f} "
                f"| {p['cc_sec']} / {p['cc_shuffle'] / 1e6:.1f} "
                f"| {p['cc_rounds']} |"
            )
    if not results or "exact_dedup_sec" not in results[0]:
        print(json.dumps({"metric": "scale_curve", "points": results}))
        return 0
    print("\n| scale | docs | exact_dedup s / MB | index build s | incr probe (matching delta) s / MB | novel probe plain s / MB | novel probe bucketed s / MB | IVF s / MB | PQ s / MB |")
    print("|---|---|---|---|---|---|---|---|---|")
    for p in results:
        print(
            f"| {p['scale']}x | {p['n_docs']:,} "
            f"| {p['exact_dedup_sec']} / {p['exact_dedup_shuffle'] / 1e6:.1f} "
            f"| {p['index_build_sec']} "
            f"| {p['incr_probe_sec']} / {p['incr_probe_shuffle'] / 1e6:.1f} "
            f"| {p['novel_probe_sec']} / {p['novel_probe_shuffle'] / 1e6:.1f} "
            f"| {p['novel_probe_bucketed_sec']} / {p['novel_probe_bucketed_shuffle'] / 1e6:.1f} "
            f"| {p['ivf_sec']} / {p['ivf_shuffle'] / 1e6:.1f} "
            f"| {p['pq_sec']} / {p['pq_shuffle'] / 1e6:.1f} |"
        )
    print(json.dumps({"metric": "scale_curve", "points": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
