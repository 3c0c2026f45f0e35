"""Spark-only throughput point for the document/curation family at a
multiplier beyond DuckDB-oracle reach (VERDICT r07 #1: the ≥5M-doc
"sf1-class" bench evidence; correctness at this scale is carried by the
×10/×30 oracle sweeps on the same generator, plus partition-invariance
here).

Runs against a make_sf.py output dir and reports wall seconds (warm,
median-of-N… N=1 by default — at 5M docs one pass is minutes, and the
cross-run variance that motivated median-of-3 at sf0.1 is amortized by
run length) plus cumulative shuffle-write delta per op.

Usage: python scripts/bench_docs_at_scale.py --dir /tmp/spark_graft_docs_x1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from reciping_data_pipeline_spark.operators import dedup  # noqa: E402
from reciping_data_pipeline_spark.queries import all_queries  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402


def _shuffle_bytes(spark) -> int:
    it = spark._jsc.sc().statusStore().executorList(False).iterator()
    total = 0
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="make_sf.py output (documents/embeddings)")
    ap.add_argument("--delta-docs", type=int, default=500)
    ap.add_argument(
        "--ops",
        default="exact_dedup,index_build,incr_probe,bpe,curation,fuzzy",
        help="comma subset (curation/fuzzy are the expensive composites)",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    spark = get_spark(app_name="bench_docs_at_scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.dir, "documents.parquet"))
    n_docs = docs.count()
    out: dict = {"dir": args.dir, "n_docs": n_docs}

    def timed(name: str, build):
        b0 = _shuffle_bytes(spark)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 1)
        out[f"{name}_shuffle_mb"] = round((_shuffle_bytes(spark) - b0) / 1e6, 1)
        print(json.dumps({name: out[f"{name}_sec"], "shuffle_mb": out[f"{name}_shuffle_mb"]}), flush=True)

    registry = all_queries()
    if "exact_dedup" in ops:
        timed("exact_dedup", lambda: dedup.exact_dedup(docs, "doc_id", "text"))
    if "index_build" in ops or "incr_probe" in ops:
        idx_path = os.path.join(args.dir, "minhash_index.parquet")
        t0 = time.perf_counter()
        dedup.build_minhash_index(docs, "doc_id", "text").write.mode("overwrite").parquet(idx_path)
        out["index_build_sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"index_build": out["index_build_sec"]}), flush=True)
        index = spark.read.parquet(idx_path)
        # novel fixed delta (token-reversal kills every shingle): pure
        # probe cost — the number that must stay flat vs corpus size
        delta = (
            docs.limit(args.delta_docs)
            .select(
                (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
                F.concat_ws(
                    " ", F.reverse(F.split(F.trim(F.col("text")), r"\s+"))
                ).alias("text"),
            )
            .localCheckpoint()
        )
        if "incr_probe" in ops:
            # warm once, then measure
            for _ in range(2):
                b0 = _shuffle_bytes(spark)
                t0 = time.perf_counter()
                dedup.incremental_minhash_dedup(delta, docs, index, "doc_id", "text").write.format(
                    "noop"
                ).mode("overwrite").save()
                out["incr_probe_sec"] = round(time.perf_counter() - t0, 1)
                out["incr_probe_shuffle_mb"] = round((_shuffle_bytes(spark) - b0) / 1e6, 1)
            print(json.dumps({"incr_probe": out["incr_probe_sec"], "shuffle_mb": out["incr_probe_shuffle_mb"]}), flush=True)
    if "bpe" in ops:
        timed("bpe_token_counts", lambda: registry["doc_token_counts_bpe"].fn(spark, args.dir))
    if "curation" in ops:
        timed("curation_pipeline", lambda: registry["doc_curation_pipeline_e2e"].fn(spark, args.dir))
    if "fuzzy" in ops:
        timed("fuzzy_dedup_e2e", lambda: registry["doc_fuzzy_dedup_e2e"].fn(spark, args.dir))
    print(json.dumps({"metric": "docs_at_scale", **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
