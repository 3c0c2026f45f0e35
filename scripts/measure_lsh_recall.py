"""Measure MinHash-LSH near-dup RECALL as a function of max_bucket on
the clone-heavy docszipf fixture (VERDICT r13 #3: "the max_bucket drop
changes RECALL, which must be measured, not warned").

Ground truth: the exact shingle-Jaccard >= 0.5 pair set over the
fixture's planted clone-farm docs (computed once by DuckDB shingle
inversion — `--truth` parquet with (id_a, id_b)). The fixture plants
zipf(1)-sized clone clusters whose rank-1 cluster (~1.2k members at
mult=300) exceeds the default max_bucket=1000, so the uncollapsed
banded pipeline drops it in ALL 16 bands; the exact-clone pre-collapse
(minhash_lsh_pairs collapse_exact, r14) routes each cluster through
banding as one representative per distinct text.

Output: one JSON line per (max_bucket, collapse_exact) cell with
recall against the planted truth, pair counts, and wall seconds.

Usage:
  python scripts/measure_lsh_recall.py \
      --sf /tmp/spark_graft_docszipf \
      --truth /tmp/docszipf_truth_pairs.parquet \
      --caps 100,250,500,1000,2000,4000
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
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--truth", required=True)
    ap.add_argument("--caps", default="100,250,500,1000,2000,4000")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    spark = get_spark(app_name="measure_lsh_recall")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    truth = spark.read.parquet(args.truth).select("id_a", "id_b")
    n_truth = truth.count()
    results = []
    for cap in [int(c) for c in args.caps.split(",")]:
        for collapse in (False, True):
            t0 = time.perf_counter()
            found = dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", threshold=0.5,
                max_bucket=cap, collapse_exact=collapse,
            )
            hits = found.join(truth, on=["id_a", "id_b"], how="left_semi").count()
            sec = round(time.perf_counter() - t0, 1)
            row = {
                "max_bucket": cap,
                "collapse_exact": collapse,
                "truth_pairs": n_truth,
                "found_truth_pairs": hits,
                "recall": round(hits / n_truth, 4) if n_truth else None,
                "sec": sec,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
