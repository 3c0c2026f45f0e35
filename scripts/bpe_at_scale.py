"""Production-shaped BPE measurement (VERDICT r08 #3): fit a 16k-merge
vocabulary on the 5M-doc fixture with a 1M-word vocab cap, then encode
the whole corpus with the learned table.

Reports, as one JSON line for SCALE.md:
- ``vocab_sec``   — distributed word count + O(max_vocab) driver collect
- ``train_sec``   — driver-side incremental-pair-count trainer
  (`train_bpe_fast`: lazy-invalidation heap + batched per-merge deltas)
- ``encode_sec``  — corpus-wide token counts through the Arrow kernel
  (rank-dict greedy encode — cost independent of merge-table size)
- ``tokens_per_sec`` / ``docs_per_sec`` for the encode pass

Usage: python scripts/bpe_at_scale.py --dir /tmp/spark_graft_docs_x1000
       [--merges 16384] [--max-vocab 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from reciping_data_pipeline_spark.functions import bpe  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="make_sf.py output with documents")
    ap.add_argument("--merges", type=int, default=16384)
    ap.add_argument("--max-vocab", type=int, default=1_000_000)
    args = ap.parse_args()

    spark = get_spark(app_name="bpe_at_scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    out = {"metric": "bpe_at_scale", "n_docs": n_docs, "merges": args.merges,
           "max_vocab": args.max_vocab}

    # 1. vocabulary: distributed exact word counts (vocab-sized shuffle),
    #    top-max_vocab collected to the driver (codebook pattern).
    t0 = time.perf_counter()
    wc = bpe.word_count_df(docs)
    if args.max_vocab:
        wc = wc.orderBy(F.col("cnt").desc(), F.col("word")).limit(args.max_vocab)
    counts = {r["word"]: r["cnt"] for r in wc.collect()}
    out["vocab_sec"] = round(time.perf_counter() - t0, 1)
    out["vocab_words"] = len(counts)

    # 2. driver-side trainer (incremental pair counts).
    t0 = time.perf_counter()
    merges = bpe.train_bpe_fast(counts, args.merges)
    out["train_sec"] = round(time.perf_counter() - t0, 1)
    out["merges_learned"] = len(merges)

    # 3. corpus-wide encode through the Arrow kernel.
    t0 = time.perf_counter()
    agg = docs.select(
        bpe.bpe_token_count_udf(merges)(F.col("text")).alias("n_tok")
    ).agg(F.sum("n_tok").alias("total_tokens"), F.count("*").alias("n")).first()
    out["encode_sec"] = round(time.perf_counter() - t0, 1)
    out["total_tokens"] = agg["total_tokens"]
    out["docs_per_sec"] = int(n_docs / out["encode_sec"])
    out["tokens_per_sec"] = int(agg["total_tokens"] / out["encode_sec"])
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
