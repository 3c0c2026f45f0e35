"""Subprocess body for test_retry_determinism: run deterministic-kernel
pipelines under injected first-attempt task failures and verify the
output is byte-identical to a clean run.

Why a subprocess: task retries require ``spark.task.maxFailures`` > 1,
which in local mode is only settable via the ``local[N,F]`` master
string at context creation — the shared test session can't be
reconfigured. 100 TB clusters lose executors constantly; every kernel
whose output feeds an oracle hash (MinHash signatures, weighted
sampling keys, sequence packing) must give retries no way to flip it.

Injection: an Arrow-batched column that raises on ``attemptNumber() ==
0`` for half the partitions, composed into the SAME whole-stage task as
the kernel under test — the retry therefore re-executes the kernel for
that partition, and a partition-order- or attempt-dependent kernel
would change the final hash.
"""

from __future__ import annotations

import hashlib
import json
import sys

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def df_hash(df) -> str:
    rows = sorted(str(tuple(r)) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(sf_dir: str) -> int:
    sys.path.insert(0, "/root/repo")
    from reciping_data_pipeline_spark.functions import bpe
    from reciping_data_pipeline_spark.operators import dedup, sampling
    from reciping_data_pipeline_spark.queries.corpusops import pack_sequences

    spark = (
        SparkSession.builder.master("local[8,2]")  # 2 attempts per task
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("retry_determinism")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # defined after session creation: the decorator parses the return
    # type against the active context
    @pandas_udf("long")
    def flaky(v: pd.Series) -> pd.Series:
        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0 and ctx.partitionId() % 2 == 0:
            raise RuntimeError("injected failure: first attempt of even partition")
        return v

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(6, "doc_id")
        .withColumn("n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+")))
    )

    def scenarios(base):
        merges = [("a", " "), ("t", "h"), ("th", "e")]  # fixed: fit is driver-side
        return {
            "minhash_index": dedup.build_minhash_index(base, "doc_id", "text"),
            "weighted_sample": sampling.weighted_sample(
                base, 50, "n_chars", id_col="doc_id", seed=7
            ).select("doc_id", "source"),
            "stratified_sample": sampling.stratified_weighted_sample(
                base, 5, "n_chars", "source", id_col="doc_id", seed=7
            ).select("doc_id", "source"),
            "sequence_packing": pack_sequences(
                base.select("source", "doc_id", "n_tok"), bin_tokens=512.0, n_buckets=4
            ),
            "bpe_counts": base.select(
                "doc_id", bpe.bpe_token_count_udf(merges)(F.col("text")).alias("n")
            ),
        }

    clean = {name: df_hash(df) for name, df in scenarios(docs).items()}
    injected_base = docs.withColumn("_f", flaky(F.col("doc_id"))).where(
        F.col("_f") >= 0
    )
    results = {}
    ok = True
    for name, df in scenarios(injected_base).items():
        h = df_hash(df.drop("_f"))
        match = h == clean[name]
        ok = ok and match
        results[name] = {"clean": clean[name], "retried": h, "match": match}
    print(json.dumps({"ok": ok, "scenarios": results}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
