"""Simulate the driver's correctness gate locally.

Runs every catalog query (or the first N, like the driver) at a given
scale factor, compares to its DuckDB oracle with the same
row-count/schema/value comparison, and prints one JSON summary line.

Usage: python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [--first 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from reciping_data_pipeline_spark.queries import all_queries  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=0, help="check only the first N registry entries (0 = all)")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--json-out", default="", help="write per-query results to this JSON file")
    ap.add_argument("--partitions", type=int, default=32,
                    help="spark.sql.shuffle.partitions (partition-invariance sweeps)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracle_utils import compare_to_oracle  # noqa: E402

    spark = get_spark(app_name="driver_sim", shuffle_partitions=args.partitions)
    con = duckdb.connect()
    # Cap DuckDB and let it SPILL: its default memory limit (80% of
    # host RAM) ignores the multi-GB Spark JVM sharing the box, and a
    # 30M-row window-sort oracle then drives the host into allocation
    # failure (×300-zipf sweep, r13: DuckDB OOM + driver MemoryError).
    # Derived from host RAM, not fixed (ADVICE r13): a flat 20GB on a
    # smaller host would RAISE the cap above the 80% default and
    # recreate the failure — half of total, ceilinged at 20GB, floored
    # at 1GB.
    total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (1 << 30)
    cap_gb = max(1, min(20, int(total_gb * 0.5)))
    con.execute(f"SET memory_limit='{cap_gb}GB'")
    con.execute("SET temp_directory='/tmp/duckdb_sim_spill'")
    for name in TABLE_NAMES:
        path = os.path.join(args.sf, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written table (scaled fixtures from make_sf.py):
            # a directory of part files — DuckDB needs the glob form
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")

    registry = all_queries()
    names = list(registry)
    if args.only:
        names = [n for n in args.only.split(",") if n in registry]
    elif args.first:
        names = names[: args.first]

    results: dict[str, str] = {}
    for name in names:
        q = registry[name]
        try:
            df = q.fn(spark, args.sf)
            if q.oracle is None:
                n_rows = df.count()
                results[name] = f"rows_only:{n_rows}"
            else:
                compare_to_oracle(df, con, q.oracle, name)
                results[name] = "ok"
        except AssertionError as e:
            results[name] = f"MISMATCH: {str(e)[:300]}"
        except Exception:
            results[name] = f"ERROR: {traceback.format_exc(limit=3)[-300:]}"
        print(f"{name}: {results[name]}", flush=True)

    bad = {n: r for n, r in results.items() if not (r == "ok" or r.startswith("rows_only"))}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(
                {"sf": args.sf, "partitions": args.partitions, "results": results}, f, indent=1
            )
    print(json.dumps({"checked": len(results), "bad": len(bad), "bad_names": sorted(bad)}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
