"""Named query catalog with DuckDB oracle SQL.

Each query is registered with:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation
  (DataFrame API or Spark SQL; Catalyst picks the physical plan).
- ``oracle`` — equivalent ANSI SQL the driver runs in DuckDB over the
  same parquet tables, or ``None`` for non-SQL-expressible operators
  (those get a rows-only check).

Conventions that make the cross-engine value-hash comparison stable:
- every computed column is explicitly aliased, identically on both
  sides (the driver sorts columns by name before hashing);
- every floating-point aggregate is rounded identically on both
  sides (double summation order differs between engines; rounding
  absorbs the last-ulp noise). Display rounding of aggregates may use
  ``round(x, N)``; VALUE-AFFECTING rounding (anything feeding a
  comparison, ranking, or further arithmetic) must use the floor form
  ``floor(x * 10^N + 0.5) / 10^N`` — pure IEEE mul/add/floor that is
  bit-identical across engines, unlike engine ``round()`` tie
  behavior (Spark: BigDecimal-of-shortest-repr HALF_UP; DuckDB:
  binary-value rounding). Medians avoid interpolation builtins
  (explicit middle-rank averaging). Property-gated in
  ``tests/test_properties.py``;
- integer sums are cast to BIGINT on the DuckDB side (DuckDB promotes
  SUM(int) to HUGEINT, Spark keeps BIGINT);
- ties in top-k / ranking are always broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


# Driver-window rotation (stalest-first). The driver verifies the FIRST
# 50 entries of ``queries()`` in dict order each round, so ordering is
# the whole scheduling policy. Before r08 a hand-maintained
# ``_DRIVER_VERIFIED`` set split the catalog into never-checked (front)
# and checked (back); by r07 all 184 queries had been green at least
# once, but 108 of them last had a THIRD-PARTY driver row in r04 or
# earlier. r08 replaces the set with staleness computed from the
# committed CORRECTNESS_r*.json artifacts themselves: a query's rank is
# the latest round in which the driver recorded it green (hash_match,
# or rows_match for no-oracle entries), -1 if never. Ascending sort ⇒
# brand-new queries head the window, then the stalest cohort; every
# round the 50 oldest third-party rows get refreshed automatically and
# no query's evidence ages past ~3 rounds at the current catalog size.
#
# ``_FORCE_REVERIFY`` pins queries whose SEMANTICS changed after their
# last green row (their recorded round would otherwise let them hide at
# the back with evidence for the old behavior): they rank as never-run.
_FORCE_REVERIFY: frozenset[str] = frozenset(
    {
        # (Satisfied pins are CLEARED at each round's close-out — a
        # satisfied pin left in place occupies a front-of-window slot
        # every round and starves the stalest cohort the rotation
        # exists to refresh. r09's 8 pins, r10's 2, r11's 7, r12's 1,
        # r13's 6 all cleared after recording green. r14's 18 pins —
        # the three r13 skew-rewrite oracles, the exact-clone collapse
        # family, the derived plant offsets, the waterfill TRY_CAST,
        # and the r14 engine-plan rewrites — all recorded hash-green
        # in CORRECTNESS_r14.json and are cleared for r15 per VERDICT
        # r14 #8.)
        #
        # r15 optimization round: rows whose ENGINE plan was rewritten
        # for performance (oracles unchanged; every one re-proven
        # hash-equal at sf0.001 + sf0.01 before commit, see
        # OPTIMIZATION_r15.md): single-exchange co-occurrence edge
        # builder + fused LPA rounds (the three co-purchase graph
        # rows), the crossing-bucket weighted median, the chunked
        # clone-cluster re-expansion (the three pair operators and
        # their pair-consuming rows), and the Arrow-kernel id-type
        # cast-back (embed_semantic_dedup). Their recorded green
        # rounds predate the new plans — refresh.
        "copurchase_label_propagation",
        "copurchase_pagerank",
        "copurchase_triangles",
        "qty_weighted_median_price_by_flag",
        "doc_minhash_lsh_pairs",
        "doc_simhash_pairs",
        "doc_ngram_jaccard_pairs",
        "doc_fuzzy_dedup_e2e",
        "doc_curation_pipeline_e2e",
        "doc_dedup_groups",
        "doc_split_leakage",
        "embed_semantic_dedup",
    }
)

# Staleness budget (VERDICT r13 #7): with 196 catalog queries and a
# 50-row driver window, zero-growth refresh latency is ceil(196/50) =
# 4 rounds; each pinned row displaces one stalest row for one round.
# ACCEPTED MAX STALENESS: 4 rounds without a driver row (the ×100
# scale sweep independently re-oracles all 196 every round, so a
# 4-round-old driver row is never the only evidence). Additions are
# batched with a redundancy-pruning pass when the catalog would push
# refresh latency past 4 (CATALOG_TARGET below); assemble_scale_
# artifact.py separately enforces its own carried-age bound of 2 for
# the ×100 artifact.
CATALOG_TARGET = 200  # keep len(all_queries()) at or under this


def _last_green_rounds() -> dict[str, int]:
    """query name -> latest round with a green driver row, parsed from
    the committed CORRECTNESS_r*.json artifacts in the repo root (the
    directory holding the package). Unreadable/absent artifacts are
    skipped; an empty map leaves registration order unchanged."""
    import glob
    import json
    import os
    import re as _re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            # hash_match must be strictly True; rows_match only counts
            # for no-oracle entries (hash_match is None there).  A
            # hash-MISMATCH row ({hash_match: false, rows_match: true})
            # is red and must NOT refresh staleness, else the rotation
            # pushes exactly the broken queries to the back of the
            # window (ADVICE r08).
            if (
                isinstance(res, dict)
                and res.get("err") is None
                and (
                    res.get("hash_match") is True
                    or (res.get("hash_match") is None and res.get("rows_match") is True)
                )
            ):
                out[name] = max(out.get(name, -1), rnd)
    return out


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return
    the full registry, ordered stalest-first by last green driver
    round (never-verified queries first — the driver checks the first
    50, so each round refreshes the oldest third-party evidence)."""
    from reciping_data_pipeline_spark.queries import (  # noqa: F401
        clickstream,
        corpusops,
        graphops,
        groupingsets,
        intervalops,
        layoutops,
        medallionops,
        multimodalops,
        qualityops,
        relational_ext,
        rollupserve,
        samplingops,
        statops,
        subqueries,
        textops,
        tpch,
        vectorops,
    )
    # curation registers LAST: its queries append after the current
    # unverified backlog so they never displace queries already queued
    # for this round's 50-entry driver verification window.
    from reciping_data_pipeline_spark.queries import curation  # noqa: F401

    last_green = _last_green_rounds()

    def rank(name: str) -> int:
        return -1 if name in _FORCE_REVERIFY else last_green.get(name, -1)

    # Stable sort: registration order is preserved within a staleness
    # cohort, so same-round queries keep their module grouping.
    return {n: REGISTRY[n] for n in sorted(REGISTRY, key=rank)}
