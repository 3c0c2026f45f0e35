"""Generate an sf1-class fixture by deterministic fact replication
(VERDICT r07 #1): documents/embeddings/events/orders/lineitem scaled
``--mult``×, dims copied as-is — the realistic scale-up shape (facts
grow, dims don't) that keeps every FK the headline queries join on
valid.

Replication is ONE Spark scan crossJoined with ``range(mult)`` (fully
executor-parallel — no driver loop, no k-way union plan), with per-copy
transforms chosen so the scaled corpus is HONEST about duplicate mass:

- documents: ids shift by copy block; every TOKEN gets a per-copy tag
  (copy 0 untouched), so shingles never collide across copies — the
  corpus's natural near-dup structure repeats per copy and dup mass
  grows LINEARLY. A bare suffix perturbation (scale_curve's replicas)
  would make every copy a near-dup of every other and inflate dup mass
  quadratically, which no real crawl does. The tag is GLUED LETTERS
  (r10), so letter-run pre-tokenizers (BPE) see a word-form vocabulary
  that grows ~base_vocab×mult — the Heaps-law shape — instead of
  collapsing back to the base 1k words.
- embeddings: ids shift; per-copy pseudo-random noise
  (xxhash64(vec_id, dim, copy)-derived, magnitude ~1.5× the unit norm)
  pushes cross-copy cosine far below any dedup threshold — again
  linear semantic-dup mass.
- events: event_id/user_id shift per copy (new users, same calendar) —
  per-user/segment/day aggregates scale linearly.
- orders: o_orderkey shifts, o_custkey kept (customer FK valid).
- lineitem: l_orderkey AND l_partkey shift per copy → the co-purchase
  graph becomes ``mult`` disjoint replicas of the base subgraph
  (linear |E|, constant diameter); l_suppkey kept.

The output directory is a drop-in ``sf_dir``: the whole catalog's
``queries(spark, sf_dir)`` and the DuckDB oracles run on it unchanged
(`scripts/driver_sim.py --sf <out>`), which is what makes the scaled
correctness artifact third-party-replayable. Note the part/partkey FK
is intentionally broken for copies > 0 — the scaled dirs serve the
fact-side headline queries, not part-dim joins.

Usage:
  python scripts/make_sf.py --out /tmp/spark_graft_sf1 --mult 10
  python scripts/make_sf.py --out /tmp/..._docs1000 --mult 1000 --tables documents
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import load_table  # noqa: E402

BLOCK = 10_000_000
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def _with_copies(df, mult: int):
    copies = df.sparkSession.range(mult).select(F.col("id").alias("copy"))
    return df.crossJoin(copies)


def scale_documents(spark, sf_dir: str, mult: int):
    docs = _with_copies(load_table(spark, sf_dir, "documents"), mult)
    # Per-copy tag in LETTERS, glued to the token ("recipeqbdh", digit
    # i → letter chr('a'+i)), not the old "_c137" form: a digit tag is
    # invisible to letter-run pre-tokenizers (BPE's [A-Za-z]+ split
    # "word_c137" back into the same 1k base words at every mult, so
    # the 5M-doc BPE measurement saw a 1,062-word vocabulary and
    # exhausted at 1,116 merges — VERDICT r09 #6). Glued letter tags
    # give the scaled corpus a word-FORM diversity that grows with
    # mult (~base_vocab × mult distinct letter-words — the Heaps-law
    # shape a real crawl has) while preserving the properties the
    # fixtures are built on: tags are constant per copy, so shingles
    # still never collide across copies and dup mass stays linear.
    tag = F.concat(
        F.lit("q"), F.translate(F.col("copy").cast("string"), "0123456789", "abcdefghij")
    )
    tagged = F.array_join(
        F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, tag)),
        " ",
    )
    text = F.when(F.col("copy") == 0, F.col("text")).otherwise(tagged)
    return docs.select(
        (F.col("doc_id") + F.col("copy") * BLOCK).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        # recompute, don't carry: the per-copy tags lengthen every copy>0
        # text, and a stale n_chars skews length-weighted queries at
        # scale (ADVICE r08)
        F.length(text).cast("long").alias("n_chars"),
    )


def scale_documents_zipf(
    spark,
    sf_dir: str,
    mult: int,
    *,
    clone_frac: float = 0.0075,
    plain_frac: float = 0.10,
    templates: int = 1000,
    boiler_classes: int = 100,
    source_labels: int = 50,
):
    """Skewed-corpus documents fixture (VERDICT r13 #3): the clone-heavy
    + boilerplate-heavy source mix where LSH dedup dies at scale.

    Three deterministic roles per (doc_id, copy), chosen by hashed
    uniforms so the mix is reproducible and oracle-replayable:

    - ``clone_frac`` CLONE rows: text replaced by one of ``templates``
      40-word template texts, template rank zipf(1)-distributed
      (floor(T^u) inverse-CDF — the same construction as the events
      zipf users). Half of each cluster are EXACT clones, half append
      one member-unique salt word (pairwise shingle-Jaccard ≈ 0.95).
      At mult=300 the rank-1 cluster holds ~1.5k members — deliberately
      ABOVE the LSH max_bucket=1000 cap, so banded dedup without
      exact-fingerprint pre-collapse measurably loses recall here.
      source='clone_farm'.
    - ``plain_frac`` PLAIN rows: the base text with the per-copy glued
      letter tag (exactly scale_documents' transform) — preserves the
      base corpus's organic near-dup structure, whose oracle behavior
      is already proven at ×100.
    - the rest BOILERPLATE rows: a 15-word boilerplate prefix shared
      per (copy, boiler_class) + 35 member-unique content words from a
      100k-word vocabulary. Text sharing is bounded per class (~45
      docs at mult=300, B=100) so the exact-Jaccard shingle-inversion
      oracles stay tractable, while the SOURCE label is zipf(1) over
      ``source_labels`` — rank-1 source carries ~1/H(S) of the corpus,
      the skewed source-mix shape the mixture/stats rows must survive.
      Pairwise content J ≈ 11/79 < 0.5: boilerplate alone must never
      clear the near-dup threshold (that is the false-positive
      discipline; candidates that arise die in exact verification).
    """
    docs = _with_copies(load_table(spark, sf_dir, "documents"), mult)

    def u(salt):
        return (
            F.pmod(
                F.xxhash64(F.col("doc_id"), F.col("copy"), F.lit(salt)),
                F.lit(1_000_000),
            )
            / 1_000_000.0
        )

    role_u = u("role")
    tmpl = F.floor(F.pow(F.lit(float(templates)), u("tmpl"))).cast("long")
    tmpl_words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.lit("tmpl"), tmpl, F.lit("w"),
            F.pmod(F.xxhash64(tmpl, i), F.lit(97)),
        ),
    )
    salt_word = F.concat(
        F.lit("salt"),
        F.pmod(F.xxhash64(F.col("doc_id"), F.col("copy")), F.lit(1_000_000_000)),
    )
    clone_text = F.array_join(
        F.when(u("salt") < 0.5, tmpl_words).otherwise(
            F.concat(tmpl_words, F.array(salt_word))
        ),
        " ",
    )

    bcls = F.pmod(
        F.xxhash64(F.col("doc_id"), F.col("copy"), F.lit("bcls")),
        F.lit(boiler_classes),
    )
    boiler_words = F.transform(
        F.sequence(F.lit(1), F.lit(15)),
        lambda i: F.concat(
            F.lit("boil"), F.col("copy"), F.lit("x"), bcls, F.lit("w"), i
        ),
    )
    content_words = F.transform(
        F.sequence(F.lit(1), F.lit(35)),
        lambda i: F.concat(
            F.lit("u"),
            F.pmod(F.xxhash64(F.col("doc_id"), F.col("copy"), i), F.lit(100_000)),
        ),
    )
    boiler_text = F.array_join(F.concat(boiler_words, content_words), " ")

    tag = F.concat(
        F.lit("q"),
        F.translate(F.col("copy").cast("string"), "0123456789", "abcdefghij"),
    )
    plain_text = F.when(
        F.col("copy") == 0, F.col("text")
    ).otherwise(
        F.array_join(
            F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, tag)),
            " ",
        )
    )

    src = F.concat(
        F.lit("src"),
        F.floor(F.pow(F.lit(float(source_labels)), u("src"))).cast("long"),
    )
    text = (
        F.when(role_u < clone_frac, clone_text)
        .when(role_u < clone_frac + plain_frac, plain_text)
        .otherwise(boiler_text)
    )
    source = F.when(role_u < clone_frac, F.lit("clone_farm")).otherwise(src)
    return docs.select(
        (F.col("doc_id") + F.col("copy") * BLOCK).alias("doc_id"),
        text.alias("text"),
        "lang",
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def scale_embeddings(spark, sf_dir: str, mult: int):
    emb = _with_copies(load_table(spark, sf_dir, "embeddings"), mult)
    noisy = F.transform(
        F.col("embedding"),
        lambda x, j: (
            x
            + F.when(F.col("copy") == 0, F.lit(0.0)).otherwise(
                (
                    F.pmod(F.xxhash64(F.col("vec_id"), j, F.col("copy")), F.lit(1000)).cast(
                        "double"
                    )
                    / 1000.0
                    - 0.5
                )
                * 0.375  # per-dim ±0.19 → ~1.5 L2 noise on dim-64 unit vectors
            )
        ).cast("float"),
    )
    return emb.select(
        (F.col("vec_id") + F.col("copy") * BLOCK).alias("vec_id"),
        noisy.alias("embedding"),
        "label",
    )


def scale_events(spark, sf_dir: str, mult: int, zipf_users: int = 0):
    """``zipf_users > 0`` remaps user_id to a zipf(s=1) population of
    that many users (deterministic inverse-CDF of an xxhash64 uniform:
    rank = U^u has P(rank=r) ∝ 1/r), instead of the default per-copy id
    shift. Real clickstreams are zipfian — rank-1 carries ~1/ln(U) of
    ALL events — so this is the skewed-reducer stress shape the uniform
    replication can't produce (VERDICT r08 #5)."""
    ev = _with_copies(load_table(spark, sf_dir, "events"), mult)
    if zipf_users > 0:
        u = (
            F.pmod(F.xxhash64(F.col("event_id"), F.col("copy")), F.lit(1_000_000))
            / 1_000_000.0
        )
        user = F.floor(F.pow(F.lit(float(zipf_users)), u)).cast("long")
    else:
        user = F.col("user_id") + F.col("copy") * BLOCK
    return ev.select(
        (F.col("event_id") + F.col("copy") * BLOCK).alias("event_id"),
        "ts",
        user.alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def scale_orders(spark, sf_dir: str, mult: int):
    o = _with_copies(load_table(spark, sf_dir, "orders"), mult)
    return o.select(
        (F.col("o_orderkey") + F.col("copy") * BLOCK).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


def scale_lineitem(spark, sf_dir: str, mult: int, zipf_parts: int = 0):
    """``zipf_parts > 0`` remaps l_partkey to a zipf(1) population of
    that many parts (same inverse-CDF construction as the events zipf
    users) instead of the per-copy id shift: the rank-1 part lands in
    ~1/H(P) of ALL lineitems, so the co-purchase graph grows a hub
    vertex of near-complete degree — the classic triangle-enumeration
    killer that degree-ordered edge orientation exists to survive
    (VERDICT r13 #4). Uniform replication cannot produce this shape
    (each copy is a disjoint replica of constant degree)."""
    li = _with_copies(load_table(spark, sf_dir, "lineitem"), mult)
    if zipf_parts > 0:
        u = (
            F.pmod(
                F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"), F.col("copy")),
                F.lit(1_000_000),
            )
            / 1_000_000.0
        )
        part = F.floor(F.pow(F.lit(float(zipf_parts)), u)).cast("long")
    else:
        part = F.col("l_partkey") + F.col("copy") * BLOCK
    return li.select(
        (F.col("l_orderkey") + F.col("copy") * BLOCK).alias("l_orderkey"),
        part.alias("l_partkey"),
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )


SCALERS = {
    "documents": scale_documents,
    "embeddings": scale_embeddings,
    "events": scale_events,
    "orders": scale_orders,
    "lineitem": scale_lineitem,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mult", type=int, required=True)
    ap.add_argument(
        "--tables",
        default="documents,embeddings,events,orders,lineitem",
        help="comma subset of fact tables to scale (dims always copied)",
    )
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument(
        "--zipf-users",
        type=int,
        default=0,
        help="remap events.user_id to a zipf(1) population of N users "
        "(skewed-reducer stress fixture); 0 = uniform per-copy shift",
    )
    ap.add_argument(
        "--zipf-parts",
        type=int,
        default=0,
        help="remap lineitem.l_partkey to a zipf(1) population of N "
        "parts (hub-degree co-purchase graph stress); 0 = per-copy "
        "shift",
    )
    ap.add_argument(
        "--docs-zipf",
        action="store_true",
        help="use the clone-heavy + boilerplate-heavy documents scaler "
        "(zipf clone clusters + zipf source mix; see "
        "scale_documents_zipf)",
    )
    args = ap.parse_args()
    if args.mult < 1:
        raise SystemExit("--mult must be >= 1")

    spark = get_spark(app_name="make_sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    report = {"base": args.sf, "mult": args.mult, "tables": {}}
    key_of = {
        "documents": "doc_id", "embeddings": "vec_id", "events": "event_id",
        "orders": "o_orderkey", "lineitem": "l_orderkey",
    }
    for name in args.tables.split(","):
        # id-block safety: copy blocks are disjoint only while base ids
        # stay under BLOCK
        mx = load_table(spark, args.sf, name).agg(F.max(key_of[name])).first()[0]
        if mx is not None and mx >= BLOCK:
            raise SystemExit(f"{name}: base max id {mx} >= BLOCK {BLOCK}")
        t0 = time.perf_counter()
        out_path = os.path.join(args.out, f"{name}.parquet")
        if name == "events" and args.zipf_users:
            df = scale_events(spark, args.sf, args.mult, zipf_users=args.zipf_users)
        elif name == "documents" and args.docs_zipf:
            df = scale_documents_zipf(spark, args.sf, args.mult)
        elif name == "lineitem" and args.zipf_parts:
            df = scale_lineitem(spark, args.sf, args.mult, zipf_parts=args.zipf_parts)
        else:
            df = SCALERS[name](spark, args.sf, args.mult)
        # spread by the shifted key so every output split mixes copies
        df.repartition(args.partitions).write.mode("overwrite").parquet(out_path)
        n = spark.read.parquet(out_path).count()
        report["tables"][name] = {"rows": n, "sec": round(time.perf_counter() - t0, 1)}
        print(f"{name}: {n:,} rows in {report['tables'][name]['sec']}s", flush=True)
    import shutil

    for name in DIM_TABLES:
        src = os.path.join(args.sf, f"{name}.parquet")
        if os.path.isfile(src):
            # single-file copy keeps the DuckDB-friendly layout
            shutil.copyfile(src, os.path.join(args.out, f"{name}.parquet"))
        elif os.path.isdir(src):
            shutil.copytree(
                src, os.path.join(args.out, f"{name}.parquet"), dirs_exist_ok=True
            )
    with open(os.path.join(args.out, "make_sf.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
