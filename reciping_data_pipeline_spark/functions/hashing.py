"""Shingling and LSH-banding column expressions.

Shingle generation, base hashing, band bucketing and Hamming distance
are native Spark expressions (``transform`` / ``slice`` /
``xxhash64`` / ``bit_count``) — small trees that codegen well. The
dense sketch kernels (MinHash signatures, SimHash, hyperplane
signatures) live in functions/sketches.py as Arrow-vectorized Pandas
UDFs: as Catalyst expressions their 64-way expansion built
multi-thousand-node trees that OOMed analysis/codegen. This is the
standard MinHash-LSH construction (Broder 1997; Leskovec et al.,
MMDS ch.3) and SimHash (Charikar 2002).

Scale notes (100 TB posture): per-document sketch computation is
embarrassingly parallel and pipelined inside the scan stage; only the
(band_idx, band_hash) exchange shuffles, and its fan-out is bounded
by documents x bands rows of ~24 bytes. Bucket skew (a degenerate
band value grouping millions of docs) is handled by AQE skew-join
splitting plus an optional per-bucket cap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Mersenne prime 2^31-1 for the universal-hash family
# h_i(x) = (a_i*x + b_i) mod p. Chosen so a*x + b stays below 2^63
# (a, x < p => a*x < 2^62) — no silent Java long overflow, which would
# corrupt the permutation family.
_MERSENNE_P = (1 << 31) - 1


def word_shingles(tokens_col: Column, k: int = 5) -> Column:
    """Distinct k-word shingles of a token array, as strings.

    ``transform(sequence(0, n-k), i -> concat_ws(' ', slice(toks, i+1, k)))``
    — pure Catalyst, no UDF. Returns empty array when n < k (guarded:
    Spark's sequence(0, -1) would count DOWN, not produce empty).
    """
    n = F.size(tokens_col)
    shingles = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, k)),
    )
    empty = F.array().cast("array<string>")
    return F.when(n >= k, F.array_distinct(shingles)).otherwise(empty)


def shingle_hashes(shingles: Column) -> Column:
    """Non-negative 31-bit base hashes of each shingle (xxhash64 -> mod p)."""
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P)))


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutations.
    Derived from a fixed LCG so runs are reproducible across sessions."""
    params, state = [], seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a MinHash signature (array<bigint>) into bands; hash each
    band to one bigint. Returns array<struct<band_idx int, band_hash
    bigint>> ready to explode into the bucket join."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures: popcount(a XOR b)
    via bit_count (native in Spark 3.3+)."""
    return F.bit_count(a.bitwiseXOR(b))
