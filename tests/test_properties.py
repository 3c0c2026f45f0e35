"""Hypothesis property tests for the pure-Python/numpy kernels (no
Spark session — these run in milliseconds and cover the combinatorial
input space the example-based tests can't)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from reciping_data_pipeline_spark.functions.hashing import _MERSENNE_P, _perm_params
from reciping_data_pipeline_spark.operators.multimodal import _fake_decode
from reciping_data_pipeline_spark.pipeline.datagen import ab_group
from reciping_data_pipeline_spark.sources.jsonl import interval_paths

_dt = st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2099, 12, 31))


@given(start=_dt, minutes=st.integers(min_value=1, max_value=24 * 60))
@settings(max_examples=200, deadline=None)
def test_interval_paths_cover_and_align(start, minutes):
    end = start + timedelta(minutes=minutes)
    paths = interval_paths("/s", start, end)
    assert paths  # non-empty for any non-empty interval
    assert len(paths) == len(set(paths))  # no duplicate buckets
    # each path's bucket is 15-min aligned and within [start-15m, end)
    for p in paths:
        parts = dict(kv.split("=") for kv in p.split("/")[2:])
        t = datetime(
            int(parts["year"]), int(parts["month"]), int(parts["day"]),
            int(parts["hour"]), int(parts["minute"]),
        )
        assert t.minute % 15 == 0
        assert start - timedelta(minutes=15) < t < end
    # first bucket contains `start`
    first = paths[0]
    assert f"minute={(start.minute // 15) * 15:02d}" in first


@given(uid=st.text(min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_ab_group_deterministic_and_binary(uid):
    g = ab_group(uid)
    assert g in ("treatment", "control")
    assert ab_group(uid) == g  # stable


@given(n=st.integers(min_value=1, max_value=256), seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=100, deadline=None)
def test_perm_params_in_field(n, seed):
    params = _perm_params(n, seed)
    assert len(params) == n
    for a, b in params:
        assert 1 <= a < _MERSENNE_P  # a=0 would collapse the permutation
        assert 0 <= b < _MERSENNE_P
        # a * x + b stays below 2^63 for x < p (no silent long overflow)
        assert a * (_MERSENNE_P - 1) + b < 2**63


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_fake_decode_deterministic_and_bounded(data):
    w, h, c, luma = _fake_decode(data)
    assert (w, h, c, luma) == _fake_decode(data)
    assert 64 <= w < 256 and 64 <= h < 256 and c == 3
    assert 0.0 <= luma <= 1.0


@given(
    hashes=st.lists(
        st.lists(st.integers(min_value=0, max_value=_MERSENNE_P - 1), min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_minhash_batch_equals_rowwise(spark, hashes):
    """The reduceat-vectorized MinHash kernel must equal the naive
    per-row formulation bit-for-bit. (`spark` fixture: pandas_udf needs
    an active context just to parse its return-type DDL; the kernel
    itself runs driver-side here.)"""
    import pandas as pd

    from reciping_data_pipeline_spark.functions import sketches

    num_perm, seed = 16, 42
    params = _perm_params(num_perm, seed)
    a = np.array([p[0] for p in params], dtype=np.uint64).reshape(-1, 1)
    b = np.array([p[1] for p in params], dtype=np.uint64).reshape(-1, 1)

    udf_fn = sketches.minhash_signature_udf(num_perm, seed)
    batch = udf_fn.func(pd.Series([np.array(h, dtype=np.int64) for h in hashes]))

    for got, h in zip(batch, hashes):
        if not h:
            assert list(got) == [_MERSENNE_P] * num_perm
            continue
        hv = np.asarray(h, dtype=np.uint64)
        want = ((a * hv + b) % np.uint64(_MERSENNE_P)).min(axis=1).astype(np.int64)
        assert list(got) == list(want)


@given(
    amp=st.integers(min_value=0, max_value=32_767),
    n_frames=st.integers(min_value=0, max_value=4_096),
)
@settings(max_examples=150, deadline=None)
def test_wav_codec_round_trip_exact(amp, n_frames):
    """The real WAV codec round-trips exactly for any (amp, frames):
    square-wave RMS equals the amplitude, frame count and duration are
    preserved, including the empty-audio edge."""
    from reciping_data_pipeline_spark.operators.multimodal import (
        decode_wav_bytes,
        synth_wav_bytes,
    )

    nch, sr, nf, dur_ms, rms = decode_wav_bytes(synth_wav_bytes(amp, n_frames))
    assert (nch, sr, nf) == (1, 16_000, n_frames)
    assert dur_ms == n_frames * 1000 // 16_000
    assert rms == (amp if n_frames else 0)


@given(
    names=st.lists(
        st.sampled_from("abcdefgh"), min_size=1, max_size=8, unique=True
    ),
    extra=st.lists(
        st.sampled_from("wxyz"), min_size=0, max_size=4, unique=True
    ),
    split=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_evolved_schema_is_additive_and_order_stable(names, extra, split):
    """snapshots._evolved_schema_json: parent column order is preserved,
    new columns append in incoming order, overlap is idempotent, and
    same-name/same-type overlap never raises."""
    from pyspark.sql.types import LongType, StructField, StructType

    from reciping_data_pipeline_spark.sources.snapshots import _evolved_schema_json

    parent = StructType([StructField(n, LongType()) for n in names])
    incoming_names = names[split:] + extra  # overlap + new columns
    incoming = StructType([StructField(n, LongType()) for n in incoming_names])
    out = StructType.fromJson(
        __import__("json").loads(_evolved_schema_json(parent.json(), incoming))
    )
    assert [f.name for f in out] == names + [n for n in incoming_names if n not in names]
    # idempotent: evolving again with the same incoming changes nothing
    assert _evolved_schema_json(out.json(), incoming) == out.json()


@given(name=st.sampled_from("abc"))
@settings(max_examples=10, deadline=None)
def test_evolved_schema_type_conflict_always_raises(name):
    import json as _json

    import pytest as _pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from reciping_data_pipeline_spark.sources.snapshots import _evolved_schema_json

    parent = StructType([StructField(name, LongType())])
    incoming = StructType([StructField(name, StringType())])
    with _pytest.raises(ValueError):
        _evolved_schema_json(parent.json(), incoming)
