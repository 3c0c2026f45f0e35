"""Real-BPE unit/property tests: trainer determinism, encode/train
equivalence, persistence round-trip, kernel parity with the pure-Python
reference. The cross-engine contract (DuckDB recursive-CTE oracle) is
covered by test_catalog_oracle[doc_token_counts_bpe]."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from reciping_data_pipeline_spark.functions import bpe

WORDS = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=12
)


def _corpus_counts(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in bpe.pre_tokenize(t):
            wc[w] = wc.get(w, 0) + 1
    return wc


@given(st.lists(st.text(alphabet="ab c", max_size=20), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_encode_matches_training_final_state(texts):
    """Encoding a vocabulary word by rank-order merge application must
    reproduce the token count training itself reached for that word —
    the equivalence the oracle's no-second-phase design relies on."""
    wc = _corpus_counts(texts)
    if not wc:
        return
    merges = bpe.train_bpe(wc, 12)
    # replicate training's final vocab independently
    vocab = {w: list(w) for w in wc}
    for a, b in merges:
        for w in vocab:
            vocab[w] = bpe._apply_merge(vocab[w], a, b, a + b)
    for w in wc:
        assert bpe.encode_token_count(w, merges) == len(vocab[w])


@given(st.lists(WORDS, min_size=0, max_size=30))
@settings(max_examples=50, deadline=None)
def test_merge_pass_preserves_symbol_mass(syms):
    """One merge pass only fuses adjacent (a,b) — concatenating the
    output symbols always reproduces the input string."""
    out = bpe._apply_merge(syms, "a", "b", "ab")
    assert "".join(out) == "".join(syms)
    assert len(out) <= len(syms)


@given(
    st.dictionaries(
        st.text(alphabet="abcde!? ", min_size=1, max_size=10),
        st.integers(min_value=1, max_value=9),
        max_size=40,
    ),
    st.integers(min_value=0, max_value=40),
)
@settings(max_examples=100, deadline=None)
def test_fast_trainer_equals_reference(wc, num_merges):
    """train_bpe_fast (incremental pair counts + lazy-invalidation heap)
    must be output-IDENTICAL to the reference recount loop — same
    merges, same order, same early stop — else the DuckDB recursive-CTE
    oracle (which replays the reference semantics) diverges."""
    assert bpe.train_bpe_fast(dict(wc), num_merges) == bpe.train_bpe(
        dict(wc), num_merges
    )


def test_fast_trainer_equals_reference_on_corpus():
    """Same equivalence on a realistic pre-tokenized corpus with
    repeated-symbol runs (the overlap edge of the one-pass merge)."""
    texts = [
        "the cat sat on the mat",
        "aaaa aaaa baaab",
        "the theme thesis there",
        "don't can't won't it's",
        "ababab ababab abab",
    ] * 3
    wc = _corpus_counts(texts)
    for n in (0, 1, 7, 30, 500):
        assert bpe.train_bpe_fast(dict(wc), n) == bpe.train_bpe(dict(wc), n)


def test_trainer_deterministic_and_tie_break():
    # 'ab' and 'cd' both appear twice; ('a','b') < ('c','d') wins first.
    wc = {"ab": 2, "cd": 2}
    assert bpe.train_bpe(wc, 2) == [("a", "b"), ("c", "d")]
    # early stop: everything fully merged before the budget runs out
    assert bpe.train_bpe({"ab": 1}, 10) == [("a", "b")]
    assert bpe.train_bpe({"x": 5}, 10) == []


def test_oov_word_encodes_with_learned_merges():
    merges = bpe.train_bpe({"lower": 3, "lowest": 2}, 4)
    # 'low' never seen alone, but shares learned subwords
    assert bpe.encode_token_count("low", merges) < 3
    # fully unseen alphabet degrades to characters, never crashes
    assert bpe.encode_token_count("XYZ", merges) == 3
    assert bpe.encode_token_count("", merges) == 0


def test_fit_persist_roundtrip_and_kernel_parity(spark):
    texts = [
        "the cat sat on the mat, the cat!",
        "it's the cats' mats -- they're the best 123 12345 !!",
        "low lower lowest newer newest wider wide widest",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe.fit_bpe_merges(df, "text", num_merges=20)
    assert merges  # learned something
    # persistence round-trip preserves rank order exactly
    assert bpe.merges_from_df(bpe.merges_to_df(spark, merges)) == merges
    # Arrow kernel == pure-Python reference per document
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.bpe_token_count_udf(merges)(df.text).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        expected = sum(bpe.encode_token_count(w, merges) for w in bpe.pre_tokenize(t))
        assert got[i] == expected
    # max_vocab cap is deterministic and still encodes everything
    capped = bpe.fit_bpe_merges(df, "text", num_merges=20, max_vocab=5)
    capped2 = bpe.fit_bpe_merges(df.repartition(7), "text", num_merges=20, max_vocab=5)
    assert capped == capped2


@given(st.lists(st.text(alphabet="ab cde", max_size=20), min_size=1, max_size=25))
@settings(max_examples=60, deadline=None)
def test_ranked_encode_equals_rank_order_encode(texts):
    """The O(len²) lowest-rank-present greedy encode must be
    output-identical to the O(merges×len) rank-order pass for any merge
    table a real training run can produce — including on OOV words
    (never seen in training) built from the same alphabet."""
    wc = _corpus_counts(texts)
    if not wc:
        return
    merges = bpe.train_bpe(wc, 15)
    ranks = {p: i for i, p in enumerate(merges)}
    probe = list(wc) + ["".join(sorted(wc))[:16], "abcde", "aabbccddee", ""]
    for w in probe:
        assert bpe.encode_token_count_ranked(w, ranks) == bpe.encode_token_count(
            w, merges
        ), (w, merges)
