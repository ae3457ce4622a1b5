"""BPE trainer parity: the distributed merge loop (llm/bpe.py) must learn
exactly the merges of a pure-Python reference implementation of Sennrich
et al.'s algorithm — same counts, same lexicographic tie-break, same
left-to-right non-overlapping merge — on arbitrary small corpora."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from financial_data_engineering_spark.llm.bpe import bpe_learn

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_corpora = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


def _ref_bpe(words: list[str], n_merges: int, min_count: int):
    """Pure-Python Sennrich-style BPE on whitespace-free words."""
    vocab = Counter(words)
    segs = {w: [c for c in w] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # max count, then lexicographically smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((a, b, n))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


@_SETTINGS
@given(words=_corpora, n_merges=st.integers(0, 4))
def test_bpe_matches_reference(spark, words, n_merges):
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got_merges, got_vocab = bpe_learn(
        docs, n_merges=n_merges, min_count=2
    )
    want_merges, want_segs = _ref_bpe(words, n_merges, min_count=2)
    assert got_merges == want_merges
    got_segs = {r["word"]: list(r["syms"]) for r in got_vocab.collect()}
    assert got_segs == want_segs


def test_bpe_learns_overlapping_run_left_to_right(spark):
    # "aaaa" x3 — pair (a,a) appears 3 per word pre-merge (9 total);
    # merging left-to-right gives [aa, aa], and round 2 merges (aa, aa).
    docs = spark.createDataFrame(
        [(i, "aaaa") for i in range(3)], "doc_id long, text string"
    )
    merges, vocab = bpe_learn(docs, n_merges=2)
    assert merges == [("a", "a", 9), ("aa", "aa", 3)]
    assert [list(r["syms"]) for r in vocab.collect()] == [["aaaa"]]


def _ref_apply(words, merges):
    """Reference merge application (left-to-right non-overlapping, in
    merge order) — mirrors _ref_bpe's rewrite step."""
    out = {}
    for w in set(words):
        syms = [c for c in w]
        for a, b in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out[w] = syms
    return out


@_SETTINGS
@given(words=_corpora, n_merges=st.integers(0, 4))
def test_bpe_apply_matches_reference(spark, words, n_merges):
    """Encoding parity: learn merges on a corpus, apply them with
    bpe_apply_merges, and the per-doc token counts must equal the
    reference segmentation applied to the same text — the full
    train -> encode loop on one engine pair."""
    from financial_data_engineering_spark.llm.bpe import bpe_apply_merges

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges, _ = bpe_learn(docs, n_merges=n_merges, min_count=2)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_apply_merges(
            docs, [(a, b) for a, b, _ in merges]
        ).collect()
    }
    segs = _ref_apply(words, [(a, b) for a, b, _ in merges])
    want = {i: len(segs[w]) for i, w in enumerate(words)}
    assert got == want


def test_bpe_apply_digest_distinguishes_merge_boundaries(spark):
    """'th'+'e' fused vs 't'+'he' must hash differently — the unit
    separator keeps merge boundaries visible in the digest."""
    from financial_data_engineering_spark.llm.bpe import bpe_apply_merges

    docs = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    a = bpe_apply_merges(docs, [("t", "h")]).collect()[0]  # [th, e]
    b = bpe_apply_merges(docs, [("h", "e")]).collect()[0]  # [t, he]
    assert a["n_tokens"] == 2 and b["n_tokens"] == 2
    assert a["enc_digest"] != b["enc_digest"]
