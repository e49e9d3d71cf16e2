"""Property tests for the BPE trainer/encoder semantics.

Drives the PURE-PYTHON merge/encode machinery (text/bpe.apply_merges_py and
an independent pair-count replica) under hypothesis — no SparkSession, so
hundreds of random corpora sweep in seconds. The Spark-side equivalence is
pinned separately by tests/test_bpe.py and the golden-parquet oracle.
"""

from __future__ import annotations

import collections

from hypothesis import given, settings
from hypothesis import strategies as st

from fries_flink_spark.text.bpe import apply_merges_py, bpe_vocab

words = st.text(alphabet="abc0", min_size=1, max_size=12)
corpora = st.lists(words, min_size=1, max_size=40)


def _train_py(corpus: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Independent trainer replica (same tie-break contract)."""
    wc = collections.Counter(corpus)
    items = [[list(w), f] for w, f in wc.items()]
    merges = []
    for _ in range(num_merges):
        cnt: collections.Counter = collections.Counter()
        for syms, f in items:
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        if not cnt:
            break
        (left, right), n = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((left, right))
        for item in items:
            item[0] = _apply_one(item[0], left, right)
    return merges


def _apply_one(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(corpora)
@settings(max_examples=150, deadline=None)
def test_encode_reassembles_to_input(corpus):
    merges = _train_py(corpus, 8)
    for w in corpus:
        assert "".join(apply_merges_py(w, merges)) == w


@given(corpora)
@settings(max_examples=150, deadline=None)
def test_tokens_are_vocab_members(corpus):
    merges = _train_py(corpus, 8)
    vocab = bpe_vocab([(l, r, 0) for l, r in merges])
    for w in corpus:
        for tok in apply_merges_py(w, merges):
            assert tok in vocab  # alphabet chars or learned merges only


@given(corpora)
@settings(max_examples=100, deadline=None)
def test_merges_never_increase_token_count(corpus):
    merges = _train_py(corpus, 8)
    for w in corpus:
        prev = len(w)
        for t in range(len(merges) + 1):
            n = len(apply_merges_py(w, merges[:t]))
            assert n <= prev
            prev = n
