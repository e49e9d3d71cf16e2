"""BPE tokenizer training/encoding unit tests (text/bpe.py).

Hand-checkable fixture: Sennrich-style merge order is fully determined by
integer pair counts with (freq desc, left asc, right asc) ties.
"""

from __future__ import annotations

import pytest

from fries_flink_spark.text.bpe import (
    apply_merges_py,
    encode_bpe,
    train_bpe,
    word_histogram,
)


def _hist(spark, rows):
    return spark.createDataFrame(rows, "text string").transform(
        lambda df: word_histogram(df, "text")
    )


def test_word_histogram_lowercases_and_splits(spark):
    h = {
        r["word"]: r["freq"]
        for r in _hist(spark, [("Low low LOW!",), ("ab-ab cd",)]).collect()
    }
    assert h == {"low": 3, "ab": 2, "cd": 1}


def test_train_bpe_merge_order(spark):
    # 'abab' x3 + 'abc' x2: pair counts a-b:8, b-a:3, b-c:2 → first merge
    # (a,b). Then 'ab','ab' adjacency gives (ab,ab):3 vs (ab,c):2 → second
    # merge (ab,ab).
    h = _hist(spark, [("abab abab abab abc abc",)])
    merges = train_bpe(h, num_merges=2)
    assert [(m[0], m[1]) for m in merges] == [("a", "b"), ("ab", "ab")]
    assert merges[0][2] == 8


def test_train_ties_break_lexicographically(spark):
    # 'xy' and 'ab' both occur twice: (a,b) wins the tie over (x,y).
    merges = train_bpe(_hist(spark, [("xy xy ab ab",)]), num_merges=1)
    assert (merges[0][0], merges[0][1]) == ("a", "b")


def test_greedy_merge_no_overlap(spark):
    # 'aaa': overlapping pair (a,a) counts 2 per word, but the merge pass is
    # non-overlapping: aaa -> [aa, a].
    merges = train_bpe(_hist(spark, [("aaa aaa",)]), num_merges=1)
    assert (merges[0][0], merges[0][1]) == ("a", "a")
    assert apply_merges_py("aaa", [("a", "a")]) == ["aa", "a"]
    assert apply_merges_py("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_min_freq_stops_training(spark):
    merges = train_bpe(_hist(spark, [("ab",)]), num_merges=5, min_freq=2)
    assert merges == []


def test_encode_matches_python_reference(spark):
    df = spark.createDataFrame([(1, "abab cd"), (2, "ABC! aaa")], "id int, text string")
    merges = [("a", "b", 9), ("ab", "ab", 5), ("a", "a", 3)]
    out = {r["id"]: r["tokens"] for r in encode_bpe(df, "text", merges).collect()}
    pairs = [("a", "b"), ("ab", "ab"), ("a", "a")]
    assert out[1] == apply_merges_py("abab", pairs) + apply_merges_py("cd", pairs)
    assert out[2] == apply_merges_py("abc", pairs) + apply_merges_py("aaa", pairs)
    assert out[1] == ["abab", "c", "d"]
    assert out[2] == ["ab", "c", "aa", "a"]


def test_train_then_encode_roundtrip(spark):
    # Tokens always reassemble to the original normalized words.
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the mat was flat",)], "text string"
    )
    merges = train_bpe(word_histogram(df, "text"), num_merges=6, min_freq=1)
    out = encode_bpe(df.limit(1), "text", merges).collect()[0]["tokens"]
    assert "".join(out) == "thecatsatonthemat"


def test_unigram_logcost_hand_check(spark):
    import math

    from fries_flink_spark.text.lm import doc_logcost, unigram_model

    # corpus: 'a a a b' -> freq a=3, b=1, total=4
    df = spark.createDataFrame([(1, "a a a b"), (2, "b b")], "id int, t string")
    model, total = unigram_model(df, "t")
    assert total == 6  # a:3, b:3
    out = {r["id"]: r for r in doc_logcost(df, "t", "id", model, total).collect()}
    c = int(math.floor((math.log(6.0) - math.log(3.0)) * 1e6 + 0.5))
    assert out[1]["n_tokens"] == 4 and out[1]["cost_micro"] == 4 * c
    assert out[2]["mean_cost_micro"] == c


def test_unigram_oov_add_one(spark):
    import math

    from fries_flink_spark.text.lm import doc_logcost, unigram_model

    train = spark.createDataFrame([(1, "seen words only"),], "id int, t string")
    model, total = unigram_model(train, "t")
    new = spark.createDataFrame([(9, "unseen")], "id int, t string")
    out = doc_logcost(new, "t", "id", model, total).collect()[0]
    # OOV cost = ln(total) - ln(1)
    assert out["cost_micro"] == int(math.floor(math.log(float(total)) * 1e6 + 0.5))


def test_bpe_vocab_ids_stable_and_unk(spark):
    from fries_flink_spark.text.bpe import UNK_ID, bpe_vocab, encode_ids

    merges = [("a", "b", 9), ("ab", "c", 5)]
    v = bpe_vocab(merges)
    assert v["<unk>"] == UNK_ID and v["a"] == 1 and v["z"] == 26
    assert v["ab"] == 37 and v["abc"] == 38  # merged tokens after alphabet
    # appending a merge never renumbers existing tokens
    v2 = bpe_vocab(merges + [("c", "d", 2)])
    assert all(v2[t] == i for t, i in v.items())

    df = spark.createDataFrame([(1, "abc zq ab")], "id int, t string")
    out = encode_ids(df, "t", merges).collect()[0]["token_ids"]
    # 'abc' -> [abc]; 'zq' -> [z, q]; 'ab' -> [ab]
    assert out == [38, 26, 17, 37]


def test_doc_logppl_fused_equals_two_pass(spark, sf_dir):
    """The one-job doc_logppl must reproduce doc_logcost∘unigram_model
    exactly (integer micro-nats) on real fixture text."""
    from fries_flink_spark.catalog import load_table
    from fries_flink_spark.text.lm import doc_logcost, doc_logppl, unigram_model

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200")
    model, total = unigram_model(docs, "text")
    two = {
        r["doc_id"]: (r["n_tokens"], r["cost_micro"], r["mean_cost_micro"])
        for r in doc_logcost(docs, "text", "doc_id", model, total).collect()
    }
    one = {
        r["doc_id"]: (r["n_tokens"], r["cost_micro"], r["mean_cost_micro"])
        for r in doc_logppl(docs, "text", "doc_id").collect()
    }
    assert one == two and len(one) > 0
