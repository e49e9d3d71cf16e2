"""Distributed BPE tokenizer training + encoding.

A training-data pipeline needs a tokenizer, and training one over a large
corpus is a canonical "aggregate-then-iterate" job: the corpus-scale work is
ONE word-count shuffle; everything after operates on the word *histogram*,
which is vocabulary-sized (Heaps' law: ~10⁶ distinct words for a 100 TB web
corpus) and therefore safe for driver-coordinated iteration.

Algorithm (Sennrich et al. 2016, arXiv:1508.07909 — byte-pair encoding for
subword units, without the ``</w>`` end-of-word marker; words are split on
non-alphanumerics and lowercased, so symbols are ASCII [a-z0-9] strings):

1. ``word_histogram``: corpus → (word, freq). One shuffle, two-phase count.
2. ``train_bpe``: repeat ``num_merges`` times — count adjacent symbol pairs
   weighted by word freq (vocab-sized explode + aggregate), pick the most
   frequent pair (ties: smaller left, then smaller right symbol — the
   deterministic analog of Sennrich's arbitrary dict order), merge it
   greedily left-to-right in every word. Only ONE (l, r, n) row reaches the
   driver per merge.
3. ``encode_bpe``: corpus-scale ``mapInPandas`` applying the ranked merge
   list per word, with a per-batch word→tokens cache (Zipf: a few thousand
   distinct words cover most tokens of a batch).

Scale contract: step 1 scans the corpus once; step 2 never touches the
corpus again (each merge is a vocab-sized job, lineage truncated per
iteration); step 3 is embarrassingly parallel with the merge table broadcast
(num_merges entries ≪ executor memory).

Reference scope: not a reference-engine operator (Flink has no tokenizer
library); part of the training-data pipeline surface this engine adds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_histogram", "train_bpe", "encode_bpe", "bpe_vocab", "encode_ids"]

_SPLIT = "[^a-z0-9]+"


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the lowercased corpus, split on non-alphanumerics."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), _SPLIT)).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_in_syms(left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one symbol,
    as an Arrow-batched pandas UDF over the vocab-sized symbol table.

    Keeps the classic non-overlap semantics: 'aaa' under merge (a, a)
    becomes [aa, a] — a freshly merged symbol never re-merges with the next
    element within the same pass.

    Why Python and not a Catalyst ``aggregate`` fold: the fold's array
    accumulator is copied on every step (``GenericArrayData.copy`` inside
    ``ArrayAggregate.eval``), making one merge pass O(len²) per word — a
    577-symbol word (a document with no split characters) costs ~330k array
    copies per merge. The linear Python scan over an Arrow batch is ~1000×
    cheaper on long words, and the table this runs on is vocabulary-sized
    by design (never corpus-sized), so the Python path is off the hot scan.
    """
    merged = left + right

    @F.pandas_udf("array<string>")
    def apply_one(col: pd.Series) -> pd.Series:
        def one(syms):
            if left not in syms:  # C-speed reject: most words lack the pair
                return syms
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return col.map(one)

    return apply_one


def train_bpe(
    words: DataFrame,
    num_merges: int,
    min_freq: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a (word, freq) histogram.

    Returns [(left, right, pair_freq), ...] in merge order. Stops early when
    the best pair's weighted frequency drops below ``min_freq``. Each
    iteration runs on the vocabulary-sized symbol table only; exactly one
    row is collected per merge.
    """
    vocab = words.select(
        F.col(freq_col).alias("freq"),
        F.expr(
            f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    def _pair_counts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Map-side combine in Python: one Counter per partition, emitting
        # only the DISTINCT pairs seen there (thousands of rows) instead of
        # exploding every adjacency (len(syms)-1 rows per word). The
        # Catalyst transform→struct→explode alternative is interpreted
        # per element (higher-order functions don't codegen) and shuffles
        # the full adjacency multiset — ~10× slower on a 200k-word vocab.
        import collections

        for pdf in it:
            cnt: collections.Counter = collections.Counter()
            for syms, f in zip(pdf["syms"], pdf["freq"]):
                f = int(f)
                for i in range(len(syms) - 1):
                    cnt[(syms[i], syms[i + 1])] += f
            if cnt:
                ks = list(cnt.keys())
                yield pd.DataFrame(
                    {
                        "l": [k[0] for k in ks],
                        "r": [k[1] for k in ks],
                        "n": [cnt[k] for k in ks],
                    }
                )

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select("freq", "syms")
            .mapInPandas(_pair_counts, schema="l string, r string, n long")
            .groupBy("l", "r")
            .agg(F.sum("n").alias("n"))
        )
        top = (
            pairs.orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_freq:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        # Re-checkpoint per merge: the fold expression would otherwise nest
        # num_merges deep and blow up analysis/codegen time.
        vocab = vocab.withColumn(
            "syms", _merge_in_syms(left, right)(F.col("syms"))
        ).localCheckpoint(eager=True)
    return merges


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference encoder: apply merges in rank order, each pass
    greedy left-to-right — identical semantics to the training fold."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        if left not in syms:  # C-speed reject: this pass can't apply
            continue
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "tokens",
) -> DataFrame:
    """Append ``out_col``: the BPE token array of ``text_col``.

    Corpus-scale path: one mapInPandas pass, merge ranks broadcast via
    closure (a few KB), per-batch word cache so each distinct word is
    encoded once per Arrow batch.
    """
    import pandas as pd

    pairs = [(l, r) for l, r, *_ in merges]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<string>"

    import re

    splitter = re.compile(_SPLIT)

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            toks = cache.get(w)
            if toks is None:
                toks = apply_merges_py(w, pairs)
                cache[w] = toks
            return toks

        for pdf in it:
            toks_col = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in splitter.split(str(text).lower()):
                    if w:
                        toks.extend(enc_word(w))
                toks_col.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = toks_col
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)


#: id 0 is reserved for OOV/unknown (tokens outside the training alphabet)
UNK_ID = 0
_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def bpe_vocab(merges: list[tuple[str, str]] | list[tuple[str, str, int]]) -> dict[str, int]:
    """token -> id table: UNK=0, then the 36-char alphabet, then merged
    tokens in rank order — the deterministic id assignment every tokenizer
    export needs (ids are stable under corpus growth as long as the merge
    list is append-only)."""
    vocab = {"<unk>": UNK_ID}
    for ch in _ALPHABET:
        vocab[ch] = len(vocab)
    for m in merges:
        tok = m[0] + m[1]
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def encode_ids(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col``: array<int> of BPE token ids (UNK for any symbol
    outside the vocabulary). Same corpus-scale shape as :func:`encode_bpe`
    — the id lookup happens inside the same mapInPandas pass."""
    import pandas as pd

    pairs = [(m[0], m[1]) for m in merges]
    vocab = bpe_vocab(merges)
    import re

    splitter = re.compile(_SPLIT)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<int>"

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}

        def enc_word(w: str) -> list[int]:
            ids = cache.get(w)
            if ids is None:
                ids = [vocab.get(t, UNK_ID) for t in apply_merges_py(w, pairs)]
                cache[w] = ids
            return ids

        for pdf in it:
            col = []
            for text in pdf[text_col]:
                ids: list[int] = []
                for w in splitter.split(str(text).lower()):
                    if w:
                        ids.extend(enc_word(w))
                col.append(ids)
            pdf = pdf.copy()
            pdf[out_col] = col
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)
