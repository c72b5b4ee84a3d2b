"""Byte-pair-encoding tokenizer: distributed vocabulary training and
Arrow-vectorized encoding.

Reference behavior: the classic word-frequency BPE of Sennrich et al.
(2016, "Neural Machine Translation of Rare Words with Subword Units")
with GPT-2-style greedy rank-order application at encode time. The
training-data counterpart in the reference ecosystem is the tokenizer
step every LLM corpus pipeline runs after curation; logstash itself has
no tokenizer (its closest analog is the csv/kv tokenization family),
so this is part of the training-data-pipeline surface the brief adds.

Scale design (100 TB):
- `bpe_train` makes exactly ONE full pass over the corpus — a
  whitespace-split explode + groupBy word count (map-side partial
  aggregation, one keyed shuffle). Everything after operates on the
  TOP-`top_words` word-frequency table, which is bounded (default 50k
  rows ≈ a few MB) before it is collected; merge learning is
  O(top_words · num_merges) driver-side — the same bounded-sample
  strategy production tokenizer trainers use. No per-iteration cluster
  pass.
- `bpe_encode` is an Arrow `pandas_udf` (the canonical slow-path
  escape: an iterative merge loop Catalyst cannot express). The merges
  table rides the UDF closure (broadcast-sized by construction: ≤
  num_merges pairs), and a per-executor memo caches word→tokens —
  natural-language word frequency is Zipfian, so the hit rate is high;
  the memo is capped to bound executor memory.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_MEMO_CAP = 200_000


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 200,
    top_words: int = 50_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus.

    Deterministic: ties on pair count break on the lexicographically
    smallest (left, right) pair, and the word table is truncated by
    (count desc, word asc) — the same corpus always yields the same
    merges regardless of partitioning.
    """
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = (
        df.select(F.explode(F.split(text, r"\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {tuple(r["w"]): r["c"] for r in words}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def _bpe_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    memo: dict[str, tuple[str, ...]],
) -> tuple[str, ...]:
    hit = memo.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank = len(ranks)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and r < best_rank:
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                out.append(best[0] + best[1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    result = tuple(syms)
    if len(memo) < _MEMO_CAP:
        memo[word] = result
    return result


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    *,
    target: str = "bpe_tokens",
    word_sep: str | None = "▁",
    lowercase: bool = False,
) -> DataFrame:
    """Apply a learned merges table: whitespace-split words, greedy
    rank-order BPE per word, flattened to one token array per row.
    `word_sep` (when set) is emitted as a standalone boundary token
    between words — it must not appear inside any merge NOR anywhere in
    the text (or decode cannot distinguish it from a literal char; the
    default is SentencePiece's U+2581 '▁', which never occurs in
    log/crawl data — pass e.g. '_' only for corpora verified clean of
    it). Null text → empty array."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sep = word_sep

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(s: pd.Series) -> pd.Series:
        memo: dict[str, tuple[str, ...]] = {}

        def one(text: str | None) -> list[str]:
            if not text:
                return []
            if lowercase:
                text = text.lower()
            toks: list[str] = []
            first = True
            for w in text.split():
                if not first and sep is not None:
                    toks.append(sep)
                first = False
                toks.extend(_bpe_word(w, ranks, memo))
            return toks

        return s.map(one)

    return df.withColumn(target, _encode(F.col(text_col)))


def bpe_decode(
    df: DataFrame,
    tokens_col: str,
    *,
    target: str = "text_decoded",
    word_sep: str | None = "▁",
) -> DataFrame:
    """Invert `bpe_encode`: concatenate the token strings, mapping the
    boundary token back to a single space. BPE merges only ever join
    characters of one word, so decode needs no merge table — it is pure
    column algebra (ONE transform + concat_ws, zero shuffle, zero UDF).
    Roundtrip contract: decode(encode(text)) == whitespace-normalized
    text (encode splits on arbitrary whitespace runs), PROVIDED
    `word_sep` does not occur in the text — every standalone token equal
    to it becomes a space, which is why the default is U+2581 '▁'."""
    col = F.col(tokens_col)
    if word_sep is None:
        return df.withColumn(target, F.concat_ws("", col))
    return df.withColumn(
        target,
        F.concat_ws(
            "",
            F.transform(
                col,
                lambda t: F.when(t == F.lit(word_sep), F.lit(" ")).otherwise(t),
            ),
        ),
    )
