"""Distributed BPE (byte-pair encoding) tokenizer training.

``bpe_ish_token_count`` (functions/text.py) is a regex stand-in for a
trained tokenizer; this module trains the real thing — the merge table —
from the corpus, the way an LLM data pipeline would (Sennrich et al.,
ACL 2016).

Scale design: BPE statistics live on the WORD VOCABULARY, not the corpus.
The one corpus-scale pass is the initial word count (explode + partial-agg
groupBy — the x1 shape); every merge iteration after that runs on the
vocab table (|distinct words| rows — millions, not billions, at 100 TB):

1. pair counting: a pure-column ``transform`` over adjacent symbol pairs,
   posexplode, groupBy(pair) weighted by word count — partial-agg shuffle
   of vocab-scale rows;
2. best pair selection: one driver-side top-1 (count DESC, pair ASC —
   deterministic tie-break);
3. merge application: Arrow-batched pandas UDF rewriting each word's
   symbol array (sequential within a word, so no pure-HOF form exists —
   the d2-established escape hatch), map-only, no shuffle.

The vocab is localCheckpointed every iteration so the iterative plan never
deepens (same discipline as graph/closure.py).

Words carry an end-of-word sentinel ``</w>`` on the last character so
merges distinguish suffix from interior occurrences, per the paper.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import PandasUDFType, pandas_udf
from pyspark.sql.types import ArrayType, StringType

EOW = "</w>"


def _initial_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(symbols array<string>, n bigint) — distinct words as char symbols,
    last char tagged with the end-of-word sentinel."""
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
    ).where(F.col("w") != "")
    counts = words.groupBy("w").agg(F.count("*").alias("n"))
    chars = F.split(F.col("w"), "")
    sym = F.transform(
        chars,
        lambda c, i: F.when(i == F.size(chars) - 1, F.concat(c, F.lit(EOW))).otherwise(
            c
        ),
    )
    return counts.select(sym.alias("symbols"), F.col("n"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the vocab, weighted by word frequency."""
    s = F.col("symbols")
    pairs = F.transform(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
        lambda c, i: F.concat(c, F.lit("\x00"), F.element_at(s, i + 2)),
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge_udf(left: str, right: str):
    merged = left + right

    def _merge(col: pd.Series) -> pd.Series:
        def one(syms):
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

    # explicit PandasUDFType: `from __future__ import annotations` breaks
    # hint inference (CLAUDE.md invariant)
    return pandas_udf(_merge, ArrayType(StringType()), PandasUDFType.SCALAR)


def bpe_train(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns (merges — ordered list of (left, right) symbol pairs — and the
    final vocab DataFrame (symbols, n)). Stops early when no pair occurs
    more than once.
    """
    vocab = _initial_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["pair"].split("\x00", 1)
        merges.append((left, right))
        vocab = vocab.select(
            _apply_merge_udf(left, right)(F.col("symbols")).alias("symbols"),
            "n",
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge table: one Arrow-batched map-only pass
    (the merge list broadcasts inside the UDF closure). Returns the input
    plus ``bpe_tokens array<string>`` and ``n_bpe_tokens``."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode(col: pd.Series) -> pd.Series:
        def word_syms(w):
            return [*w[:-1], w[-1] + EOW] if w else []

        def one(text):
            toks = []
            for w in str(text).lower().split():
                syms = word_syms(w)
                while len(syms) > 1:
                    best, bi = None, -1
                    for i in range(len(syms) - 1):
                        r = ranks.get((syms[i], syms[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, bi = r, i
                    if best is None:
                        break
                    syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
                toks.extend(syms)
            return toks

        return col.map(one)

    _encode_udf = pandas_udf(_encode, ArrayType(StringType()), PandasUDFType.SCALAR)
    return docs.withColumn("bpe_tokens", _encode_udf(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    )
