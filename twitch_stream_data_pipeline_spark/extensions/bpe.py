"""Distributed BPE tokenizer training (SURVEY.md §2.9 tier).

Byte-pair-encoding merge learning (Sennrich et al., arXiv:1508.07909)
is the tokenizer-training step of every LLM data pipeline. The
distributed structure that makes it cluster-cheap: the CORPUS is
scanned exactly once (a word-frequency aggregation — one shuffle,
collapsing 100 TB of text to a vocabulary-sized table); every merge
round then runs over that distinct-word table, whose size is the
word-form vocabulary (10^5-10^7 rows), independent of corpus volume.
A round is one adjacent-pair count (explode + freq-weighted groupBy —
map-side combined) and one driver-side argmax of a single row; the
merge application is a per-word left-to-right greedy fold, a pure
column expression. Lineage is truncated per round (lazy
localCheckpoint, the connected_components rule).

Determinism: ties on pair frequency break lexicographically
(freq DESC, left ASC, right ASC) — the merge SEQUENCE is bit-stable
under any partitioning (integer counts, no floats anywhere), pinned
against a pure-Python reference trainer in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import tokenize

#: end-of-word marker appended to each word's last character (the
#: Sennrich convention: merges crossing word boundaries are impossible,
#: and a token knows whether it ends a word)
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: lowercase whitespace words -> ``(word, freq)``.

    The ONLY corpus-sized operation in BPE training; everything after
    runs on this vocabulary-sized relation. Word splitting is the
    house :func:`~.text_analysis.tokenize` rule, shared with
    token_count and the dedup shingles, so BPE can never tokenize
    differently than the rest of the engine."""
    return (
        df.select(
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols() -> F.Column:
    """word -> array of single characters, EOW appended to the last."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """Greedy left-to-right single-round merge of adjacent
    ``(left, right)`` symbol pairs, as one aggregate() fold — after a
    merge fires, its product cannot chain into the next pair within
    the same round (the BPE convention): the fold compares the
    accumulator's LAST element, which is already the merged token."""
    merged = F.lit(left + right)
    return F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a corpus; returns the merge
    table ``(rank, left, right, pair_freq)`` in learned order — the
    artifact a tokenizer ships. Stops early when no adjacent pair
    reaches ``min_pair_freq`` (merging singletons is noise).

    See the module docstring for the scale shape; the corpus is read
    once, each round costs one vocabulary-sized shuffle + a 1-row
    driver collect (the argmax — bounded model state, the IVF
    quantizer contract).
    """
    spark = df.sparkSession
    vocab = (
        word_frequencies(df, text_col)
        .select("freq", _initial_symbols().alias("symbols"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        n = F.size("symbols")
        pairs = (
            vocab.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice("symbols", 1, n - 1),
                        F.slice("symbols", 2, n - 1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        top = pairs.orderBy(
            F.desc("pair_freq"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not top or top[0]["pair_freq"] < min_pair_freq:
            break
        left, right, pf = top[0]["l"], top[0]["r"], int(top[0]["pair_freq"])
        merges.append((rank, left, right, pf))
        vocab = vocab.select(
            "freq", _merge_fold(left, right).alias("symbols")
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: one row per input
    document with the BPE token array (merges replayed in learned
    order — inference is a fixed pipeline of fold expressions, fully
    JVM-side). Returns ``id_col, tokens array<string>,
    n_bpe_tokens``; documents with no words keep an empty array and
    count 0 (never dropped).

    Scale shape, matching the module thesis: the merge folds run ONCE
    PER DISTINCT WORD (vocabulary-sized), and the per-occurrence work
    is only the join of the ``word -> tokens`` table back onto the
    (doc, position, word) rows — a corpus with N occurrences over a
    vocabulary V pays V fold pipelines, not N. Token order is
    document order: the gather keys on (word position, symbol
    position) and sorts the collected structs, so the result is
    byte-identical under any partitioning."""
    words = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            tokenize(F.lower(F.col(text_col)))
        ).alias("wpos", "word"),
    ).filter(F.col("word") != "")
    seg = words.select("word").distinct().select(
        "word", _initial_symbols().alias("symbols")
    )
    for left, right in merges:
        seg = seg.select("word", _merge_fold(left, right).alias("symbols"))
    toks = words.join(seg, "word").select(
        "__id", "wpos", F.posexplode("symbols").alias("spos", "tok")
    )
    gathered = toks.groupBy("__id").agg(
        F.sort_array(
            F.collect_list(F.struct("wpos", "spos", "tok"))
        ).alias("g")
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(gathered, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(
                F.transform("g", lambda s: s["tok"]),
                F.array().cast("array<string>"),
            ).alias("tokens"),
            F.coalesce(F.size("g").cast("long"), F.lit(0)).alias(
                "n_bpe_tokens"
            ),
        )
    )
