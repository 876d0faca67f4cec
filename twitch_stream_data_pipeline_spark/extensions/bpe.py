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

#: end-of-word marker appended to each word's last character (the
#: Sennrich convention: merges crossing word boundaries are impossible,
#: and a token knows whether it ends a word)
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: lowercase whitespace words -> ``(word, freq)``.

    The ONLY corpus-sized operation in BPE training; everything after
    runs on this vocabulary-sized relation."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
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
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, the BPE
    token array (merges replayed in learned order — inference is a
    fixed pipeline of fold expressions, fully JVM-side). Returns
    ``doc_id, tokens array<string>, n_bpe_tokens``.

    Token order is document order: the gather keys on (word position,
    symbol position) and sorts the collected structs, so the result is
    byte-identical under any partitioning — a bare ``collect_list``
    after a shuffle would not be."""
    words = df.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("wpos", "word"),
    ).filter(F.col("word") != "")
    out = words.select("doc_id", "wpos", _initial_symbols().alias("symbols"))
    for left, right in merges:
        out = out.select(
            "doc_id", "wpos", _merge_fold(left, right).alias("symbols")
        )
    toks = out.select(
        "doc_id", "wpos", F.posexplode("symbols").alias("spos", "tok")
    )
    gathered = toks.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("wpos", "spos", "tok"))
        ).alias("g")
    )
    return gathered.select(
        "doc_id",
        F.transform("g", lambda s: s["tok"]).alias("tokens"),
        F.size("g").cast("long").alias("n_bpe_tokens"),
    )
