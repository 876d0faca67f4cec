"""Distributed supervised text classification: multinomial Naive Bayes.

The quality/language classifiers of LLM data pipelines (the GPT-3 /
LLaMA pretraining filters are linear classifiers over text features;
fastText-style models dominate production curation) reduce to exactly
this distributable shape: **training is one aggregation** (per-class
term counts), **inference is one sparse join plus an argmax window**.
Multinomial NB with add-one smoothing is the dependency-free member of
that family — the same plan shape carries any linear bag-of-words
model (swap the log-count weight column for a learned one).

Scale shape (the TF-IDF / unigram-LM economics, SURVEY.md §2.9):

- training shuffles only ``(label, term) -> count`` — map-side partial
  aggregation, vocabulary-sized output, never document bodies;
- the model relation (``label x term``) is broadcast by default
  (``broadcast_model=False`` for web-scale vocabularies — the join
  stays a plain shuffle join on the high-cardinality ``term`` key);
- inference never materializes the dense ``doc x class x vocab``
  tensor: the smoothing floor folds into a per-(doc, class) closed
  form ``ln P(d|c) = -n_tokens * ln(n_tok_c + V)`` and only *matched*
  (doc-term ∩ class-term) pairs join — the sparse part;
- the per-class constants (prior, smoothing denominator) are a
  classes-sized relation crossed onto per-doc stats with a broadcast:
  linear in docs x classes;
- the argmax is one ``row_number`` window per doc (WindowGroupLimit
  prunes map-side), tie-broken on the class name.

Determinism contract (Spark == DuckDB bit-for-bit): the matched-term
log-weight sum is decimal(25,6)-routed (order-independent); every
other float op is a fixed-order double expression (``ln``-portability
established by the unigram-LM query); argmax ties break on label.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import tokenize

__all__ = ["nb_train", "nb_predict", "nb_evaluate"]


def _terms(df: DataFrame, key: Column, text_col: str) -> DataFrame:
    """``(key, term)`` exploded lowercase whitespace tokens."""
    return df.select(
        key.alias("__key"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    )


def nb_train(
    train: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB; returns ``(term_counts, class_consts)``.

    ``term_counts``: ``label, term, cnt`` — the model proper, one
    map-side-combined aggregation of the exploded training corpus.

    ``class_consts``: ``label, ln_prior, ln_denom`` — per-class scoring
    constants: ``ln_prior = ln(n_docs_c / n_train)`` and ``ln_denom =
    ln(n_tok_c + V)`` (the add-one smoothing denominator, ``V`` =
    training vocabulary size). Classes-sized — always broadcastable.
    """
    toks = _terms(train, F.col(label_col), text_col).withColumnRenamed(
        "__key", "label"
    )
    # lazy checkpoint (the bm25_topk candidates pattern): term_counts
    # has three consumers (class totals, vocabulary size, the inference
    # join) — without materialization each one re-tokenizes the whole
    # training corpus for a vocabulary-sized aggregate. The relation is
    # |classes| x |vocab| rows, corpus-independent in size.
    term_counts = (
        toks.groupBy("label", "term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    class_tok = term_counts.groupBy("label").agg(F.sum("cnt").alias("n_tok"))
    class_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    n_train = class_docs.agg(F.sum("n_docs").alias("n_train"))
    vocab = term_counts.agg(
        F.count_distinct("term").alias("v_size")
    )
    class_consts = (
        class_docs.join(class_tok, "label")
        .crossJoin(F.broadcast(n_train))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(
                F.col("n_docs").cast("double") / F.col("n_train").cast("double")
            ).alias("ln_prior"),
            F.log((F.col("n_tok") + F.col("v_size")).cast("double")).alias(
                "ln_denom"
            ),
        )
    )
    return term_counts, class_consts


def nb_predict(
    docs: DataFrame,
    term_counts: DataFrame,
    class_consts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document against every class; emit the argmax.

    ``score(d, c) = ln_prior_c - n_tokens_d * ln_denom_c
    + sum_{t in d, (c,t) in model} tf * ln(cnt + 1)``

    — algebraically identical to full add-one-smoothed NB (each token
    contributes ``ln((cnt+1)/(n_tok_c+V))``; unmatched terms hit the
    ``cnt=0`` floor, which the closed-form base term pre-pays for ALL
    tokens so only matched terms need the sparse join correction).

    Emits ``doc_id, pred_label, score``. One sparse join (term key,
    model side broadcast by default), one doc-grid cross with the
    broadcast class constants, one argmax window tie-broken on label.
    """
    # two consumers (doc lengths + the sparse model join) — materialize
    # once so the scored corpus tokenizes exactly once (tf rows are a
    # fraction of the raw text; the same trade bm25_topk documents)
    doc_tf = (
        _terms(docs, F.col(id_col), text_col)
        .withColumnRenamed("__key", id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    doc_len = doc_tf.groupBy(id_col).agg(F.sum("tf").alias("n_tokens"))
    model = F.broadcast(term_counts) if broadcast_model else term_counts
    matched = (
        doc_tf.join(model, "term")
        .groupBy(id_col, "label")
        .agg(
            F.sum(
                (F.col("tf") * F.log(F.col("cnt") + F.lit(1)))
                .cast("decimal(25,6)")
            )
            .cast("double")
            .alias("m")
        )
    )
    scored = (
        doc_len.crossJoin(F.broadcast(class_consts))
        .join(matched, [id_col, "label"], "left")
        .select(
            id_col,
            F.col("label").alias("pred_label"),
            (
                F.col("ln_prior")
                - F.col("n_tokens") * F.col("ln_denom")
                + F.coalesce(F.col("m"), F.lit(0.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.col("pred_label")
    )
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") == 1)
        .drop("__rnk")
    )


def nb_evaluate(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    broadcast_model: bool = True,
) -> DataFrame:
    """End-to-end train/score/evaluate on one labeled corpus: train on
    the deterministic md5 ``train_pct`` split, predict the held-out
    rest, emit ``doc_id, label, pred_label, hit`` per held-out doc.

    The held-out docs-with-no-tokens edge (empty text) never arises
    here — ``tokenize`` of an empty string still yields one ``""``
    token, so every document has ``n_tokens >= 1`` and a score row.
    """
    from .sampling import split_assign

    split = split_assign(F.col(id_col), train_pct=train_pct)
    train = docs.filter(split == "train")
    test = docs.filter(split == "test")
    term_counts, class_consts = nb_train(
        train, label_col=label_col, text_col=text_col
    )
    preds = nb_predict(
        test,
        term_counts,
        class_consts,
        text_col=text_col,
        id_col=id_col,
        broadcast_model=broadcast_model,
    )
    return (
        test.select(id_col, F.col(label_col).alias("label"))
        .join(preds, id_col)
        .select(
            id_col,
            "label",
            "pred_label",
            (F.col("pred_label") == F.col("label")).cast("int").alias("hit"),
        )
    )
