"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table.

All pure column expressions — no UDFs — so they run inside whole-stage
codegen and scale linearly with input splits. The reference's only text
column is the stream ``title`` (``scripts/process_raw_data/
process_raw_streams_data.py:79``); these operators generalize that to a
training-corpus pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword marker lists for the n-gram/stopword
#: language-id heuristic. Order = tie-break precedence.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "una", "por"),
    "fr": ("le", "les", "des", "une", "est"),
    "zh": ("de5", "shi4", "bu4", "le5", "wo3"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokenize(text: Column) -> Column:
    """Whitespace tokenizer: split on runs of whitespace, trimmed."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens (BPE-free token proxy)."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(tokenize(text))
    )


#: GPT-2-style pre-tokenizer split, the BPE-ish token-count proxy:
#: contraction suffixes, space-prefixed letter runs, digit runs,
#: punctuation runs, residual whitespace. Deliberately restricted to
#: constructs Java regex and RE2 (DuckDB) evaluate identically — no
#: lookahead (RE2 has none), no \p{} shorthands outside classes — so
#: the count is engine-portable and oracle-checkable.
BPE_SPLIT_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Number of BPE-ish pre-tokens (the regex family real BPE
    tokenizers split on before merges — GPT-2's pattern minus the
    RE2-incompatible trailing-space lookahead). A fast, dependency-free
    proxy for LLM token budgeting: counts sit ~1.3x word count on
    English prose, exactly like real BPE vocabularies.

    Vectorized JVM ``regexp_extract_all`` — no UDF, no tokenizer
    library; each extracted pre-token would be a merge-input, so the
    count upper-bounds (and tracks) the true BPE token count.
    """
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PAT), F.lit(0)))


def text_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    lowercased, whitespace-stripped text. Identical content maps to an
    identical 128-bit key regardless of spacing/case — the join key for
    exact dedup at any scale.
    """
    return F.md5(F.replace(F.lower(text), F.lit(" "), F.lit("")))


def quality_columns(text: Column, toks: Column) -> dict[str, Column]:
    """The quality statistics as named column expressions over a text
    column and its pre-projected token array (project the array once
    per row — an inline ``split()`` referenced from several expressions
    is re-evaluated by Catalyst per use). Shared by :func:`text_quality`
    and single-pass composites like the corpus-curation query.
    """
    n_tokens = F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(toks))
    n_chars = F.length(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[.,;:!?]"), 0))

    # empty documents are legal rows: a 0-token (or 0-char) doc gets
    # ratio 0.0 instead of a division — under Spark's default ANSI
    # mode the unguarded x/0 THROWS mid-scan (round-9 poison-sweep
    # find; the random driver testdata never contains an empty text)
    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    return {
        "n_chars_measured": n_chars,
        "n_tokens": n_tokens,
        "chars_per_token": ratio(n_chars, n_tokens),
        "stopword_ratio": ratio(n_stop, n_tokens),
        "punct_ratio": ratio(n_punct, n_chars),
    }


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring projection: length, token, punctuation and
    stopword statistics per document. All ratios are double divisions
    of exact integer counts (deterministic across engines).
    """
    base = df.select(
        "doc_id", F.col(text_col).alias("__text"), tokenize(F.col(text_col)).alias("toks")
    )
    cols = quality_columns(F.col("__text"), F.col("toks"))
    return base.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    max_df: int | None = None,
    broadcast_df: bool = True,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    ``tfidf = tf * (ln((N+1)/(df+1)) + 1)`` (sklearn's smooth-idf
    formula): tf = term occurrences in the doc, df = number of docs
    containing the term, N = corpus size. Ties broken by term asc so
    ranking is total. Emits ``doc_id, term, tf, tfidf, rnk``.

    Plan shape: two hash aggregations (doc×term tf, then term df — both
    with map-side partial counts), the df relation joined back onto tf,
    corpus size N as a broadcast 1-row cross join, then one per-doc
    top-k window. The score is rounded to 9 decimals BEFORE ranking:
    JVM StrictMath.log and libm log disagree by 1 ULP on rare
    (N+1)/(df+1) inputs (found by the round-9 unicode poison fixture at
    ln(13/4)), and neither the emitted score nor the rank may hang on
    the last ULP — the same rule weighted_sample's priorities follow.

    Web-scale controls (mirroring the dedup tier's ``max_shingle_df``):

    - ``max_df`` drops terms appearing in more than ``max_df`` documents
      *before* the join. Ultra-common terms carry near-zero idf and
      never rank, but they dominate the df relation's weight and the
      join's row fan-out — capping them bounds both. ``None`` keeps
      every term.
    - ``broadcast_df=False`` switches the df join to a plain shuffle
      join for vocabularies too large to broadcast (web-scale n-gram
      vocabularies run to billions of terms; a broadcast would OOM
      every executor). The default broadcasts, which is right whenever
      the vocabulary is dictionary-sized.
    """
    toks = df.select(
        "doc_id", F.explode(tokenize(F.lower(F.col(text_col)))).alias("term")
    )
    # doc x term counts pinned ONCE (lazy localCheckpoint, same trade
    # as unigram_logprob below): the df aggregate and the scoring join
    # otherwise each re-tokenize the corpus (r12: 2 tokenize passes ->
    # 1; the n_docs count keeps its own column-pruned scan).
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    n_docs = df.agg(F.count("*").alias("n_docs"))
    idf = (
        F.log(
            (F.col("n_docs") + F.lit(1)).cast("double")
            / (F.col("df") + F.lit(1)).cast("double")
        )
        + F.lit(1.0)
    )
    dfreq_side = F.broadcast(dfreq) if broadcast_df else dfreq
    # round to 9 decimals BEFORE ranking (the weighted_sample rule):
    # JVM StrictMath.log and libm log disagree by 1 ULP on rare
    # (N+1)/(df+1) inputs — the driver corpus never hits one, but the
    # round-9 unicode poison fixture did (ln(13/4)), and neither the
    # score nor the rank may hang on the last ULP
    scored = (
        tf.join(dfreq_side, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * idf, 9).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rnk")
    )


def language_pred(toks: Column) -> tuple[Column, Column]:
    """(pred_lang, marker_hits) expressions over a token-array column.

    Scores each language by marker-token hits and picks the best with a
    fixed precedence chain (en > de > es > fr > zh on ties) so the
    result is deterministic. Zero hits anywhere -> 'und'. Shared by
    :func:`language_id` and single-pass composites.
    """
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # precedence chain built in reverse so earlier langs win ties
    pred = F.lit("und")
    max_rest = F.lit(0)
    for lang in reversed(langs):
        s = scores[lang]
        pred = F.when((s > 0) & (s >= max_rest), F.lit(lang)).otherwise(pred)
        max_rest = F.greatest(max_rest, s)
    return pred, max_rest


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language-ID heuristic (see :func:`language_pred`)."""
    base = df.select("doc_id", tokenize(F.col(text_col)).alias("toks"))
    pred, hits = language_pred(F.col("toks"))
    return base.select(
        "doc_id",
        pred.alias("pred_lang"),
        hits.alias("marker_hits"),
    )


#: PII patterns restricted to syntax shared by Java regex and RE2, so
#: the engine and the DuckDB oracle state the same language.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails and phone numbers: ``doc_id, n_email, n_phone,
    scrubbed``. Counts are taken against the original text; patterns
    are then replaced sequentially with ``<EMAIL>`` / ``<PHONE>``
    tokens (the loss-masking convention — downstream tokenizers see a
    stable placeholder, not an empty hole).

    Pure ``regexp_extract_all`` / ``regexp_replace`` column
    expressions: whole-stage codegen, no UDF, linear per-byte cost —
    the scrub runs in the same pass as any other projection.
    """
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    scrubbed = text
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select("doc_id", *counts, scrubbed.alias("scrubbed"))


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition signals per document: ``doc_id, n_grams,
    top_count, top_gram_frac, dup_gram_frac`` over word ``n``-grams
    (occurrences, not distinct — repetition is the point).

    ``top_gram_frac`` = share of the most frequent n-gram,
    ``dup_gram_frac`` = share of occurrences beyond each gram's first
    (1 - distinct/total) — the two repetition filters of Rae et al.'s
    Gopher quality rules, token-based. Documents shorter than ``n``
    tokens emit no row.

    Two partial-aggregable shuffles: (doc, gram) counts, then per-doc
    max/sum/count — no window, no array-accumulator HOFs (a per-row
    map-aggregate would leave whole-stage codegen and serialize a
    counting map per row; the exploded groupBy form stays codegen'd and
    map-side combines).
    """
    toksdf = df.select(
        "doc_id", F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("toks")
    )
    cnt = F.size("toks") - (n - 1)
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at("toks", i + k) for k in range(n)]),
    )
    per_gram = (
        toksdf.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.sum("cnt")
    distinct = F.count("*")
    top = F.max("cnt")
    return per_gram.groupBy("doc_id").agg(
        total.alias("n_grams"),
        top.alias("top_count"),
        (top.cast("double") / total).alias("top_gram_frac"),
        (F.lit(1.0) - distinct.cast("double") / total).alias("dup_gram_frac"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Corpus-LM quality score: mean per-token unigram log-probability,
    the distributable core of the KenLM-style perplexity filters used
    for pretraining curation (CCNet / GPT-3 appendix A keep docs whose
    LM score is close to a reference corpus; a unigram model is the
    degenerate order-1 case and needs no external artifact — the
    corpus is its own model).

    ``logprob = sum_t tf(t) * ln(count(t)/T) / sum_t tf(t)`` where
    ``count`` is the term's corpus frequency and ``T`` total corpus
    tokens. Low (very negative) scores mark documents dominated by
    rare junk; scores near zero mark documents of pure boilerplate.
    Emits ``doc_id, n_tokens, logprob``.

    Plan shape (the same partial-agg + broadcast economics as TF-IDF):
    one doc x term count aggregation, a term-frequency relation
    aggregated from it (vocabulary-sized; broadcast by default,
    ``broadcast_vocab=False`` for web-scale vocabularies), corpus
    total as a 1-row broadcast, and a final doc_id-keyed aggregation —
    every shuffle key is either high-cardinality or pre-combined
    map-side. The weighted ln-sum is decimal-routed so the mean is
    bit-stable under any aggregation order.
    """
    toks = df.select(
        "doc_id", F.explode(tokenize(F.lower(F.col(text_col)))).alias("term")
    )
    # doc x term counts pinned ONCE (lazy localCheckpoint, the bm25 /
    # nb-classifier trade): the vocabulary aggregate and the scoring
    # join below otherwise each re-tokenize the corpus (r12: 3 scans ->
    # 1 in the plan). tf rows are a fraction of the raw text.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("t_total"))
    vocab_side = F.broadcast(vocab) if broadcast_vocab else vocab
    ln_p = F.log(F.col("cnt").cast("double") / F.col("t_total").cast("double"))
    weighted = (
        tf.join(vocab_side, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "tf", (F.col("tf") * ln_p).alias("w"))
    )
    return weighted.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        (
            F.sum(F.col("w").cast("decimal(25,6)")).cast("double") / F.sum("tf")
        ).alias("logprob"),
    )


def boilerplate_ratio(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    common_df: int = 10,
) -> DataFrame:
    """Corpus-boilerplate signal: the fraction of a document's word
    ``n``-gram *positions* covered by n-grams that appear in more than
    ``common_df`` distinct documents — the corpus-level statement of
    C4/RefinedWeb boilerplate removal (shared headers, navigation
    chrome, templated sentences recur across many pages; prose does
    not). Emits ``doc_id, n_grams, common_frac``; documents shorter
    than ``n`` tokens emit no row.

    Plan shape: explode n-grams ONCE and immediately aggregate to
    ``(doc, gram, count)`` — every later stage works on the distinct-
    grams-per-doc relation, not raw positions: the document-frequency
    aggregation is a plain count over it, and the df join returns onto
    it with position counts re-expanded as weights (``sum(cnt)`` /
    ``sum(cnt where df > K)``). Counts only — exact on both engines,
    no decimal routing needed. The df relation is
    gram-cardinality-sized, so it is NOT broadcast (unlike the tiny
    LM vocab above); the join shuffles on gram, which AQE can split.
    """
    toks = df.select("doc_id", tokenize(F.trim(F.lower(F.col(text_col)))).alias("toks"))
    # guard short docs explicitly: sequence(0, size-n) with size < n
    # would produce a DESCENDING [0..negative] array (Spark infers step
    # -1), not an empty one — exploding an empty array is what drops
    # the sub-n-token docs
    starts = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
        ).alias("gram"),
    )
    # distinct-grams-per-doc pinned ONCE (lazy localCheckpoint, same
    # trade as unigram_logprob / tfidf_top_terms): the df aggregate and
    # the weights join otherwise each re-run tokenize + n-gram explode
    # over the corpus (r12: 2 gram passes -> 1).
    gram_cnt = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    gram_df = gram_cnt.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        gram_cnt.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            (
                F.sum(
                    F.when(F.col("df") > common_df, F.col("cnt")).otherwise(0)
                ).cast("double")
                / F.sum("cnt")
            ).alias("common_frac"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k retrieval: for each query, the ``k`` highest-scoring
    documents — the lexical-retrieval half of a RAG pipeline, run as a
    corpus-scale batch join instead of a serving index.

    ``score(q,d) = sum_{t in q} idf(t) * tf_td*(k1+1) /
    (tf_td + k1*(1 - b + b*len_d/avg_len))`` with the positive
    Robertson/Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))``. Emits
    ``query_id, doc_id, score, rnk``.

    Scale shape — NOTHING corpus-sized ever shuffles (the naive
    formulation aggregates the full exploded postings relation —
    a corpus-vocabulary-wide shuffle — before pruning; Catalyst
    cannot push a join below an aggregation, so the prune must be
    written upstream of the group-by, and here it is):

    - the (query_id, term) pairs are tokenized Spark-side then
      collected to the driver ONCE — the same documented Q<<N
      contract as cosine_knn (queries are probe-sized; the corpus is
      not) — so the term prune compiles to an ``IN`` literal filter
      evaluated inside the corpus scan stage *before* the tf
      aggregation (no broadcast exchange, no second scan of the
      query relation), and every shuffle in the plan is
      candidate-sized;
    - ``query_id`` is attached by one broadcast join against the
      driver-local pairs relation — a LocalTableScan, zero extra
      jobs;
    - doc length is ``size(tokens)``, computed in the same projection
      that explodes them and carried through the tf aggregation as a
      (functionally dependent) grouping column — no second aggregation;
    - document frequency re-aggregates the pruned tf relation per term
      (exactly one row per (doc, term) exists there, so the count IS
      the corpus df of each query term — pruning drops other terms,
      never docs) into a query-vocabulary-sized relation that also
      absorbs the 1-row corpus stats, precomputing ``idf`` and
      ``avg_len`` once per term; that tiny relation broadcast-joins
      back onto the candidates. The candidate relation is lazily
      checkpointed so its two consumers (df aggregate, score join)
      tokenize/explode the corpus exactly ONCE; this replaces the
      previous ``count over (partition by term)`` window — which
      re-shuffled AND sorted the whole candidate relation — with a
      ≤|query-vocab|-row aggregate, and folds the former
      candidate-wide crossJoin of the stats row into the broadcast
      side;
    - corpus totals (N, total length) aggregate the un-exploded token
      arrays: one map-only scan into a 1-row relation joined onto the
      vocabulary-sized side only.

    The per-(query, doc) score is a decimal-routed sum (order-stable),
    and the final top-k is one window per query over the candidate
    set. Nothing quadratic: candidates = postings of query terms only.
    """
    toksdf = docs.select(
        "doc_id", tokenize(F.lower(F.col(text_col))).alias("toks")
    )
    stats = toksdf.agg(
        F.count("*").alias("n_docs"), F.sum(F.size("toks")).alias("total_len")
    )
    qrel = queries.select(
        F.col("query_id"),
        F.explode_outer(
            F.array_distinct(tokenize(F.lower(F.col(text_col))))
        ).alias("term"),
    ).distinct()
    qpairs = [r for r in qrel.collect() if r["term"] is not None]
    vocab = sorted({r["term"] for r in qpairs})
    qterms = queries.sparkSession.createDataFrame(qpairs, schema=qrel.schema)
    cand = (
        toksdf.select(
            "doc_id", F.size("toks").alias("len_d"), F.explode("toks").alias("term")
        )
        .filter(F.col("term").isin(vocab) if vocab else F.lit(False))
        .groupBy("doc_id", "len_d", "term")
        .agg(F.count("*").alias("tf"))
        # lazy checkpoint (same pattern as graph.py's label propagation):
        # the candidate relation has two consumers (df aggregation +
        # score join); materializing it once keeps the corpus tokenize/
        # explode single-pass — without it Catalyst prunes the two
        # branches differently and re-derives candidates from the raw
        # scan, re-tokenizing the whole corpus for a ≤|vocab|-row
        # aggregate. Candidate-sized (postings of query terms only,
        # no document bodies), so the materialization is bounded by the
        # same Q<<N contract as the driver-collected query pairs.
        .localCheckpoint(eager=False)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    termstats = (
        cand.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(stats)
        .select(
            "term",
            idf.alias("idf"),
            (F.col("total_len").cast("double") / F.col("n_docs")).alias(
                "avg_len"
            ),
        )
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("len_d") / F.col("avg_len"))
    )
    contrib = F.col("idf") * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        cand.join(F.broadcast(termstats), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(contrib.cast("decimal(25,6)")).cast("double").alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "rnk")
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Order-2 corpus-LM quality score: mean per-position bigram
    conditional log-probability — one step up the KenLM ladder from
    :func:`unigram_logprob` toward the CCNet / GPT-3 perplexity
    filters (arXiv:1911.00359 trains a 5-gram model; order 2 is the
    smallest model that sees word ORDER, so scrambled or
    machine-mangled text scores low even when its unigram profile is
    clean). The corpus is its own model (the same self-trained
    contract as the unigram score): every scored bigram is in the
    model by construction, so no smoothing floor is needed.

    ``score = sum tf * ln(c2(w1,w2) / c1(w1)) / sum tf`` over the
    document's bigram positions, where ``c2`` is the corpus bigram
    count and ``c1(w1) = sum_w c2(w1, w)`` the history count — a true
    MLE conditional (sums to 1 over the vocabulary; every per-position
    term is <= 0). Documents with fewer than 2 tokens drop out (no
    bigram positions — callers left-join if they need them back).

    Plan shape: one doc x bigram aggregation feeds BOTH the model and
    the scoring (lazily checkpointed — the nb_train economics, one
    tokenize of the corpus total); the bigram-count join shuffles on
    the high-cardinality (w1, w2) key; the history relation is
    unigram-vocabulary-sized and broadcast by default
    (``broadcast_vocab=False`` for web-scale vocabularies). The
    weighted ln-sum is decimal-routed; ``ln`` of one double division
    per row keeps cross-engine bit parity.
    """
    # token array materialized before the zip/slice expressions — the
    # doc_shingles rule (an inline split is re-evaluated per consumer)
    tdf = df.select(
        "doc_id", tokenize(F.lower(F.col(text_col))).alias("toks")
    )
    toks = F.col("toks")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
        F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
    )
    b = (
        tdf.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    tf2 = (
        b.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    c2 = tf2.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    hist = F.broadcast(c1) if broadcast_vocab else c1
    ln_p = F.log(F.col("c2").cast("double") / F.col("c1").cast("double"))
    weighted = (
        tf2.join(c2, ["w1", "w2"])
        .join(hist, "w1")
        .select("doc_id", "tf", (F.col("tf") * ln_p).alias("w"))
    )
    return weighted.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        (
            F.sum(F.col("w").cast("decimal(25,6)")).cast("double")
            / F.sum("tf")
        ).alias("bigram_logprob"),
    )
