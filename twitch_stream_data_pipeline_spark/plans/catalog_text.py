"""Extension tiers: text analysis + the dedup family (SURVEY.md §2.9).

Mechanically split out of the monolithic ``plans/catalog.py`` in
round 11 (VERDICT r10 #8). Registrations and helpers are verbatim;
the registry (``CATALOG``), shared scan helpers and determinism
machinery live in ``catalog_base``, and ``catalog.py`` assembles
the parts in the original order and re-exports the public surface
(``EXPOSURE_ORDER`` pins what the harness grades, so module
boundaries change nothing observable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.dedup_text import (
    MINHASH_PRIME,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_params,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from ..extensions.text_analysis import (
    LANG_MARKERS,
    STOPWORDS,
    language_id,
    text_fingerprint,
    text_quality,
    token_count,
)
from .catalog_base import (
    _register,
    _t,
    _docs,
)

# ===========================================================================
# Extension operators (SURVEY.md §2.9): text analysis
# ===========================================================================


@_register(
    "token_stats",
    r"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
    FROM documents
    """,
    ("text", "ext"),
    "Token counting (whitespace tokenizer) + char length per document.",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        token_count(F.col("text")).alias("n_tokens"),
    )


@_register(
    "bpe_token_stats",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text,
                 '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+'
             )) AS bpe_tokens
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
           bpe_tokens,
           length(text) AS n_chars,
           CASE WHEN bpe_tokens > 0
                THEN CAST(length(text) AS DOUBLE) / bpe_tokens END
             AS chars_per_bpe_token
    FROM t
    """,
    ("text", "ext", "llm"),
    "BPE-ish token counting: GPT-2-style pre-tokenizer regex (portable "
    "Java-regex/RE2 subset, no lookahead) next to the whitespace count — "
    "the dependency-free LLM token-budget proxy, one vectorized "
    "regexp_extract_all per document, no UDF.",
)
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.text_analysis import bpe_token_count

    docs = _docs(spark, sf_dir)
    bpe = bpe_token_count(F.col("text"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
        F.when(bpe > 0, F.length("text").cast("double") / bpe).alias(
            "chars_per_bpe_token"
        ),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@_register(
    "text_quality",
    rf"""
    WITH t AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\s+') END AS toks
      FROM documents
    )
    SELECT doc_id,
           n_chars AS n_chars_measured,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN CAST(n_chars AS DOUBLE) / len(toks)
                ELSE 0.0 END AS chars_per_token,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL})))
                          AS DOUBLE) / len(toks)
                ELSE 0.0 END AS stopword_ratio,
           CASE WHEN n_chars > 0
                THEN CAST(len(regexp_extract_all(text, '[.,;:!?]'))
                          AS DOUBLE) / n_chars
                ELSE 0.0 END AS punct_ratio
    FROM t
    """,
    ("text", "ext"),
    "Quality scoring: length/token/stopword/punctuation statistics. "
    "Empty/whitespace docs are legal rows: 0 tokens, every ratio 0.0 "
    "(the unguarded divisions THREW under ANSI mode — round-9 "
    "poison-sweep find).",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(_docs(spark, sf_dir))


def _langid_oracle() -> str:
    score = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)  # en, de, es, fr, zh — earlier wins ties
    cases = []
    for i, lang in enumerate(langs):
        rest = [score[l2] for l2 in langs[i + 1 :]]
        cond = f"s_{lang} > 0"
        if rest:
            cond += f" AND s_{lang} >= greatest({', '.join('s_' + l2 for l2 in langs[i+1:])})"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    score_cols = ",\n             ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    greatest_all = ", ".join("s_" + lang for lang in langs)
    return rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             {score_cols}
      FROM t
    )
    SELECT doc_id,
           CASE {' '.join(cases)} ELSE 'und' END AS pred_lang,
           greatest({greatest_all}, 0) AS marker_hits
    FROM s
    """


@_register(
    "lang_id",
    _langid_oracle(),
    ("text", "ext"),
    "Marker-stopword language-ID heuristic with fixed tie precedence.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_docs(spark, sf_dir))


@_register(
    "doc_fingerprint",
    "SELECT doc_id, md5(replace(lower(text), ' ', '')) AS fingerprint FROM documents",
    ("text", "ext"),
    "Deterministic document fingerprint (md5 of normalized text).",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", text_fingerprint(F.col("text")).alias("fingerprint"))


# ===========================================================================
# Extension operators: dedup family
# ===========================================================================


@_register(
    "exact_dedup",
    """
    SELECT md5(replace(lower(text), ' ', '')) AS text_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    ("dedup", "ext"),
    "Exact dedup by md5 fingerprint; deterministic min-id survivor.",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no pre-repartition: the groupBy(text_hash) is itself the shuffle
    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


_SHINGLES_SQL = r"""
      SELECT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 CASE WHEN len(toks) - 2 >= 1
                      THEN generate_series(1, len(toks) - 2)
                      ELSE [] END,
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
        FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
              FROM documents)
      )
"""


@_register(
    "ngram_jaccard",
    rf"""
    WITH sh0 AS ({_SHINGLES_SQL}),
    -- shingle document-frequency cap (100): mirrors the Spark operator's
    -- skew guard — sizes and intersections both over the capped universe
    sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0
      JOIN (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 100) ok
        USING (shingle)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - inter) >= 0.5
    """,
    ("dedup", "ext"),
    "Exact n-gram Jaccard near-dup pairs via shingle posting-list buckets.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


@_register(
    "winnow_near_dup",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
      FROM documents
    ), gh AS (
      SELECT doc_id,
             CASE WHEN length(norm) >= 8 THEN
               list_transform(generate_series(1, length(norm) - 7), i ->
                 list_reduce(
                   list_transform(generate_series(i, i + 7),
                                  p -> CAST(ord(substr(norm, p, 1)) AS BIGINT)),
                   (acc, c) -> (acc * 257 + c) % 1000000007))
             ELSE CAST([] AS BIGINT[]) END AS gh
      FROM t
    ), fps AS (
      SELECT doc_id,
             CASE WHEN len(gh) >= 4 THEN
                    list_distinct(list_transform(generate_series(1, len(gh) - 3),
                                  j -> list_min(gh[j:j+3])))
                  WHEN len(gh) >= 1 THEN [list_min(gh)]
                  ELSE CAST([] AS BIGINT[]) END AS fps
      FROM gh
    ), fp AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
    counts AS (SELECT fp, COUNT(*) AS c FROM fp GROUP BY 1),
    kept AS (SELECT fp.doc_id, fp.fp FROM fp JOIN counts USING (fp) WHERE c <= 100)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 30
    """,
    ("dedup", "text", "ext", "llm"),
    "Winnowing (MOSS) character-level near-dup: Rabin-Karp 8-gram "
    "rolling hashes, window-4 min winnowing (any shared substring of "
    ">= 11 chars guarantees a shared fingerprint), fingerprint "
    "posting-list buckets with the df skew cap, pairs generated "
    "in-array — the tokenizer-independent dedup tier word shingles "
    "miss; exact signed-64 modular arithmetic mirrored by the oracle. "
    "min_shared=30 sits past the 99.9th percentile of background "
    "8-gram collision on this small-vocabulary fixture, so surviving "
    "pairs are genuine near-duplicates, not shared phrasing.",
)
def q_winnow_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup_text import winnow_near_dup_pairs

    return winnow_near_dup_pairs(
        _docs(spark, sf_dir), k=8, w=4, min_shared=30, max_fp_df=100
    )


def _minhash_sig_sql(num_hashes: int = 32) -> tuple[str, str]:
    """(CTE defining sigs table, list of mh col names) for the oracle."""
    params = minhash_params(num_hashes)
    mins = ",\n             ".join(
        f"MIN((h0 * {a} + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(params)
    )
    return (
        rf"""
    sh AS ({_SHINGLES_SQL}),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {MINHASH_PRIME} AS h0
      FROM sh
    ),
    sigs AS (
      SELECT doc_id,
             {mins}
      FROM hashed GROUP BY doc_id
    )""",
        ", ".join(f"mh{i}" for i in range(num_hashes)),
    )


def _minhash_banded0_cte(bands: int = 8, rows_per_band: int = 4) -> str:
    """Shared WITH body: signatures -> per-band hashes (``banded0``,
    uncapped). Used by every LSH oracle so no two can band
    differently."""
    sig_cte, _cols = _minhash_sig_sql(bands * rows_per_band)
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, md5("
        + " || ',' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + ") AS band_hash, "
        + f"{b} AS band FROM sigs"
        for b in range(bands)
    )
    return rf"""{sig_cte},
    banded0 AS ({band_selects})"""


def _minhash_banded_cte(bands: int = 8, rows_per_band: int = 4) -> str:
    """``banded0`` plus the 200-doc bucket-size cap over the WHOLE
    corpus (the in-corpus pairing semantics; the ingest oracle caps
    over indexed postings only and composes banded0 directly)."""
    return rf"""{_minhash_banded0_cte(bands, rows_per_band)},
    -- bucket-size cap (200): mirrors the Spark operator's degenerate-
    -- bucket guard before pairing
    banded AS (
      SELECT banded0.* FROM banded0
      JOIN (SELECT band, band_hash FROM banded0
            GROUP BY band, band_hash HAVING COUNT(*) <= 200) ok
        USING (band, band_hash)
    )"""


def _minhash_pairs_oracle(bands: int = 8, rows_per_band: int = 4) -> str:
    return rf"""
    WITH {_minhash_banded_cte(bands, rows_per_band)}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id
    """


@_register(
    "minhash_lsh_pairs",
    _minhash_pairs_oracle(),
    ("dedup", "ext", "lsh"),
    "MinHash(32) + LSH banding (8 bands x 4 rows): candidate near-dup pairs. "
    "The 100 TB-scale near-dup path — no quadratic join.",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(_docs(spark, sf_dir))
    return lsh_candidate_pairs(sigs)


@_register(
    "lsh_index_probe",
    rf"""
    WITH {_minhash_banded_cte()}
    SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS match_id
    FROM banded q
    JOIN banded c ON q.band = c.band AND q.band_hash = c.band_hash
                 AND c.doc_id != q.doc_id
    WHERE q.doc_id < 50
    """,
    ("dedup", "ext", "lsh", "index"),
    "The ON-DISK MinHash-LSH index probed with a query batch: "
    "build_lsh_index materializes (doc_id, band, band_hash) postings "
    "band-partitioned with the banding parameters persisted beside "
    "them; lsh_index_probe bands the queries with the PERSISTED "
    "params and broadcast-joins them against the postings — the "
    "incremental-dedup path (new batch << corpus: the index side "
    "never shuffles, and probe_bands prunes whole band directories "
    "for approximate recall, IVF's n_probe re-expressed for LSH). "
    "Queries here are the doc_id < 50 slice of the same corpus, so "
    "the oracle is the banding SQL of minhash_lsh_pairs restricted "
    "to query-anchored directed pairs — an exact differential check "
    "of the materialized layout, persisted-params reload, and "
    "touched-keys bucket cap.",
)
def q_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..extensions.dedup_text import build_lsh_index, lsh_index_probe

    docs = _docs(spark, sf_dir)
    if docs.head(1) == []:  # empty-input contract: nothing to index
        return spark.createDataFrame([], "query_id long, match_id long")
    path = tempfile.mkdtemp(prefix="lsh_index_")
    build_lsh_index(docs, path)
    return lsh_index_probe(spark, path, docs.filter(F.col("doc_id") < 50))


@_register(
    "dedup_ingest",
    rf"""
    WITH {_minhash_banded0_cte()},
    idx AS (SELECT * FROM banded0 WHERE doc_id >= 50),
    ok AS (SELECT band, band_hash FROM idx
           GROUP BY 1, 2 HAVING COUNT(*) <= 200),
    idxf AS (SELECT idx.* FROM idx JOIN ok USING (band, band_hash)),
    q AS (SELECT * FROM banded0 WHERE doc_id < 50),
    matched AS (
      SELECT DISTINCT q.doc_id
      FROM q JOIN idxf ON q.band = idxf.band AND q.band_hash = idxf.band_hash
    ),
    -- in-batch gate: capped band buckets WITHIN the batch, lower-id rule
    qok AS (SELECT band, band_hash FROM q
            GROUP BY 1, 2 HAVING COUNT(*) <= 200),
    qf AS (SELECT q.* FROM q JOIN qok USING (band, band_hash)),
    batch_dup AS (
      SELECT DISTINCT b.doc_id
      FROM qf a JOIN qf b ON a.band = b.band AND a.band_hash = b.band_hash
                         AND a.doc_id < b.doc_id
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d
    WHERE d.doc_id < 50
      AND d.doc_id NOT IN (SELECT doc_id FROM matched)
      AND d.doc_id NOT IN (SELECT doc_id FROM batch_dup)
    """,
    ("dedup", "ext", "lsh", "index", "pipeline"),
    "Incremental near-dup INGEST — the operational form of the LSH "
    "index: the corpus (doc_id >= 50) is materialized once with "
    "build_lsh_index; the new batch (doc_id < 50) probes it and only "
    "documents with NO candidate match survive (candidate-level "
    "semantics: any shared band bucket disqualifies — the "
    "conservative ingest gate; near_dup_verify slots between probe "
    "and anti-join for distance-verified semantics). Per-ingest "
    "all-pairs LSH over corpus+batch would re-shuffle all history "
    "every 15 minutes (the reference's cadence); here history is "
    "touched only via the probe's broadcast join and the bucket cap "
    "counts INDEXED postings only — exactly what the oracle states "
    "relationally. The survivors-append path (dedup_ingest "
    "append=True) is pinned by the streaming ingest test.",
)
def q_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..extensions.dedup_text import build_lsh_index, dedup_ingest

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") >= 50)
    batch = docs.filter(F.col("doc_id") < 50)
    # No empty-corpus pre-probe (r13, VERDICT r12 #4 job-count trim):
    # the former `corpus.head(1)` emptiness branch cost an executeTake
    # job on EVERY invocation to special-case a corpus that is empty.
    # An index built over an empty corpus is a first-class layout
    # (parquet root with no part files + empty `_ids` + default
    # `_params` — the round-9 degenerate-corpus contract in
    # `_read_postings`), and dedup_ingest over it applies exactly the
    # in-batch gate with the build-default parameters: the same result
    # the branch computed, now on one code path (empty-input sweeps
    # re-verified green).
    path = tempfile.mkdtemp(prefix="lsh_ingest_")
    build_lsh_index(corpus, path)
    return dedup_ingest(spark, path, batch).select(
        "doc_id", "lang", "n_chars"
    )


def _simhash_oracle(bits: int = 60) -> str:
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (h0 >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    return rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h0 FROM toks
    ),
    sums AS (
      SELECT doc_id,
             {bit_sums}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {fp} AS simhash FROM sums
    """


@_register(
    "simhash",
    _simhash_oracle(),
    ("dedup", "ext"),
    "60-bit SimHash fingerprint per document (token bit votes).",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash64(_docs(spark, sf_dir))


