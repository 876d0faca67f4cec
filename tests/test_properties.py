"""Property-based hardening (hypothesis): the bucketed near-dup plans
must agree with direct brute-force computation on arbitrary tiny
corpora — guards the posting-list pair-generation rewrite against
edge cases the fixed fixtures do not reach (empty docs, all-identical
docs, single-token docs, shared-shingle chains)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from twitch_stream_data_pipeline_spark.extensions.dedup_text import (
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_words, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=7)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_jaccard(texts, n=3, threshold=0.5):
    def sh(t):
        toks = t.strip().lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    sets = {i: sh(t) for i, t in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a < b and (sets[a] or sets[b]):
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter / union >= threshold:
                    out.add((a, b))
    return out


@given(_corpus)
@_SETTINGS
def test_ngram_jaccard_matches_brute_force(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=None).collect()
    }
    assert got == _brute_jaccard(texts)


@given(_corpus)
@_SETTINGS
def test_simhash_pairs_candidate_exactness(spark, texts):
    """With 4 chunks / hamming<=3 the pigeonhole candidate set is exact:
    the emitted pairs must be precisely all pairs within distance 3
    (computed brute-force from the per-doc fingerprints)."""
    from twitch_stream_data_pipeline_spark.extensions.dedup_text import simhash64

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    expect = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(df, max_bucket_size=None).collect()
    }
    assert got == expect


@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=12),
    st.integers(min_value=0, max_value=60),
)
@_SETTINGS
def test_budget_select_matches_naive_cumsum(spark, token_counts, budget):
    """The histogram+boundary formulation must equal the naive global
    ordered cumsum keep-rule on arbitrary corpora — including budget 0,
    all-identical scores, and budgets larger than the corpus."""
    from twitch_stream_data_pipeline_spark.extensions.sampling import budget_select

    texts = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"] for r in budget_select(df, budget).collect()}
    # naive rule: order by (n_tokens desc, doc_id asc), keep while the
    # inclusive running total fits
    naive = set()
    cum = 0
    for doc_id, n in sorted(enumerate(token_counts), key=lambda t: (-t[1], t[0])):
        cum += n
        if cum <= budget:
            naive.add(doc_id)
    assert got == naive, (token_counts, budget, got, naive)


@given(st.lists(st.sampled_from(["a b c", "a b", "x y z w", ""]), min_size=1, max_size=8))
@_SETTINGS
def test_canonical_dedup_keeps_best_member(spark, texts):
    """Survivor of every duplicate group must be the longest member
    with the lowest doc_id, and group sizes must partition the corpus."""
    from twitch_stream_data_pipeline_spark.extensions.dedup_text import canonical_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = canonical_dedup(df).collect()
    # brute force
    groups = {}
    for i, t in enumerate(texts):
        key = t.replace(" ", "").lower()
        groups.setdefault(key, []).append(i)
    expect = {}
    for key, ids in groups.items():
        toks = lambda i: len(texts[i].split()) if texts[i].strip() else 0
        best = min(ids, key=lambda i: (-toks(i), i))
        expect[best] = (toks(best), len(ids))
    got = {r["doc_id"]: (r["n_tokens"], r["n_members"]) for r in rows}
    assert got == expect, (texts, got, expect)


# --- events timestamp decode: encoding independence (VERDICT r4 contract) ---

_epoch_us = st.integers(
    min_value=1_500_000_000_000_000,  # 2017
    max_value=2_500_000_000_000_000,  # 2049
)
_epochs = st.lists(_epoch_us, min_size=1, max_size=8, unique=True)


@given(_epochs)
@_SETTINGS
def test_events_decode_is_encoding_independent(spark, tmp_path_factory, epochs):
    """Arbitrary instants written as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS) must decode to the same (secs, ts_us) integer
    timeline through _events — the property the round-3 unit bug
    violated. Fixture writer shared with tests/test_data_contract.py
    so both suites pin the same events schema shape."""
    from twitch_stream_data_pipeline_spark.plans.catalog import _events

    from .test_data_contract import _write_events

    decoded = {}
    for unit in ("ns", "us"):
        d = tmp_path_factory.mktemp(f"enc_{unit}")
        _write_events(str(d), unit, epochs_us=epochs)
        decoded[unit] = {
            r["event_id"]: (r["secs"], r["ts_us"])
            for r in _events(spark, str(d)).select(
                "event_id", "secs", "ts_us"
            ).collect()
        }
    expect = {i: (e // 1_000_000, e) for i, e in enumerate(epochs)}
    assert decoded["ns"] == decoded["us"] == expect


def _brute_winnow(text, k=8, w=4, b=257, m=1_000_000_007):
    """Independent pure-Python winnowing (true rolling form would give
    identical values; direct evaluation keeps the reference obvious)."""
    import re

    norm = re.sub(r"\s+", " ", text.lower())
    if len(norm) < k:
        return set()
    gh = []
    for i in range(len(norm) - k + 1):
        acc = 0
        for ch in norm[i : i + k]:
            acc = (acc * b + ord(ch)) % m
        gh.append(acc)
    if len(gh) < w:
        return {min(gh)}
    return {min(gh[j : j + w]) for j in range(len(gh) - w + 1)}


_chars = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=40,
)


@given(st.lists(_chars, min_size=1, max_size=6))
@_SETTINGS
def test_winnow_fingerprints_match_reference_implementation(spark, texts):
    """The Spark column-expression winnowing (lambda-bound let
    expressions, signed-64 modular arithmetic) must equal an
    independent pure-Python implementation on arbitrary printable
    text — including short docs, whitespace runs, empty strings, and
    punctuation-only bodies."""
    from twitch_stream_data_pipeline_spark.extensions.dedup_text import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    expect = {i: _brute_winnow(t) for i, t in enumerate(texts)}
    expect = {i: s for i, s in expect.items() if s}
    assert got == expect, (got, expect)


def _brute_pool(vec, out_dim):
    """AdaptiveAvgPool1d reference: dim j averages
    input[floor(j*n/out) : ceil((j+1)*n/out)]."""
    n = len(vec)
    out = []
    for j in range(out_dim):
        lo = (j * n) // out_dim
        hi = -((-(j + 1) * n) // out_dim)  # ceil
        out.append(sum(vec[lo:hi]) / (hi - lo) if hi > lo else None)
    return out


@given(
    st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32).map(float),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=1, max_value=6),
)
@_SETTINGS
def test_pool_features_matches_adaptive_avg_reference(spark, vecs, out_dim):
    from twitch_stream_data_pipeline_spark.extensions.multimodal import (
        pool_features,
    )

    df = spark.createDataFrame(
        list(enumerate(vecs)), "doc_id long, features array<double>"
    )
    got = {
        r["doc_id"]: r["features"]
        for r in pool_features(df, out_dim=out_dim).collect()
    }
    for i, vec in enumerate(vecs):
        expect = _brute_pool(vec, out_dim)
        assert len(got[i]) == out_dim
        for g, e in zip(got[i], expect):
            if e is None:
                assert g is None
            else:
                assert g is not None and abs(g - e) < 1e-9, (i, got[i], expect)


@given(
    st.lists(  # pages per batch: each page carries 0-2 record ids
        st.lists(st.integers(0, 2), min_size=1, max_size=5),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_paged_stream_equals_batch_under_any_rate_limit(
    tmp_path_factory, chains, max_pages
):
    """Protocol invariant: draining the stream reader at ANY
    max_pages_per_trigger yields exactly the batch reader's rows —
    same (batch_id, page, record_pos, value) keys, same order within a
    batch, no dupes, no gaps — because offsets are chain positions."""
    import json as _json
    import os

    from twitch_stream_data_pipeline_spark.sources.paged_api import (
        END_CURSOR,
        FilePager,
        PagedEnvelopeStreamReader,
        START_CURSOR,
        _rows,
        _walk,
    )

    root = str(tmp_path_factory.mktemp("paged_prop"))
    next_id = 0
    for b, pages in enumerate(chains):
        batch = f"b{b}"
        os.makedirs(f"{root}/{batch}")
        cursors = [START_CURSOR] + [f"c{i}" for i in range(1, len(pages))]
        for i, n_recs in enumerate(pages):
            recs = []
            for _ in range(n_recs):
                recs.append({"id": str(next_id)})
                next_id += 1
            env = {"data": recs}
            env["pagination"] = (
                {"cursor": cursors[i + 1]} if i + 1 < len(pages) else {}
            )
            _json.dump(env, open(f"{root}/{batch}/{cursors[i]}.json", "w"))

    # batch-reader ground truth via the same walk the executor runs
    pager = FilePager(root)
    expect = []
    for b in range(len(chains)):
        page = 0
        for env, _c, _n in _walk(pager, f"b{b}", START_CURSOR, 1000):
            expect.extend(_rows(env, f"b{b}", page))
            page += 1

    reader = PagedEnvelopeStreamReader(
        {"path": root, "max_pages_per_trigger": str(max_pages)}
    )
    off = reader.initialOffset()
    drained = []
    for _ in range(100):
        rows, off = reader.read(off)
        rows = list(rows)
        drained.extend(rows)
        if not rows and all(c == END_CURSOR for c in off["cursors"].values()):
            break
    assert sorted(drained) == sorted(expect)


# ---------------------------------------------------------------------------
# round-5 session operators
# ---------------------------------------------------------------------------

_keys = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9),
    min_size=1,
    max_size=25,
    unique=True,
)


@given(_keys, st.integers(min_value=1, max_value=9))
@_SETTINGS
def test_global_row_index_is_sorted_permutation(spark, keys, buckets):
    from twitch_stream_data_pipeline_spark.extensions.sampling import (
        global_row_index,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["row_index"]
        for r in global_row_index(df, "k", buckets=buckets).collect()
    }
    assert got == {k: i + 1 for i, k in enumerate(sorted(keys))}


_events_seq = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),        # user
        st.sampled_from(["signup", "click", "purchase", "other"]),
        st.integers(min_value=0, max_value=50),       # secs
    ),
    min_size=0,
    max_size=30,
)


def _brute_funnel(rows, steps):
    users = {u for u, _, _ in rows}
    counts = []
    reached = {}
    for u in users:
        ts = sorted(s for uu, t, s in rows if uu == u and t == steps[0])
        if ts:
            reached[u] = ts[0]
    counts.append(len(reached))
    for step in steps[1:]:
        nxt = {}
        for u, prev in reached.items():
            ts = sorted(
                s for uu, t, s in rows if uu == u and t == step and s > prev
            )
            if ts:
                nxt[u] = ts[0]
        reached = nxt
        counts.append(len(reached))
    return counts


@given(_events_seq)
@_SETTINGS
def test_funnel_matches_brute_force(spark, rows):
    from twitch_stream_data_pipeline_spark.operators.event_analytics import (
        funnel_stages,
    )

    steps = ("signup", "click", "purchase")
    df = spark.createDataFrame(
        [(u, t, s, 0.0) for u, t, s in rows] or [(0, "noop", 0, 0.0)],
        "user_id long, event_type string, secs long, value double",
    )
    got = {
        r["stage"]: r["n_users"] for r in funnel_stages(df, steps).collect()
    }
    want = _brute_funnel(rows, steps)
    assert [got[i + 1] for i in range(3)] == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # doc_id
            st.sampled_from(["s0", "s1", "s2"]),      # source
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@_SETTINGS
def test_temperature_sample_partition_independent_and_keeps_min(spark, rows):
    from twitch_stream_data_pipeline_spark.extensions.sampling import (
        temperature_sample,
    )

    df1 = spark.createDataFrame(rows, "doc_id long, source string")
    df8 = df1.repartition(8)
    kept1 = sorted(r["doc_id"] for r in temperature_sample(df1).collect())
    kept8 = sorted(r["doc_id"] for r in temperature_sample(df8).collect())
    assert kept1 == kept8  # partition-independent keep decisions
    # every smallest-count source keeps all members (rate == 1)
    from collections import Counter

    c = Counter(s for _, s in rows)
    cmin = min(c.values())
    smallest = {s for s, n in c.items() if n == cmin}
    kept_set = set(kept1)
    for d, s in rows:
        if s in smallest:
            assert d in kept_set


_ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),      # user
        st.integers(min_value=0, max_value=3_000_000),  # secs (~5 weeks)
    ),
    min_size=1,
    max_size=30,
)


@given(_ev_rows)
@_SETTINGS
def test_retention_matches_brute_force(spark, rows):
    from collections import Counter

    from twitch_stream_data_pipeline_spark.operators.event_analytics import (
        retention_cohorts,
    )

    df = spark.createDataFrame(
        [(u, "view", s, 0.0) for u, s in rows],
        "user_id long, event_type string, secs long, value double",
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    # python reference
    wk = 604_800
    weeks = {}
    for u, s in rows:
        weeks.setdefault(u, set()).add(s // wk)
    want = Counter()
    for u, ws in weeks.items():
        c = min(ws)
        for w in ws:
            want[(c, w - c)] += 1
    assert got == dict(want)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=20_000),  # secs, ~22 slots
            st.integers(min_value=-50, max_value=50),    # value as int
        ),
        min_size=1,
        max_size=25,
    )
)
@_SETTINGS
def test_gapfill_matches_brute_force(spark, rows):
    from twitch_stream_data_pipeline_spark.operators.event_analytics import (
        gapfill_forward,
    )

    df = spark.createDataFrame(
        [(1, g, s, float(v)) for g, s, v in rows],
        "event_id long, event_type string, secs long, value double",
    )
    got = {
        (r["event_type"], r["slot"]): (r["sum_value"], r["is_observed"])
        for r in gapfill_forward(df).collect()
    }
    # python reference (integer values keep sums exact)
    obs = {}
    for g, s, v in rows:
        obs.setdefault(g, {}).setdefault(s // 900, 0)
        obs[g][s // 900] += v
    want = {}
    for g, slots in obs.items():
        lo, hi = min(slots), max(slots)
        lastv = None
        for sl in range(lo, hi + 1):
            if sl in slots:
                lastv = float(slots[sl])
                want[(g, sl)] = (lastv, 1)
            else:
                want[(g, sl)] = (lastv, 0)
    assert got == want


# ---------------------------------------------------------------------------
# Round 7: the two new in-memory BPE engines, property-pinned against
# their naive reference semantics (pure Python — no Spark needed, so
# hypothesis can afford many examples)
# ---------------------------------------------------------------------------

_bpe_chars = st.sampled_from("abc")
_bpe_word = st.text(alphabet="abc", min_size=1, max_size=7)


def _naive_trainer(word_freqs, n_merges, min_pair_freq):
    """Reference: full pair recount + linear argmax every round."""
    from collections import Counter

    from twitch_stream_data_pipeline_spark.extensions.bpe import EOW

    seqs = {i: [*w[:-1], w[-1] + EOW] for i, (w, _) in enumerate(word_freqs)}
    freqs = {i: f for i, (_, f) in enumerate(word_freqs)}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for i, s in seqs.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += freqs[i]
        if not pairs:
            break
        (l, r), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pf < min_pair_freq:
            break
        merges.append((rank, l, r, int(pf)))
        for i, s in seqs.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            seqs[i] = out
    return merges


@given(
    st.lists(
        st.tuples(_bpe_word, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=60, deadline=None)
def test_driver_merge_trainer_equals_naive_recount(word_freqs, min_freq):
    """The incremental-pair-count + lazy-heap trainer must produce the
    exact merge sequence of a full recount per round — including the
    decrement-push subtlety (a pair whose count only DECREASED must
    stay visible to the argmax at its new count)."""
    from twitch_stream_data_pipeline_spark.extensions.bpe import (
        _driver_merge_trainer,
    )

    # collapse duplicate words (the real input is a distinct-word table)
    merged = {}
    for w, f in word_freqs:
        merged[w] = merged.get(w, 0) + f
    wf = sorted(merged.items())
    want = _naive_trainer(wf, 30, min_freq)
    got = _driver_merge_trainer(wf, 30, min_freq)
    assert got == want


@given(
    _bpe_word,
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=3),
            st.text(alphabet="abc", min_size=1, max_size=3),
        ),
        min_size=0,
        max_size=25,
    ),
)
@settings(max_examples=120, deadline=None)
def test_replay_symbols_equals_naive_sequential_replay(word, merge_list):
    """The occurrence-indexed heap replay must equal one greedy pass
    per merge in rank order for ARBITRARY merge tables — including
    pathological ones where a late merge's product string-collides
    with an earlier pair's token, and tables listing the SAME pair at
    several ranks (a trained table can re-learn a pair whose adjacency
    later merges string-rebuild; the rank-list mapping replays every
    listed round, a single pair->rank dict replays only one)."""
    from twitch_stream_data_pipeline_spark.extensions.bpe import (
        EOW,
        _replay_symbols,
    )

    syms = [*word[:-1], word[-1] + EOW]
    naive = list(syms)
    for l, r in merge_list:
        out = []
        for x in naive:
            if out and out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        naive = out
    from twitch_stream_data_pipeline_spark.extensions.bpe import _ranks_of

    got = _replay_symbols(syms, merge_list, _ranks_of(merge_list))
    assert got == naive


def test_replay_symbols_duplicate_pair_tables():
    """Fixed regressions for duplicated merge pairs (review r7): a
    keep-LAST pair->rank dict fired (b,c) before the first (a,b); a
    keep-FIRST dict missed the re-fire round where ('xy','b') matches
    only after ('x','y') has built the 'xy' symbol."""
    from twitch_stream_data_pipeline_spark.extensions.bpe import (
        _ranks_of,
        _replay_symbols,
    )

    for syms, merges, want in [
        # duplicate listed later must not displace the first round
        (
            ["a", "b", "c", "d</w>"],
            [("a", "b"), ("b", "c"), ("a", "b")],
            ["ab", "c", "d</w>"],
        ),
        # re-fire: the second ('xy','b') round matches the adjacency
        # built by ('x','y') in between
        (
            ["x", "y", "b</w>"],
            [("xy", "b</w>"), ("x", "y"), ("xy", "b</w>")],
            ["xyb</w>"],
        ),
    ]:
        assert _replay_symbols(syms, merges, _ranks_of(merges)) == want


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-5, max_value=5, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_unit_rows_zero_safe(rows):
    """_unit_rows: non-zero rows become unit vectors, all-zero rows
    stay all-zero (never NaN) — the ADVICE r6 normalization contract."""
    import numpy as np

    from twitch_stream_data_pipeline_spark.extensions.similarity import (
        _unit_rows,
    )

    X = np.array(rows, dtype=np.float64)
    U = _unit_rows(X)
    assert not np.isnan(U).any()
    for i in range(len(X)):
        n = np.linalg.norm(X[i])
        if n == 0:
            assert (U[i] == 0).all()
        else:
            assert abs(np.linalg.norm(U[i]) - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Round 12: the promoted pack_groups oracle under adversarial weights.
# The fixed corpora and the fuzz sweep exercise the RECURSIVE-CTE
# first-fit-decreasing restatement on realistic distributions; this
# property drives the SAME SQL against the Python packer on hostile
# shapes the data never produces densely — all-equal weights (every
# placement is a tie), single items exactly at / just over the cap,
# zero weights, one-item and cap-1 corners. Pure DuckDB vs pure
# Python: no Spark session involved, so the search is cheap and wide.
# ---------------------------------------------------------------------------

_pack_weights = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=24
)


@given(_pack_weights, st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=60, deadline=None)
def test_pack_oracle_cte_equals_python_packer(weights, max_groups, cap):
    import duckdb

    from twitch_stream_data_pipeline_spark.operators.packing import (
        pack_into_groups,
        pack_oracle_sql,
    )

    items = [(f"k{i:02d}", w) for i, w in enumerate(weights)]
    groups = pack_into_groups(items, max_groups=max_groups, cap=cap)
    want = [
        (gid, len(g), sum(w for k, w in items if k in set(g)))
        for gid, g in enumerate(groups)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE w (k VARCHAR, wt BIGINT)"
    )
    con.executemany("INSERT INTO w VALUES (?, ?)", items)
    sql = pack_oracle_sql(
        "SELECT k, wt AS w FROM w",
        max_groups=max_groups,
        cap_sql=str(cap),
    )
    got = con.execute(sql).fetchall()
    assert [tuple(r) for r in got] == want, (weights, max_groups, cap)
