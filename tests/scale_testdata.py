"""Synthesize a larger-SF sibling of a driver testdata directory by
key-offset replication (VERDICT r8 next-round #7: the 100x design
arguments are plan-shape-proven but had only been *measured* at sf0.1;
this utility manufactures a >=5x volume locally so the heaviest
queries' scaling CURVES can be measured, not argued).

Not a pytest module — run it directly:

    python tests/scale_testdata.py /root/testdata/sf0.1 \
        /root/repo/.scale_bench/sf0.5 5

Replication semantics (replica 0 is the original data, bit-identical):

- ``documents``: doc_id offset; every WORD of every replica's text is
  prefixed with a replica tag, so every shingle/minhash/simhash of a
  replica differs from the original's — near-dup density stays that of
  the base corpus instead of exploding to 80% duplicates (verbatim
  replication would turn every pair-emitting dedup query quadratic and
  measure output transfer, not scaling).
- ``embeddings``: vec_id offset; the vector is cyclically ROTATED by
  the replica index — norms, per-dim distributions, and cluster
  structure survive (a cluster rotates to a new position as a cluster),
  while replicas decorrelate from their originals, so ANN candidate
  economics scale the way a real 5x corpus would.
- ``events``: event_id/user_id offset (the user universe grows with
  the data, keeping per-user event counts — and therefore window/
  session/graph shapes — constant), ts shifted by a few seconds per
  replica to break exact-tie artifacts.
- ``orders``/``lineitem``/``customer``: order/customer keys offset
  consistently so joins keep their selectivity; part/supplier keys are
  left in range against the UNSCALED dims — fact-to-dim ratio growing
  with volume is exactly what a real scale-up does.
- ``region``/``nation``/``part``/``supplier``/dims: copied verbatim.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

#: base-table row counts at the key-dense driver layout are derived
#: from the data itself (max(key)+1), never hard-coded.
_COPY_TABLES = ("region", "nation", "part", "supplier")


def _span(con, path: str, col: str) -> int:
    return con.execute(f"SELECT max({col}) + 1 FROM '{path}'").fetchone()[0]


def make_scaled(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    p = lambda t: f"{src}/{t}.parquet"  # noqa: E731
    out = lambda t: f"{dst}/{t}.parquet"  # noqa: E731

    for t in _COPY_TABLES:
        if os.path.exists(p(t)):
            shutil.copyfile(p(t), out(t))

    n_docs = _span(con, p("documents"), "doc_id")
    docs_parts = []
    for k in range(replicas):
        if k == 0:
            docs_parts.append(f"SELECT * FROM '{p('documents')}'")
        else:
            docs_parts.append(f"""
              SELECT doc_id + {k * n_docs} AS doc_id,
                     array_to_string(
                       list_transform(string_split(text, ' '),
                                      w -> 'r{k}' || w), ' ') AS text,
                     lang, source, n_chars
              FROM '{p('documents')}'""")
    con.execute(
        f"COPY ({' UNION ALL '.join(docs_parts)}) TO '{out('documents')}' "
        "(FORMAT PARQUET)"
    )

    n_vecs = _span(con, p("embeddings"), "vec_id")
    emb_parts = []
    for k in range(replicas):
        if k == 0:
            emb_parts.append(f"SELECT * FROM '{p('embeddings')}'")
        else:
            emb_parts.append(f"""
              SELECT vec_id + {k * n_vecs} AS vec_id,
                     list_concat(embedding[{k + 1}:],
                                 embedding[1:{k}]) AS embedding,
                     label
              FROM '{p('embeddings')}'""")
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{out('embeddings')}' "
        "(FORMAT PARQUET)"
    )

    n_ev = _span(con, p("events"), "event_id")
    n_users = _span(con, p("events"), "user_id")
    ev_parts = []
    for k in range(replicas):
        if k == 0:
            ev_parts.append(f"SELECT * FROM '{p('events')}'")
        else:
            ev_parts.append(f"""
              SELECT event_id + {k * n_ev} AS event_id,
                     ts + INTERVAL {k * 7} SECOND AS ts,
                     user_id + {k * n_users} AS user_id,
                     event_type, value, props
              FROM '{p('events')}'""")
    con.execute(
        f"COPY ({' UNION ALL '.join(ev_parts)}) TO '{out('events')}' "
        "(FORMAT PARQUET)"
    )

    n_orders = _span(con, p("orders"), "o_orderkey")
    n_cust = _span(con, p("customer"), "c_custkey")
    ord_parts, li_parts, cust_parts = [], [], []
    for k in range(replicas):
        if k == 0:
            ord_parts.append(f"SELECT * FROM '{p('orders')}'")
            li_parts.append(f"SELECT * FROM '{p('lineitem')}'")
            cust_parts.append(f"SELECT * FROM '{p('customer')}'")
        else:
            ord_parts.append(f"""
              SELECT o_orderkey + {k * n_orders} AS o_orderkey,
                     o_custkey + {k * n_cust} AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate,
                     o_orderpriority
              FROM '{p('orders')}'""")
            li_parts.append(f"""
              SELECT * REPLACE (l_orderkey + {k * n_orders} AS l_orderkey)
              FROM '{p('lineitem')}'""")
            cust_parts.append(f"""
              SELECT * REPLACE (c_custkey + {k * n_cust} AS c_custkey)
              FROM '{p('customer')}'""")
    for t, parts in (
        ("orders", ord_parts),
        ("lineitem", li_parts),
        ("customer", cust_parts),
    ):
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out(t)}' "
            "(FORMAT PARQUET)"
        )


if __name__ == "__main__":
    src, dst, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
    make_scaled(src, dst, replicas)
    print(f"wrote {dst} at {replicas}x {src}")
