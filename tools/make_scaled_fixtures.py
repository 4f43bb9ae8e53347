"""Derive a larger-SF fixture set from the driver's sf0.1 tables by
deterministic replication with per-copy key shifts — the harness for
parity sweeps BEYOND the scales the driver ships (sf1 ≈ 6M lineitem).

This is a ROBUSTNESS harness, not replacement test data: the driver's
/root/testdata stays the only correctness gate input; the derived set
exists to demonstrate that the exactness machinery (fixed-point
headroom, rank tie-breaks, fold determinism) holds one scale decade
further. Derivation rules:

- every key domain shifts by copy * (max_key + 1), applied consistently
  on both sides of each FK (orders.o_custkey and customer.c_custkey
  shift together), so referential structure is preserved exactly;
- region/nation are fixed dimensions and are not replicated;
- documents get a per-copy text suffix (so the near-dup surface grows
  with the corpus instead of producing 10 exact copies of every text,
  which would quadratically inflate candidate groups); n_chars is
  recomputed, preserving the fixture invariant n_chars = length(text);
- all other attribute columns are copied verbatim — copy 0 is
  byte-identical to sf0.1.

Usage: python tools/make_scaled_fixtures.py [n_copies] [out_dir]
Defaults: 10 copies -> <repo>/.fixtures/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

STRIDES = {
    "c": 15_000,  # customer
    "s": 1_000,  # supplier
    "p": 20_000,  # part
    "o": 150_000,  # orders
    "doc": 5_000,
    "vec": 2_000,
    "ev": 100_000,
    "usr": 1_500,
}


def _union(n: int, template: str) -> str:
    return " UNION ALL ".join(template.format(c=c) for c in range(n))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # The embedding diversification rotates by the copy index; at
    # copy >= dim (64) rotation wraps to the identity and replicas
    # become verbatim duplicates again — the quadratic-pairs artifact
    # this generator exists to avoid. Widen the scheme before scaling
    # past 64 copies (e.g. compose rotation with a per-copy sign flip).
    if n > 64:
        raise SystemExit("n_copies > 64 would make embedding rotation degenerate; see comment")
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", "sf1"
        )
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    S = STRIDES

    tables: dict[str, str] = {
        "region": "SELECT * FROM src",
        "nation": "SELECT * FROM src",
        "customer": _union(
            n,
            f"SELECT c_custkey + {{c}} * {S['c']} AS c_custkey, c_name, c_nationkey,"
            " c_acctbal, c_mktsegment FROM src",
        ),
        "supplier": _union(
            n,
            f"SELECT s_suppkey + {{c}} * {S['s']} AS s_suppkey, s_name, s_nationkey,"
            " s_acctbal FROM src",
        ),
        "part": _union(
            n,
            f"SELECT p_partkey + {{c}} * {S['p']} AS p_partkey, p_name, p_brand, p_type,"
            " p_size, p_retailprice FROM src",
        ),
        "orders": _union(
            n,
            f"SELECT o_orderkey + {{c}} * {S['o']} AS o_orderkey,"
            f" o_custkey + {{c}} * {S['c']} AS o_custkey,"
            " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src",
        ),
        "lineitem": _union(
            n,
            f"SELECT l_orderkey + {{c}} * {S['o']} AS l_orderkey,"
            f" l_partkey + {{c}} * {S['p']} AS l_partkey,"
            f" l_suppkey + {{c}} * {S['s']} AS l_suppkey,"
            " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
            " l_returnflag, l_linestatus, l_shipdate FROM src",
        ),
        "events": _union(
            n,
            f"SELECT event_id + {{c}} * {S['ev']} AS event_id, ts,"
            f" user_id + {{c}} * {S['usr']} AS user_id, event_type, value, props FROM src",
        ),
        "documents": _union(
            n,
            f"SELECT doc_id + {{c}} * {S['doc']} AS doc_id,"
            " CASE WHEN {c} = 0 THEN text ELSE text || ' c{c}' END AS text,"
            " lang, source,"
            " CASE WHEN {c} = 0 THEN n_chars"
            " ELSE n_chars + length(' c{c}') END AS n_chars FROM src",
        ),
        "embeddings": _union(
            n,
            f"SELECT vec_id + {{c}} * {S['vec']} AS vec_id,"
            # Per-copy diversification (the doc-text suffix precedent):
            # rotate the vector left by the copy index. Rotation is an
            # ISOMETRY, so every within-copy cosine is preserved exactly
            # (each replica is an isometric image of the original corpus
            # and near-dup structure replicates LINEARLY), while
            # cross-copy rotations of the same vector decorrelate —
            # verbatim replication instead gave every vector 10 exact
            # copies and semantic-dedup pair counts grew quadratically.
            " CASE WHEN {c} = 0 THEN embedding"
            " ELSE embedding[{c}+1:] || embedding[1:{c}] END AS embedding,"
            " label FROM src",
        ),
    }

    for t, sql in tables.items():
        q = sql.replace("src", f"'{SRC}/{t}.parquet'")
        dest = os.path.join(out, f"{t}.parquet")
        con.sql(f"COPY ({q}) TO '{dest}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{t}: {rows} rows")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
