"""Generate a 10x replica of the sf0.1 testdata for the scale-cliff
bench (r10 verdict #4): one decade of measured scaling beats arguing
the 100 TB mandate from plan shape alone.

Writes `sf1`-shaped parquet to ``.scale/sf1/`` (gitignored; ~170 MB)
by replicating each sf0.1 table 10x with TPC-H-style semantics:

- ``region``/``nation`` stay FIXED (dims don't scale with SF);
- fact/entity keys shift by a per-replica offset so FK joins hold
  WITHIN a replica and never collide across replicas
  (customer+orders share the c_custkey shift, orders+lineitem the
  o_orderkey shift, etc.);
- ``documents.text`` gets a per-replica word-suffix rewrite
  (``w -> w~r<k>`` for replica k>0): every replica keeps the ORIGINAL
  within-replica duplicate/shingle structure (dup rate constant as
  the corpus grows — how real corpora scale) while replicas share no
  shingles, so the near-dup pair graph grows linearly, not
  quadratically through 10 exact copies of every document. Vocabulary
  consequently grows ~10x (worse than Heaps' law — a conservative,
  adversarial-to-us choice for BPE/vocab operators);
- ``embeddings`` shift ids and add a tiny per-replica epsilon to the
  vector (replica points stay in the same region of space — cell
  populations grow 10x, the SemDeDup stress case).

Deterministic, idempotent (overwrites). Run:
    python scripts/make_scale_data.py [--out .scale/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
OFF_STEP = 100_000_000  # leaves room above every sf0.1 key space


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def rep(table: str, select_tpl: str) -> None:
        """UNION ALL of `copies` replicas; {o} = key offset, {r} = replica."""
        parts = [
            select_tpl.format(o=r * OFF_STEP, r=r)
            + f" FROM read_parquet('{SRC}/{table}.parquet')"
            for r in range(args.copies)
        ]
        sql = " UNION ALL ".join(parts)
        dst = os.path.join(args.out, f"{table}.parquet")
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{os.path.join(args.out, t + '.parquet')}' (FORMAT PARQUET)"
        )
        print(f"{t}: copied fixed dim")

    rep("customer",
        "SELECT c_custkey + {o} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment")
    rep("supplier",
        "SELECT s_suppkey + {o} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    rep("part",
        "SELECT p_partkey + {o} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice")
    rep("orders",
        "SELECT o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    rep("lineitem",
        "SELECT l_orderkey + {o} AS l_orderkey, l_partkey + {o} AS l_partkey, "
        "l_suppkey + {o} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate")
    rep("events",
        "SELECT event_id + {o} AS event_id, ts, user_id + {o} AS user_id, "
        "event_type, value, props")
    # replica 0 keeps the original text so sf0.1 results embed verbatim;
    # k>0 suffixes every word — disjoint shingle/vocab space per replica
    rep("documents",
        "SELECT doc_id + {o} AS doc_id, "
        "CASE WHEN {r} = 0 THEN text "
        "ELSE regexp_replace(text, '(\\S+)', '\\1~r{r}', 'g') END AS text, "
        "lang, source, "
        "CAST(length(CASE WHEN {r} = 0 THEN text "
        "ELSE regexp_replace(text, '(\\S+)', '\\1~r{r}', 'g') END) AS BIGINT)"
        " AS n_chars")
    rep("embeddings",
        "SELECT vec_id + {o} AS vec_id, "
        "list_transform(embedding, x -> CAST(x + {r} * 0.0001 AS FLOAT)) "
        "AS embedding, label")


if __name__ == "__main__":
    main()
