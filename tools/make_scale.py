"""Synthesize a larger scale factor from sf0.1 for perf benching.

Replicates every fact table ``replicas``× with disjoint key ranges and
consistent FK remapping (each replica is a self-contained copy of the
star schema joined to the shared region/nation dims), so join/agg
cardinalities scale linearly the way a real TPC-H sf1 would.

Content columns are perturbed so the similarity operators see a
realistic corpus rather than a 10-way duplicated one:

* ``documents.text`` — replica digit injected every 7 chars, which
  breaks >60% of char-5 shingles (cross-replica Jaccard ≈ 0.2, below
  every near-dup threshold). Within-replica duplicate structure is
  preserved, so dedup still has real work.
* ``embeddings.embedding`` — replicas > 0 get fresh deterministic
  pseudo-random vectors (hash-derived), not jittered copies, so the
  ANN/near-dup operators don't face a quadratic true-pair blowup that
  no real corpus would have.

Timing-only data: both engines read the same parquet, and correctness
is gated at sf0.01 against DuckDB — nothing here is compared by value.

Usage: python tools/make_scale.py [out_dir] [replicas]
       (defaults: /tmp/sdscale/sf1 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {key column: stride}; stride = max_key+1 at sf0.1
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
PASSTHROUGH = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdscale/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")

    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet')"
            f" TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")

    for t, keys in STRIDES.items():
        src_cols = [
            (r[0], r[1])
            for r in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        sel = []
        for c, ctype in src_cols:
            if c in keys:
                # preserve the physical type (int32 keys stay int32)
                sel.append(f"CAST({c} + r.rep * {keys[c]} AS {ctype}) AS {c}")
            elif t == "documents" and c == "text":
                sel.append(
                    "CASE WHEN r.rep = 0 THEN text ELSE"
                    " regexp_replace(text, '(.{7})', '\\1' || (r.rep % 10), 'g')"
                    " END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN r.rep = 0 THEN embedding ELSE"
                    " list_transform(range(64), i -> CAST("
                    "   (hash(vec_id * 640 + r.rep * 64 + i) % 1000) / 500.0 - 1.0"
                    " AS FLOAT)) END AS embedding"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)}"
            f" FROM '{SRC}/{t}.parquet', (SELECT unnest(range({replicas})) AS rep) r"
            f" ORDER BY {list(keys)[0]})"
            f" TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
