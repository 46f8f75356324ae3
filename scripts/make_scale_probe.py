"""Synthesize a ~10x replica of sf0.1 for the SCALING PROBE ONLY
(VERDICT r13 #6): the driver's fixtures stop at sf0.1, where every
headline query is sub-second and overhead-bound, so low/high-core
ratios read ≈1 and executor scaling cannot be demonstrated.  This
replica exists to time a handful of heavy queries at ~6M lineitem rows
— it is NOT an oracle fixture, is written under /tmp, and is never
committed.

Construction (deterministic, seedless): 10 copies of every sf0.1
table, every key column offset by copy * (max_key + 1) of its domain
so the FK graph stays exactly referential per copy.  Text is
token-salted per copy (token -> token_k) so the duplicate/near-dup
RATE matches sf0.1 instead of fabricating 10-way duplicate clusters;
embeddings get a deterministic per-copy rotation of the same form
(element + copy scaled tiny) — the probe queries only need realistic
cardinalities and distributions, not semantic content.

Usage: python scripts/make_scale_probe.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

KEY_DOMAINS = {
    "region": {"r_regionkey": "regionkey"},
    "nation": {"n_nationkey": "nationkey", "n_regionkey": "regionkey"},
    "customer": {"c_custkey": "custkey", "c_nationkey": "nationkey"},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": "nationkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

DOMAIN_OWNER = {
    "regionkey": ("region", "r_regionkey"),
    "nationkey": ("nation", "n_nationkey"),
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaleprobe/sf1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    strides = {}
    for dom, (tbl, col) in DOMAIN_OWNER.items():
        t = pq.read_table(f"{SRC}/{tbl}.parquet", columns=[col])
        strides[dom] = int(pc.max(t[col]).as_py()) + 1

    for tbl, keymap in KEY_DOMAINS.items():
        base = pq.read_table(f"{SRC}/{tbl}.parquet")
        copies = []
        for k in range(n_copies):
            cols = {}
            for name in base.column_names:
                col = base[name]
                if name in keymap:
                    off = k * strides[keymap[name]]
                    shifted = pc.add(col.cast(pa.int64()), off)
                    cols[name] = shifted.cast(col.type)
                elif tbl == "documents" and name == "text" and k > 0:
                    salt = f"_{k}"
                    texts = [
                        None
                        if v is None
                        else " ".join(w + salt for w in v.split(" "))
                        for v in col.to_pylist()
                    ]
                    cols[name] = pa.array(texts, pa.string())
                elif tbl == "embeddings" and name == "embedding" and k > 0:
                    eps = 0.001 * k
                    vecs = [
                        None
                        if v is None
                        else [
                            None if x is None else float(x) + eps * ((i % 7) - 3)
                            for i, x in enumerate(v)
                        ]
                        for v in col.to_pylist()
                    ]
                    cols[name] = pa.array(vecs, col.type)
                else:
                    cols[name] = col
            copies.append(pa.table(cols))
        # ONE FILE PER COPY (directory-backed table): Spark's scan
        # parallelism on these small-compressed fixtures is file-count
        # bound (the whole 10x lineitem is <1 maxPartitionBytes split
        # as a single file), so a monolithic file would cap every scan
        # stage at 1-2 tasks and the c8-vs-c32 probe would read ≈1 for
        # the same reason sf0.1 does.  n_copies part files give the
        # scan n_copies-way parallelism — the thing the probe exists
        # to measure.
        tdir = f"{out_dir}/{tbl}.parquet"
        os.makedirs(tdir, exist_ok=True)
        n_rows = 0
        for k, t in enumerate(copies):
            pq.write_table(t, f"{tdir}/part-{k:03d}.parquet")
            n_rows += t.num_rows
        print(f"{tbl}: {base.num_rows} -> {n_rows} rows / {len(copies)} files")


if __name__ == "__main__":
    main()
