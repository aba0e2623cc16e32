#!/usr/bin/env python3
"""Deterministic scale-up of a testdata sf directory by key-shifted
replication — the scale-evidence input the round-11 verdict's item 6
asks for (the shipped testdata tops out at sf0.1, where every query is
driver-latency-bound and 8-vs-32-core ratios sit at ~1; this builds a
k×-larger input so compute-bound operators can SHOW a core ratio).

NOT an oracle surface: replicas are key-disjoint (every key column
shifted by replica × (max_key+1)) and document texts are
word-perturbed per replica (each word suffixed with the replica
ordinal) so the dedup family's shingle/minhash work scales ~k× instead
of degenerating into k²-sized cross-replica duplicate cliques. Use the
output ONLY for scaling probes (tools/scale_probe.py); correctness
stays pinned to the driver's own sf dirs.

Usage: python tools/make_scale_data.py <src_sf_dir> <dst_dir> [k]
Deterministic: pure arithmetic on the source tables, no RNG.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns shifted per replica, per table (column -> stride source)
SHIFTS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
COPY = ["region", "nation"]  # fixed dimensions: replicate by reference


def _strides(src: str) -> dict[str, int]:
    """One stride per shifted column name: max over every table that
    carries it, +1 — so cross-table foreign keys stay consistent
    (o_custkey and c_custkey shift by the same stride)."""
    base = {
        "orderkey": 0, "custkey": 0, "partkey": 0, "suppkey": 0,
        "event_id": 0, "user_id": 0, "vec_id": 0, "doc_id": 0,
    }

    def root(col: str) -> str:
        return col.split("_", 1)[1] if col[1:2] == "_" else col

    for table, cols in SHIFTS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=cols)
        for c in cols:
            m = pc.max(t.column(c)).as_py() or 0
            r = root(c)
            base[r] = max(base[r], int(m))
    return {k: v + 1 for k, v in base.items()}


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    strides = _strides(src)

    def root(col: str) -> str:
        return col.split("_", 1)[1] if col[1:2] == "_" else col

    for table in COPY:
        pq.write_table(
            pq.read_table(os.path.join(src, f"{table}.parquet")),
            os.path.join(dst, f"{table}.parquet"),
        )
        print(f"{table}: copied")

    for table, cols in SHIFTS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        reps = []
        for i in range(k):
            r = t
            for c in cols:
                shifted = pc.add(r.column(c), i * strides[root(c)])
                r = r.set_column(r.schema.get_field_index(c), c, shifted)
            if table == "documents" and i > 0:
                # suffix every word with the replica ordinal: all
                # shingles differ from every other replica's, so
                # near-dup structure replicates instead of cross-linking
                texts = [
                    None if s is None else " ".join(w + str(i) for w in s.split(" "))
                    for s in r.column("text").to_pylist()
                ]
                r = r.set_column(
                    r.schema.get_field_index("text"), "text",
                    pa.array(texts, pa.string()),
                )
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {out.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
