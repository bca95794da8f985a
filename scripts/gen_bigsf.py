#!/usr/bin/env python
"""Generate a scaled-up copy of a driver sf dir for LOCAL measurement only.

The driver's round-end bench may run at a larger, driver-generated scale
factor than the committed /root/testdata dirs (BENCH_r06.json: sf=1.0).
That data is wiped between sessions, so this script rebuilds an
equivalently-sized dataset by tiling sf0.1 K times with FK-consistent key
offsets (replica i shifts every entity key by i*1e7, preserving joins,
modular-arithmetic distributions, and the bounded probe/distractor id
ranges the ANN/near-dup queries filter on). Replica document texts get a
per-doc word shuffle so the dedup/minhash queries see ~K*distinct texts
instead of K exact copies of each (which would overstate LSH bucket
density vs the driver's generator).

Usage: python scripts/gen_bigsf.py [--src /root/testdata/sf0.1]
                                   [--out /tmp/sfbig] [--k 10]

Measurement helper only — never read by queries() or bench.py defaults.
"""
from __future__ import annotations

import argparse
import os
import random

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000  # per-replica key offset; multiple of 1e4 so (key*c)%10000
                  # distributions (r1 intervals) are replica-invariant

# table -> int64 key columns shifted by i*OFF per replica
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]  # constant-size at every sf


def _shuffle_words(texts: pa.ChunkedArray, seed: int) -> pa.Array:
    rng = random.Random(seed)
    out = []
    for t in texts.to_pylist():
        words = t.split(" ")
        rng.shuffle(words)
        out.append(" ".join(words))
    return pa.array(out, type=pa.string())


def scale_table(src: str, out: str, name: str, k: int) -> int:
    tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
    reps = []
    for i in range(k):
        rep = tbl
        if i > 0:
            for col in KEYED[name]:
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep.column(col), pa.scalar(
                    i * OFF, type=rep.schema.field(col).type))
                rep = rep.set_column(idx, col, shifted)
            if name == "documents":
                idx = rep.schema.get_field_index("text")
                rep = rep.set_column(idx, "text",
                                     _shuffle_words(rep.column("text"), i))
        reps.append(rep)
    big = pa.concat_tables(reps)
    pq.write_table(big, os.path.join(out, f"{name}.parquet"))
    return big.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfbig")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in DIMS:
        tbl = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        pq.write_table(tbl, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} (dim, copied)")
    for name in KEYED:
        n = scale_table(args.src, args.out, name, args.k)
        print(f"{name}: {n}")
    open(os.path.join(args.out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
