#!/usr/bin/env python3
"""Deterministic scale-up rehearsal data: sfX -> sf(X*REP) by key-shifted
replication, preserving parquet schemas byte-exactly (pyarrow, no Spark —
Spark would round-trip events.ts TIMESTAMP(NANOS) through nanosAsLong and
change the column type the oracle and Sources.events() both rely on).

Usage: python3 tools/scale_up.py <srcDir> <destDir> [replicas=10]

Design (documented in SCALING.md "sf1.0 rehearsal"):
  - FK families shift together per replica r so joins stay closed:
    orderkey (orders+lineitem), custkey (customer+orders), suppkey
    (supplier+lineitem), partkey (part+lineitem). region/nation are
    fixed-cardinality dims and are NOT replicated (like TPC-H).
  - documents.text gets a per-replica letter+digit rotation: replica 0 is
    the original corpus (so absolute candidate windows like doc_id < 1024
    select exactly the sf0.1 docs), replicas 1..R-1 are shingle-disjoint
    from it. Without this, 10 exact copies of every doc would turn each
    near-dup pair into a 10x10 clique and every LSH/Jaccard/connected-
    components query quadratic in REP — not how a real 10x corpus grows.
    Pair-producing ops stay ~linear in REP: each replica contributes its
    own internal dup structure.
  - embeddings.embedding gets a per-replica circular component rotation
    (norm-preserving; expected cross-replica cosine ~0 for these vectors)
    for the same reason: intra-replica ANN/near-dup structure identical to
    the original, no planted cross-replica near-dups.
  - Everything else (timestamps, prices, flags, props) is copied verbatim.

This is a SCALE rehearsal, not a reproduction of the driver generator at
sf1.0 (its seed/process is unknown); correctness at sf1.0 is still exact
because the DuckDB oracle reads the same parquet.
"""
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> stride (next power of 10 above the sf0.1 max, so replica
# digits are human-readable). Columns in the same FK family share a name
# across tables, so one map covers both sides of each join.
STRIDES = {
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "c_custkey": 100_000, "o_custkey": 100_000,
    "s_suppkey": 10_000, "l_suppkey": 10_000,
    "p_partkey": 100_000, "l_partkey": 100_000,
    "event_id": 1_000_000, "user_id": 10_000,
    "doc_id": 10_000, "vec_id": 10_000,
}
REPLICATED = ["customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]
FIXED_DIMS = ["region", "nation"]


def caesar(r):
    """Per-replica letter AND digit substitution. Letters: replicas 1..25
    are Caesar rotations; replicas >= 26 use a seeded random alphabet
    permutation instead — a plain rotation wraps mod 26, which made
    replicas 26..29 of the first sf3.0 build exact text copies of replicas
    0..3 and inflated LSH candidate pairs 11.6x over linear (contamination
    hits doubled: replica 26 re-matched the eval set). Digits get the same
    treatment (rotation below r=10, seeded permutation beyond) — without
    it, shingles composed entirely of digits/punctuation are byte-identical
    across replicas, quietly weakening the 'cross-replica shingles
    disjoint' invariant the linear-pair-growth criterion rests on for
    numeric-heavy content. Punctuation-only shingles can still collide;
    the fixture corpus has none. Distinct permutations keep cross-replica
    shingles disjoint for any R."""
    import random
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    dig = string.digits
    if r < 26:
        k = r % 26
        sub = lo[k:] + lo[:k]
    else:
        sub = "".join(random.Random(f"scale-up-replica-{r}").sample(lo, 26))
    if r < 10:
        dsub = dig[r:] + dig[:r]
    else:
        dsub = "".join(random.Random(f"scale-up-digits-{r}").sample(dig, 10))
    return str.maketrans(lo + up + dig, sub + sub.upper() + dsub)


def replica(tbl, name, r):
    if r == 0:
        return tbl
    cols = []
    for i, field in enumerate(tbl.schema):
        col = tbl.column(i)
        if field.name in STRIDES:
            col = pc.cast(
                pc.add(col, STRIDES[field.name] * r), field.type)
        elif name == "documents" and field.name == "text":
            tr = caesar(r)
            col = pa.array(
                [None if v is None else v.translate(tr)
                 for v in col.to_pylist()], type=field.type)
        elif name == "embeddings" and field.name == "embedding":
            mat = np.array(col.to_pylist(), dtype=np.float32)
            # roll stride 7 is coprime with dim=64, so roll amounts are
            # distinct for r < dim; beyond that replicas would repeat.
            assert r < mat.shape[1], (
                f"embedding roll wraps at {mat.shape[1]} replicas")
            mat = np.roll(mat, (r * 7) % mat.shape[1], axis=1)
            col = pa.array(list(mat), type=field.type)
        cols.append(col)
    return pa.table(cols, schema=tbl.schema)


def main(src, dest, rep):
    import os
    os.makedirs(dest, exist_ok=True)
    for name in FIXED_DIMS + REPLICATED:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        n = 1 if name in FIXED_DIMS else rep
        out = pa.concat_tables(replica(tbl, name, r) for r in range(n))
        assert out.schema == tbl.schema, f"{name}: schema drift"
        # row_group_size ~1M keeps groups scannable in parallel by Spark
        pq.write_table(out, f"{dest}/{name}.parquet",
                       row_group_size=1_000_000)
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data/sf1.0"
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dest, rep)
