"""Scale up a driver-generated testdata dir by integer replication.

Usage: python tools/gen_scale.py [k] [src_dir] [out_dir]
Defaults: k=10, src=/root/testdata/sf0.1, out=<repo>/.testdata/sf1

The driver generates sf0.001/0.01/0.1 only (TESTDATA.md, read-only);
the 10x scale-up bench point (VERDICT r7 next-round #1) needs an sf1.
This tool builds one DETERMINISTICALLY from sf0.1 by k-fold replication
with consistent foreign-key shifts — every copy is a disjoint,
structurally identical shard of the original, so query outputs scale
exactly linearly in k and any super-linear *runtime* is attributable to
the engine, not the data.

Replication rules (why naive copy would corrupt the measurement):

* TPC-H tables: keys are dense 0-based, so copy i shifts every key and
  FK by ``i * rows(owning table)`` — joins land exactly as in the
  original, group-key cardinalities (returnflag, mktsegment, ...) stay
  constant, fact tables grow k-fold.
* region/nation: fixed-size dimensions in TPC-H — copied once.
* documents: ids shift; TEXT of copy i>0 is re-tokenized through a
  per-copy caesar rotation of [a-z] (length-, token-boundary- and
  punctuation-preserving).  Identical text across copies would make
  every doc a cross-copy near-duplicate, so dedup outputs (pair
  tables, LSH buckets) would blow up O(k^2) BY DATA CONSTRUCTION and
  the scaling record would be meaningless.  Rotation keeps each copy's
  internal duplicate structure bit-exact (planted dups stay dups)
  while making cross-copy shingle overlap zero.
* embeddings: ids shift; vectors of copy i>0 go through a per-copy
  SIGNED PERMUTATION of the 64 dims (orthogonal transform: preserves
  norms and all within-copy pairwise cosines exactly, makes cross-copy
  cosine of the "same" vector noise) — same rationale as documents for
  ANN/embedding-dedup entries.
* events: event_id/user_id shift; timestamps keep the original range,
  so time-window densities grow k-fold (what a bigger deployment looks
  like) and watermark/window state sizes are genuinely stressed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(f"{src}/{name}.parquet")


def _write(out: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, f"{out}/{name}.parquet")


def _shift(tbl: pa.Table, col: str, by: int) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    arr = tbl.column(idx)
    shifted = pa.compute.add(arr, pa.scalar(by, type=arr.type))
    return tbl.set_column(idx, tbl.schema.field(idx), shifted.cast(arr.type))


def _replicate(tbl: pa.Table, k: int, shifts: dict, transform=None) -> pa.Table:
    copies = []
    for i in range(k):
        c = tbl
        for col, stride in shifts.items():
            if i:
                c = _shift(c, col, i * stride)
        if transform is not None:
            c = transform(c, i)
        copies.append(c)
    return pa.concat_tables(copies)


def _rotate_text(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    rot = i % 25 + 1  # never identity for i>0
    src = "abcdefghijklmnopqrstuvwxyz"
    table = str.maketrans(src, src[rot:] + src[:rot])
    idx = tbl.schema.get_field_index("text")
    texts = tbl.column(idx).to_pylist()
    arr = pa.array([t.translate(table) if t is not None else None for t in texts])
    return tbl.set_column(idx, tbl.schema.field(idx), arr)


def _permute_vecs(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    idx = tbl.schema.get_field_index("embedding")
    col = tbl.column(idx).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    vals = np.asarray(col.values)
    dim = len(col[0])
    mat = vals.reshape(-1, dim).copy()
    rng = np.random.RandomState(42 + i)
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(mat.dtype)
    mat = mat[:, perm] * signs
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), type=col.type.value_type), dim
    ).cast(pa.list_(col.type.value_type))
    return tbl.set_column(idx, tbl.schema.field(idx), arr)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else f"{repo}/.testdata/sf1"
    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation"):
        _write(out, name, _read(src, name))

    cust = _read(src, "customer")
    supp = _read(src, "supplier")
    part = _read(src, "part")
    orders = _read(src, "orders")
    li = _read(src, "lineitem")
    n_c, n_s, n_p, n_o = len(cust), len(supp), len(part), len(orders)
    _write(out, "customer", _replicate(cust, k, {"c_custkey": n_c}))
    _write(out, "supplier", _replicate(supp, k, {"s_suppkey": n_s}))
    _write(out, "part", _replicate(part, k, {"p_partkey": n_p}))
    _write(out, "orders", _replicate(orders, k, {"o_orderkey": n_o, "o_custkey": n_c}))
    _write(
        out,
        "lineitem",
        _replicate(li, k, {"l_orderkey": n_o, "l_partkey": n_p, "l_suppkey": n_s}),
    )

    ev = _read(src, "events")
    n_u = 1 + int(pa.compute.max(ev.column("user_id")).as_py())
    _write(out, "events", _replicate(ev, k, {"event_id": len(ev), "user_id": n_u}))

    docs = _read(src, "documents")
    _write(out, "documents", _replicate(docs, k, {"doc_id": len(docs)}, _rotate_text))

    emb = _read(src, "embeddings")
    _write(out, "embeddings", _replicate(emb, k, {"vec_id": len(emb)}, _permute_vecs))

    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        md = pq.read_metadata(f"{out}/{name}.parquet")
        print(f"{name}: {md.num_rows} rows")
    print(f"wrote {out} (k={k} from {src})")


if __name__ == "__main__":
    main()
