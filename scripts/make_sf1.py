#!/usr/bin/env python3
"""Synthesize the bench-only sf1 fixture (dev tool; the shipped Scala
library does not depend on this). Reconstructs the round-7 construction
documented in BASELINE.md §"Scale validation" on top of whatever testdata
generation is current:

- documents x10: copy k rotates a-z by k (a character bijection, so
  gram/shingle statistics and every within-copy similarity are exactly
  preserved while cross-copy vocabularies stay disjoint - "10x more
  documents of the same kind"); doc_id offset per copy.
- events x10: event_id AND user_id offset per copy (un-offset users would
  let the per-user stream joins match across copies - output would grow
  x100 on x10 data by construction, a fixture artifact, not a plan
  property); ts shifted per copy by k*(span+1h) so the concatenated
  stream stays TIME-ORDERED in event_id order ("10x more history", the
  same shape as the source stream). Un-shifted ts repeated the same
  30-day span 10 times back-to-back in arrival order, which made ~90%
  of rows "late" under stream_watermark_late's prefix-max watermark -
  the same fixture-artifact class as the un-offset user_id. Per-user
  behavior is unchanged either way (each user's events live in one
  copy); value distributions verbatim.
- lineitem x10 with per-copy key offsets on order/part/supp, AND
  orders/part/supplier x10 with the MATCHING offsets - the join graph
  genuinely gains 10 identical components. (The first cut offset only
  lineitem's FK side, leaving 9/10 of the probe keys dangling: joins
  then measure a 10x probe whose match volume does not scale - the same
  fixture-artifact class as the un-offset user_id below.)
- embeddings x10 (r10; previously symlinked 1x, which silenced every
  sim_/dedup_near_embedding scale measurement): copy k offsets vec_id
  and ROTATES the 64 dims by k - a bijection of coordinates, so every
  within-copy cosine/norm/cell geometry is exactly preserved while
  cross-copy pairs decorrelate ("10x more vectors of the same kind").
  Labels repeat per copy: the fixed label vocabulary genuinely gains
  10x members per cell, which is exactly the growth regime the
  refined-cell/trained-IVF paths exist for.
- all other tables symlinked from the source sf dir (customer stays 1x:
  orders' o_custkey is NOT offset, so per-customer fan-out grows 10x -
  the realistic "same customers, more history" shape).

Usage: make_sf1.py [src_dir] [dst_dir] [copies]
       (defaults sf0.1 -> /tmp/graft_sf1, 10 copies)

copies > 25 (r11 ran 30 copies for the sf3 probe; r12 runs 100 for the
sf10 decade probe) switch the per-copy text bijection from a rotation
to a SEEDED LETTER-ONLY PERMUTATION of a-z (seed = copy index, so the
fixture is deterministic): still a character bijection per copy —
within-copy gram/shingle/set statistics exactly preserved — with 26!
distinct permutations, so no copy pair shares the map and the map is
never the identity in practice. Letters map to LETTERS on purpose: the
first cut rotated a-z0-9, and the r12 sf10 bench showed digit-mixed
copies distort character-class statistics (regex keys matching
[a-z]+/[0-9]+ runs did ~20x the match work on permuted docs — phantom
superlinearity on map-only keys). Cross-copy vocabularies are no
longer provably disjoint (two permutations can incidentally agree on a
word), but an 8-char shingle collides with probability ~26^-d — far
below any near-dup threshold's candidate mass, invisible to a timing
probe. Copies 0-25 use the ORIGINAL a-z rotation byte-for-byte, so the
default sf1 output is unchanged. (The committed r11/r12 sf3 numbers
were measured on the earlier a-z0-9-rotation fixture; 4 of its 30
copies carried digit-rotated text — a ~13 % admixture, noted in
BASELINE.md.)

Embeddings keep the dim-rotation for copies < 64 and add a seeded
per-copy ±1 sign-flip diagonal for copies >= 64: rotation alone
repeats mod the 64 dims (copy 64 would duplicate copy 0's geometry
exactly — a planted cross-copy exact-dup corpus), while
rotation∘sign-flip is still an isometry (within-copy cosines, norms
and cell geometry exactly preserved) that decorrelates every copy
pair. Copies 0-63 are byte-identical to the pre-r12 construction.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
assert COPIES <= 1000, "keep the fixture in the probe regime"

ROT_TABLES = {"documents"}


def rotate_text(col: pa.ChunkedArray, k: int) -> pa.Array:
    """Rotate a character alphabet by k (bijection; other chars untouched):
    a-z rotation for k < 26 (the original sf1 construction, unchanged);
    a seeded a-z-ONLY permutation for k >= 26 (the sf10 probe's extra
    copies — letters map to letters, see the module header for why the
    earlier a-z0-9 rotation was retired)."""
    if k == 0:
        return col.combine_chunks()
    if k < 26:
        src = "abcdefghijklmnopqrstuvwxyz"
        dst = src[k:] + src[:k]
    else:
        # seeded LETTER-ONLY permutation: deterministic per copy,
        # bijective, no two copies share the map. Letters must map to
        # letters: the first >26-copy cut rotated a-z0-9, and the r12
        # sf10 bench showed the digit-mixed copies change CHARACTER-CLASS
        # statistics — regex keys matching [a-z]+/[0-9]+ runs did ~20x
        # the match work on permuted docs, reading as phantom exp 1.3-1.7
        # superlinearity on map-only keys. A letter permutation preserves
        # the character-class profile exactly along with the gram/shingle
        # statistics. (Identity is excluded for any k: Random(k).shuffle
        # of 26 elements yields the identity with P = 1/26!.)
        src = "abcdefghijklmnopqrstuvwxyz"
        chars = list(src)
        random.Random(k).shuffle(chars)
        dst = "".join(chars)
    py = col.to_pylist()
    table = str.maketrans(src, dst)
    return pa.array([None if t is None else t.translate(table) for t in py],
                    type=pa.string())


def write_copies(dst_path: str, make_copy) -> None:
    """Stream COPIES row groups through one ParquetWriter instead of
    concat_tables-then-write: at the sf100 probe scale (1000 copies) the
    concatenated lineitem table alone is ~60 GB of Arrow memory, while
    streaming bounds peak memory at one copy. Row order and values are
    identical to the concat construction (copy k is row-group block k)."""
    writer = None
    try:
        for k in range(COPIES):
            part = make_copy(k)
            if writer is None:
                writer = pq.ParquetWriter(dst_path, part.schema)
            writer.write_table(part)
    finally:
        if writer is not None:
            writer.close()


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for name in tables:
        src_path = f"{SRC}/{name}.parquet"
        dst_path = f"{DST}/{name}.parquet"
        if os.path.lexists(dst_path):
            os.remove(dst_path)
        if name == "documents":
            t = pq.read_table(src_path)

            def doc_copy(k: int) -> pa.Table:
                cols = {}
                for field in t.schema:
                    c = t.column(field.name)
                    if field.name == "doc_id":
                        cols[field.name] = pc.add(c, k * 10_000_000)
                    elif field.name == "text":
                        cols[field.name] = rotate_text(c, k)
                    else:
                        cols[field.name] = c
                return pa.table(cols)
            write_copies(dst_path, doc_copy)
        elif name == "events":
            t = pq.read_table(src_path)
            ts = t.column("ts")
            span_us = int((pc.max(ts).as_py() - pc.min(ts).as_py())
                          .total_seconds() * 1e6) + 3_600_000_000
            off = {"event_id": 100_000_000, "user_id": 10_000_000}

            def ev_copy(k: int) -> pa.Table:
                cols = {}
                for f in t.schema:
                    c = t.column(f.name)
                    if f.name in off:
                        cols[f.name] = pc.add(c, k * off[f.name])
                    elif f.name == "ts":
                        cols[f.name] = pc.add(
                            c, pa.scalar(k * span_us, type=pa.duration("us")))
                    else:
                        cols[f.name] = c
                return pa.table(cols)
            write_copies(dst_path, ev_copy)
        elif name in ("lineitem", "orders", "part", "supplier"):
            t = pq.read_table(src_path)
            off = {"l_orderkey": 100_000_000, "l_partkey": 10_000_000,
                   "l_suppkey": 1_000_000, "o_orderkey": 100_000_000,
                   "p_partkey": 10_000_000, "s_suppkey": 1_000_000}

            def tpc_copy(k: int) -> pa.Table:
                return pa.table(
                    {f.name: (pc.add(t.column(f.name), k * off[f.name])
                              if f.name in off else t.column(f.name))
                     for f in t.schema})
            write_copies(dst_path, tpc_copy)
        elif name == "embeddings":
            t = pq.read_table(src_path)
            vecs = t.column("embedding").to_pylist()
            labels = t.column("label")
            ids = t.column("vec_id")
            etype = t.schema.field("embedding").type

            def emb_copy(k: int) -> pa.Table:
                r = k % 64
                rot = [None if v is None else v[r:] + v[:r] for v in vecs]
                if k >= 64:
                    # rotation repeats mod the 64 dims; compose a seeded
                    # ±1 diagonal (an isometry — within-copy geometry
                    # exactly preserved) so no copy pair shares geometry
                    rng = random.Random(1000 + k)
                    signs = [rng.choice((1.0, -1.0)) for _ in range(64)]
                    # element-level nulls survive the flip exactly as the
                    # rotation path keeps them (a null element aborted the
                    # >=64-copy path only, so a fixture that regenerated
                    # fine at 10 copies failed at sf10 scale)
                    rot = [None if v is None else
                           [None if x is None else x * s
                            for x, s in zip(v, signs)] for v in rot]
                return pa.table({
                    "vec_id": pc.add(ids, k * 10_000_000),
                    "embedding": pa.array(rot, type=etype),
                    "label": labels,
                })
            write_copies(dst_path, emb_copy)
        else:
            os.symlink(os.path.abspath(src_path), dst_path)
    for name in tables:
        n = pq.read_metadata(f"{DST}/{name}.parquet").num_rows
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
