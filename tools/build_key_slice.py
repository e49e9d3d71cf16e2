"""Build a KEY-SLICED fixture dir: `events` filtered to a deterministic
residue class (user_id % K == r), every other table symlinked unchanged.

Purpose: exact (not sampled) oracle verification of per-key-partitioned
operators at fixture scales where the FULL output is too large to collect
and hash driver-side (e.g. sql_mr_all_rows at the 1000x dir emits ~50M
rows). MATCH_RECOGNIZE / CEP / per-user windows partition by user_id, so
restricting BOTH engines to the same residue class preserves every match
within the class bit-for-bit — the compare is exact on the slice, and the
slice is chosen by residue (not head-N), so every per-key pathology
(longest runs, densest users) has the same distribution as the full table.
The full-table engine-side completion (rows produced, no oracle) is proven
separately by the calling gate.

Usage: python tools/build_key_slice.py <src_sf_dir> <dst_dir> [K] [r] [tables]
       (default K=97, r=3, tables=events; tables is comma-separated from
        {events, documents, part, customer, orders} — documents slices on doc_id, exact
        for any per-document/row-wise operator)
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: residue key per sliceable table — each is the table's row identity (or,
#: for events, the partition key of every keyed operator over it), so a
#: residue class is exact for row-wise and per-key operators alike
SLICE_KEYS = {
    "events": "user_id",
    "documents": "doc_id",
    "part": "p_partkey",
    "customer": "c_custkey",
    # orders slices on o_custkey (not o_orderkey) so customer-partitioned
    # windows (over_ranking's PARTITION BY o_custkey) keep every partition
    # intact within the residue class
    "orders": "o_custkey",
}


def build(
    src: str, dst: str, k: int = 97, r: int = 3,
    slice_tables: tuple[str, ...] = ("events",),
) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        if os.path.lexists(d):
            continue
        if t in slice_tables:
            key = SLICE_KEYS[t]
            glob = f"{s}/*.parquet" if os.path.isdir(s) else s
            con = duckdb.connect()
            con.execute(
                f"COPY (SELECT * FROM '{glob}' WHERE {key} % {k} = {r}) "
                f"TO '{d}' (FORMAT PARQUET)"
            )
            n = con.execute(f"SELECT count(*) FROM '{d}'").fetchone()[0]
            total = con.execute(f"SELECT count(*) FROM '{glob}'").fetchone()[0]
            con.close()
            print(f"{t} slice: {n} of {total} rows ({key} % {k} = {r})")
            assert n > 0, "empty slice — wrong key column or residue"
        else:
            os.symlink(s, d)
    print(f"key-slice dir ready: {dst}")


if __name__ == "__main__":
    src = sys.argv[1]
    dst = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 97
    r = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    tabs = tuple(sys.argv[5].split(",")) if len(sys.argv) > 5 else ("events",)
    build(src, dst, k, r, tabs)
