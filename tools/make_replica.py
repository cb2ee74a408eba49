"""Build the K× key-shifted replica of an SF directory (default: 10× of
/root/testdata/sf0.1 into /tmp/sfbig) for the scale-linearity studies in
BASELINE.md (rounds 3/4/7 methodology, now reproducible instead of
ad-hoc).

Fact tables (lineitem, orders, customer, supplier, part, events,
documents, embeddings) are concatenated K times with every integer key
shifted by `copy * stride` (stride = max key + 1 per key family), so FK
joins stay consistent within each copy and never collide across copies.
Dimension tables (region, nation) are left as-is — small shared
vocabulary, exactly like a warehouse where dims are small and facts
replicate. Text/embedding payloads are NOT varied: each document/vector becomes a
K-way exact duplicate, which makes the dedup operators' outputs grow
quadratically per cluster BY DESIGN (documented in BASELINE.md as
output-inherent — the worst case for near-dup pair generation).

Implemented with pyarrow (not Spark) so every column type — including
the ns-precision event timestamps — round-trips bit-exact.

Usage: python tools/make_replica.py [K] [SRC_DIR] [DST_DIR]
"""

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FAMILY = {  # column -> stride family (FK pairs share one stride)
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "eventid", "user_id": "userid",
    "doc_id": "docid", "vec_id": "vecid",
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfbig"
    os.makedirs(dst, exist_ok=True)

    strides: dict = {}
    for t, cols in SHIFT_COLS.items():
        tab = pq.read_table(f"{src}/{t}.parquet", columns=cols)
        for c in cols:
            m = pc.max(tab[c]).as_py() or 0
            fam = FAMILY[c]
            strides[fam] = max(strides.get(fam, 0), int(m) + 1)
    print("strides:", strides)

    def clean(path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    for t in COPY_AS_IS:
        clean(f"{dst}/{t}.parquet")
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    for t in sorted(SHIFT_COLS):
        clean(f"{dst}/{t}.parquet")
        base = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for i in range(k):
            tab = base
            for c in SHIFT_COLS.get(t, []):
                idx = tab.schema.get_field_index(c)
                typ = tab.schema.field(idx).type
                shifted = pc.cast(
                    pc.add(pc.cast(tab[c], pa.int64()),
                           i * strides[FAMILY[c]]), typ)
                tab = tab.set_column(idx, tab.schema.field(idx), shifted)
            copies.append(tab)
        out = pa.concat_tables(copies, promote_options="none")
        pq.write_table(out, f"{dst}/{t}.parquet",
                       row_group_size=1 << 20)
        print(f"{t}: {len(out)} rows")


if __name__ == "__main__":
    main()
