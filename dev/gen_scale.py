#!/usr/bin/env python3
"""Scale-factor multiplier for the driver's synthetic tables (dev
tooling only — the shipped library has no Python dependency).

Replicates each sf table K times with referential key offsets
(replica r of orders points at replica r of customers, etc.), keeping
every non-key column and the exact parquet schema byte-identical.
Both engines then read the SAME scaled parquet, so the DuckDB-oracle
parity check stays meaningful at the larger sf — the sweep's purpose
is hunting scale-only failures (BIGINT overflow, decimal promotion,
skew blowups), not semantic novelty.

Usage: python3 dev/gen_scale.py <srcDir> <dstDir> <K>
"""
import sys, os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: offset_source_table} (keys offset by the owning
# table's span so referential integrity holds across replicas)
KEYED = {
    "orders":    {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem":  {"l_orderkey": "orders", "l_partkey": "part",
                  "l_suppkey": "supplier"},
    "customer":  {"c_custkey": "customer"},
    "supplier":  {"s_suppkey": "supplier"},
    "part":      {"p_partkey": "part"},
    "events":    {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
PRIMARY = {"orders": "o_orderkey", "customer": "c_custkey",
           "supplier": "s_suppkey", "part": "p_partkey",
           "events": "event_id", "events_user": "user_id",
           "documents": "doc_id", "embeddings": "vec_id"}
COPY_AS_IS = ["region", "nation"]


def span(src, owner):
    tab = "events" if owner == "events_user" else owner
    t = pq.read_table(os.path.join(src, f"{tab}.parquet"),
                      columns=[PRIMARY[owner]])
    mx = pc.max(t.column(0)).as_py()
    off = 10
    while off <= mx:
        off *= 10
    return off


def main(src, dst, k):
    os.makedirs(dst, exist_ok=True)
    for t in COPY_AS_IS:
        pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                       os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: copied")
    spans = {}
    for tab, keys in KEYED.items():
        base = pq.read_table(os.path.join(src, f"{tab}.parquet"))
        reps = []
        for r in range(k):
            cols = []
            for name in base.column_names:
                col = base.column(name)
                owner = keys.get(name)
                if owner and r > 0:
                    if owner not in spans:
                        spans[owner] = span(src, owner)
                    col = pc.add(col, pa.scalar(r * spans[owner],
                                                type=col.type))
                cols.append(col)
            reps.append(pa.table(dict(zip(base.column_names, cols)),
                                 schema=base.schema))
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{tab}.parquet"))
        print(f"{tab}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
