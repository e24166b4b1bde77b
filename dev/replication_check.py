#!/usr/bin/env python3
"""Replication-law fallback oracle for gen_scale.py sweeps (dev tooling).

gen_scale.py builds sf(0.1*K) by replicating sf0.1 K times with key
offsets, so every replica is a disjoint isomorphic copy of the base
data. For a query whose result is a deterministic
`ORDER BY metric DESC, key ASC LIMIT k` over per-node metrics of a
key-partitioned structure (the part co-occurrence graph family), the
scaled answer is therefore derivable EXACTLY from the base-sf DuckDB
oracle: replicate each base row K times with the key offset, re-sort
by the query's order, take k. This lets us verify Spark's scaled
output even when DuckDB's all-pairs enumeration exhausts box temp
disk at the scaled factor (q123/q181/q279 at sf1.0 each needed
>80 GB of duckdb_temp_storage).

Soundness of truncating to the base top-k before replicating: the
order is (metric DESC, node ASC) and replica node ids are base+r*S
with S > max base id, so the base copy of any entry precedes all
replicas with equal metric; hence every entry of the scaled top-k has
its base copy in the base top-k.

NOT applicable when the metric depends on a global of the whole graph
(q279's Louvain gain has a 1/m term with m scaling by K — its scaled
gains are NOT the base gains; that query stays a documented oracle
gap, with replica-consistency of the output as the weaker check).

Usage: python3 dev/replication_check.py <baseSfDir> <scaledVerifyDir> <K>
Checks the hard-coded applicable queries; exit 0 iff all match.
"""
import json
import sys

import duckdb
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE, VERIFY, K = sys.argv[1], sys.argv[2], int(sys.argv[3])


def stride():
    """Part-key replication offset, computed the way gen_scale.span()
    computes it (next power of 10 above the base max p_partkey) — a
    hard-coded 100000 silently diverges if the base dir is a different
    sf or part keys ever cross 10^5."""
    t = pq.read_table(f"{BASE}/part.parquet", columns=["p_partkey"])
    mx = pc.max(t.column(0)).as_py()
    off = 10
    while off <= mx:
        off *= 10
    return off


STRIDE = stride()
print(f"[replication] base part-key stride {STRIDE} (from {BASE})")

# query -> (offset key columns, k, sort key builder)
APPLICABLE = {
    "q123_triangle_count":
        (["node"], 15, lambda e: (-e["triangles"], e["node"])),
    "q181_clustering_coeff":
        (["node"], 50, lambda e: (-e["cc"], e["node"])),
}

sql = json.load(open(f"{VERIFY}/oracle_sql.json"))
con = duckdb.connect()
con.execute(
    "CREATE VIEW lineitem AS SELECT * FROM "
    f"read_parquet('{BASE}/lineitem.parquet')")

ok = True
for q, (keys, k, order) in APPLICABLE.items():
    rows = con.execute(sql[q]).fetchall()
    names = [c[0] for c in con.description]
    exp = []
    for row in rows:
        d = dict(zip(names, row))
        for r in range(K):
            e = dict(d)
            for c in keys:
                e[c] = d[c] + r * STRIDE
            exp.append(e)
    exp.sort(key=order)
    exp = exp[:k]
    got = sorted(pq.read_table(f"{VERIFY}/{q}").to_pylist(), key=order)
    match = exp == got
    ok &= match
    print(f"{'ok  ' if match else 'FAIL'} {q} (replication law, "
          f"{len(got)} rows)")
    if not match:
        # diagnostic diff (mirrors check.py): a rounding-level
        # divergence must be distinguishable from a law violation
        diffs = [(i, e, g) for i, (e, g)
                 in enumerate(zip(exp, got)) if e != g]
        for i, e, g in diffs[:5]:
            print(f"  row {i}: exp {e}\n          got {g}")
        if len(exp) != len(got):
            print(f"  row counts differ: exp {len(exp)} got {len(got)}")
sys.exit(0 if ok else 1)
