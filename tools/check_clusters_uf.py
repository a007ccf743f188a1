#!/usr/bin/env python3
"""Union-find oracle for q_dedup_clusters at big SFs.

The registered oracle (oracle_sql.json) computes connected components
via a recursive-CTE transitive closure — the `reach` relation holds
every (src, reachable-dst) pair, so its memory is O(sum of
cluster_size^2) and at the sf1.0 slice DuckDB grinds past 60 GB on
it. This checker keeps the SAME edge definition (it reuses the
oracle's own SQL up through the `dup` CTE verbatim) and replaces only
the closure with a linear-memory union-find, then labels each doc
with the min doc_id of its component — exactly the `min(dst)`
semantics of the recursive query. Sf0.01/sf0.1 agreement between the
two oracles is established by the driver gate (recursive CTE) plus
this script run at the same SF.

Usage: python3 tools/check_clusters_uf.py <outDir> <sfDir>

Developer tooling only — never runs on the cluster.
"""
import json
import sys
from pathlib import Path

import duckdb


def main(out_dir: str, sf_dir: str) -> int:
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    sql = oracle["q_dedup_clusters"]
    # reuse the registered oracle's own edge pipeline: cut at the `ed AS`
    # CTE (everything after `dup` is the closure this script replaces)
    cut = sql.index(", ed AS")
    edge_sql = sql[:cut] + " SELECT d1, d2 FROM dup"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    edges = con.execute(edge_sql).fetchall()

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps roots = min so far (final min fixed below)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    verts = {v for e in edges for v in e}
    want = sorted((v, find(v)) for v in verts)

    got = con.execute(
        f"SELECT doc_id, cluster_id FROM read_parquet('{out_dir}/q_dedup_clusters/*.parquet') "
        f"ORDER BY doc_id").fetchall()
    got = [(int(a), int(b)) for a, b in got]
    if got == want:
        print(f"[ OK ] q_dedup_clusters: {len(got)} rows ({len(edges)} edges, union-find oracle)")
        return 0
    only_got = set(got) - set(want)
    only_want = set(want) - set(got)
    print(f"[HASH] q_dedup_clusters: {len(only_got)} spark-only / {len(only_want)} oracle-only rows")
    for r in list(only_got)[:5]:
        print("  spark:", r)
    for r in list(only_want)[:5]:
        print("  oracle:", r)
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
