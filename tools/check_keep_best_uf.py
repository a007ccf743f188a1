#!/usr/bin/env python3
"""Union-find oracle for q_dedup_keep_best at big SFs.

Twin of check_clusters_uf.py: q_dedup_keep_best's registered oracle
(oracle_sql.json) reuses the q_dedup_clusters recursive-CTE closure
(O(sum cluster_size^2) memory — >60 GB in DuckDB at the sf1.0 slice)
and then elects the best-quality member per cluster. This checker
reuses the oracle's OWN SQL for both non-closure stages — the edge
pipeline up through the `dup` CTE and the `q` quality CTE are
executed verbatim in DuckDB — and replaces only the closure with a
linear-memory union-find plus a Python max-by-(quality, -doc_id)
election. Sf0.01/sf0.1 agreement between the two oracles is
established by the driver gate (recursive CTE) plus this script run
at the same SF.

Usage: python3 tools/check_keep_best_uf.py <outDir> <sfDir>

Developer tooling only — never runs on the cluster.
"""
import json
import re
import sys
from pathlib import Path

import duckdb


def main(out_dir: str, sf_dir: str) -> int:
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    sql = oracle["q_dedup_keep_best"]
    # edge pipeline: everything before the `ed AS` closure CTE
    cut = sql.index(", ed AS")
    edge_sql = sql[:cut] + " SELECT d1, d2 FROM dup"
    # quality stage: the oracle's own `q` CTE body, run standalone
    m = re.search(r"q AS \((.*)\)\s*SELECT cluster_id", sql, re.S)
    if not m:
        print("[ERR ] q_dedup_keep_best oracle: no `q AS (...)` quality CTE found")
        return 1
    quality_sql = m.group(1)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    edges = con.execute(edge_sql).fetchall()
    quality = dict(con.execute(quality_sql).fetchall())

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
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # union by min id: root == component min
    members: dict = {}
    for v in {v for e in edges for v in e}:
        members.setdefault(find(v), []).append(v)
    want = []
    for cid, ds in members.items():
        best = max(ds, key=lambda d: (quality[d], -d))
        want.append((cid, best, round(quality[best], 6), len(ds)))
    want.sort()

    got = con.execute(
        f"SELECT cluster_id, keep_doc, keep_quality, n_members "
        f"FROM read_parquet('{out_dir}/q_dedup_keep_best/*.parquet') "
        f"ORDER BY cluster_id").fetchall()
    got = [(int(a), int(b), float(c), int(d)) for a, b, c, d in got]
    ok = len(got) == len(want) and all(
        g[0] == w[0] and g[1] == w[1] and abs(g[2] - w[2]) < 1e-9 and g[3] == w[3]
        for g, w in zip(got, want))
    if ok:
        print(f"[ OK ] q_dedup_keep_best: {len(got)} rows "
              f"({len(edges)} edges, union-find oracle)")
        return 0
    sg, sw = set(got), set(want)
    print(f"[HASH] q_dedup_keep_best: {len(sg - sw)} spark-only / "
          f"{len(sw - sg)} oracle-only rows")
    for r in list(sg - sw)[:5]:
        print("  spark:", r)
    for r in list(sw - sg)[:5]:
        print("  oracle:", r)
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
