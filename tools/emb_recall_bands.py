#!/usr/bin/env python3
"""Per-tier recall of the banded embedding dedup on PLANTED near-dup
pairs (make_sfN.py PLANT_TIERS): reconstructs the planted (base,
partner) pairs from the deterministic id rule and reports, per target
cosine, how many q_dedup_embedding found. This turns the "recall -> 1
for genuinely near pairs" claim from a p_bit derivation into a
measurement — no brute-force truth needed, because the planted pairs
ARE ground truth (every planted cosine >= 0.8 > the 0.5 threshold).

Usage: python3 tools/emb_recall_bands.py <foundParquetDir> <tiles>
  <foundParquetDir> = Verify dump of q_dedup_embedding at the slice,
  e.g.  tools/run.sh graft.Verify /tmp/graft_sf1.0 /tmp/slice_out q_dedup_embedding
        python3 tools/emb_recall_bands.py /tmp/slice_out/q_dedup_embedding 10

Developer tooling only — never runs on the cluster.
"""
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent))
from make_sfN import DOMAIN, PLANT_BASE, PLANT_TIERS  # noqa: E402


def main(found_dir: str, tiles: int) -> None:
    dom = DOMAIN["embeddings"]["vec_id"]
    con = duckdb.connect()
    con.execute(
        "CREATE TEMP VIEW found AS SELECT v1, v2 FROM "
        f"read_parquet('{found_dir}/*.parquet')")
    pairs = []
    idx = 0
    for cos_t, count in PLANT_TIERS:
        for _ in range(count):
            b, p = 2 * idx, PLANT_BASE + 2 * idx
            idx += 1
            for k in range(tiles):
                pairs.append((cos_t, k * dom + b, k * dom + p))
    con.execute("CREATE TEMP TABLE planted(cos_t DOUBLE, v1 BIGINT, v2 BIGINT)")
    con.executemany("INSERT INTO planted VALUES (?, ?, ?)", pairs)
    rows = con.execute("""
        SELECT cos_t, count(*) n,
               sum(CASE WHEN f.v1 IS NOT NULL THEN 1 ELSE 0 END) hit
        FROM planted p LEFT JOIN found f ON p.v1 = f.v1 AND p.v2 = f.v2
        GROUP BY cos_t ORDER BY cos_t""").fetchall()
    for c, n, hit in rows:
        print(f"cos~{c:.2f}: {hit}/{n} planted pairs found  recall={hit / n:.4f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
