#!/usr/bin/env python3
"""Deterministic sfN-equivalent slice: tiles sf0.1 with key-offset copies.

Usage: python3 tools/make_sfN.py <tiles> <outDir> [srcDir]
  e.g.  python3 tools/make_sfN.py 10 /tmp/graft_sf1.0

Tile 0 is the source unchanged; tile k offsets every key domain by
k * (domain size), consistently across fact tables so joins stay
referentially intact. Dimensions (region, nation) are shared, as they
would be at any scale. The tiling is HONEST about content, not just
keys — a naive copy would make every document/vector an exact
duplicate of its 9 siblings and turn dedup/ANN into a degenerate
benchmark:

  - names (customer/supplier) are re-derived from the offset key, and
    part NAME tokens are suffixed per tile, so entity-resolution and
    token-similarity joins see 10x distinct entities, not 10 copies of
    each name (10 copies would grow the pair output ~100x — a
    quadratic artifact no real 10x catalog has); brand/type/segment
    stay unmutated, as real low-cardinality dims do;
  - document text is re-tokenized per tile (token suffix "~k"), so
    within-tile duplicate/near-dup structure is preserved exactly
    while cross-tile shingle overlap is zero — duplicate RATE stays
    constant as volume grows, which is how real corpora scale;
    n_chars is recomputed from the mutated text;
  - embeddings first get PLANTED near-dup partners in measured
    cosine tiers (PLANT_TIERS below — the synthetic corpus has no
    high-cosine pairs, so banded-LSH recall on genuinely-near pairs
    was previously underivable), then each tile is rotated by a
    deterministic per-tile ORTHOGONAL matrix: every within-tile
    cosine (and norm) — including the planted tiers — is preserved
    exactly, while cross-tile cosines collapse to the random-pair
    distribution (~N(0, 1/dim)) — a small additive perturbation
    would instead leave 9 cross-tile twins per vector at cos ≈ 0.97
    and turn the cosine-threshold dedup quadratic.

This file is developer tooling only (drives the 3-point scaling
curve in SCALE.md); it never runs on the cluster.
"""
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOMAIN = {  # key domain sizes in sf0.1 (max key + 1)
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2300},  # 2000 source + the planted partners below
}

# Planted near-dup embedding pairs, per tile: the synthetic corpus has
# NO high-cosine pairs (its "dups" are chance alignments at cos
# 0.5-0.7), so the claim "banded-LSH recall -> 1 for genuinely near
# pairs" was derived from the p_bit formula, never measured. Each tier
# plants `count` partners at an EXACT target cosine against base
# vectors with even local ids (both ends even => both survive the
# recall probe's 1-in-2 vec_id sample). Partner local ids are
# PLANT_BASE + 2*j (even, gap-free parity), bases are local ids
# 0,2,...: tier t's j-th pair is (2*(t*50+j), PLANT_BASE + 2*(t*50+j)).
# tools/emb_recall_bands.py reconstructs the pairs from this rule and
# reports per-tier recall of q_dedup_embedding's output at the slice.
PLANT_BASE = 2000
PLANT_TIERS = [(0.80, 50), (0.90, 50), (0.95, 50)]


def plant_near_dups(df):
    import pandas as pd
    rng = np.random.RandomState(777)
    mats = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    dim = mats.shape[1]
    new_rows = []
    pair_idx = 0
    for cos_t, count in PLANT_TIERS:
        s = np.sqrt(1.0 - cos_t * cos_t)
        for _ in range(count):
            base_id = 2 * pair_idx
            part_id = PLANT_BASE + 2 * pair_idx
            pair_idx += 1
            v = mats[base_id]
            vn = np.linalg.norm(v)
            vhat = v / vn
            w0 = rng.standard_normal(dim)
            w = w0 - (w0 @ vhat) * vhat
            what = w / np.linalg.norm(w)
            u = (cos_t * vhat + s * what) * vn  # cos(u, v) = cos_t exactly
            base_row = df.iloc[base_id]
            new_rows.append({"vec_id": part_id,
                             "embedding": u.astype(np.float32),
                             "label": base_row["label"]})
    return pd.concat([df, pd.DataFrame(new_rows)], ignore_index=True)


def tile(name: str, t: pa.Table, k: int) -> pa.Table:
    df = t.to_pandas()
    if name == "embeddings":
        # plant BEFORE the key offset and rotation: the per-tile
        # orthogonal rotation preserves every within-tile cosine, so
        # each tile carries the identical planted tier structure
        df = plant_near_dups(df)
    for col, size in DOMAIN[name].items():
        df[col] = df[col] + k * size
    if name == "customer":
        df["c_name"] = df["c_custkey"].map(lambda x: f"Customer#{x:09d}")
    elif name == "supplier":
        df["s_name"] = df["s_suppkey"].map(lambda x: f"Supplier#{x:09d}")
    elif name == "part" and k > 0:
        # alnum suffix (cleanName strips punctuation, so "~k" would
        # partially collapse); substring searches for original tokens
        # still hit via contains
        suf = f"x{k}"
        df["p_name"] = df["p_name"].map(
            lambda s: " ".join(w + suf for w in s.split(" ")))
    elif name == "documents" and k > 0:
        suf = f"~{k}"
        df["text"] = df["text"].map(
            lambda s: " ".join(w + suf for w in s.split(" ")))
        df["n_chars"] = df["text"].str.len().astype("int64")
    elif name == "embeddings" and k > 0:
        rng = np.random.RandomState(1000 + k)  # deterministic per tile
        mats = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        dim = mats.shape[1]
        q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
        q = q * np.sign(np.diag(r))  # sign-fixed => properly Haar-ish, det-stable
        df["embedding"] = list((mats @ q).astype(np.float32))
    return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)


def main(tiles: int, out_dir: str, src_dir: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name in ["region", "nation"]:
        t = pq.read_table(Path(src_dir) / f"{name}.parquet")
        pq.write_table(t, out / f"{name}.parquet")
        print(f"{name}: {t.num_rows} rows (shared dim)")
    for name in DOMAIN:
        t = pq.read_table(Path(src_dir) / f"{name}.parquet")
        parts = [tile(name, t, k) for k in range(tiles)]
        whole = pa.concat_tables(parts)
        pq.write_table(whole, out / f"{name}.parquet")
        print(f"{name}: {t.num_rows} -> {whole.num_rows} rows")


if __name__ == "__main__":
    n = int(sys.argv[1])
    main(n, sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
