"""Recall@k of the ANN paths vs exact brute-force ground truth.

VERDICT r4 #3: the LSH/IVF oracles prove each approximate algorithm
matches its own SQL twin, but nothing said what recall the shipped knob
defaults actually achieve. This tool measures recall@k on the real
embeddings table at $SPARK_GRAFT_SF_DIR for the driver-entry
configurations plus one extra knob point per family (seeds for LSH,
nprobe for IVF) so the knob's slope is on record. Results go in BENCH.md.

recall@k(query) = |ANN top-k ∩ exact top-k| / k; reported as the mean
over all queries (queries the ANN path returns nothing for count as 0).

Usage: python tools/ann_recall.py  [prints one JSON line]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 5
EMB_DIM = 64


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(ann: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    total = 0.0
    for q, truth in exact.items():
        got = ann.get(q, set())
        total += len(got & truth) / len(truth)
    return total / len(exact) if exact else 0.0


def main() -> None:
    from cdx_toolkit_spark import similarity
    from cdx_toolkit_spark.session import get_spark

    spark = get_spark("ann-recall", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()

    exact = topk_sets(
        similarity.brute_force_topk(emb, k=K, n=n).collect()
    )

    configs = [
        # (label, callable) — first of each family is the driver-entry
        # config; the second moves the documented recall knob one notch
        ("lsh_planes10_seed42", lambda: similarity.lsh_topk(
            emb, k=K, n_planes=10, seed=42, dim=EMB_DIM)),
        ("lsh_planes8_seeds42_43", lambda: similarity.lsh_topk(
            emb, k=K, n_planes=8, seeds=(42, 43), dim=EMB_DIM)),
        ("lsh_planes8_seeds42_45", lambda: similarity.lsh_topk(
            emb, k=K, n_planes=8, seeds=(42, 43, 44, 45), dim=EMB_DIM)),
        ("lsh_planes6_seeds42_45", lambda: similarity.lsh_topk(
            emb, k=K, n_planes=6, seeds=(42, 43, 44, 45), dim=EMB_DIM)),
        ("ivf_nlist64_nprobe8", lambda: similarity.ivf_topk(
            emb, k=K, nlist=64, nprobe=8)),
        ("ivf_nlist64_nprobe16", lambda: similarity.ivf_topk(
            emb, k=K, nlist=64, nprobe=16)),
        ("ivf_nlist64_nprobe32", lambda: similarity.ivf_topk(
            emb, k=K, nlist=64, nprobe=32)),
    ]
    results = {}
    for label, build in configs:
        t0 = time.monotonic()
        df = build()
        ann = topk_sets(df.collect())
        dt = time.monotonic() - t0
        similarity.release(df)
        results[label] = {
            "recall_at_k": round(recall(ann, exact), 4),
            "wall_sec": round(dt, 2),
        }
    print(json.dumps({
        "metric": f"ANN recall@{K} vs brute force",
        "sf_dir": SF_DIR,
        "n_vectors": n,
        "k": K,
        "results": results,
    }))


if __name__ == "__main__":
    main()
