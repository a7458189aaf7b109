"""Scale-stress of the COMPOSED pretraining chain (VERDICT r5 #5).

The r5 10M-row probes stressed packing / quota-sampling / CC in isolation;
this script runs the full `pipeline_pretrain` composition — LSH candidates
→ Jaccard verify → connected components → survivor keep → decontaminate →
quality gate → temperature-α rebalance → hashed split → concat-and-chunk
packing — at 1-10M documents on a PARAMETRIC synthetic corpus whose every
stage outcome is computable in closed form on the driver:

  - doc texts interleave the 5 quality stopwords with doc-unique tokens,
    so no 3-gram shingle is shared across base documents (every shingle
    embeds the base id) — the verified pair graph is EXACTLY the planted
    duplicate pairs;
  - every doc with id % 10 == 1 is a byte-identical copy of id-1
    (Jaccard 1.0): CC components are exactly those disjoint pairs, the
    min-id survivor drops exactly the ids ≡ 1 (mod 10);
  - eval carve-out ids ≡ 7 (mod 50) never collide with the dup ids
    (7 mod 10 ≠ 1) and share no shingles with any train doc, so
    decontamination must drop NOTHING;
  - token counts are 20 + id % 13 (all docs pass the 0.3 quality gate:
    score ≥ 0.5625), languages split 60/30/10 by id % 10, and the
    rebalance/split hashes are the portable md5 family — the driver model
    replays them with hashlib and predicts the packed output's row count,
    token total, stream end and pack-span sum EXACTLY.

Run:  python tools/stress_pretrain.py [N_DOCS]   (default 1,000,000)

Prints one JSON line per run with walls + every invariant check; exits
non-zero on any mismatch. Results are recorded in BENCH.md §scale-stress.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

BUDGET = 2048
ALPHA = 0.5
REB_SEED = 4
GRAN = 1_000_000


def synth_docs(spark, n: int):
    """Deterministic corpus; every column derives from spark.range(id)."""
    base = F.when(F.col("id") % 10 == 1, F.col("id") - 1).otherwise(
        F.col("id")
    )
    b = base.cast("string")
    prefix = F.concat_ws(
        " ",
        F.lit("the"), F.concat(F.lit("u"), b, F.lit("a")),
        F.lit("of"), F.concat(F.lit("u"), b, F.lit("b")),
        F.lit("and"), F.concat(F.lit("u"), b, F.lit("c")),
        F.lit("to"), F.concat(F.lit("u"), b, F.lit("d")),
        F.lit("a"), F.concat(F.lit("u"), b, F.lit("e")),
    )
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (F.lit(10) + base % 13).cast("int")),
            lambda j: F.concat(F.lit("f"), b, F.lit("x"), j.cast("string")),
        ),
        " ",
    )
    lang = (
        F.when(F.col("id") % 10 < 6, "l0")
        .when(F.col("id") % 10 < 9, "l1")
        .otherwise("l2")
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(prefix, F.lit(" "), filler).alias("text"),
        lang.alias("lang"),
    )


# ---------------------------------------------------------------------------
# driver-side closed-form model (mirrors the portable md5 hash family)
# ---------------------------------------------------------------------------

def _bucket(i: int, seed: int) -> int:
    h = hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
    return int(h[8:16], 16) % GRAN


def model(n: int, budget: int = BUDGET) -> dict:
    ids = np.arange(n, dtype=np.int64)
    dup = ids % 10 == 1
    n_dups = int(dup.sum())
    surv = ids[~dup]
    is_eval = surv % 50 == 7
    train = surv[~is_eval]
    # languages on the TRAIN set (gate drops nothing)
    lang = np.where(train % 10 < 6, 0, np.where(train % 10 < 9, 1, 2))
    counts = np.bincount(lang, minlength=3).astype(np.float64)
    z = float((counts ** ALPHA).sum())
    total = float(counts.sum())
    factors = np.round((counts ** ALPHA) / z * total / counts, 6)
    base_copies = np.floor(factors).astype(np.int64)
    thr = np.round((factors - base_copies) * GRAN).astype(np.int64)
    n_tokens = 20 + (train % 13)
    rows = []  # (row_id, n_tokens) surviving rebalance + train split
    n_reb = 0
    for i, g, nt in zip(train.tolist(), lang.tolist(), n_tokens.tolist()):
        nc = base_copies[g] + (1 if _bucket(i, REB_SEED) < thr[g] else 0)
        for copy in range(1, int(nc) + 1):
            n_reb += 1
            rid = i * 1024 + copy
            if _bucket(rid, 0) < 900000:  # split: train threshold 0.9
                rows.append((rid, nt))
    rows.sort()
    nts = np.array([r[1] for r in rows], dtype=np.int64)
    cum = np.cumsum(nts)
    starts = cum - nts
    ends = cum
    n_packs = np.where(
        nts > 0, (ends - 1) // budget - starts // budget + 1, 0
    )
    return {
        "n_dups": n_dups,
        "n_surv": int(surv.size),
        "n_eval": int(is_eval.sum()),
        "n_train": int(train.size),
        "factors": factors.tolist(),
        "n_rebalanced": n_reb,
        "n_train_split": len(rows),
        "token_total": int(nts.sum()),
        "sum_n_packs": int(n_packs.sum()),
        "max_pack_id": int((int(nts.sum()) - 1) // budget),
    }


def run_stress(spark, n: int, budget: int = BUDGET) -> dict:
    """Run the composed chain at `n` synthetic docs and check all nine
    closed-form invariants; returns the result record (see main). Shared
    by the CLI probe and the pytest harness (tests/test_stress_pretrain)."""
    from cdx_toolkit_spark import cluster, dedup, sampling, textkit, packing

    t_model = time.monotonic()
    exp = model(n, budget)
    t_model = time.monotonic() - t_model

    walls: dict[str, float] = {}
    checks: dict[str, bool] = {}

    def tick(name, fn):
        t0 = time.monotonic()
        out = fn()
        walls[name] = round(time.monotonic() - t0, 3)
        return out

    docs = synth_docs(spark, n)

    # -- dedup front half (shared shingles, prod xxhash64 minhash)
    shingles = dedup.shingle_table(docs, n=3).persist()
    cand = dedup.minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, n=3, portable=False, shingles=shingles
    )
    pairs = dedup.verify_jaccard_pairs(
        docs, cand, n=3, threshold_num=8, threshold_den=10,
        max_doc_freq=100, shingles=shingles,
    ).persist()
    stats = tick(
        "lsh_verify",
        lambda: pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("doc_b") - F.col("doc_a") == 1).cast("long")).alias(
                "adj"
            ),
        ).first(),
    )
    checks["pairs_exactly_planted"] = (
        stats["n"] == exp["n_dups"] and stats["adj"] == exp["n_dups"]
    )

    cc = tick("cc", lambda: cluster.connected_components(pairs))
    surv = cluster.cc_survivors(docs, cc=cc)
    n_surv = tick("survivors", lambda: surv.count())
    checks["survivors"] = n_surv == exp["n_surv"]

    evalset = surv.where(F.col("doc_id") % 50 == 7)
    train = surv.where(F.col("doc_id") % 50 != 7)
    sh_tr = shingles.join(
        train.select(F.col("doc_id").alias("doc")), "doc", "left_semi"
    )
    # SEAM (found by this probe at 1M docs): `clean` is consumed FOUR
    # times downstream — the rebalance weights aggregate, the rebalance
    # join, the invariant count and the packing tokens scan. Unstaged,
    # each consumer re-executed the decontaminate lineage against a
    # session whose storage still pinned the 31M-row shingle frame:
    # gate_rebalance alone took 256 s (of a 334 s chain). Persisting the
    # decontaminated survivor frame and RELEASING the shingle/pair
    # persists (decontaminate is their last consumer) cuts the chain to
    # the per-stage sums you'd predict — exactly the stage boundary a
    # production run of this chain needs.
    clean = dedup.decontaminate(train, evalset, n=3, shingles=sh_tr).persist()
    n_clean = tick("decontaminate", lambda: clean.count())
    checks["decontaminate_drops_nothing"] = n_clean == exp["n_train"]
    shingles.unpersist()
    pairs.unpersist()

    gated = clean.withColumn(
        "quality", textkit.quality_score_col("text")
    ).where(F.col("quality") >= 0.3)
    reb = sampling.temperature_rebalance(
        gated, "lang", alpha=ALPHA, seed=REB_SEED
    )
    reb = reb.withColumn(
        "row_id", F.col("doc_id") * 1024 + F.col("copy")
    ).withColumn("split", textkit.split_assign_col("row_id"))
    n_reb = tick("gate_rebalance", lambda: reb.count())
    checks["rebalanced_rows"] = n_reb == exp["n_rebalanced"]

    tr = reb.where(F.col("split") == "train")
    packed = packing.pack_assignments(
        tr, budget=budget, id_col="row_id",
        tokens_col=textkit.token_count_col("text"),
    )
    agg = tick(
        "pack",
        lambda: packed.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("tok"),
            F.max(F.col("seq_start") + F.col("n_tokens")).alias("end"),
            F.sum("n_packs").alias("spans"),
            F.max("pack_id").alias("maxp"),
        ).first(),
    )
    checks["train_split_rows"] = agg["rows"] == exp["n_train_split"]
    checks["token_total"] = agg["tok"] == exp["token_total"]
    checks["stream_end"] = agg["end"] == exp["token_total"]
    checks["sum_n_packs"] = agg["spans"] == exp["sum_n_packs"]
    checks["max_pack_id"] = agg["maxp"] == exp["max_pack_id"]

    clean.unpersist()
    total_wall = round(sum(walls.values()), 3)
    return {
        "n_docs": n,
        "budget": budget,
        "walls_sec": walls,
        "total_wall_sec": total_wall,
        "docs_per_sec": round(n / total_wall, 1),
        "model_sec": round(t_model, 3),
        "expected": {k: v for k, v in exp.items() if k != "factors"},
        "factors": exp["factors"],
        "checks": checks,
        "all_green": all(checks.values()),
    }


def main() -> None:
    from cdx_toolkit_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress_pretrain", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = dict(run_stress(spark, n), cpus=cpus)
    print(json.dumps(out))
    if not out["all_green"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
