"""Distributed connected components over near-duplicate candidate pairs.

Production dedup keeps ONE document per duplicate *cluster*, not per pair:
the pair relation from MinHash/SimHash/winnowing is not transitive, so a
chain A~B~C must collapse to one survivor even when (A,C) was never
emitted as a pair. That requires connected components over the pair graph
(the practice in large-corpus dedup pipelines, e.g. Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better", which unions
MinHash pairs into clusters before dropping).

`connected_components` is a pure-DataFrame iterative algorithm in the
Shiloach–Vishkin family: each round alternates

  1. *propagate*  — every node takes the min label over itself and its
     neighbors (one keyed join + one map-side-combined min aggregate);
  2. *pointer-jump* — every node replaces its label L with label(L)
     (one keyed self-join), halving the depth of the label-pointer chains,

so label chains shrink geometrically and convergence takes O(log d)
rounds for diameter-d components (a chain of 2^k nodes converges in ~k
rounds, pinned by a test) — not the O(d) of naive label propagation.
Every step is an equi-join or hash aggregate on the node id: no
cartesian products, no collect of the graph, and each round's frame is
`localCheckpoint`ed so the plan stays O(1) deep instead of growing with
the iteration count (the standard Spark iterative-algorithm pattern; the
only driver-side value is one scalar label-sum per round, whose
monotone fixpoint is the exact convergence test).

Labels are node ids and only ever decrease toward the component minimum,
so the fixpoint is exact and deterministic: component_id == min(doc_id in
component), independent of partitioning, parallelism, and round count.

100 TB notes: per round the big frames touched are |V| labels and |E|
directed edges, shuffled on node id — skew on a mega-component's hub is
bounded because the aggregate is a MIN (map-side combine collapses each
partition's contribution to one row per node). The edge frame is built
once (symmetrized, distinct) and reused read-only by every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 64,
) -> DataFrame:
    """(doc_id, component_id) for every node that appears in ``pairs``,
    where component_id = min node id reachable through the pair graph.

    ``max_rounds`` is a diverge guard, not a tuning knob: convergence is
    detected exactly (unchanged monotone label sum), and pointer-jumping makes the
    round count logarithmic in the largest component's diameter — 64
    covers any graph that fits in 2^64 ids. Raises RuntimeError if the
    guard is ever hit (it cannot be, short of a bug).
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    lab = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    ).localCheckpoint(eager=False)

    prev_total = object()  # sentinel unequal to any sum (incl. None)
    for _ in range(max_rounds):
        # 1. propagate: min over the neighborhood's labels. Join labels to
        #    the edge *source* side then MIN-aggregate per destination —
        #    map-side combine bounds hub-node skew before the shuffle.
        nbr_min = (
            edges.join(lab.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("lab").alias("_nl"))
        )
        prop = (
            lab.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("_nl", "lab")).alias("lab"),
            )
        )
        # 2. pointer-jump: lab <- label(lab). Labels are node ids whose
        #    own row always exists (a label is only ever some node's id),
        #    but keep the left-join + coalesce so a root's self-label is
        #    a no-op rather than a dropped row.
        jump = prop.select(
            F.col("node").alias("lab"), F.col("lab").alias("_pl")
        )
        new = (
            prop.join(jump, "lab", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("_pl", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        # exact convergence: labels only ever DECREASE, so the global
        # label sum is strictly monotone until the fixpoint — an unchanged
        # sum means no label changed, no join against the previous round
        # needed (one aggregate over the just-checkpointed blocks).
        # decimal(38,0): sum(int64 ids) over 10^10 nodes overflows int64.
        total = new.agg(
            F.sum(F.col("lab").cast("decimal(38,0)")).alias("t")
        ).first()[0]
        lab = new
        if total == prev_total:
            break
        prev_total = total
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return lab.select(
        F.col("node").alias("doc_id"), F.col("lab").alias("component_id")
    )


def cc_survivors(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    keep_by=None,
    cc: DataFrame | None = None,
) -> DataFrame:
    """``docs`` minus every non-representative member of each duplicate
    cluster; documents in no pair pass through untouched.

    Default policy keeps the min-id member (free: it IS the component
    label). ``keep_by`` — a Column (or column name) evaluated over
    ``docs`` — switches to keep-the-best: the member maximizing
    (keep_by, -id), the policy production pipelines actually want (keep
    the highest-quality copy, drop the rest). That costs one extra keyed
    join + a max_by aggregate per component — both on the (small)
    clustered subset, never the corpus.

    Either way: one left-anti keyed join against the drop list.

    Pass ``cc`` (a (doc_id, component_id) frame, e.g. a memoized
    connected_components result — its output is backed by checkpointed
    blocks, so reusing the handle replays none of the iteration) to skip
    recomputing components; ``pairs`` is then ignored and may be None."""
    if cc is None:
        if pairs is None:
            raise ValueError("cc_survivors needs `pairs` or `cc`")
        cc = connected_components(pairs)
    if keep_by is None:
        drop = cc.where(F.col("doc_id") != F.col("component_id")).select(
            F.col("doc_id").alias(id_col)
        )
        return docs.join(drop, id_col, "left_anti")
    keep = F.col(keep_by) if isinstance(keep_by, str) else keep_by
    members = docs.select(
        F.col(id_col).alias("doc_id"), keep.alias("_keep")
    ).join(cc, "doc_id")
    # deterministic argmax: highest _keep, then LOWEST id (struct compare;
    # negate the id so one max_by orders both)
    winners = members.groupBy("component_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("_keep"), -F.col("doc_id"))
        ).alias("_win")
    )
    drop = (
        members.join(winners, "component_id")
        .where(F.col("doc_id") != F.col("_win"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(drop, id_col, "left_anti")


def connected_components_sql(pairs_sql: str) -> str:
    """DuckDB twin of connected_components: min-reachable-label via a
    recursive reachability walk (UNION-deduped, so it terminates), then a
    per-node MIN. Exact on the oracle's scale; the Spark side is the one
    that has to be clever about round counts."""
    return (
        "WITH RECURSIVE pairs AS (" + pairs_sql + "),\n"
        "e AS (SELECT doc_a AS u, doc_b AS v FROM pairs WHERE doc_a <> doc_b"
        " UNION SELECT doc_b, doc_a FROM pairs WHERE doc_a <> doc_b),\n"
        "walk(n, lab) AS (\n"
        "  SELECT u, u FROM (SELECT DISTINCT u FROM e)\n"
        "  UNION\n"
        "  SELECT e.v, walk.lab FROM walk JOIN e ON e.u = walk.n\n"
        ")\n"
        "SELECT n AS doc_id, min(lab) AS component_id FROM walk GROUP BY n"
    )
