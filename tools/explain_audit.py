"""Physical-plan audit: assert the plans we WANT, not just plans that pass.

Writes PLANS.md with the formatted plan of each audited query plus a
checklist of structural properties (column pruning reached the scan,
broadcast joins where a side is small, partial aggregation before the
shuffle, whole-stage codegen on the hot path, no sort where hash-agg
suffices). Run: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def explain_str(df, mode: str = "formatted") -> str:
    jem = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jem)


def main() -> None:
    from cdx_toolkit_spark.session import get_spark

    spark = get_spark("explain-audit", cpus=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from pyspark.sql import functions as F

    qs = E.queries()
    checks = []  # (name, description, ok, detail)
    sections = []

    def audit(name, df, props):
        plan = explain_str(df)
        sections.append((name, plan))
        for desc, pred in props:
            ok, detail = pred(plan)
            checks.append((name, desc, ok, detail))

    def tree_of(plan: str) -> str:
        # formatted mode = operator tree, blank line, then per-node details
        # (which REPEAT node names — structural counts must use the tree)
        return plan.split("\n\n")[0]

    def contains(pat, flags=0):
        def f(plan):
            m = re.search(pat, plan, flags)
            return bool(m), (m.group(0)[:100] if m else f"missing /{pat}/")
        return f

    def absent(pat, flags=0):
        def f(plan):
            m = re.search(pat, plan, flags)
            return not m, (f"unexpected {m.group(0)[:80]}" if m else "clean")
        return f

    # 1. column pruning: the events scan must read ONLY the 3 used columns
    audit(
        "events_daily_counts", qs["events_daily_counts"](spark, SF_DIR),
        [
            ("scan reads only ts,event_type,user_id",
             contains(r"ReadSchema: struct<(?=[^>]*\bts:)(?=[^>]*\bevent_type:)"
                      r"(?=[^>]*\buser_id:)[^>,]*,[^>,]*,[^>,]*>")),
            ("partial agg before shuffle (map-side combine)",
             contains(r"HashAggregate .*partial", re.I | re.S)),
            ("no sort (hash agg, not sort agg)", absent(r"\bSortAggregate\b")),
        ],
    )

    # 2. star join: small dimension side broadcast, not shuffled
    audit(
        "orders_topk_per_segment", qs["orders_topk_per_segment"](spark, SF_DIR),
        [
            ("customer side broadcast", contains(r"BroadcastHashJoin")),
            ("orders scan pruned to join/window columns",
             contains(r"ReadSchema: struct<o_orderkey[^>]*o_custkey[^>]*o_totalprice")),
        ],
    )

    # 3. anti-join dedup: broadcast or shuffled-hash, never cartesian
    audit(
        "urlseen_antijoin", qs["urlseen_antijoin"](spark, SF_DIR),
        [
            ("anti join present", contains(r"LeftAnti")),
            ("no cartesian product", absent(r"CartesianProduct")),
        ],
    )

    # 4. derived-view window query: filter evaluated BELOW the projection
    #    (substituted into doc_id arithmetic), single scan, codegen spans
    audit(
        "iter_window_filter", qs["iter_window_filter"](spark, SF_DIR),
        [
            ("whole-stage codegen on the hot path ('*' nodes in formatted mode)",
             lambda plan: (bool(re.search(r"\*\s+\w", tree_of(plan))),
                           "codegen stars present" if re.search(
                               r"\*\s+\w", tree_of(plan)) else "no '*' nodes")),
            ("single parquet scan of documents",
             lambda plan: (tree_of(plan).count("Scan parquet") == 1,
                           f"{tree_of(plan).count('Scan parquet')} scans")),
            ("limit short-circuits (TakeOrderedAndProject/CollectLimit)",
             contains(r"TakeOrderedAndProject|CollectLimit")),
        ],
    )

    # 5. exact dedup: one shuffle, partial agg, no sort
    audit(
        "dedup_exact", qs["dedup_exact"](spark, SF_DIR),
        [
            ("partial agg before shuffle",
             contains(r"HashAggregate .*partial", re.I | re.S)),
            ("exactly one exchange",
             lambda plan: (tree_of(plan).count("Exchange") == 1,
                           f"{tree_of(plan).count('Exchange')} exchanges")),
            ("no sort", absent(r"\bSort\b \[")),
        ],
    )

    # 6. collapse: min_by hash agg (no row_number window/sort)
    audit(
        "collapse_urlkey", qs["collapse_urlkey"](spark, SF_DIR),
        [
            ("hash agg, not a window",
             absent(r"\bWindow\b")),
            ("no sort", absent(r"\bSort\b \[")),
        ],
    )

    # 6b. composed clean-corpus pipeline: dedup agg is partial, the keep-set
    #     join is keyed (never cartesian), single documents scan feeds both
    #     sides of the self-semi-join shape
    audit(
        "pipeline_clean_corpus", qs["pipeline_clean_corpus"](spark, SF_DIR),
        [
            ("partial agg before the dedup shuffle",
             contains(r"HashAggregate .*partial", re.I | re.S)),
            ("keyed join (no cartesian product)", absent(r"CartesianProduct")),
            # the quality gate must be evaluated ON THE SCAN SIDE, below the
            # keep-set join — Catalyst pushes the threshold predicate through
            # the join so disqualified docs never enter the build/probe
            ("quality filter pushed below the join onto the scan",
             lambda plan: (
                 bool(re.search(r"Filter \(\d+\)\s*\n\s*:?\s*\+- Scan parquet",
                                tree_of(plan)))
                 and ">= 0.3" in plan,
                 "filter sits directly over the scan"
                 if re.search(r"Filter \(\d+\)\s*\n\s*:?\s*\+- Scan parquet",
                              tree_of(plan))
                 else "filter not adjacent to scan")),
        ],
    )

    # 6c. IVF ANN (r3 GEMM layout): the packed centroid blob is BROADCAST
    #     into every corpus block (map-side assignment, no corpus shuffle);
    #     per-list scoring groups on list_id only (Arrow-batched GEMM)
    audit(
        "ann_ivf_topk", qs["ann_ivf_topk"](spark, SF_DIR),
        [
            ("centroid blob broadcast into block assignment",
             contains(r"BroadcastNestedLoopJoin")),
            ("no cartesian product", absent(r"CartesianProduct")),
            ("per-list GEMM scoring keyed on list_id only",
             contains(r"hashpartitioning\(list_id")),
            ("scoring is Arrow-grouped (no per-row Python)",
             contains(r"FlatMapGroupsInPandas")),
        ],
    )

    # 6c2. LSH ANN (r4, VERDICT r3 #2): the bucket re-rank is a per-bucket
    #      Arrow GEMM, not a bucket self-join with interpreted per-pair
    #      zip_with/aggregate dot products
    audit(
        "ann_lsh_topk", qs["ann_lsh_topk"](spark, SF_DIR),
        [
            ("no interpreted per-pair dot product (no zip_with in plan)",
             absent(r"zip_with")),
            ("scoring is Arrow-streamed (per-bucket GEMM in mapInPandas)",
             contains(r"MapInPandas")),
            ("one shuffle routes vectors to their bucket task",
             contains(r"hashpartitioning\(bucket")),
            ("no bucket self-join remains",
             lambda plan: ("Join" not in tree_of(plan),
                           "no join nodes" if "Join" not in tree_of(plan)
                           else "join node present")),
        ],
    )

    # 6c2b. grid-salted LSH ANN (r6, ADVICE r5): hot buckets split into a
    #       probe-salt x member-tile GRID. The plan must show the hot map
    #       arriving by BROADCAST (never a shuffled join of the corpus
    #       against the tiny histogram), the grid fan-out as Expand/
    #       explode-side Generate (no corpus self-join), and scoring still
    #       one bucket shuffle + Arrow stream.
    from cdx_toolkit_spark import similarity as _sim

    _emb_for_salt = spark.read.schema(
        "vec_id bigint, embedding array<float>, label int"
    ).parquet(f"{SF_DIR}/embeddings.parquet")
    audit(
        "ann_lsh_topk_grid_salted",
        # thr=16: sf0.01 holds 500 vectors over 16 buckets (19-48 rows
        # each), so a 64-row threshold salts NOTHING and the audit would
        # assert against an unsalted plan (vacuous)
        _sim.lsh_topk(
            _emb_for_salt, k=5, n_planes=4, dim=64, id_col="vec_id",
            hot_bucket_rows=16,
        ),
        [
            ("hot-bucket map joins by broadcast",
             contains(r"BroadcastHashJoin")),
            ("no shuffled join against the hot map",
             absent(r"SortMergeJoin|ShuffledHashJoin")),
            ("grid fan-out is generate/explode, not a self-join",
             contains(r"Generate\b[\s\S]*?explode")),
            ("scoring is Arrow-streamed (per-sub-group GEMM)",
             contains(r"MapInPandas")),
            ("one shuffle routes rows to their grid cell",
             contains(r"hashpartitioning\(bucket")),
            ("no interpreted per-pair dot product",
             absent(r"zip_with")),
        ],
    )

    # 6c3. bucketed cosine dedup (r4): pair emission Arrow-streamed over
    #      bucket-sorted partitions; one bucket shuffle; no join anywhere
    #      (sum(bucket^2) pairs, never an all-pairs or bucket self-join)
    audit(
        "dedup_cosine_bucketed", qs["dedup_cosine_bucketed"](spark, SF_DIR),
        [
            ("pair emission is Arrow-streamed (MapInPandas)",
             contains(r"MapInPandas")),
            ("one shuffle routes vectors to their bucket",
             contains(r"hashpartitioning\(bucket")),
            ("no join nodes (bucketed, never all-pairs)",
             lambda plan: ("Join" not in tree_of(plan),
                           "no join nodes" if "Join" not in tree_of(plan)
                           else "join node present")),
        ],
    )

    # 6d. composed near-dedup pipeline: every join keyed (no cartesian),
    #     the shingle-table aggregations partial before their shuffles
    audit(
        "pipeline_near_dedup", qs["pipeline_near_dedup"](spark, SF_DIR),
        [
            ("no cartesian product", absent(r"CartesianProduct")),
            ("no broadcast nested loop (all joins keyed)",
             absent(r"BroadcastNestedLoopJoin")),
            ("partial aggregation before the signature shuffle",
             contains(r"HashAggregate")),
        ],
    )

    # 6e. cluster-correct near-dedup: the iterative CC rounds ran at
    #     compose time behind localCheckpoint (adjudicated iterative-algo
    #     exemption); the RESULT plan must stay keyed — the survivor
    #     anti-join on doc_id, no cartesian anywhere, and the label frame
    #     read back from checkpointed blocks (O(1)-deep plan, not a
    #     64-round join tower).
    audit(
        "pipeline_near_dedup_cc", qs["pipeline_near_dedup_cc"](spark, SF_DIR),
        [
            ("no cartesian product", absent(r"CartesianProduct")),
            ("no broadcast nested loop (all joins keyed)",
             absent(r"BroadcastNestedLoopJoin")),
            ("cluster drop-list applied as anti-join",
             contains(r"LeftAnti")),
            ("iteration severed: converged labels come from checkpointed "
             "blocks (Scan ExistingRDD), not a replayed join tower",
             contains(r"Scan ExistingRDD")),
        ],
    )

    # 6e0. the full pretraining composition: end-to-end keyed — the eval
    #      shingle table and the temperature factors both arrive by
    #      broadcast, no cartesian anywhere, converged CC labels and the
    #      packing cumsum read back from checkpointed blocks.
    audit(
        "pipeline_pretrain", qs["pipeline_pretrain"](spark, SF_DIR),
        [
            ("no cartesian product", absent(r"CartesianProduct")),
            ("broadcast joins present (eval shingles / factors / offsets)",
             contains(r"BroadcastHashJoin")),
            # the anti/semi dedup+decontaminate joins live upstream of the
            # packing checkpoint — audited on their own entries
            # (pipeline_near_dedup_cc, sample_group_quota) — the visible
            # plan here is the packing tail and must stay broadcast-only
            ("iterative/checkpointed stages severed (Scan ExistingRDD)",
             contains(r"Scan ExistingRDD")),
        ],
    )

    # 6e1. PII redaction: pure codegen'd projection — no shuffle, no
    #      Python, and the scan prunes to the two used columns.
    audit(
        "pii_redact", qs["pii_redact"](spark, SF_DIR),
        [
            ("zero exchanges (pure projection)",
             lambda plan: ("Exchange" not in tree_of(plan),
                           "clean" if "Exchange" not in tree_of(plan)
                           else "exchange present")),
            ("no Python/Arrow eval",
             absent(r"BatchEvalPython|ArrowEval|MapInPandas")),
            ("scan reads only doc_id,text",
             contains(r"ReadSchema: struct<doc_id:[^>,]*,text:[^>,]*>")),
        ],
    )

    # 6e2. deterministic sampling: hash_sample is a pure filter (no
    #      shuffle, no Python); quota keeps the heavy columns out of the
    #      rank (semi-join of kept ids, rank half checkpointed); the
    #      temperature factors arrive by broadcast and the upsampling
    #      explode is a Generate, never a cartesian.
    audit(
        "sample_hash", qs["sample_hash"](spark, SF_DIR),
        [
            ("zero exchanges (pure filter)",
             lambda plan: ("Exchange" not in tree_of(plan),
                           "clean" if "Exchange" not in tree_of(plan)
                           else "exchange present")),
            ("no Python/Arrow eval", absent(r"BatchEvalPython|ArrowEval|MapInPandas")),
        ],
    )
    audit(
        "sample_group_quota", qs["sample_group_quota"](spark, SF_DIR),
        [
            ("kept ids return via semi-join", contains(r"LeftSemi")),
            ("no cartesian product", absent(r"CartesianProduct")),
            ("rank half severed behind checkpoint (skinny frame only)",
             contains(r"Scan ExistingRDD")),
        ],
    )
    audit(
        "sample_temperature", qs["sample_temperature"](spark, SF_DIR),
        [
            ("group factors joined by broadcast", contains(r"BroadcastHashJoin")),
            ("copies explode via Generate", contains(r"Generate")),
            ("no cartesian product", absent(r"CartesianProduct")),
            ("group counts partial-aggregated before their exchange",
             contains(r"HashAggregate .*partial", re.I | re.S)),
        ],
    )

    # 6f. sequence packing: the visible (post-checkpoint) plan must keep
    #     the corpus-sized carried frame out of every exchange — offsets
    #     arrive by broadcast; the stats agg is partial-combined and its
    #     window runs AFTER the tiny aggregate, never on the big frame.
    audit(
        "pack_assignments", qs["pack_assignments"](spark, SF_DIR),
        [
            ("partition offsets joined by broadcast (big frame unshuffled)",
             contains(r"BroadcastHashJoin")),
            ("no cartesian product", absent(r"CartesianProduct")),
            ("stats aggregate partial before its exchange",
             contains(r"HashAggregate .*partial", re.I | re.S)),
            ("carried cumsum read from checkpointed blocks",
             contains(r"Scan ExistingRDD")),
        ],
    )
    # the pre-checkpoint half (hidden behind Scan ExistingRDD above):
    # rebuild skinny->ranged->mapInPandas exactly as pack_assignments does
    # and assert ONE exchange (the range partition) + the Arrow cumsum
    from cdx_toolkit_spark import packing as _packing
    from cdx_toolkit_spark import textkit as _tk

    _docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _skinny = _docs_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _tk.token_count_col("text").cast("long").alias("n_tokens"),
    )
    _pre = (
        _skinny.repartitionByRange(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .mapInPandas(
            _packing._cumsum_stream,
            "doc_id long, n_tokens long, _pid int, _cum long",
        )
    )
    audit(
        "pack_cumsum_prechk", _pre,
        [
            ("running sum is Arrow-streamed (MapInPandas)",
             contains(r"MapInPandas")),
            ("ONE exchange: the doc_id range partition",
             lambda plan: (
                 len(re.findall(r"\bExchange\b", tree_of(plan))) == 1
                 and "rangepartitioning" in plan,
                 f"{len(re.findall(r'Exchange', tree_of(plan)))} exchange(s)",
             )),
            ("skinny projection: scan reads only doc_id,text",
             contains(r"ReadSchema: struct<doc_id:[^>,]*,text:[^>,]*>")),
            ("no global single-partition sort/window",
             absent(r"\bWindow\b|\bSortExec\b, Exchange SinglePartition")),
        ],
    )

    # 7. frontier politeness: robots joined via broadcast
    from cdx_toolkit_spark.frontier import politeness
    from cdx_toolkit_spark.frontier.scheduler import prepare

    cands = spark.createDataFrame(
        [(f"https://h{i % 9}.com/{i}", i % 3, 1000 + i) for i in range(64)],
        "url string, priority int, discovered_ts long",
    )
    robots = spark.createDataFrame(
        [("h1.com", 1.0, ["/x"])],
        "host string, crawl_delay_s double, disallow_prefixes array<string>",
    )
    audit(
        "frontier_attach_robots",
        politeness.attach_robots(prepare(cands), robots),
        [
            ("robots dimension broadcast", contains(r"BroadcastHashJoin")),
            ("no shuffle of the frontier for rule attach",
             absent(r"Exchange hashpartitioning\(host")),
        ],
    )

    # 7b. skew-safe rank (r3): exactly ONE exchange of the frontier — the
    #     range partition. The r2 shape added a second full-table hash
    #     exchange (host, _pid) for the local-rank window; the rangesorted
    #     variant derives local ranks from monotonically_increasing_id on
    #     the sorted partitions, so that exchange must be gone. (The tiny
    #     per-(host, partition) offsets agg still hash-exchanges its few
    #     rows — asserted as the count of exchanges ON the checkpointed
    #     frontier lineage, which Spark renders as a Scan ExistingRDD.)
    ranked = politeness.assign_fetch_times(
        politeness.attach_robots(prepare(cands), robots).drop(
            "next_attempt_ts"
        ),
        None,
        mitigate_skew=True,
    )
    # execute through the frame's OWN QueryExecution (collect — a write
    # command would plan a fresh one) so the ADAPTIVE plan is final: the
    # offsets join carries no broadcast hint (the stats side is active-
    # host-bounded, potentially huge at web scale) — the assertion is that
    # AQE picks the broadcast at THIS scale from runtime sizes
    ranked.collect()
    audit(
        "frontier_rank_skew_safe",
        ranked,
        [
            ("no (host, _pid) window exchange of the frontier",
             absent(r"Exchange hashpartitioning\(host#\d+, _pid")),
            ("no full-table sort window (local ranks ride the range sort)",
             absent(r"Window \[row_number")),
            ("AQE broadcasts the offsets join at this scale (unhinted)",
             contains(r"BroadcastHashJoin")),
        ],
    )

    # 8. winnowing fingerprints (r5): the whole rolling-hash + window-min
    #    kernel must be a keyed-shuffle-free, Python-free projection stage.
    #    r7: ONE round-robin exchange is allowed — spread_for_map raises
    #    map parallelism over a single-row-group source (guide §2.5) and
    #    no-ops at scale; keyed (hash/range) exchanges stay forbidden.
    audit(
        "fingerprint_winnow",
        qs["fingerprint_winnow"](spark, SF_DIR),
        [
            ("no keyed shuffle (narrow projection + explode only)",
             absent(r"Exchange (hash|range)partitioning")),
            ("no Python/Arrow eval (pure codegen'd expressions)",
             absent(r"BatchEvalPython|ArrowEvalPython|MapInPandas")),
            ("projection pruned to (doc_id, text) at the scan",
             contains(r"ReadSchema: [^\n]*doc_id[^\n]*text")),
        ],
    )

    # 8a. the production (numpy/Arrow) winnow kernel: ONE mapInPandas
    #     stage, still no keyed shuffle (round-robin spread allowed, r7)
    audit(
        "fingerprint_winnow_prod",
        qs["fingerprint_winnow_prod"](spark, SF_DIR),
        [
            ("no keyed shuffle", absent(r"Exchange (hash|range)partitioning")),
            ("single Arrow stage (mapInPandas), no row-at-a-time Python",
             contains(r"MapInPandas")),
            ("no row-at-a-time Python eval", absent(r"BatchEvalPython")),
        ],
    )

    # 8b. winnow-overlap pairs: inverted-index self-join — both sides must
    #     arrive at the join already partitioned on fp (one exchange family,
    #     no nested-loop blowup), aggregates map-side combined
    audit(
        "dedup_winnow_overlap",
        qs["dedup_winnow_overlap"](spark, SF_DIR),
        [
            ("no cartesian/nested-loop join", absent(r"CartesianProduct|BroadcastNestedLoop")),
            # equi-join keyed on fp whatever the physical strategy — AQE
            # broadcasts the rare-fp dimension at this SF; at 10^9 docs the
            # same logical plan shuffles both sides on fp
            ("pair self-join is an equi-join keyed on fp",
             contains(r"Left keys \[1\]: \[fp")),
            ("partial aggregation before the pair-count shuffle",
             contains(r"HashAggregate .*partial", re.I | re.S)),
            # r7: the (doc, fp) index is built by the vectorized arrow
            # winnow kernel (one MapInPandas stage, persisted + shared by
            # all four consumers); per-row Python stays forbidden
            ("no per-row Python eval", absent(r"BatchEvalPython")),
        ],
    )

    # 8d. decontamination: the eval shingle table must be broadcast so the
    #     (100 TB) train side reaches the join without a shuffle; the only
    #     exchange keys the per-doc aggregate over matched rows
    audit(
        "decontaminate_ngram",
        qs["decontaminate_ngram"](spark, SF_DIR),
        [
            ("eval shingles broadcast", contains(r"BroadcastExchange")),
            ("train side not shuffled before the join (no exchange on shingle)",
             absent(r"Exchange hashpartitioning\(shingle")),
            ("no cartesian/nested-loop join",
             absent(r"CartesianProduct|BroadcastNestedLoop")),
        ],
    )

    # 8e. vocabulary top-k: partial count before the shuffle, and the
    #     order+limit must plan as TakeOrderedAndProject (per-partition
    #     heaps), never a global sort
    audit(
        "vocab_topk",
        qs["vocab_topk"](spark, SF_DIR),
        [
            ("partial count before the token shuffle",
             contains(r"HashAggregate .*partial", re.I | re.S)),
            ("top-k via TakeOrderedAndProject, no global sort",
             contains(r"TakeOrderedAndProject")),
        ],
    )

    # 8f. repetition stats: pure projection
    audit(
        "text_repetition",
        qs["text_repetition"](spark, SF_DIR),
        [
            ("zero shuffles", absent(r"Exchange")),
            ("no Python/Arrow eval",
             absent(r"BatchEvalPython|ArrowEvalPython|MapInPandas")),
        ],
    )

    # 8c. trigram language ID: one vectorized Arrow stage (r7 — the
    #     numpy np.isin twin replaced the interpreted per-trigram
    #     array_contains lambdas; bit-identical, shared oracle), still a
    #     zero-shuffle map-only plan with no per-row Python
    audit(
        "text_lang_id",
        qs["text_lang_id"](spark, SF_DIR),
        [
            ("no keyed shuffle (round-robin spread allowed, r7)",
             absent(r"Exchange (hash|range)partitioning")),
            ("one vectorized Arrow stage", contains(r"MapInPandas")),
            ("no per-row Python eval", absent(r"BatchEvalPython")),
        ],
    )

    # write PLANS.md
    lines = [
        "# PLANS — physical-plan audit (structural assertions)\n",
        f"Run at `{SF_DIR}`, local[8], AQE on. Each query's formatted plan is",
        "checked for the structural properties the 100 TB posture needs —",
        "re-run with `python tools/explain_audit.py`.\n",
        "| query | property | ok | evidence |",
        "|---|---|---|---|",
    ]
    n_fail = 0
    for name, desc, ok, detail in checks:
        n_fail += (not ok)
        lines.append(
            f"| {name} | {desc} | {'✅' if ok else '❌'} | "
            f"`{detail.strip()[:90]}` |"
        )
    lines.append("\n## Formatted plans\n")
    for name, plan in sections:
        lines.append(f"### {name}\n\n```\n{plan.strip()[:4000]}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fd:
        fd.write("\n".join(lines))
    for name, desc, ok, detail in checks:
        print(("PASS" if ok else "FAIL"), name, "—", desc, "|", detail[:80])
    print(f"\n{len(checks) - n_fail}/{len(checks)} plan properties hold; PLANS.md written")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
