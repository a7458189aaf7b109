"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship CDX iteration query at sf0.001.
queries()      -> one callable per implemented operator (SURVEY.md §2 ids in
                  each docstring); all read {sf_dir}/*.parquet.
oracle_sql()   -> independent DuckDB SQL for each query. The CDX capture
                  table is *derived* from `documents` by a deterministic
                  shared transformation (cdx_toolkit_spark.cdx_view): Spark
                  computes `urlkey` with the real SURT kernel, the oracle
                  constructs it arithmetically — so every CDX comparison
                  also end-to-end-checks SURT canonicalization.

Non-SQL-expressible ops (MinHash-LSH, SimHash, hyperplane-LSH ANN, frontier
politeness/drain) ship without oracle entries -> driver records rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from cdx_toolkit_spark.cdx_view import cdx_captures, oracle_cdx_cte
from cdx_toolkit_spark.query import CdxQuery
from cdx_toolkit_spark import dedup, render, similarity, textkit, multimodal
from cdx_toolkit_spark import cluster, packing, pii, sampling, winnow
from cdx_toolkit_spark import ingest
from cdx_toolkit_spark import warc as warcmod

_CDX_COLS = (
    'urlkey, "timestamp", url, status, mime, mime_detected, digest, '
    'length, "offset", filename, crawl, languages, redirect, doc_id'
)


def _wrap(sql: str) -> str:
    return f"WITH cdx AS (\n{oracle_cdx_cte()}\n)\n{sql}"


# timezone-independent epoch seconds from the 14-digit timestamp string —
# the exact twin of cdx_toolkit_spark.query.ts_epoch_col
_TS_EPOCH = (
    "(date_diff('day', DATE '1970-01-01', make_date("
    "CAST(substring(timestamp, 1, 4) AS INT), "
    "CAST(substring(timestamp, 5, 2) AS INT), "
    "CAST(substring(timestamp, 7, 2) AS INT))) * 86400"
    " + CAST(substring(timestamp, 9, 2) AS BIGINT) * 3600"
    " + CAST(substring(timestamp, 11, 2) AS BIGINT) * 60"
    " + CAST(substring(timestamp, 13, 2) AS BIGINT))"
)
_EPOCH_20170601 = 1496275200  # timestamp_to_time('20170601000000')


# closed-form crawl catalog of the derived view (cdx_view._CRAWL: years
# 2015-2018 x week 26/52) — injected so composing a windowed/crawl query
# never runs the distinct() discovery scan (VERDICT r2 #3); on a cluster
# this is the Iceberg partition-metadata listing
_VIEW_CRAWLS = [
    f"CC-MAIN-{y}-{w}" for y in range(2015, 2019) for w in ("26", "52")
]


def _q(spark: SparkSession, sf_dir: str, dialect: str = "cc") -> CdxQuery:
    return CdxQuery(
        cdx_captures(spark, sf_dir), dialect=dialect, crawls=_VIEW_CRAWLS
    )


# explicit table schemas: spark.read.parquet without a schema runs a
# 1-task footer-inference job at COMPOSE time — with the schema given,
# composing any entry is entirely job-free (VERDICT r2 #4); on a cluster
# the schemas come from the Iceberg table metadata the same way
_TABLE_SCHEMAS = {
    "documents": (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
    "events": (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ),
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
}


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.schema(_TABLE_SCHEMAS[table]).parquet(
        f"{sf_dir}/{table}.parquet"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "embeddings")


_EMB_DIM = 64  # fixed synthetic embedding width (all sf tiers)


def _pq_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata — a driver-side file read,
    zero Spark jobs; lets the blocked-GEMM kernels size their grids at
    compose time without a count() (VERDICT r2 #4)."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows for f in ds.dataset(path).files
    )


def _cli_iter_lines(s: SparkSession, d: str) -> DataFrame:
    """The reference's flagship UX — `cdxt --cc --from 2015 --to 2018
    --limit 25 --cc-sort ascending iter 'example0.com/*' --fields
    url,status,timestamp` (/root/reference/cdx_toolkit/cli.py:214-232) —
    as a DataFrame plan: the argv string is parsed by the REAL argparse
    surface (cli.make_parser) and composed by the same
    _build_iter → normalize_field_names → winnow_fields → kv_lines_col
    chain cli.iterator() prints from, minus the stdout loop. Identical
    result contract to kv_render, so the two share one oracle — what this
    entry adds to the gate is the CLI parse+compose path itself."""
    from cdx_toolkit_spark import cli, compat

    cmd = cli.make_parser().parse_args(
        [
            "--cc", "--from", "2015", "--to", "2018",
            "--limit", "25", "--cc-sort", "ascending", "--sf-dir", d,
            "iter", "example0.com/*",
            "--fields", "url,status,timestamp",
        ]
    )
    # the known catalog keeps composition job-free (zero-jobs contract);
    # interactive CLI runs discover it instead — see cli._query
    df = cli._build_iter(cmd, s, crawls=_VIEW_CRAWLS)
    df = render.winnow_fields(
        df, compat.normalize_field_names(cmd.fields.split(","))
    )
    return df.select(render.kv_lines_col(df))


def _cli_warc_select(s: SparkSession, d: str) -> DataFrame:
    """`cdxt warc 'example0.com/*' --url-fgrep www. --warc-download-prefix
    <fixture>` — the record-selection half of the warc command
    (/root/reference/cdx_toolkit/cli.py:235-266: url match + fgrep over
    the source collection), through the real argparse surface and the
    same cli._build_warc_selection plan warcer() fetches from. The
    fetch/write half stays covered by warc_ingest + test_cli (writing
    segments is a side effect, not a DataFrame)."""
    from cdx_toolkit_spark import cli

    fx = warcmod.ensure_warc_fixture(s, d)
    cmd = cli.make_parser().parse_args(
        [
            "--cc", "--sf-dir", d,
            "warc", "example0.com/*", "--url-fgrep", "www.",
            "--warc-download-prefix", fx,
        ]
    )
    idx = cli._build_warc_selection(cmd, s)
    return idx.select(
        F.regexp_extract("record_id", r"(\d{12})>$", 1)
        .cast("long")
        .alias("doc_id"),
        "url",
        "warc_type",
    )


def _cli_size_details(s: SparkSession, d: str) -> DataFrame:
    """`cdxt --cc --from 2015 --to 2018 size 'example0.com/*' --details`
    (/root/reference/cdx_toolkit/cli.py:118-127 prints one per-index
    line) through the real argparse surface and the same
    cli._build_size_details plan sizer() streams from."""
    from cdx_toolkit_spark import cli

    cmd = cli.make_parser().parse_args(
        [
            "--cc", "--from", "2015", "--to", "2018", "--sf-dir", d,
            "size", "example0.com/*", "--details",
        ]
    )
    return cli._build_size_details(cmd, s, crawls=_VIEW_CRAWLS)


# ---------------------------------------------------------------------------
# entry: flagship query (driver smoke check at sf0.001)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cdxt iter 'example0.com/*' --from 2017 --to 2017
    --filter '=status:200' --limit 50 (reference tests/test_cli.py:232-244
    semantics) over the derived capture table."""
    return _q(spark, "/root/testdata/sf0.001").iter(
        "example0.com/*",
        from_ts="2017",
        to="2017",
        filter=["=status:200"],
        limit=50,
        cc_sort="mixed",
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- CDX iteration surface (S-1/S-2, P-3..P-8, A-2..A-7) ---------
        "iter_window_filter": lambda s, d: _q(s, d).iter(
            "example0.com/*", from_ts="2017", to="2017",
            filter=["=status:200"], limit=50, cc_sort="mixed",
        ),
        "iter_to_only_defaults": lambda s, d: _q(s, d).iter(
            "example0.com/*", to="2016", limit=100, cc_sort="ascending",
        ),
        "get_closest": lambda s, d: _q(s, d).get(
            "example0.com/*", closest="20170601", limit=10,
        ),
        "match_domain_contains": lambda s, d: _q(s, d).iter(
            "*.example4.com", from_ts="2015", to="2018", filter=["mime:pdf"],
            cc_sort="ascending",
        ),
        "filter_regex": lambda s, d: _q(s, d).iter(
            "example0.com/*", from_ts="2015", to="2018",
            filter=["~mime:text/.*"], limit=200, cc_sort="ascending",
        ),
        "filter_not_and": lambda s, d: _q(s, d).iter(
            "example0.com/*", from_ts="2015", to="2018",
            filter=["!=status:200", "!=status:404"], cc_sort="ascending",
        ),
        "ia_dialect_filter": lambda s, d: _q(s, d, dialect="ia").iter(
            "example0.com/*", from_ts="2015", to="2018",
            filter=["statuscode:200"], limit=100, cc_sort="ascending",
        ),
        "match_exact_url": lambda s, d: _q(s, d).iter(
            "http://example0.com/page/0?id=0", from_ts="2015", to="2018",
            cc_sort="ascending",
        ),
        "collapse_urlkey": lambda s, d: _q(s, d).collapse(
            "example0.com/*", field="urlkey", from_ts="2015", to="2018",
        ),
        "closest_per_urlkey": lambda s, d: _q(s, d).closest_per_urlkey(
            "example0.com/*", closest="20170601",
        ),
        "size_estimate": lambda s, d: _q(s, d).size_estimate(
            "example0.com/*", from_ts="2015", to="2018",
        ),
        "revisits": lambda s, d: _q(s, d).revisits(
            "example0.com/*", from_ts="2015", to="2018",
        ),
        "crawl_name_select": lambda s, d: _q(s, d).iter(
            "example0.com/*", crawl=["CC-MAIN-2017"], cc_sort="ascending",
        ),
        "crawl_last_n": lambda s, d: _q(s, d).iter(
            "example0.com/*", crawl=["2"], cc_sort="ascending",
        ),
        "fields_projection": lambda s, d: _q(s, d).iter(
            "example0.com/*", from_ts="2015", to="2018", limit=25,
            cc_sort="mixed", fields=["url", "status", "timestamp"],
        ),
        # S-10: kv-lines render as a Column plan (the default `cdxt iter`
        # output), over a deterministic windowed projection
        "kv_render": lambda s, d: (
            lambda df: df.select(render.kv_lines_col(df))
        )(
            _q(s, d).iter(
                "example0.com/*", from_ts="2015", to="2018", limit=25,
                cc_sort="ascending", fields=["url", "status", "timestamp"],
            )
        ),
        # §3.1: the reference's flagship UX (`cdxt ... iter URL`,
        # /root/reference/cdx_toolkit/cli.py:214-232) driven through the
        # REAL argparse surface + the same _build_iter/winnow/kv-render
        # composition main() uses — puts the CLI layer itself under the
        # driver oracle (VERDICT r5 #6). Same plan shape as kv_render, so
        # it shares that oracle SQL.
        "cli_iter_lines": _cli_iter_lines,
        "cli_size_details": _cli_size_details,
        "cli_warc_select": _cli_warc_select,
        "url_fgrep": lambda s, d: _q(s, d)
        .build("example0.com/*", from_ts="2015", to="2018")
        .where(F.col("url").contains("www."))
        .where(~F.col("url").contains("https")),
        # --- URL-seen anti-join (J-1 exact backstop) ----------------------
        "urlseen_antijoin": lambda s, d: (
            lambda cdx: cdx.select("urlkey")
            .distinct()
            .join(
                cdx.where(F.col("doc_id") % 3 == 0).select("urlkey").distinct(),
                "urlkey",
                "left_anti",
            )
        )(cdx_captures(s, d)),
        # --- dedup family --------------------------------------------------
        "dedup_exact": lambda s, d: dedup.exact_dedup(_docs(s, d)),
        # max_doc_freq=100: the ubiquitous-shingle guard (a df-k shingle is
        # k² self-join rows) — Jaccard over the non-boilerplate shingle sets
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(
            _docs(s, d), n=3, threshold_num=8, threshold_den=10,
            max_doc_freq=100,
        ),
        # portable=True: md5-derived hashes, bit-identical in DuckDB, so both
        # probabilistic kernels carry full value-hash oracles (VERDICT r1 #3).
        # r7: both variants read the SAME memoized persisted shingle frame
        # the pipelines already share (identical rows; the tokenize+shingle
        # pass is the measured cost floor and ran once per entry before)
        "dedup_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(
            _docs(s, d), num_hashes=64, bands=16, n=3, portable=True,
            shingles=_shared_shingles(s, d, _docs(s, d)),
        ),
        # the PRODUCTION hash path (xxhash64 shingle hashes + long band
        # keys — what a deployment runs; the md5-portable twin above
        # carries the value-hash oracle, this one is rows-only by design:
        # xxhash64 is not reproducible in DuckDB SQL). Registered so the
        # driver benches both variants (VERDICT r3 #4).
        "dedup_minhash_lsh_prod": lambda s, d: dedup.minhash_lsh_pairs(
            _docs(s, d), num_hashes=64, bands=16, n=3, portable=False,
            shingles=_shared_shingles(s, d, _docs(s, d)),
        ),
        # max_hamming=3 — the sound pigeonhole radius (16-bit chunk keys);
        # the r1 max_hamming=12 setting degenerated to a near-cross-join
        "dedup_simhash": lambda s, d: dedup.simhash_pairs(
            _docs(s, d), max_hamming=3, portable=True,
        ),
        "dedup_embedding_cosine": lambda s, d: dedup.embedding_cosine_pairs(
            _emb(s, d), threshold=0.42,
            n=_pq_rows(f"{d}/embeddings.parquet"),
        ).select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine")),
        # the 10^9-vector scale path: exact cosine only within LSH buckets
        "dedup_cosine_bucketed": lambda s, d: dedup.lsh_bucketed_cosine_pairs(
            _emb(s, d), threshold=0.40, n_planes=6, seeds=(42, 43),
            dim=_EMB_DIM,
        ).select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine")),
        # --- text analysis --------------------------------------------------
        "text_stats": lambda s, d: _docs(s, d).select(
            "doc_id",
            textkit.token_count_col("text"),
            textkit.stopword_count_col("text"),
            textkit.lang_guess_col("text"),
            textkit.fingerprint_col("text"),
        ),
        "text_quality": lambda s, d: _docs(s, d).select(
            "doc_id",
            textkit.quality_score_col("text"),
            textkit.bpe_token_count_col("text"),
        ),
        # PII redaction (pii.py): expression-only regex kernels in the
        # Java∩RE2 dialect (cross-engine fuzz-pinned); documents get a
        # deterministic PII garnish (email/IP/phone by doc_id residue) so
        # the value-hash oracle exercises every pattern, not just no-ops
        "pii_redact": lambda s, d: _pii_garnish(_docs(s, d)).select(
            "doc_id", pii.redact_col("text"), *pii.pii_count_cols("text")
        ),
        # deterministic corpus sampling (sampling.py): membership from the
        # portable md5 bucket — stable across runs/partitionings, unlike
        # df.sample(); all three carry full value-hash oracles.
        "sample_hash": lambda s, d: sampling.hash_sample(
            _docs(s, d), 0.25, seed=1
        ),
        # per-group cap via the exchange-free grouped rank (rank.py) on the
        # skinny projection; heavy text column crosses no exchange
        "sample_group_quota": lambda s, d: sampling.group_quota_sample(
            _docs(s, d), "lang", quota=40, seed=3
        ),
        # temperature-alpha mixture rebalancing (count_g^0.5 shares):
        # upsampled tail groups get copy>=2 rows via a bounded explode
        "sample_temperature": lambda s, d: sampling.temperature_rebalance(
            _docs(s, d), "lang", alpha=0.5, seed=4
        ).select("doc_id", "lang", "copy"),
        # concat-and-chunk sequence packing: global token offsets via the
        # exchange-free two-phase cumsum (ONE big-frame exchange; the heavy
        # text column never enters — packing.py). pack_segments is the
        # per-(doc, sequence) materialization plan incl. straddlers.
        "pack_assignments": lambda s, d: packing.pack_assignments(
            _docs(s, d), budget=128, tokens_col=textkit.token_count_col("text"),
        ),
        "pack_segments": lambda s, d: packing.pack_segments(
            _docs(s, d), budget=128, tokens_col=textkit.token_count_col("text"),
        ),
        # trigram-profile language ID (Cavnar–Trenkle-style): per-language
        # occurrence scores against literal profile arrays + argmax label —
        # pure unrolled column expressions, profiles are plan literals
        "text_lang_id": lambda s, d: textkit.lang_id_table(_docs(s, d)),
        # MOSS winnowing (SIGMOD'03): Karp–Rabin rolling-hash k-grams +
        # window-min fingerprint selection, one let-bound narrow projection
        "fingerprint_winnow": lambda s, d: winnow.winnow_fingerprint_table(
            _docs(s, d), k=8, w=8
        ),
        # the production kernel: same fingerprints from ONE numpy-vectorized
        # mapInPandas stage (linear in doc length; the expression form above
        # is the portable twin and goes quadratic on long docs — BENCH.md).
        # Deterministic and bit-identical, so it shares the FULL oracle.
        "fingerprint_winnow_prod": lambda s, d: winnow.winnow_fingerprint_table(
            _docs(s, d), k=8, w=8, impl="arrow"
        ),
        # near-dup pairs by winnowing-fingerprint set overlap (inverted
        # index self-join on fp, integer-exact Jaccard, ubiquitous-fp cap).
        # r7: the (doc, fp) index is built ONCE by the numpy-vectorized
        # arrow kernel (bit-identical to the expression form — shared
        # oracle + pytest pin) and persisted via _winnow_fps; the plan
        # otherwise re-ran the fingerprint kernel once per consumer
        # (df cap, sizes, both join sides)
        "dedup_winnow_overlap": lambda s, d: winnow.winnow_overlap_pairs(
            _docs(s, d), k=8, w=8, threshold_num=1, threshold_den=4,
            max_doc_freq=100, fps=_winnow_fps(s, d),
        ),
        # global top-k token counts (BPE/tokenizer vocabulary prep):
        # map-side-combined count + TakeOrderedAndProject, no global sort
        "vocab_topk": lambda s, d: textkit.vocab_topk(_docs(s, d), k=200),
        # Gopher-style intra-doc repetition stats (duplicate n-gram
        # fraction) — boilerplate/spam quality signal, pure projection
        "text_repetition": lambda s, d: textkit.repetition_table(
            _docs(s, d)
        ),
        # benchmark decontamination (GPT-3/Pile n-gram practice): flag train
        # docs sharing word n-grams with an eval set; eval shingles are
        # BROADCAST so the 100 TB train side joins without a shuffle.
        # r7: the train side filters the memoized shared shingle frame
        # (shingle_table(docs) restricted to train doc ids — identical rows
        # to shingle_table(train docs)) instead of re-running the explode
        "decontaminate_ngram": lambda s, d: (
            lambda docs: dedup.contamination_table(
                docs.where(F.col("doc_id") % 50 != 7),
                docs.where(F.col("doc_id") % 50 == 7),
                n=3,
                shingles=_shared_shingles(s, d, docs).where(
                    F.col("doc") % 50 != 7
                ),
            )
        )(_docs(s, d)),
        # deterministic shuffle-free train/val/test assignment (portable
        # md5 bucket vs cumulative weight thresholds — stable across runs,
        # partitionings and cluster sizes, unlike randomSplit)
        "corpus_split": lambda s, d: _docs(s, d).select(
            "doc_id", textkit.split_assign_col("doc_id")
        ),
        # composed end-to-end training-data pipeline: exact dedup (keep min
        # doc_id per normalized text) -> quality gate -> per-doc stats, all
        # ONE declarative plan — one map-side-combined shuffle for the dedup
        # agg, a keyed semi-join for the keep set, zero Python
        "pipeline_clean_corpus": lambda s, d: (
            lambda docs: docs.join(
                dedup.exact_dedup(docs)
                .select(F.col("keep_id").alias("doc_id")),
                "doc_id",
            )
            .select(
                "doc_id",
                textkit.token_count_col("text"),
                textkit.quality_score_col("text"),
                textkit.lang_guess_col("text"),
                textkit.fingerprint_col("text"),
            )
            .where(F.col("quality") >= 0.3)
        )(_docs(s, d)),
        # composed near-dedup pipeline: banded-LSH candidates verified by
        # exact n-gram Jaccard, greedy drop-the-larger-id of each verified
        # pair (the standard single-pass approximation of duplicate-cluster
        # collapse — SQL-expressible, unlike union-find), then the quality
        # gate — ONE declarative plan spanning three operator families
        "pipeline_near_dedup": lambda s, d: _pipeline_near_dedup(s, d),
        # the same composed pipeline on the PRODUCTION minhash path
        # (xxhash64 base hash — what a deployment runs; kernel pinned by
        # tests/test_round5_fixes.py against a Python xxhash64 reference).
        # No oracle entry by design: xxhash64 is not reproducible in DuckDB
        # SQL; the portable twin above carries the full value-hash oracle
        # and the verify stage is hash-free exact Jaccard in both.
        "pipeline_near_dedup_prod": lambda s, d: _pipeline_near_dedup(
            s, d, portable=False
        ),
        # duplicate CLUSTERS, not pairs: connected components over the
        # verified near-dup pair graph (pointer-jumping min-label, log-
        # diameter rounds of keyed joins — cdx_toolkit_spark/cluster.py).
        # component_id == min(doc_id in component), deterministic.
        "dedup_cc_components": lambda s, d: _cc_components(s, d),
        # the transitively-CORRECT survivor pipeline: one doc per duplicate
        # cluster survives (A~B~C collapses to A even though the (A,C)
        # pair was never emitted), vs pipeline_near_dedup's SQL-friendly
        # greedy per-pair doc_b drop which can keep >1 doc of a chain
        "pipeline_near_dedup_cc": lambda s, d: _pipeline_near_dedup_cc(s, d),
        # keep-the-BEST cluster member (max quality, min-id ties) — the
        # survivor policy production dedup wants; argmax via max_by over
        # the clustered subset only
        "dedup_cc_best": lambda s, d: cluster.cc_survivors(
            _docs(s, d).withColumn("quality", textkit.quality_score_col("text")),
            keep_by="quality",
            cc=_cc_components(s, d),
        ).select("doc_id", "quality"),
        # the FULL pretraining chain (dedup-cc -> decontaminate -> quality
        # -> temperature rebalance -> split -> pack) as one composition,
        # value-hash checked end-to-end against a 9-CTE oracle
        "pipeline_pretrain": lambda s, d: _pipeline_pretrain(s, d),
        # --- similarity search ----------------------------------------------
        "ann_cosine_topk": lambda s, d: similarity.brute_force_topk(
            _emb(s, d), k=5, n=_pq_rows(f"{d}/embeddings.parquet"),
        ),
        "ann_lsh_topk": lambda s, d: similarity.lsh_topk(
            _emb(s, d), k=5, n_planes=10, dim=_EMB_DIM,
        ),
        # multi-table LSH (the recall knob): a candidate pair counts if ANY
        # seed's table buckets it together; rediscoveries dedupe on the
        # pair key before the top-k window. Full value-hash oracle — the
        # per-seed hyperplanes embed as float literals like ann_lsh_topk's.
        "ann_lsh_multiseed": lambda s, d: similarity.lsh_topk(
            _emb(s, d), k=5, n_planes=8, dim=_EMB_DIM, seeds=(42, 43),
        ),
        # IVF scale path: deterministic hashed-sample centroids => the oracle
        # rebuilds the identical inverted lists in SQL (similarity.ivf_topk).
        # nlist ~ sqrt(n) keeps candidates/query at ~nprobe*sqrt(n)
        "ann_ivf_topk": lambda s, d: similarity.ivf_topk(
            _emb(s, d), k=5, nlist=64, nprobe=8,
        ),
        # external-query-set mode (retrieve-for-a-prompt shape): queries are
        # a derived deterministic subset of the corpus with shifted ids
        # (vec_id % 7 == 0 -> id + 100000), so the oracle rebuilds the
        # identical query table; each query's rank-1 neighbor is its own
        # source row at cosine 1.0 — a free bit-exactness probe
        "ann_lsh_queries": lambda s, d: similarity.lsh_topk(
            _emb(s, d), k=5, n_planes=10, dim=_EMB_DIM,
            queries=_ann_query_set(s, d),
        ),
        "ann_ivf_queries": lambda s, d: similarity.ivf_topk(
            _emb(s, d), k=5, nlist=64, nprobe=8,
            queries=_ann_query_set(s, d),
        ),
        # --- WARC path (S-7 ingest, F-11 gzip split, F-12 header parse) -------
        "warc_ingest": lambda s, d: _warc_ingest(s, d),
        # --- robots.txt -> politeness rules (J-2 upstream) ---------------------
        "robots_parse": lambda s, d: _robots_parse(s, d),
        # --- S-8: wayback replay reconstruction --------------------------------
        "wb_reconstruct": lambda s, d: _wb_reconstruct(s, d),
        # --- wire-format decode (S-4 pywb JSONL, S-5 IA list-of-lists) --------
        # decode from a MATERIALIZED wire fixture (the deployment shape —
        # response bodies land on storage before decoding); a fused
        # decode(encode(view)) would benchmark Catalyst's expression
        # duplication, not the decoder (see ensure_pywb_wire_fixture)
        "pywb_jsonl_decode": lambda s, d: ingest.decode_pywb_jsonl(
            ingest.read_pywb_wire(s, ingest.ensure_pywb_wire_fixture(s, d))
        ),
        "ia_lol_decode": lambda s, d: ingest.decode_ia_lol(
            ingest.encode_ia_lol(cdx_captures(s, d), pages=4)
        ),
        # input_hint per-row invariant under the value-hash oracle: the
        # pages table (url, warc_ts, html binary, text, lang) with text
        # re-extracted from html by the real Arrow kernel
        # (textkit.text_from_html_udf, utf-8 errors='replace'). The
        # oracle rebuilds the expected text CLOSED-FORM: each deterministic
        # byte garnish decodes to a FIXED string (invalid bytes -> fixed
        # runs of U+FFFD), so DuckDB hash-checks byte-identical extraction
        # without needing a replace-mode decoder.
        "pages_extract": lambda s, d: _pages_extract(s, d),
        # --- multimodal plumbing ---------------------------------------------
        "media_features": lambda s, d: multimodal.extract_features(
            multimodal.synth_media(s, d)
        ).select("media_id", "kind", "n_bytes"),
        "media_frame_plan": lambda s, d: multimodal.frame_sample_plan(
            multimodal.synth_media(s, d), every_s=1.0
        ).select("media_id", "frame_offset_s"),
        # --- generic relational breadth (events + star schema) ---------------
        # --- frontier math under the value-hash oracle ---------------------
        # ST-2 core: the exchange-free skew-safe rank + token-bucket fetch
        # times, derived deterministically from `documents` so DuckDB can
        # rebuild the identical schedule in SQL (politeness.host_rank /
        # assign_fetch_times; candidate set keeps (priority, discovered_ts)
        # unique per host so the urlkey tiebreak never fires and the oracle
        # needs no SURT)
        "politeness_schedule": lambda s, d: _politeness_schedule(s, d),
        # ST-3 policy: classify_failures over a derived outcomes table —
        # status backoff doubling, flat conn-error wait, DNS-fatal on
        # unseen hosts, warn/give-up counters (scheduler.classify_failures)
        "retry_classify": lambda s, d: _retry_classify(s, d),
        "events_daily_counts": lambda s, d: _read(s, d, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        ),
        "orders_topk_per_segment": lambda s, d: (
            lambda o, c: o.join(c, o.o_custkey == c.c_custkey)
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("c_mktsegment").orderBy(
                        F.col("o_totalprice").desc(), F.col("o_orderkey")
                    )
                ),
            )
            .where(F.col("rk") <= 3)
            .select("c_mktsegment", "o_orderkey", "rk")
        )(
            _read(s, d, "orders"),
            _read(s, d, "customer"),
        ),
    }


def _pages_extract(s: SparkSession, d: str) -> DataFrame:
    from cdx_toolkit_spark.pages import synth_pages

    return synth_pages(s, d).select(
        "doc_id",
        "url",
        F.md5(F.col("text")).alias("text_md5"),
        F.length("text").alias("n_chars_text"),
    )


def _pages_extract_oracle() -> str:
    # garnish classes (pages._GARNISH) decode to fixed strings under
    # utf-8/replace: class 2 (b'\xff\xfe\xfa') -> three U+FFFD, class 3
    # (truncated b'\xe2\x82') -> one U+FFFD; doc_id % 50 == 0 rows have
    # EMPTY html (the revisit analogue) -> empty text
    return (
        "WITH t AS (SELECT doc_id,\n"
        "  CASE WHEN doc_id % 50 = 0 THEN ''\n"
        "    ELSE text || CASE doc_id % 4 WHEN 0 THEN ''"
        " WHEN 1 THEN '±µ€漢字'"
        " WHEN 2 THEN '���' ELSE '�' END END AS txt\n"
        "  FROM documents)\n"
        "SELECT doc_id,\n"
        "  'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END"
        " || 'example' || CAST(doc_id % 25 AS VARCHAR) || '.com/doc/'"
        " || CAST(doc_id AS VARCHAR) AS url,\n"
        "  md5(txt) AS text_md5,\n"
        "  length(txt) AS n_chars_text\n"
        "FROM t"
    )


_SHINGLE_CACHE: dict = {}


def _shared_shingles(s: SparkSession, d: str, docs: DataFrame) -> DataFrame:
    # keyed on applicationId, not id(session): id() values can be reused
    # after a stopped session is garbage-collected, which would hand a
    # later session a frame bound to a dead SparkContext (ADVICE r4).
    # Entries from other application ids are evicted — their contexts are
    # gone, so the persisted blocks are already freed; this just drops the
    # dead references.
    app = s.sparkContext.applicationId
    for stale in [k for k in _SHINGLE_CACHE if k[0] != app]:
        _SHINGLE_CACHE.pop(stale, None)
    key = (app, d)
    if key not in _SHINGLE_CACHE:
        _SHINGLE_CACHE[key] = dedup.shingle_table(docs, n=3).persist()
    return _SHINGLE_CACHE[key]


_VP_CACHE: dict = {}
_CC_CACHE: dict = {}
_FPS_CACHE: dict = {}


def _winnow_fps(s: SparkSession, d: str) -> DataFrame:
    """Memoized persisted distinct (doc, fp) winnowing-fingerprint index
    (k=8, w=8) — the r7 shared frame for the overlap-pairs entry. Built by
    the numpy-vectorized arrow kernel (bit-identical to the expression
    form: both share the driver oracle and are equality-pinned in pytest);
    persisted because the overlap plan reads it four times (df cap, sizes,
    both join sides). Freed by release_caches()."""
    app = s.sparkContext.applicationId
    for stale in [k for k in _FPS_CACHE if k[0] != app]:
        _FPS_CACHE.pop(stale, None)
    key = (app, d)
    if key not in _FPS_CACHE:
        _FPS_CACHE[key] = (
            winnow.winnow_fingerprint_table(_docs(s, d), 8, 8, impl="arrow")
            .select(F.col("doc_id").alias("doc"), "fp")
            .distinct()
            .persist()
        )
    return _FPS_CACHE[key]
# persisted stage boundaries tracked so release_caches() can free them:
# the pretrain chain's decontaminated survivor frame is consumed by
# several downstream branches (rebalance weights aggregate + join,
# packing's skinny scan); the 1M-doc stress probe
# (tools/stress_pretrain.py) measured the unstaged chain paying the
# decontaminate lineage once per consumer. _STAGE_KEYED memoizes them per
# (applicationId, sf_dir, stage) so repeated entry calls reuse one copy
# (ADVICE r6).
_STAGE_PERSISTS: list = []
_STAGE_KEYED: dict = {}


def _verified_pairs(
    s: SparkSession, d: str, portable: bool = True
) -> DataFrame:
    """The shared candidate→verify front half of the near-dedup pipelines:
    banded-LSH candidates intersected with exact-Jaccard verification,
    both stages reading ONE persisted shingle frame. Returns the verified
    (doc_a, doc_b, ...) pair graph — lazily persisted and memoized per
    (applicationId, sf_dir, portable) like the shingle frame: four driver
    entries consume it (both cc entries, the cc pipeline, the pretrain
    chain), and recomputing the LSH+verify plan per entry would rerun its
    shuffles once per consumer."""
    app = s.sparkContext.applicationId
    for stale in [k for k in _VP_CACHE if k[0] != app]:
        _VP_CACHE.pop(stale, None)
    key = (app, d, portable)
    if key not in _VP_CACHE:
        docs = _docs(s, d)
        shingles = _shared_shingles(s, d, docs)
        cand = dedup.minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, n=3, portable=portable,
            shingles=shingles,
        )
        _VP_CACHE[key] = dedup.verify_jaccard_pairs(
            docs, cand, n=3, threshold_num=8, threshold_den=10,
            max_doc_freq=100, shingles=shingles,
        ).persist()
    return _VP_CACHE[key]


def _cc_components(s: SparkSession, d: str) -> DataFrame:
    """Converged connected-components labels over the verified pair graph,
    memoized per (applicationId, sf_dir). No persist() needed: the
    returned frame is backed by the iteration's checkpointed blocks —
    caching the HANDLE is what avoids replaying the rounds."""
    app = s.sparkContext.applicationId
    for stale in [k for k in _CC_CACHE if k[0] != app]:
        _CC_CACHE.pop(stale, None)
    key = (app, d)
    if key not in _CC_CACHE:
        _CC_CACHE[key] = cluster.connected_components(_verified_pairs(s, d))
    return _CC_CACHE[key]


def release_caches(
    spark: SparkSession | None = None, sweep_orphans: bool = True
) -> dict:
    """Free every session-lifetime block the entry layer memoizes: the
    persisted shingle frame (_SHINGLE_CACHE), the persisted verified-pair
    graphs (_VP_CACHE), the checkpoint-backed CC label handles (_CC_CACHE)
    and similarity's tracked intermediates (centroid blobs / salted
    assignments) — then sweep any remaining persistent RDDs (orphaned
    localCheckpoint blocks from politeness ranks / packing carries / CC
    rounds, whose handles are already dropped or dropped here).

    The memoized persists are deliberately session-lifetime for one-shot
    driver runs, but in a LONG session they pin executor storage across
    unrelated memory-sensitive work — BENCH_r05 recorded the pipelined
    frontier drain 2x slower than serial with these blocks resident, so
    bench.py calls this between the operator suite and the frontier
    section (VERDICT r5 #1/#2).

    After this call, any OUTSTANDING DataFrame handle backed by a
    localCheckpoint (a previously returned cc_components frame, a
    politeness rank) is invalid — localCheckpoint truncates lineage, so
    the swept blocks cannot be recomputed. Entry callables build fresh
    frames per call, so the driver contract is unaffected.

    Returns {"unpersisted": n_frames, "swept": n_rdds}.
    """
    n_frames = 0
    for cache in (_SHINGLE_CACHE, _VP_CACHE, _FPS_CACHE):
        while cache:
            _, f = cache.popitem()
            try:
                f.unpersist(blocking=True)
                n_frames += 1
            except Exception:
                pass
    while _STAGE_PERSISTS:
        f = _STAGE_PERSISTS.pop()
        try:
            f.unpersist(blocking=True)
            n_frames += 1
        except Exception:
            pass
    _STAGE_KEYED.clear()  # memo handles for the frames just unpersisted
    _CC_CACHE.clear()  # handles only; blocks are swept below
    n_frames += similarity.release_all()
    # sweep_orphans=True (default, what bench.py relies on) additionally
    # unpersists EVERY persistent RDD in the session — including persists/
    # localCheckpoints owned by caller code outside the entry layer
    # (ADVICE r6: session-global by design; pass False in a notebook that
    # holds its own cached frames, which would otherwise be silently freed
    # — localCheckpoint-backed ones unrecoverably).
    if spark is None:
        spark = SparkSession.getActiveSession()
    n_swept = 0
    if not sweep_orphans:
        spark = None
    if spark is not None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            try:
                jrdd.unpersist(True)
                n_swept += 1
            except Exception:
                pass
    return {"unpersisted": n_frames, "swept": n_swept}


def _verified_pairs_oracle() -> str:
    return (
        "SELECT v.doc_a, v.doc_b FROM "
        f"({_minhash_lsh_oracle(num_hashes=64, bands=16)}) c "
        f"JOIN ({_ngram_jaccard_oracle()}) v "
        "ON c.doc_a = v.doc_a AND c.doc_b = v.doc_b"
    )


def _pipeline_near_dedup_cc(s: SparkSession, d: str) -> DataFrame:
    """Cluster-correct near-dedup: connected components over the verified
    pair graph, keep the min-id representative of each component plus all
    unpaired documents, then the same token/quality projection+gate as
    _pipeline_near_dedup. Differs from the greedy per-pair drop exactly on
    transitive chains (A~B, B~C without an (A,C) pair)."""
    docs = _docs(s, d)
    kept = cluster.cc_survivors(docs, cc=_cc_components(s, d))
    return kept.select(
        "doc_id",
        textkit.token_count_col("text"),
        textkit.quality_score_col("text"),
    ).where(F.col("quality") >= 0.3)


def _pipeline_near_dedup_cc_oracle() -> str:
    cc = cluster.connected_components_sql(_verified_pairs_oracle())
    return (
        f"WITH cc AS ({cc}),\n"
        "dropped AS (SELECT doc_id FROM cc WHERE doc_id <> component_id),\n"
        "kept AS (SELECT d.doc_id, d.text FROM documents d\n"
        "  WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)),\n"
        "t AS (SELECT doc_id,\n"
        "  CASE WHEN trim(text) = '' THEN 0"
        "    ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,\n"
        "  len(list_filter(string_split_regex(trim(text), '\\s+'),"
        "    x -> list_contains(['the','a','of','and','to'], x))) AS sw\n"
        "  FROM kept)\n"
        "SELECT doc_id, nt AS n_tokens,\n"
        "  round(0.5 * least(1.0, nt / 64.0) + 0.5 * least(1.0,"
        "    4.0 * (CASE WHEN nt > 0 THEN CAST(sw AS DOUBLE) / nt"
        "           ELSE 0.0 END)), 6) AS quality\n"
        "FROM t WHERE round(0.5 * least(1.0, nt / 64.0) + 0.5 * least(1.0,"
        "    4.0 * (CASE WHEN nt > 0 THEN CAST(sw AS DOUBLE) / nt"
        "           ELSE 0.0 END)), 6) >= 0.3"
    )


def _pipeline_pretrain(s: SparkSession, d: str) -> DataFrame:
    """The whole pretraining data chain as ONE declarative composition:

      cluster-correct near-dedup (LSH -> Jaccard verify -> connected
      components) -> benchmark decontamination (eval carve-out doc_id%50==7,
      broadcast eval shingles) -> quality gate -> temperature-α(0.5)
      language rebalance (copies) -> hashed train/val/test split on
      (doc, copy) rows -> concat-and-chunk packing of the train split.

    Returns the train split's pack placement per (doc_id, copy). Every
    stage reads the ONE persisted shingle frame where it applies; the
    only Spark jobs at compose time are the adjudicated iterative-CC
    rounds and the shingle/pair materializations they share. Copy ids
    stay < 1024 (alpha=0.5 over a handful of language groups gives
    factors ~O(1)), so row_id = doc_id*1024 + copy is collision-free."""
    docs = _docs(s, d)
    surv = cluster.cc_survivors(docs, cc=_cc_components(s, d))
    evalset = surv.where(F.col("doc_id") % 50 == 7)
    train = surv.where(F.col("doc_id") % 50 != 7)
    # shared shingle frame filtered to the train ids (contamination_table
    # uses `shingles` verbatim for the train side)
    sh_tr = _shared_shingles(s, d, docs).join(
        train.select(F.col("doc_id").alias("doc")), "doc", "left_semi"
    )
    # lazy persisted stage boundary (zero jobs at compose): everything
    # downstream — the rebalance weights aggregate, the rebalance join,
    # the packing scan — re-reads this frame instead of re-executing the
    # decontaminate lineage per branch (seam measured by
    # tools/stress_pretrain.py at 1M docs). Freed by release_caches().
    # r7 (ADVICE r6): memoized per (applicationId, sf_dir) like the other
    # entry caches, so a driver calling the entry repeatedly in one
    # session pins ONE survivor-frame copy, not one per call.
    app = s.sparkContext.applicationId
    ckey = (app, d, "pretrain_clean")
    cached = _STAGE_KEYED.get(ckey)
    if cached is None:
        for stale in [k for k in _STAGE_KEYED if k[0] != app]:
            _STAGE_KEYED.pop(stale, None)
        cached = dedup.decontaminate(
            train, evalset, n=3, shingles=sh_tr
        ).persist()
        _STAGE_KEYED[ckey] = cached
        _STAGE_PERSISTS.append(cached)
    clean = cached
    gated = clean.withColumn(
        "quality", textkit.quality_score_col("text")
    ).where(F.col("quality") >= 0.3)
    reb = sampling.temperature_rebalance(gated, "lang", alpha=0.5, seed=4)
    reb = reb.withColumn(
        "row_id", F.col("doc_id") * 1024 + F.col("copy")
    ).withColumn("split", textkit.split_assign_col("row_id"))
    tr = reb.where(F.col("split") == "train")
    packed = packing.pack_assignments(
        tr, budget=128, id_col="row_id",
        tokens_col=textkit.token_count_col("text"),
    )
    # packed.doc_id IS row_id (pack_assignments aliases its id input)
    return packed.select(
        F.expr("doc_id div 1024").alias("doc_id"),
        (F.col("doc_id") % 1024).alias("copy"),
        "n_tokens", "seq_start", "pack_id", "pack_offset", "n_packs",
    )


# DuckDB twins of textkit token/stopword/quality expressions (shared by
# the composed-pipeline and cc-best oracles)
_NT_EXPR = (
    "CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(string_split_regex(trim(text), '\\s+')) END"
)
_SW_EXPR = (
    "len(list_filter(string_split_regex(trim(text), '\\s+'),"
    " x -> list_contains(['the','a','of','and','to'], x)))"
)
_Q_EXPR = (
    f"round(0.5 * least(1.0, ({_NT_EXPR}) / 64.0) + 0.5 * least(1.0,"
    f" 4.0 * (CASE WHEN ({_NT_EXPR}) > 0 THEN CAST(({_SW_EXPR}) AS DOUBLE)"
    f" / ({_NT_EXPR}) ELSE 0.0 END)), 6)"
)


def _dedup_cc_best_oracle() -> str:
    cc = cluster.connected_components_sql(_verified_pairs_oracle())
    return (
        f"WITH cc AS MATERIALIZED ({cc}),\n"
        f"q AS MATERIALIZED (SELECT doc_id, {_Q_EXPR} AS quality"
        " FROM documents),\n"
        "m AS (SELECT q.doc_id, q.quality, cc.component_id"
        " FROM q JOIN cc USING (doc_id)),\n"
        "win AS (SELECT component_id, doc_id AS w FROM (SELECT *,"
        " row_number() OVER (PARTITION BY component_id"
        " ORDER BY quality DESC, doc_id ASC) AS rk FROM m) WHERE rk = 1),\n"
        "dropped AS (SELECT m.doc_id FROM m JOIN win USING (component_id)"
        " WHERE m.doc_id <> win.w)\n"
        "SELECT doc_id, quality FROM q"
        " WHERE doc_id NOT IN (SELECT doc_id FROM dropped)"
    )


def _pipeline_pretrain_oracle() -> str:
    cc = cluster.connected_components_sql(_verified_pairs_oracle())
    contam = dedup.contamination_sql(
        n=3, table="surv", eval_pred="doc_id % 50 = 7"
    )
    nt_expr = _NT_EXPR
    q_expr = _Q_EXPR
    reb = sampling.temperature_rebalance_sql("gated", "lang", 0.5, seed=4)
    pack = packing.pack_assignments_sql("SELECT row_id AS doc_id, nt FROM tr", 128)
    split_case = textkit.split_assign_sql("row_id")
    # every stage CTE is MATERIALIZED: DuckDB otherwise inlines a CTE once
    # per reference, and this chain references each stage 2-3x downstream —
    # the compounded re-evaluation goes exponential (stage walls measured
    # doubling per CTE until the un-hinted query no longer terminated).
    return (
        f"WITH cc AS MATERIALIZED ({cc}),\n"
        "dropped AS MATERIALIZED"
        " (SELECT doc_id FROM cc WHERE doc_id <> component_id),\n"
        "surv AS MATERIALIZED (SELECT * FROM documents"
        " WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),\n"
        f"contam AS MATERIALIZED (SELECT doc_id FROM ({contam})),\n"
        "clean AS MATERIALIZED (SELECT * FROM surv WHERE doc_id % 50 <> 7"
        " AND doc_id NOT IN (SELECT doc_id FROM contam)),\n"
        f"gated AS MATERIALIZED (SELECT doc_id, lang, text, {nt_expr} AS nt"
        f" FROM clean WHERE {q_expr} >= 0.3),\n"
        f"reb AS MATERIALIZED ({reb}),\n"
        "wid AS MATERIALIZED"
        " (SELECT *, doc_id * 1024 + copy AS row_id FROM reb),\n"
        f"tr AS MATERIALIZED (SELECT * FROM wid"
        f" WHERE ({split_case}) = 'train'),\n"
        f"packed AS MATERIALIZED ({pack})\n"
        "SELECT doc_id // 1024 AS doc_id, doc_id % 1024 AS copy, n_tokens,"
        " seq_start, pack_id, pack_offset, n_packs FROM packed"
    )


def _pipeline_near_dedup(
    s: SparkSession, d: str, portable: bool = True
) -> DataFrame:
    """LSH candidates ∩ exact-Jaccard-verified pairs -> drop doc_b (the
    larger id), keep survivors passing the quality gate. Returns
    (doc_id, n_tokens, quality). portable=False swaps the md5-derived
    minhash base for the xxhash64 production kernel (pinned against a
    Python reference in tests/test_round5_fixes.py); the verify stage is
    hash-free exact Jaccard either way, so only the CANDIDATE set can
    differ between the twins."""
    docs = _docs(s, d)
    # the tokenize+shingle explode is the pipelines' cost floor — built
    # ONCE inside _verified_pairs via the persisted memoized shingle frame
    # (VERDICT r3 #3); verify runs ONLY on candidates, so work scales with
    # |candidates|, not the full co-shingled pair space.
    ver = _verified_pairs(s, d, portable=portable)
    drop = ver.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = docs.join(drop, "doc_id", "left_anti")
    return kept.select(
        "doc_id",
        textkit.token_count_col("text"),
        textkit.quality_score_col("text"),
    ).where(F.col("quality") >= 0.3)


def _pipeline_near_dedup_oracle() -> str:
    return (
        "WITH cand AS (SELECT doc_a, doc_b FROM "
        f"({_minhash_lsh_oracle(num_hashes=64, bands=16)})),\n"
        "ver AS (SELECT doc_a, doc_b FROM "
        f"({_ngram_jaccard_oracle()})),\n"
        "dropped AS (SELECT DISTINCT v.doc_b AS doc_id\n"
        "  FROM cand c JOIN ver v ON c.doc_a = v.doc_a AND c.doc_b = v.doc_b),\n"
        "kept AS (SELECT d.doc_id, d.text FROM documents d\n"
        "  WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)),\n"
        "t AS (SELECT doc_id,\n"
        "  CASE WHEN trim(text) = '' THEN 0"
        "    ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,\n"
        "  len(list_filter(string_split_regex(trim(text), '\\s+'),"
        "    x -> list_contains(['the','a','of','and','to'], x))) AS sw\n"
        "  FROM kept)\n"
        "SELECT doc_id, nt AS n_tokens,\n"
        "  round(0.5 * least(1.0, nt / 64.0) + 0.5 * least(1.0,"
        "    4.0 * (CASE WHEN nt > 0 THEN CAST(sw AS DOUBLE) / nt"
        "           ELSE 0.0 END)), 6) AS quality\n"
        "FROM t WHERE round(0.5 * least(1.0, nt / 64.0) + 0.5 * least(1.0,"
        "    4.0 * (CASE WHEN nt > 0 THEN CAST(sw AS DOUBLE) / nt"
        "           ELSE 0.0 END)), 6) >= 0.3"
    )


def _politeness_schedule(s: SparkSession, d: str) -> DataFrame:
    """Deterministic candidate frontier from `documents` (40% of rows on
    one hot host — the .com skew) through the skew-mitigated rank +
    fetch-time assignment. No robots rules => every host gets the default
    3.0 s crawl delay (politeness.DEFAULT_CRAWL_DELAY_S), which the oracle
    hardcodes."""
    from cdx_toolkit_spark.frontier import politeness
    from cdx_toolkit_spark.frontier.scheduler import prepare

    docs = _docs(s, d)
    host = F.when(
        F.col("doc_id") % 5 < 2, F.lit("hot.example.com")
    ).otherwise(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org"),
        )
    )
    cand = docs.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.lit(0).alias("priority"),
        F.col("doc_id").alias("discovered_ts"),
    )
    robots = s.createDataFrame(
        [], "host string, crawl_delay_s double, disallow_prefixes array<string>"
    )
    polite = politeness.attach_robots(prepare(cand), robots)
    sched = politeness.assign_fetch_times(
        polite.drop("next_attempt_ts"), None, mitigate_skew=True
    )
    return sched.select(
        "url",
        "host",
        F.col("host_rank").cast("int").alias("host_rank"),
        F.round("fetch_time", 6).alias("fetch_time"),
        F.floor(F.col("fetch_time") / 60.0).cast("int").alias("batch"),
    )


def _politeness_schedule_oracle() -> str:
    return (
        "WITH c AS (SELECT doc_id,\n"
        "  CASE WHEN doc_id % 5 < 2 THEN 'hot.example.com'\n"
        "    ELSE 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' END"
        "  AS host\n"
        "  FROM documents),\n"
        "r AS (SELECT 'https://' || host || '/p/' || CAST(doc_id AS VARCHAR)"
        "  AS url, host,\n"
        "  CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) - 1"
        "    AS INT) AS host_rank\n"
        "  FROM c)\n"
        "SELECT url, host, host_rank,\n"
        # CAST: DuckDB parses the 3.0 literal as DECIMAL and would return
        # DECIMAL fetch_times that hash differently from Spark doubles
        "  CAST(round(host_rank * 3.0, 6) AS DOUBLE) AS fetch_time,\n"
        "  CAST(floor(host_rank * 3.0 / 60.0) AS INT) AS batch\n"
        "FROM r"
    )


def _retry_classify(s: SparkSession, d: str) -> DataFrame:
    """Deterministic fetch-outcome table from `documents` spanning every
    retry category (retryable statuses, hard 404s, connection/timeout/
    chunked errors, DNS on seen and unseen hosts, counters at the warn and
    give-up thresholds), classified by scheduler.classify_failures."""
    from cdx_toolkit_spark.frontier.scheduler import classify_failures

    docs = _docs(s, d)
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 23).cast("string"), F.lit(".example.net")
    )
    sched = docs.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        host.alias("host"),
        (F.col("doc_id") % 3).cast("int").alias("priority"),
        (F.lit(1000) + F.col("doc_id")).alias("discovered_ts"),
        (F.col("doc_id") % 4).cast("int").alias("retries"),
        F.lit(0.0).alias("next_attempt_ts"),
        (F.col("doc_id") % 120).cast("int").alias("conn_errors"),
        (F.lit(1.0) + (F.col("doc_id") % 5)).alias("crawl_delay_s"),
        (F.col("doc_id") * 1.5).alias("fetch_time"),
    )
    status = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(503))
        .when(F.col("doc_id") % 7 == 1, F.lit(429))
        .when(F.col("doc_id") % 7 == 2, F.lit(404))
        .when(F.col("doc_id") % 7 == 3, F.lit(200))
        .otherwise(F.lit(0))
    )
    error = (
        F.when(F.col("doc_id") % 7 == 4, F.lit("connection"))
        .when(F.col("doc_id") % 7 == 5, F.lit("timeout"))
        .when(F.col("doc_id") % 7 == 6, F.lit("dns"))
        .otherwise(F.lit(None).cast("string"))
    )
    results = docs.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        status.alias("status"),
        error.alias("error"),
    )
    seen_hosts = docs.select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 23).cast("string"),
            F.lit(".example.net"),
        ).alias("host")
    ).where(F.col("doc_id") % 23 < 8).distinct()
    out = classify_failures(sched, results, seen_hosts=seen_hosts)
    return out.select(
        "url", "host", "category", "retries", "conn_errors",
        F.round("next_attempt_ts", 6).alias("next_attempt_ts"), "warned",
    )


def _retry_classify_oracle() -> str:
    return (
        "WITH s AS (SELECT doc_id,\n"
        "  'h' || CAST(doc_id % 23 AS VARCHAR) || '.example.net' AS host,\n"
        "  CAST(doc_id % 4 AS INT) AS retries,\n"
        "  CAST(doc_id % 120 AS INT) AS conn_errors0,\n"
        "  CAST(1.0 + (doc_id % 5) AS DOUBLE) AS crawl_delay_s,\n"
        "  CAST(doc_id * 1.5 AS DOUBLE) AS fetch_time,\n"
        "  CASE doc_id % 7 WHEN 0 THEN 503 WHEN 1 THEN 429 WHEN 2 THEN 404"
        "    WHEN 3 THEN 200 ELSE 0 END AS status,\n"
        "  CASE doc_id % 7 WHEN 4 THEN 'connection' WHEN 5 THEN 'timeout'"
        "    WHEN 6 THEN 'dns' ELSE NULL END AS error\n"
        "  FROM documents),\n"
        "t AS (SELECT *,\n"
        "  'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url,\n"
        "  (error IS NOT NULL) AS is_conn,\n"
        "  (error = 'dns' AND doc_id % 23 >= 8) AS dns_fatal,\n"
        "  CASE WHEN error IS NOT NULL THEN conn_errors0 + 1"
        "    ELSE conn_errors0 END AS conn_errors,\n"
        "  (error IS NULL AND status IN (429,500,502,503,504,509))"
        "    AS retryable\n"
        "  FROM s),\n"
        "c AS (SELECT *,\n"
        "  CASE WHEN dns_fatal THEN 'drop_dns_fatal'\n"
        "    WHEN is_conn AND conn_errors > 100 THEN 'drop_give_up'\n"
        "    WHEN is_conn THEN 'retry_conn'\n"
        "    WHEN retryable THEN 'retry_status'\n"
        "    ELSE 'drop' END AS category\n"
        "  FROM t WHERE error IS NOT NULL OR status >= 400"
        "    OR status IN (429,500,502,503,504,509))\n"
        "SELECT url, host, category,\n"
        "  CASE WHEN category = 'retry_status' THEN retries + 1"
        "    ELSE retries END AS retries,\n"
        "  conn_errors,\n"
        "  CAST(round(CASE WHEN category = 'retry_status' THEN fetch_time +"
        "    least(2.0 * crawl_delay_s * power(2.0, retries), 60.0)\n"
        "    WHEN category = 'retry_conn' THEN fetch_time + 60.0"
        "    ELSE NULL END, 6) AS DOUBLE) AS next_attempt_ts,\n"
        "  (is_conn AND conn_errors > 10) AS warned\n"
        "FROM c"
    )


def _warc_ingest(s: SparkSession, d: str) -> DataFrame:
    """S-7/F-11/F-12 end-to-end: build (once) a deterministic multi-segment
    gzip WARC fixture derived from `documents` via the real segmented sink
    (S-9), ingest it with read_warc, and emit per-record parsed fields. The
    oracle reconstructs every field arithmetically from `documents`, and
    digest_ok re-verifies the CC sha1:B32 payload digest written into the
    headers — the digest kernel is checked end-to-end, not just golden."""
    from cdx_toolkit_spark.textkit import digest_b32_col, text_from_html_udf

    fx = warcmod.ensure_warc_fixture(s, d)
    recs = warcmod.read_warc(s, f"{fx}/*.warc.gz").where(
        F.col("warc_type").isin("response", "revisit")
    )
    return recs.select(
        F.regexp_extract("record_id", r"(\d{12})>$", 1).cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
        F.col("warc_type"),
        F.col("http_status"),
        F.length("payload").cast("long").alias("n_payload_bytes"),
        text_from_html_udf(F.col("payload")).alias("text"),
        (
            F.col("payload_digest")
            == F.concat(F.lit("sha1:"), digest_b32_col(F.col("payload")))
        ).alias("digest_ok"),
    )


def _warc_ingest_oracle() -> str:
    """Arithmetic reconstruction of the WARC fixture's parsed fields from
    `documents` (same doc_id arithmetic as cdx_view / synth_warc_records)."""
    from cdx_toolkit_spark.cdx_view import _MIME, _STATUS, _TS, _URL

    iso = (
        f"(substring({_TS},1,4) || '-' || substring({_TS},5,2) || '-' || "
        f"substring({_TS},7,2) || 'T' || substring({_TS},9,2) || ':' || "
        f"substring({_TS},11,2) || ':' || substring({_TS},13,2) || 'Z')"
    )
    rev = f"({_MIME} = 'warc/revisit')"
    return (
        "SELECT doc_id,\n"
        f"  {_URL} AS url,\n"
        f"  {iso} AS warc_date,\n"
        f"  CASE WHEN {rev} THEN 'revisit' ELSE 'response' END AS warc_type,\n"
        f"  CASE WHEN {rev} THEN CAST(NULL AS INT) "
        f"ELSE CAST({_STATUS} AS INT) END AS http_status,\n"
        f"  CASE WHEN {rev} THEN CAST(0 AS BIGINT) "
        "ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS n_payload_bytes,\n"
        f"  CASE WHEN {rev} THEN '' ELSE text END AS text,\n"
        "  TRUE AS digest_ok\n"
        "FROM documents"
    )


def _robots_parse(s: SparkSession, d: str) -> DataFrame:
    """J-2 upstream: derive the politeness rules table from robots.txt
    BODIES (north_star: "token-bucket crawl-delay from robots.txt"). The
    synthetic bodies exercise: non-* groups that must not leak, comments,
    empty Disallow lines, hosts without a `User-agent: *` group (defaults),
    and per-host Crawl-delay values."""
    from cdx_toolkit_spark.cdx_view import _HOST_ID
    from cdx_toolkit_spark.frontier.robots import parse_robots

    hosts = _docs(s, d).selectExpr(f"{_HOST_ID} AS hid").distinct()
    hid = F.col("hid")
    delay_str = F.element_at(
        F.array(F.lit("0.55"), F.lit("1"), F.lit("3"), F.lit("6")),
        (hid % 4 + 1).cast("int"),
    )
    star_group = F.concat(
        F.lit("User-agent: *\nCrawl-delay: "), delay_str,
        F.lit("\nDisallow: /private/"), hid.cast("string"),
        F.lit("\n# crawler notes\nDisallow: /tmp\nDisallow:\n"),
    )
    bodies = hosts.select(
        hid,
        F.concat(F.lit("example"), hid.cast("string"), F.lit(".com")).alias("host"),
        F.concat(
            F.lit("User-agent: fancybot\nDisallow: /secret\nCrawl-delay: 9\n\n"),
            F.when(hid % 5 == 0, F.lit("")).otherwise(star_group),
        ).alias("body"),
    )
    rules = parse_robots(bodies.select("host", "body"))
    return rules.select(
        "host",
        "crawl_delay_s",
        F.array_join("disallow_prefixes", ",").alias("disallow_csv"),
    )


def _robots_parse_oracle() -> str:
    from cdx_toolkit_spark.cdx_view import _HOST_ID

    return (
        f"WITH h AS (SELECT DISTINCT {_HOST_ID} AS hid FROM documents)\n"
        "SELECT 'example' || CAST(hid AS VARCHAR) || '.com' AS host,\n"
        "  CAST(CASE WHEN hid % 5 = 0 THEN 3.0 ELSE "
        "(CASE hid % 4 WHEN 0 THEN 0.55 WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 "
        "ELSE 6.0 END) END AS DOUBLE) AS crawl_delay_s,\n"
        "  CASE WHEN hid % 5 = 0 THEN '' ELSE "
        "'/private/' || CAST(hid AS VARCHAR) || ',/tmp' END AS disallow_csv\n"
        "FROM h"
    )


def _wb_reconstruct(s: SparkSession, d: str) -> DataFrame:
    """S-8 wayback replay reconstruction (reference fake_wb_warc,
    warc.py:34-97): a synthetic wayback playback (302-vivified redirects,
    x-archive-orig-* wrapped headers, wayback Location) is derived from
    `documents`, then the render kernels reconstruct the ORIGINAL response:
    status restored, originals unwrapped, wayback headers marked
    X-Archive-*, Location rewritten (F-9), WARC-Date from the archived
    http Date."""
    from cdx_toolkit_spark.cdx_view import _MIME, _REDIRECT, _STATUS, _TS, _URL
    from cdx_toolkit_spark.render import (
        http_date_to_iso_col,
        wb_response_headers_col,
        wb_status_line_col,
    )

    http_date = (
        f"(date_format(make_date(CAST(substring({_TS},1,4) AS INT), "
        f"CAST(substring({_TS},5,2) AS INT), CAST(substring({_TS},7,2) AS INT)), "
        "'EEE, dd MMM yyyy') || ' ' || "
        f"substring({_TS},9,2) || ':' || substring({_TS},11,2) || ':' || "
        f"substring({_TS},13,2) || ' GMT')"
    )
    playback = _docs(s, d).selectExpr(
        "doc_id",
        f"{_URL} AS url",
        f"('https://web.archive.org/web/' || {_TS} || 'id_/' || {_URL}) AS wb_url",
        f"CASE WHEN {_STATUS} = '301' THEN 302 "
        f"WHEN {_STATUS} = '404' THEN 404 ELSE 200 END AS status_code",
        f"CASE WHEN {_STATUS} = '301' THEN 'Found' "
        f"WHEN {_STATUS} = '404' THEN 'Not Found' ELSE 'OK' END AS reason",
        f"{_STATUS} AS capture_status",
        "concat("
        f"  array(named_struct('k', 'Content-Type', 'v', {_MIME}),"
        f"        named_struct('k', 'X-Archive-Orig-Date', 'v', {http_date}),"
        "        named_struct('k', 'Server', 'v', 'nginx/1.21')),"
        f"  CASE WHEN {_REDIRECT} IS NOT NULL THEN "
        "    array(named_struct('k', 'Location', 'v',"
        f"      'https://web.archive.org/web/' || {_TS} || 'id_/' || {_REDIRECT}))"
        "  ELSE array() END"
        ") AS headers",
    )
    hdrs = wb_response_headers_col("headers")
    orig_date = F.element_at(
        F.filter(
            F.col("headers"),
            lambda h: F.lower(h["k"]).startswith("x-archive-orig-date"),
        ),
        1,
    )["v"]
    return playback.select(
        "doc_id",
        "url",
        F.col("wb_url").alias("warc_source_uri"),
        wb_status_line_col("status_code", "reason", "capture_status").alias(
            "status_line"
        ),
        http_date_to_iso_col(orig_date).alias("warc_date"),
        F.array_join(
            F.transform(hdrs, lambda h: F.concat(h["k"], F.lit(": "), h["v"])),
            " | ",
        ).alias("headers_str"),
    )


def _wb_reconstruct_oracle() -> str:
    from cdx_toolkit_spark.cdx_view import _MIME, _REDIRECT, _STATUS, _TS, _URL

    iso = (
        f"(substring({_TS},1,4) || '-' || substring({_TS},5,2) || '-' || "
        f"substring({_TS},7,2) || 'T' || substring({_TS},9,2) || ':' || "
        f"substring({_TS},11,2) || ':' || substring({_TS},13,2) || 'Z')"
    )
    http_date = (
        f"(strftime(make_date(CAST(substring({_TS},1,4) AS INT), "
        f"CAST(substring({_TS},5,2) AS INT), CAST(substring({_TS},7,2) AS INT)), "
        "'%a, %d %b %Y') || ' ' || "
        f"substring({_TS},9,2) || ':' || substring({_TS},11,2) || ':' || "
        f"substring({_TS},13,2) || ' GMT')"
    )
    return (
        "SELECT doc_id,\n"
        f"  {_URL} AS url,\n"
        f"  ('https://web.archive.org/web/' || {_TS} || 'id_/' || {_URL})"
        " AS warc_source_uri,\n"
        f"  CASE WHEN {_STATUS} = '301' THEN '301 Moved Permanently' "
        f"WHEN {_STATUS} = '404' THEN '404 Not Found' "
        "ELSE '200 OK' END AS status_line,\n"
        f"  {iso} AS warc_date,\n"
        f"  ('Content-Type: ' || {_MIME} || ' | Date: ' || {http_date} || "
        "' | X-Archive-Server: nginx/1.21' || "
        f"CASE WHEN {_REDIRECT} IS NOT NULL "
        f"THEN ' | Location: ' || {_REDIRECT} ELSE '' END) AS headers_str\n"
        "FROM documents"
    )


def _ngram_jaccard_oracle() -> str:
    """DuckDB twin of dedup.ngram_jaccard_pairs(n=3, 8/10, max_doc_freq=100)
    — shared by the standalone entry and the near-dedup pipeline oracle."""
    return (
        "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws"
        "  FROM documents),\n"
        "sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s\n"
        "  FROM w, unnest(generate_series(1, len(ws)-2)) AS g(i) WHERE len(ws) >= 3),\n"
        "sh AS (SELECT doc_id, s FROM sh0 WHERE s IN (\n"
        "  SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100)),\n"
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),\n"
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter\n"
        "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)\n"
        "SELECT doc_a, doc_b, n_inter, sa.n + sb.n - n_inter AS n_union\n"
        "FROM inter JOIN sizes sa ON doc_a = sa.doc_id "
        "JOIN sizes sb ON doc_b = sb.doc_id\n"
        "WHERE 10 * n_inter >= 8 * (sa.n + sb.n - n_inter)"
    )


def _minhash_lsh_oracle(num_hashes: int = 64, bands: int = 16) -> str:
    """DuckDB twin of dedup.minhash_lsh_pairs(portable=True): identical
    shingling, one md5-derived 32-bit hash per shingle + the affine rehash
    family (all < 2^62, overflow-free), md5 band keys, bucket join."""
    from cdx_toolkit_spark.dedup import MERSENNE31, affine_consts, hash64_sql

    rpb = num_hashes // bands
    h32 = f"(({hash64_sql('s', 0)}) & 4294967295)"
    mins = ",\n    ".join(
        f"min((h * {a} + {b}) % {MERSENNE31}) AS mh_{j}"
        for j, (a, b) in enumerate(affine_consts(num_hashes))
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws(','"
        + "".join(
            f", CAST(mh_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
        )
        + ")) AS sig FROM sig"
        for b in range(bands)
    )
    return (
        "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws"
        "  FROM documents),\n"
        "sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s\n"
        "  FROM w, unnest(generate_series(1, len(ws)-2)) AS g(i) WHERE len(ws) >= 3),\n"
        f"sh2 AS (SELECT doc_id, {h32} AS h FROM sh),\n"
        f"sig AS (SELECT doc_id,\n    {mins}\n  FROM sh2 GROUP BY doc_id),\n"
        f"b AS (\n{band_selects}\n)\n"
        "SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b\n"
        "FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig"
        " AND a.doc_id < b2.doc_id"
    )


def _simhash_oracle(max_hamming: int = 3) -> str:
    """DuckDB twin of dedup.simhash_pairs(portable=True): md5-derived token
    hashes, 64 bit-vote sums, pigeonhole 16-bit chunk join, bit_count(xor)
    verify. Bit 63 is assembled as an additive -2^63 (DuckDB raises on
    1<<63 overflow; Spark's shiftleft wraps to the same value)."""
    h = dedup.hash64_sql("tok", 0)
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(64)
    )
    bits = " | ".join(
        [f"(CASE WHEN v_{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)"
         for i in range(63)]
        + ["(CASE WHEN v_63 > 0 THEN CAST(-9223372036854775808 AS BIGINT)"
           " ELSE 0 END)"]
    )
    chunks = max_hamming + 1
    return (
        "WITH w AS (SELECT doc_id,"
        "  unnest(string_split_regex(trim(text), '\\s+')) AS tok"
        "  FROM documents),\n"
        f"t AS (SELECT doc_id, {h} AS h FROM w WHERE tok <> ''),\n"
        f"v AS (SELECT doc_id,\n    {votes}\n  FROM t GROUP BY doc_id),\n"
        f"s AS (SELECT doc_id, ({bits}) AS simhash FROM v),\n"
        "b AS (SELECT doc_id, simhash, c AS chunk,"
        "  (simhash >> (c * 16)) & 65535 AS key"
        f"  FROM s, unnest(generate_series(0, {chunks - 1})) AS u(c))\n"
        "SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,\n"
        "  bit_count(xor(a.simhash, b2.simhash)) AS hamming\n"
        "FROM b a JOIN b b2 ON a.chunk = b2.chunk AND a.key = b2.key"
        " AND a.doc_id < b2.doc_id\n"
        f"WHERE bit_count(xor(a.simhash, b2.simhash)) <= {max_hamming}"
    )


def _ann_lsh_oracle(k: int = 5, n_planes: int = 10, seed: int = 42,
                    dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_topk: the fixed-seed hyperplanes are
    embedded as float literals (repr round-trips exactly), bucket = sum of
    sign bits, exact cosine re-rank within buckets."""
    from cdx_toolkit_spark.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    plane_terms = []
    for j in range(n_planes):
        dot = " + ".join(
            f"v[{i + 1}]*{planes[i, j]!r}" for i in range(dim)
        )
        plane_terms.append(
            f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(plane_terms)
    return (
        "WITH e AS (SELECT vec_id,"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "  FROM embeddings),\n"
        "s AS (SELECT vec_id, v,"
        "  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,\n"
        f"  ({bucket}) AS bucket\n  FROM e),\n"
        "p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,\n"
        "  list_sum(list_transform(generate_series(1, len(a.v)),"
        "    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cosine\n"
        "  FROM s a JOIN s b ON a.bucket = b.bucket"
        "  AND a.vec_id <> b.vec_id)\n"
        "SELECT query_id, neighbor_id, rank FROM ("
        "  SELECT query_id, neighbor_id, row_number() OVER ("
        "    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id"
        f"  ) AS rank FROM p) t WHERE rank <= {k}"
    )


def _ann_query_set(s: SparkSession, d: str) -> DataFrame:
    """Deterministic external query set for the ANN queries=-mode entries:
    every 7th corpus vector, re-idded (+100000) so query and corpus ids
    are disjoint (the scorer's equal-id mask never fires; each query's
    rank-1 hit is its own source row at cosine 1.0)."""
    return (
        _emb(s, d)
        .where(F.col("vec_id") % 7 == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )


def _ann_lsh_queries_oracle(k: int = 5, n_planes: int = 10, seed: int = 42,
                            dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_topk(queries=_ann_query_set(...)):
    the query table derives from the same corpus CTE (identical vectors =>
    identical buckets/norms), pairs are query-bucket x corpus-bucket."""
    from cdx_toolkit_spark.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    plane_terms = []
    for j in range(n_planes):
        dot = " + ".join(
            f"v[{i + 1}]*{planes[i, j]!r}" for i in range(dim)
        )
        plane_terms.append(
            f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(plane_terms)
    return (
        "WITH e AS (SELECT vec_id,"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "  FROM embeddings),\n"
        "s AS (SELECT vec_id, v,"
        "  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,\n"
        f"  ({bucket}) AS bucket\n  FROM e),\n"
        "q AS (SELECT vec_id + 100000 AS vec_id, v, nrm, bucket FROM s"
        "  WHERE vec_id % 7 = 0),\n"
        "p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,\n"
        "  list_sum(list_transform(generate_series(1, len(a.v)),"
        "    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cosine\n"
        "  FROM q a JOIN s b ON a.bucket = b.bucket)\n"
        "SELECT query_id, neighbor_id, rank FROM ("
        "  SELECT query_id, neighbor_id, row_number() OVER ("
        "    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id"
        f"  ) AS rank FROM p) t WHERE rank <= {k}"
    )


def _ann_ivf_queries_oracle(k: int = 5, nlist: int = 64,
                            nprobe: int = 8) -> str:
    """DuckDB twin of similarity.ivf_topk(queries=_ann_query_set(...)):
    corpus lists from the hashed-sample centroid rule (crank=1 membership
    only), query probe lists from the same centroid cosine ranking; ids
    are disjoint so no self filter is needed."""
    return (
        "WITH e AS (SELECT vec_id,"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "  FROM embeddings),\n"
        "n AS (SELECT vec_id, v, CASE WHEN"
        "  sqrt(list_sum(list_transform(v, x -> x * x))) = 0 THEN 1.0"
        "  ELSE sqrt(list_sum(list_transform(v, x -> x * x))) END AS nrm"
        "  FROM e),\n"
        "cents AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm FROM n\n"
        "  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296,"
        f"  vec_id LIMIT {nlist}),\n"
        "ranked AS (SELECT *, row_number() OVER ("
        "  PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crank FROM (\n"
        "  SELECT n.vec_id, n.v, n.nrm, c.cid,\n"
        "    list_sum(list_transform(generate_series(1, len(n.v)),"
        "      i -> n.v[i] * c.cvec[i])) / (n.nrm * c.cnrm) AS ccos\n"
        "  FROM n, cents c)),\n"
        "assign AS (SELECT vec_id AS n_id, v AS n_vec, nrm AS n_nrm,"
        "  cid AS list_id FROM ranked WHERE crank = 1),\n"
        "q AS (SELECT vec_id + 100000 AS q_id, v AS q_vec, nrm AS q_nrm"
        "  FROM n WHERE vec_id % 7 = 0),\n"
        "qranked AS (SELECT *, row_number() OVER ("
        "  PARTITION BY q_id ORDER BY ccos DESC, cid) AS crank FROM (\n"
        "  SELECT q.q_id, q.q_vec, q.q_nrm, c.cid,\n"
        "    list_sum(list_transform(generate_series(1, len(q.q_vec)),"
        "      i -> q.q_vec[i] * c.cvec[i])) / (q.q_nrm * c.cnrm) AS ccos\n"
        "  FROM q, cents c)),\n"
        "probes AS (SELECT q_id, q_vec, q_nrm, cid AS list_id FROM qranked"
        f"  WHERE crank <= {nprobe}),\n"
        "p AS (SELECT q_id, n_id,\n"
        "  list_sum(list_transform(generate_series(1, len(q_vec)),"
        "    i -> q_vec[i] * n_vec[i])) / (q_nrm * n_nrm) AS cosine\n"
        "  FROM probes JOIN assign USING (list_id))\n"
        "SELECT query_id, neighbor_id, rank FROM ("
        "  SELECT q_id AS query_id, n_id AS neighbor_id, row_number() OVER ("
        "    PARTITION BY q_id ORDER BY cosine DESC, n_id"
        f"  ) AS rank FROM p) t WHERE rank <= {k}"
    )


def _ann_lsh_multiseed_oracle(k: int = 5, n_planes: int = 8,
                              seeds: tuple[int, ...] = (42, 43),
                              dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_topk(seeds=...): per-seed buckets as
    literal-coefficient sign sums computed ONCE per row (CTE columns, not
    per-pair), pair qualifies when ANY seed's buckets match, exact cosine
    re-rank, top-k by (cosine DESC, neighbor_id)."""
    from cdx_toolkit_spark.similarity import _hyperplanes

    bucket_cols = []
    for si, sd in enumerate(seeds):
        planes = _hyperplanes(dim, n_planes, sd)
        terms = []
        for j in range(n_planes):
            dot = " + ".join(
                f"v[{i + 1}]*{planes[i, j]!r}" for i in range(dim)
            )
            terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
        bucket_cols.append("(" + " + ".join(terms) + f") AS b{si}")
    share = " OR ".join(f"a.b{si} = b.b{si}" for si in range(len(seeds)))
    return (
        "WITH e AS (SELECT vec_id,"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "  FROM embeddings),\n"
        "s AS (SELECT vec_id, v,"
        "  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,\n  "
        + ",\n  ".join(bucket_cols)
        + "\n  FROM e),\n"
        "p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,\n"
        "  list_sum(list_transform(generate_series(1, len(a.v)),"
        "    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cosine\n"
        f"  FROM s a JOIN s b ON ({share})"
        "  AND a.vec_id <> b.vec_id)\n"
        "SELECT query_id, neighbor_id, rank FROM ("
        "  SELECT query_id, neighbor_id, row_number() OVER ("
        "    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id"
        f"  ) AS rank FROM p) t WHERE rank <= {k}"
    )


def _bucketed_cosine_oracle(threshold: float = 0.40, n_planes: int = 6,
                            seeds: tuple[int, ...] = (42, 43),
                            dim: int = 64) -> str:
    """DuckDB twin of dedup.lsh_bucketed_cosine_pairs: per-seed hyperplane
    buckets as literal-coefficient sign sums; a pair qualifies when it shares
    a bucket under ANY seed and cosine >= threshold."""
    from cdx_toolkit_spark.similarity import _hyperplanes

    def bucket_expr(side: str, seed: int) -> str:
        planes = _hyperplanes(dim, n_planes, seed)
        terms = []
        for j in range(n_planes):
            dot = " + ".join(
                f"{side}.v[{i + 1}]*{planes[i, j]!r}" for i in range(dim)
            )
            terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
        return " + ".join(terms)

    share = " OR ".join(
        f"({bucket_expr('a', s)}) = ({bucket_expr('b', s)})" for s in seeds
    )
    return (
        "WITH e AS (SELECT vec_id,"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "  FROM embeddings),\n"
        "n AS (SELECT vec_id, v,"
        "  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)\n"
        "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,\n"
        "  round(list_sum(list_transform(generate_series(1, len(a.v)),"
        "    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cosine\n"
        "FROM n a JOIN n b ON a.vec_id < b.vec_id\n"
        "WHERE list_sum(list_transform(generate_series(1, len(a.v)),"
        f"  i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) >= {threshold}\n"
        f"  AND ({share})"
    )


def _pii_garnish(docs: DataFrame) -> DataFrame:
    """documents with a deterministic PII garnish appended by doc_id
    residue (email / dotted-quad / phone / none) — mirrored closed-form in
    _PII_GARNISH_SQL so the oracle rebuilds the identical input."""
    did = F.col("doc_id")
    g = (
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" Contact user"), did.cast("string"),
                     F.lit("@example.com.")),
        )
        .when(
            did % 7 == 3,
            F.concat(F.lit(" Host 10.0."), (did % 256).cast("string"),
                     F.lit("."), ((did * 7) % 256).cast("string"),
                     F.lit(" up.")),
        )
        .when(
            did % 7 == 5,
            F.concat(F.lit(" Call +1 555-"),
                     F.lpad((did % 10000).cast("string"), 4, "0"),
                     F.lit(".")),
        )
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat(F.col("text"), g).alias("text"))


_PII_GARNISH_SQL = (
    "SELECT doc_id, text || CASE"
    " WHEN doc_id % 7 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)"
    "   || '@example.com.'"
    " WHEN doc_id % 7 = 3 THEN ' Host 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    "   || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up.'"
    " WHEN doc_id % 7 = 5 THEN ' Call +1 555-'"
    "   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'"
    " ELSE '' END AS text FROM documents"
)


# DuckDB twin of textkit.token_count_col over documents (shared by the
# packing oracles; same expression the pipeline/text_stats oracles inline)
_NT_SQL = (
    "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt"
    " FROM documents"
)


def oracle_sql() -> dict[str, str]:
    iter_order = 'ORDER BY crawl DESC, urlkey, "timestamp", doc_id'
    asc_order = 'ORDER BY urlkey, "timestamp", doc_id'
    p0 = "starts_with(urlkey, 'com,example0)')"
    return {
        "iter_window_filter": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20170101000000' "
            "AND timestamp <= '20171231235959' AND status = '200' "
            f"{iter_order} LIMIT 50"
        ),
        "iter_to_only_defaults": _wrap(
            # to='2016' injects from = to_padded_up - 1 year = 20160101235959
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20160101235959' "
            "AND timestamp <= '20161231235959' "
            f"{asc_order} LIMIT 100"
        ),
        "get_closest": _wrap(
            # closest=20170601 -> window = closest -/+ 90 days
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20170303000000' "
            "AND timestamp <= '20170830000000' "
            f"ORDER BY abs({_TS_EPOCH} - {_EPOCH_20170601}), timestamp, doc_id "
            "LIMIT 10"
        ),
        "match_domain_contains": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            "WHERE (starts_with(urlkey, 'com,example4)') "
            "OR starts_with(urlkey, 'com,example4,')) "
            "AND timestamp >= '20150101000000' AND timestamp <= '20181231235959' "
            "AND mime LIKE '%pdf%' "
            f"{asc_order}"
        ),
        "filter_regex": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20150101000000' "
            "AND timestamp <= '20181231235959' "
            "AND regexp_full_match(mime, '(?:text/.*)') "
            f"{asc_order} LIMIT 200"
        ),
        "filter_not_and": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20150101000000' "
            "AND timestamp <= '20181231235959' "
            "AND status <> '200' AND status <> '404' "
            f"{asc_order}"
        ),
        "ia_dialect_filter": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20150101000000' "
            "AND timestamp <= '20181231235959' "
            "AND regexp_full_match(status, '(?:200)') "
            f"{asc_order} LIMIT 100"
        ),
        "match_exact_url": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            "WHERE urlkey = 'com,example0)/page/0?id=0' "
            "AND timestamp >= '20150101000000' AND timestamp <= '20181231235959' "
            f"{asc_order}"
        ),
        "collapse_urlkey": _wrap(
            f"SELECT {_CDX_COLS} FROM ("
            f"  SELECT *, row_number() OVER ("
            '    PARTITION BY urlkey ORDER BY "timestamp", doc_id) AS rn'
            f"  FROM cdx WHERE {p0} "
            "  AND timestamp >= '20150101000000' AND timestamp <= '20181231235959'"
            ") t WHERE rn = 1"
        ),
        "closest_per_urlkey": _wrap(
            f"SELECT {_CDX_COLS} FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY urlkey ORDER BY "
            f"    abs({_TS_EPOCH} - {_EPOCH_20170601}), timestamp, doc_id"
            "  ) AS rn"
            f"  FROM cdx WHERE {p0} "
            "  AND timestamp >= '20170303000000' AND timestamp <= '20170830000000'"
            ") t WHERE rn = 1"
        ),
        "size_estimate": _wrap(
            "SELECT count(*) AS n_captures, count(DISTINCT urlkey) AS n_urls "
            f"FROM cdx WHERE {p0} "
            "AND timestamp >= '20150101000000' AND timestamp <= '20181231235959'"
        ),
        "revisits": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20150101000000' "
            "AND timestamp <= '20181231235959' AND mime = 'warc/revisit'"
        ),
        "crawl_name_select": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND crawl IN ('CC-MAIN-2017-26', 'CC-MAIN-2017-52') "
            f"{asc_order}"
        ),
        "crawl_last_n": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND crawl IN ('CC-MAIN-2018-26', 'CC-MAIN-2018-52') "
            f"{asc_order}"
        ),
        "fields_projection": _wrap(
            'SELECT url, status, "timestamp" FROM ('
            f"  SELECT * FROM cdx WHERE {p0} "
            "  AND timestamp >= '20150101000000' AND timestamp <= '20181231235959' "
            f"  {iter_order} LIMIT 25"
            ") t"
        ),
        "kv_render": _wrap(
            "SELECT 'url: ' || url || '  status: ' || status || "
            "'  timestamp: ' || timestamp AS line FROM ("
            f"  SELECT * FROM cdx WHERE {p0} "
            "  AND timestamp >= '20150101000000' AND timestamp <= '20181231235959' "
            f"  {asc_order} LIMIT 25"
            ") t"
        ),
        # cli_iter_lines drives the SAME query through the argparse
        # surface — the result contract (and therefore the oracle) is
        # kv_render's
        "cli_iter_lines": _wrap(
            "SELECT 'url: ' || url || '  status: ' || status || "
            "'  timestamp: ' || timestamp AS line FROM ("
            f"  SELECT * FROM cdx WHERE {p0} "
            "  AND timestamp >= '20150101000000' AND timestamp <= '20181231235959' "
            f"  {asc_order} LIMIT 25"
            ") t"
        ),
        "cli_size_details": _wrap(
            "SELECT crawl, count(*) AS n_captures FROM cdx "
            f"WHERE {p0} "
            "AND timestamp >= '20150101000000' AND timestamp <= '20181231235959' "
            "GROUP BY crawl ORDER BY crawl"
        ),
        "url_fgrep": _wrap(
            f"SELECT {_CDX_COLS} FROM cdx "
            f"WHERE {p0} AND timestamp >= '20150101000000' "
            "AND timestamp <= '20181231235959' "
            "AND url LIKE '%www.%' AND url NOT LIKE '%https%'"
        ),
        "urlseen_antijoin": _wrap(
            "SELECT DISTINCT urlkey FROM cdx WHERE urlkey NOT IN ("
            "  SELECT urlkey FROM cdx WHERE doc_id % 3 = 0)"
        ),
        "dedup_exact": (
            "SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) "
            "AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies "
            "FROM documents GROUP BY 1"
        ),
        "dedup_ngram_jaccard": _ngram_jaccard_oracle(),
        "dedup_embedding_cosine": (
            "WITH e AS (SELECT vec_id,"
            "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
            "  FROM embeddings),\n"
            "n AS (SELECT vec_id, v,"
            "  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)\n"
            "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,\n"
            "  round(list_sum(list_transform(generate_series(1, len(a.v)),"
            "    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cosine\n"
            "FROM n a JOIN n b ON a.vec_id < b.vec_id\n"
            "WHERE list_sum(list_transform(generate_series(1, len(a.v)),"
            "  i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) >= 0.42"
        ),
        "dedup_cosine_bucketed": _bucketed_cosine_oracle(
            threshold=0.40, n_planes=6, seeds=(42, 43), dim=64
        ),
        "corpus_split": (
            "SELECT doc_id, " + textkit.split_assign_sql("doc_id")
            + " AS split FROM documents"
        ),
        "text_quality": (
            "WITH t AS (SELECT doc_id,"
            "  CASE WHEN trim(text) = '' THEN 0"
            "    ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,"
            "  len(list_filter(string_split_regex(trim(text), '\\s+'),"
            "    x -> list_contains(['the','a','of','and','to'], x))) AS sw,"
            "  len(regexp_extract_all(text,"
            "    '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
            "| ?[^A-Za-z0-9\\s]+|\\s+')) AS nbpe"
            "  FROM documents)\n"
            "SELECT doc_id,"
            "  round(0.5 * least(1.0, nt / 64.0) + 0.5 * least(1.0,"
            "    4.0 * (CASE WHEN nt > 0 THEN CAST(sw AS DOUBLE) / nt"
            "           ELSE 0.0 END)), 6) AS quality,"
            "  nbpe AS n_bpe_tokens "
            "FROM t"
        ),
        "text_lang_id": textkit.lang_id_sql(),
        "decontaminate_ngram": dedup.contamination_sql(n=3),
        "vocab_topk": textkit.vocab_topk_sql(k=200),
        "text_repetition": textkit.repetition_sql(),
        "fingerprint_winnow": (
            winnow.winnow_fingerprint_sql(8, 8)
            + "\nSELECT doc_id, pos, fp FROM fp"
        ),
        "fingerprint_winnow_prod": (
            winnow.winnow_fingerprint_sql(8, 8)
            + "\nSELECT doc_id, pos, fp FROM fp"
        ),
        "dedup_winnow_overlap": winnow.winnow_overlap_sql(
            8, 8, 1, 4, max_doc_freq=100
        ),
        "text_stats": (
            "WITH t AS (SELECT doc_id,"
            "  string_split_regex(trim(text), '\\s+') AS toks,"
            "  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm"
            "  FROM documents)\n"
            "SELECT doc_id,"
            "  len(toks) AS n_tokens,"
            "  len(list_filter(toks, x -> list_contains("
            "    ['the','a','of','and','to'], x))) AS n_stopwords,"
            "  CASE WHEN len(toks) > 0 AND"
            "    CAST(len(list_filter(toks, x -> list_contains("
            "      ['the','a','of','and','to'], x))) AS DOUBLE) / len(toks)"
            "      >= 0.02"
            "  THEN 'en' ELSE 'unk' END AS lang_guess,"
            "  md5(norm) AS fingerprint "
            "FROM t"
        ),
        "pipeline_clean_corpus": (
            "WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents\n"
            "  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),\n"
            "t AS (SELECT d.doc_id,\n"
            "  CASE WHEN trim(text) = '' THEN 0"
            "    ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,\n"
            "  len(list_filter(string_split_regex(trim(text), '\\s+'),"
            "    x -> list_contains(['the','a','of','and','to'], x))) AS sw,\n"
            "  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm\n"
            "  FROM documents d JOIN keep USING (doc_id)),\n"
            "q AS (SELECT doc_id, nt AS n_tokens,\n"
            "  round(0.5 * least(1.0, nt / 64.0) + 0.5 * least(1.0,"
            "    4.0 * (CASE WHEN nt > 0 THEN CAST(sw AS DOUBLE) / nt"
            "           ELSE 0.0 END)), 6) AS quality,\n"
            "  CASE WHEN nt > 0 AND CAST(sw AS DOUBLE) / nt >= 0.02"
            "    THEN 'en' ELSE 'unk' END AS lang_guess,\n"
            "  md5(norm) AS fingerprint FROM t)\n"
            "SELECT doc_id, n_tokens, quality, lang_guess, fingerprint\n"
            "FROM q WHERE quality >= 0.3"
        ),
        "ann_cosine_topk": (
            "WITH e AS (SELECT vec_id,"
            "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
            "  FROM embeddings),\n"
            "n AS (SELECT vec_id, v,"
            "  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),\n"
            "p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,\n"
            "  list_sum(list_transform(generate_series(1, len(a.v)),"
            "    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cosine\n"
            "  FROM n a, n b WHERE a.vec_id <> b.vec_id)\n"
            "SELECT query_id, neighbor_id, rank FROM ("
            "  SELECT query_id, neighbor_id, row_number() OVER ("
            "    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id"
            "  ) AS rank FROM p) t WHERE rank <= 5"
        ),
        "media_features": (
            "SELECT doc_id AS media_id,"
            "  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
            "    ELSE 'video' END AS kind,"
            "  CAST(strlen(text) AS BIGINT) AS n_bytes "
            "FROM documents"
        ),
        "media_frame_plan": (
            # synth_media: video rows are doc_id%3=2, duration = n_chars/100;
            # frame offsets 0..greatest(1, floor(duration))-1 at 1s spacing
            "SELECT doc_id AS media_id, CAST(i - 1 AS DOUBLE) AS frame_offset_s "
            "FROM documents, unnest(generate_series(1, "
            "  greatest(1, CAST(floor(n_chars / 100.0) AS BIGINT)))) AS g(i) "
            "WHERE doc_id % 3 = 2"
        ),
        "pii_redact": (
            f"WITH g AS ({_PII_GARNISH_SQL})\n"
            f"SELECT doc_id, {pii.redact_sql('text')}, "
            + ", ".join(pii.pii_count_sql("text"))
            + " FROM g"
        ),
        "sample_hash": (
            "SELECT * FROM documents WHERE "
            + sampling.sample_bucket_sql("doc_id", 1)
            + " < 250000"
        ),
        "sample_group_quota": sampling.group_quota_sample_sql(
            "documents", "lang", 40, seed=3
        ),
        "sample_temperature": (
            "SELECT doc_id, lang, copy FROM ("
            + sampling.temperature_rebalance_sql("documents", "lang", 0.5, seed=4)
            + ")"
        ),
        "pack_assignments": packing.pack_assignments_sql(_NT_SQL, 128),
        "pack_segments": packing.pack_segments_sql(_NT_SQL, 128),
        "events_daily_counts": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,"
            "  count(*) AS n_events, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY 1, 2"
        ),
        "orders_topk_per_segment": (
            "SELECT c_mktsegment, o_orderkey, rk FROM ("
            "  SELECT c.c_mktsegment, o.o_orderkey, row_number() OVER ("
            "    PARTITION BY c.c_mktsegment"
            "    ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk"
            "  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
            ") t WHERE rk <= 3"
        ),
        "warc_ingest": _warc_ingest_oracle(),
        # the warc command's selection predicates, expressed independently
        # on the URL text (the Spark side goes through SURT urlkey match)
        "cli_warc_select": (
            "SELECT doc_id, url, warc_type FROM ("
            + _warc_ingest_oracle()
            + ") t WHERE regexp_matches(url,"
            " '^https?://(www\\.)?example0\\.com/')"
            " AND url LIKE '%www.%'"
        ),
        "robots_parse": _robots_parse_oracle(),
        "wb_reconstruct": _wb_reconstruct_oracle(),
        # decoders: wire text round-trips the derived view, so the oracle is
        # the view itself (crawl re-derived from the filename path on the
        # Spark side — equal to the view's crawl by construction)
        "pywb_jsonl_decode": _wrap(
            "SELECT urlkey, \"timestamp\", url, status, mime, mime_detected, "
            "digest, length, \"offset\", filename, crawl, languages, redirect "
            "FROM cdx"
        ),
        "ia_lol_decode": _wrap(
            "SELECT urlkey, \"timestamp\", url, status, mime, digest, length "
            "FROM cdx"
        ),
        "pages_extract": _pages_extract_oracle(),
        "pipeline_near_dedup": _pipeline_near_dedup_oracle(),
        "dedup_cc_components": cluster.connected_components_sql(
            _verified_pairs_oracle()
        ),
        "pipeline_near_dedup_cc": _pipeline_near_dedup_cc_oracle(),
        "dedup_cc_best": _dedup_cc_best_oracle(),
        "pipeline_pretrain": _pipeline_pretrain_oracle(),
        "politeness_schedule": _politeness_schedule_oracle(),
        "retry_classify": _retry_classify_oracle(),
        "dedup_minhash_lsh": _minhash_lsh_oracle(num_hashes=64, bands=16),
        "dedup_simhash": _simhash_oracle(max_hamming=3),
        "ann_lsh_topk": _ann_lsh_oracle(k=5, n_planes=10, seed=42, dim=64),
        "ann_lsh_multiseed": _ann_lsh_multiseed_oracle(
            k=5, n_planes=8, seeds=(42, 43), dim=64
        ),
        "ann_lsh_queries": _ann_lsh_queries_oracle(
            k=5, n_planes=10, seed=42, dim=64
        ),
        "ann_ivf_queries": _ann_ivf_queries_oracle(k=5, nlist=64, nprobe=8),
        "ann_ivf_topk": (
            "WITH e AS (SELECT vec_id,"
            "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
            "  FROM embeddings),\n"
            "n AS (SELECT vec_id, v, CASE WHEN"
            "  sqrt(list_sum(list_transform(v, x -> x * x))) = 0 THEN 1.0"
            "  ELSE sqrt(list_sum(list_transform(v, x -> x * x))) END AS nrm"
            "  FROM e),\n"
            "cents AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm FROM n\n"
            # inner mod 2^31 keeps the product under 2^63 for any BIGINT
            # vec_id (ADVICE r2) — kept in lockstep with similarity.ivf_topk
            "  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296,"
            "  vec_id LIMIT 64),\n"
            "ranked AS (SELECT *, row_number() OVER ("
            "  PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crank FROM (\n"
            "  SELECT n.vec_id, n.v, n.nrm, c.cid,\n"
            "    list_sum(list_transform(generate_series(1, len(n.v)),"
            "      i -> n.v[i] * c.cvec[i])) / (n.nrm * c.cnrm) AS ccos\n"
            "  FROM n, cents c)),\n"
            "assign AS (SELECT vec_id AS n_id, v AS n_vec, nrm AS n_nrm,"
            "  cid AS list_id FROM ranked WHERE crank = 1),\n"
            "probes AS (SELECT vec_id AS q_id, v AS q_vec, nrm AS q_nrm,"
            "  cid AS list_id FROM ranked WHERE crank <= 8),\n"
            "p AS (SELECT q_id, n_id,\n"
            "  list_sum(list_transform(generate_series(1, len(q_vec)),"
            "    i -> q_vec[i] * n_vec[i])) / (q_nrm * n_nrm) AS cosine\n"
            "  FROM probes JOIN assign USING (list_id) WHERE q_id <> n_id)\n"
            "SELECT query_id, neighbor_id, rank FROM ("
            "  SELECT q_id AS query_id, n_id AS neighbor_id, row_number() OVER ("
            "    PARTITION BY q_id ORDER BY cosine DESC, n_id"
            "  ) AS rank FROM p) t WHERE rank <= 5"
        ),
    }
