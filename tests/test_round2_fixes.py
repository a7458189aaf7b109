"""Round-2 regression tests.

Pins the ADVICE.md r1 bug fixes (cross-block cosine pair drop, brute-force
top-k tie determinism, the streaming lost-output window) and the VERDICT.md
r1 items (portable md5-derived hashes with DuckDB twins, simhash banding
guard, plan-build without table scans, normalize_crawl wiring, CC digest
golden).
"""

import base64
import hashlib
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark import dedup, similarity
from cdx_toolkit_spark.frontier.scheduler import FrontierDrain
from cdx_toolkit_spark.query import CdxQuery
from cdx_toolkit_spark.cdx_view import cdx_captures


# ---------------------------------------------------------------------------
# portable hash: Spark kernel == DuckDB twin, bit for bit
# ---------------------------------------------------------------------------

def test_portable_hash64_matches_duckdb(spark):
    import duckdb

    vals = ["hello world", "a", "", "Ünïcødé ✓", "x" * 100, "tab\there"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    for seed in (0, 7, 63):
        got = [
            r[0]
            for r in df.select(
                dedup.hash64_col(F.col("s"), seed, portable=True)
            ).collect()
        ]
        want = [
            duckdb.sql(
                f"select {dedup.hash64_sql('s', seed)} from (select ? as s)",
                params=[v],
            ).fetchone()[0]
            for v in vals
        ]
        assert got == want


# ---------------------------------------------------------------------------
# ADVICE r1 (high): cross-block pairs must not be dropped
# ---------------------------------------------------------------------------

def _pair_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["cosine"], 9)) for r in df.collect()
    }


def test_embedding_cosine_pairs_blocking_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    single = _pair_set(dedup.embedding_cosine_pairs(
        emb, threshold=0.40, block_rows=100_000))
    multi = _pair_set(dedup.embedding_cosine_pairs(
        emb, threshold=0.40, block_rows=64))
    assert single, "threshold too high — test would be vacuous"
    assert multi == single
    assert all(a < b for a, b, _ in multi)


# ---------------------------------------------------------------------------
# ADVICE r1 (medium): top-k partial selection must honor the id tie-break
# ---------------------------------------------------------------------------

def test_brute_force_topk_tie_determinism(spark):
    # 10 base vectors x 6 exact copies; k=3 < 5 tied candidates per query, so
    # the PARTIAL selection inside a block pair must honor the id tie-break —
    # value-only argpartition (the r1 bug) discards an arbitrary tied copy.
    # Within one GEMM identical columns give bitwise-equal cosines, so the
    # single-block run is fully deterministic: ranks 1..3 are the 3 smallest
    # other ids of the same base vector.
    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [(i, [float(x) for x in base[i % 10]]) for i in range(60)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    def run(block_rows):
        out = similarity.brute_force_topk(
            emb, k=3, block_rows=block_rows
        ).collect()
        return {
            (r["query_id"], r["rank"]): r["neighbor_id"] for r in out
        }

    single = run(1000)
    for q in range(60):
        dups = sorted(i for i in range(60) if i % 10 == q % 10 and i != q)
        got = [single[(q, r)] for r in (1, 2, 3)]
        assert got == dups[:3], f"query {q}: {got} != {dups[:3]}"

    # multi-block path: cross-GEMM float jitter may reorder exact ties, but
    # every top-3 neighbor must still be one of the tied duplicates — the r1
    # bug could surface a non-duplicate after discarding tied copies
    blocked = run(4)
    for q in range(60):
        dups = {i for i in range(60) if i % 10 == q % 10 and i != q}
        got = {blocked[(q, r)] for r in (1, 2, 3)}
        assert got <= dups, f"query {q}: {got - dups}"


# ---------------------------------------------------------------------------
# VERDICT r1 #4: unsound simhash banding params must be rejected
# ---------------------------------------------------------------------------

def test_simhash_pairs_rejects_narrow_chunks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="width"):
        dedup.simhash_pairs(docs, max_hamming=12)


# ---------------------------------------------------------------------------
# VERDICT r1 #9: CC digest kernel golden vs hashlib
# ---------------------------------------------------------------------------

def test_digest_b32_golden(spark):
    from cdx_toolkit_spark.textkit import digest_b32_col

    vals = ["", "hello", "Ünïcødé ✓", "a" * 1000]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r[0] for r in df.select(digest_b32_col("t")).collect()]
    want = [
        base64.b32encode(hashlib.sha1(v.encode("utf-8")).digest()).decode()
        for v in vals
    ]
    assert got == want


# ---------------------------------------------------------------------------
# VERDICT r1 #10: bucketed cosine — subset of exact, decent planted recall
# ---------------------------------------------------------------------------

def test_lsh_bucketed_cosine_pairs_recall(spark):
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    planted = []
    for _ in range(20):  # 20 planted near-dup pairs (cos ~ 0.999)
        v = rng.standard_normal(32)
        v /= np.linalg.norm(v)
        w = v + rng.standard_normal(32) * 0.01
        w /= np.linalg.norm(w)
        rows.append((vid, [float(x) for x in v]))
        rows.append((vid + 1, [float(x) for x in w]))
        planted.append((vid, vid + 1))
        vid += 2
    for _ in range(200):  # background noise
        v = rng.standard_normal(32)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = _pair_set(dedup.embedding_cosine_pairs(
        emb, threshold=0.95, block_rows=100_000))
    bucketed = _pair_set(dedup.lsh_bucketed_cosine_pairs(
        emb, threshold=0.95, n_planes=8, seeds=(42, 43, 44)))
    assert bucketed <= exact
    found = {(a, b) for a, b, _ in bucketed}
    recall = len(found & set(planted)) / len(planted)
    assert recall >= 0.6, f"planted-pair recall {recall}"


# ---------------------------------------------------------------------------
# ADVICE r1 (medium): two-phase epoch commit — no lost-output window
# ---------------------------------------------------------------------------

def _cands(spark, urls):
    return spark.createDataFrame(
        [(u, 1, 1000 + i) for i, u in enumerate(urls)],
        "url string, priority int, discovered_ts long",
    )


def test_two_phase_commit_recovery(spark, tmp_path, monkeypatch):
    wd = str(tmp_path / "wd")
    drain = FrontierDrain(spark, wd, batch_window=60.0, n_shards=2)
    drain.drain_epoch(_cands(spark, [f"http://h{i}.com/a" for i in range(6)]))

    ep2_urls = [f"http://h{i}.com/b" for i in range(6)]

    # simulate the exact ADVICE window: phase-1 output + marker committed,
    # seen-store updated, CRASH before the manifest line
    real_finish = FrontierDrain._finish_epoch

    def crash(self, rec0, written=None):
        done = self.schedule_df(rec0["epoch"]).select("urlkey", "url_hash")
        done.write.mode("overwrite").parquet(
            os.path.join(self.workdir, "seen_exact", f"ep_{rec0['epoch']}")
        )
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(FrontierDrain, "_finish_epoch", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        drain.drain_epoch(_cands(spark, ep2_urls))
    monkeypatch.setattr(FrontierDrain, "_finish_epoch", real_finish)

    assert drain.last_epoch() == 1  # manifest line never written
    committed = {r["url"] for r in drain.schedule_df(2).collect()}
    assert committed == set(ep2_urls)  # phase-1 output durable

    # the streaming layer replays the SAME micro-batch; epoch 2 must resume
    # from the marker — keep its committed output, never re-drain it against
    # a seen set that already contains its urls
    rec = drain.drain_epoch(_cands(spark, ep2_urls))
    assert rec["epoch"] == 2
    assert rec["n_scheduled"] == len(ep2_urls)
    after = {r["url"] for r in drain.schedule_df(2).collect()}
    assert after == set(ep2_urls)
    assert drain.last_epoch() == 2

    # and the engine moves on cleanly
    rec3 = drain.drain_epoch(_cands(spark, ["http://h0.com/c"]))
    assert rec3["epoch"] == 3 and rec3["n_scheduled"] == 1


# ---------------------------------------------------------------------------
# VERDICT r1 #2: composing a query must not run Spark jobs
# ---------------------------------------------------------------------------

def test_plan_compose_runs_no_jobs(spark, sf_dir):
    sc = spark.sparkContext
    captures = cdx_captures(spark, sf_dir)
    q = CdxQuery(captures, crawls=[
        "CC-MAIN-2015-26", "CC-MAIN-2015-52", "CC-MAIN-2016-26",
        "CC-MAIN-2016-52", "CC-MAIN-2017-26", "CC-MAIN-2017-52",
        "CC-MAIN-2018-26", "CC-MAIN-2018-52",
    ])
    sc.setJobGroup("compose-probe", "plan composition must be free")
    try:
        q.iter("example0.com/*", from_ts="2016", to="2017", limit=10)
        q.iter("example0.com/*", crawl=["2"], cc_sort="ascending")
        q.get("example0.com/*", closest="20170601")
        jobs = sc.statusTracker().getJobIdsForGroup("compose-probe")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == []


def test_crawl_discovery_cached_once(spark, sf_dir):
    sc = spark.sparkContext
    q = CdxQuery(cdx_captures(spark, sf_dir))
    q.iter("example0.com/*", crawl=["2"])  # first call may scan once
    sc.setJobGroup("cached-probe", "second compose must be free")
    try:
        q.iter("example0.com/*", crawl=["CC-MAIN-2017"])
        q.iter("example0.com/*", from_ts="2016", to="2017")
        jobs = sc.statusTracker().getJobIdsForGroup("cached-probe")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == []


# ---------------------------------------------------------------------------
# VERDICT r1 #9: comma-list crawl specs via normalize_crawl
# ---------------------------------------------------------------------------

def test_comma_list_crawl_spec(spark, sf_dir):
    q = CdxQuery(cdx_captures(spark, sf_dir))
    split = q.iter(
        "example0.com/*", crawl=["CC-MAIN-2017-26", "CC-MAIN-2017-52"],
        cc_sort="ascending",
    )
    comma = q.iter(
        "example0.com/*", crawl=["CC-MAIN-2017-26,CC-MAIN-2017-52"],
        cc_sort="ascending",
    )
    assert comma.count() == split.count() > 0
    with pytest.raises(ValueError, match="integer"):
        q.iter("example0.com/*", crawl=["2,CC-MAIN-2017-26"])


# ---------------------------------------------------------------------------
# SURT scalar/Column parity on adversarial inputs (trim set, userinfo across
# newlines, ':' non-port suffixes, fragments before schemes, empty hosts)
# ---------------------------------------------------------------------------

def test_surt_col_adversarial_parity(spark):
    import random
    import string

    from cdx_toolkit_spark.surt import host_col, surt, surt_col
    from cdx_toolkit_spark.frontier.reference_impl import _host_of

    rng = random.Random(99)
    alphabet = string.ascii_lowercase + string.digits + ":/?#@&.=%_-~ \n\t" + "äπ"
    urls = []
    for i in range(400):
        n = rng.randint(0, 40)
        u = "".join(rng.choice(alphabet) for _ in range(n))
        if i % 3 == 0:
            u = rng.choice(["http://", "https://", "//", "ftp://", ""]) + u
        urls.append(u)
    urls += [
        "http://a:80@b.com:8080/p?b=2&a=1#frag", "http://WWW9.Ex.com:443/",
        "//u@v@host:81/x?y", "http://host:abc/p", "a?b#c", "http://", "",
        "   ", "http://x.com/p?&&a", "ht#tp://x", "a#http://b",
        "http://x.com?", "http://x.com#", "http://x.com/p?q=1?r=2",
        "http://x@/p", "\thttp://tab.com/\n", "http://l\nb@u-.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(surt_col("url")).collect()]
    want = [surt(u) for u in urls]
    bad = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not bad, bad[:5]
    goth = [r[0] for r in df.select(host_col("url")).collect()]
    wanth = [_host_of(u) for u in urls]
    badh = [(u, g, w) for u, g, w in zip(urls, goth, wanth) if g != w]
    assert not badh, badh[:5]


# ---------------------------------------------------------------------------
# ngram jaccard: ubiquitous-shingle cap (the k² self-join guard)
# ---------------------------------------------------------------------------

def test_ngram_jaccard_max_doc_freq_cap(spark):
    """A boilerplate trigram shared by every doc must not create pairs once
    its document frequency exceeds the cap; true near-dups still match on
    their rare shingles, with sizes counted over the filtered sets."""
    boiler = "click here to"
    # docs 1/2: boilerplate + the same 4 rare trigrams (6 tokens) -> exact
    # dup over rare shingles; docs 3..12: boilerplate + unique tails
    rows = [(1, boiler + " alpha beta gamma delta"),
            (2, boiler + " alpha beta gamma delta")]
    rows += [(i, boiler + f" tail{i} x{i} y{i} z{i}") for i in range(3, 13)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold_num=8, threshold_den=10, max_doc_freq=3
    ).collect()
    # Only (1,2) survives: their rare shingles (df=2 <= 3) intersect fully;
    # every shingle containing the boilerplate words has df >= 12 and is
    # excluded from intersections AND set sizes on both sides.
    assert [(r.doc_a, r.doc_b) for r in capped] == [(1, 2)]
    (pair,) = capped
    assert pair.n_inter == pair.n_union  # exact dup over the filtered sets

    uncapped = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold_num=1, threshold_den=10
    )
    # sanity: without the cap the boilerplate shingle does link foreign docs
    assert uncapped.where("doc_a = 3").count() > 0


# ---------------------------------------------------------------------------
# IVF ANN: probing every list must recover the exact top-k
# ---------------------------------------------------------------------------

def test_ivf_topk_full_probe_equals_exact(spark):
    """With nprobe == nlist every inverted list is probed, so the candidate
    set is all-pairs and IVF must reproduce the exact cosine top-k
    (brute_force_topk) including the (−cosine, neighbor_id) tie order."""
    import math

    rows = [
        (i, [math.sin(0.7 * i + j) for j in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ivf = similarity.ivf_topk(emb, k=3, nlist=4, nprobe=4)
    exact = similarity.brute_force_topk(emb, k=3)
    got = sorted(tuple(r) for r in ivf.collect())
    want = sorted(tuple(r) for r in exact.collect())
    assert got == want

    # partial probe: still k rows per query, never self, ranks 1..k dense
    part = similarity.ivf_topk(emb, k=3, nlist=8, nprobe=2).collect()
    assert all(r.query_id != r.neighbor_id for r in part)
    by_q = {}
    for r in part:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
