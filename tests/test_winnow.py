"""Winnowing fingerprints + trigram language ID — kernel pins.

Pure-Python references computed in-test pin the Spark kernels exactly
(polynomial hash values, window-min selection with the paper's rightmost
tie-break, argmax label with alphabetical-first ties); the DuckDB twins
are covered by test_oracle_parity via the driver entries."""

import re

import pytest
from pyspark.sql import functions as F

from cdx_toolkit_spark import textkit, winnow


def py_winnow(text, k=8, w=8):
    """Independent scalar reference for the whole winnowing kernel."""
    norm = re.sub(r"\s+", " ", text.strip().lower())
    if len(norm) < k:
        return set()
    B, M = winnow.WINNOW_BASE, 1 << 32
    hs = []
    for i in range(len(norm) - k + 1):
        h = 0
        for c in norm[i : i + k]:
            h = (h * B + ord(c)) % M
        hs.append(h)
    sel = set()
    for t in range(max(len(hs) - w + 1, 1)):
        sl = hs[t : t + w]
        m = min(sl)
        # rightmost occurrence of the window minimum (SIGMOD'03 §4)
        sel.add((t + max(j for j, v in enumerate(sl) if v == m) + 1, m))
    return sel


def _spark_winnow(spark, texts, k=8, w=8):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = {}
    for r in winnow.winnow_fingerprint_table(df, k=k, w=w).collect():
        out.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    return [out.get(i, set()) for i in range(len(texts))]


def test_winnow_matches_python_reference_on_fixture_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    got = {}
    for r in winnow.winnow_fingerprint_table(docs, k=8, w=8).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == py_winnow(text), doc_id


def test_winnow_rightmost_tie_break(spark):
    # 'ababab...' makes every other 2-gram hash identical, so every window
    # contains ties — the selected position must be the RIGHTMOST minimum
    texts = ["ababababababab", "xyxyxyxyxy zz xyxyxy"]
    got = _spark_winnow(spark, texts, k=2, w=4)
    for t, g in zip(texts, got):
        assert g == py_winnow(t, k=2, w=4), t


def test_winnow_short_doc_edges(spark):
    texts = [
        "",  # empty -> no grams -> no fingerprints
        "abc",  # shorter than k=8 -> none
        "abcdefgh",  # exactly one gram -> one fingerprint at pos 1
        "abcdefghij",  # 3 grams < w=8 -> ONE window over all grams
    ]
    got = _spark_winnow(spark, texts, k=8, w=8)
    assert got[0] == set() and got[1] == set()
    assert len(got[2]) == 1 and next(iter(got[2]))[0] == 1
    assert len(got[3]) == 1  # single clamped window -> single selection
    for t, g in zip(texts, got):
        assert g == py_winnow(t, k=8, w=8)


def test_winnow_shared_substring_guarantee(spark):
    # any shared substring of length >= k + w - 1 = 15 must share >= 1
    # fingerprint between the two documents
    shared = "the common core substring here"
    texts = ["prefix one " + shared + " tail a", "other start " + shared]
    a, b = _spark_winnow(spark, texts, k=8, w=8)
    assert {f for _, f in a} & {f for _, f in b}


def test_winnow_overlap_pairs_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different content with no overlap at all qq"),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_union)
        for r in winnow.winnow_overlap_pairs(
            df, k=8, w=8, threshold_num=1, threshold_den=4
        ).collect()
    }
    assert set(pairs) == {(1, 2)}
    n_common, n_union = pairs[(1, 2)]
    assert n_common == n_union  # identical docs: identical fingerprint sets


def test_winnow_overlap_max_doc_freq_cap(spark):
    # a fingerprint present in ALL docs is excluded by the cap from both
    # the intersection and the set sizes
    boiler = "shared boilerplate sentence appears everywhere here"
    df = spark.createDataFrame(
        [(i, f"{boiler} unique tail number {i} with words {i}") for i in range(4)],
        "doc_id int, text string",
    )
    uncapped = winnow.winnow_overlap_pairs(
        df, threshold_num=1, threshold_den=10
    ).count()
    capped = winnow.winnow_overlap_pairs(
        df, threshold_num=1, threshold_den=10, max_doc_freq=3
    ).count()
    assert uncapped == 6  # all pairs share the boilerplate fingerprints
    assert capped < uncapped


def _py_lang_scores(text):
    norm = re.sub(r"\s+", " ", text.strip().lower())
    padded = f" {norm} "
    tgs = [padded[i : i + 3] for i in range(len(padded) - 2)]
    return {
        lang: sum(t in profile for t in tgs)
        for lang, profile in textkit.LANG_TRIGRAMS.items()
    }


def _py_lang_label(text):
    scores = _py_lang_scores(text)
    best = max(sorted(scores), key=lambda l: scores[l])  # first max wins
    return best if scores[best] > 0 else "unk"


LANG_SENTENCES = [
    ("The quick brown fox is jumping over the lazy dog and the cat", "en"),
    ("Der schnelle braune Fuchs springt uber den faulen Hund und die Katze", "de"),
    ("Le renard brun rapide saute par dessus le chien paresseux et les poules", "fr"),
    ("El rapido zorro marron salta sobre el perro perezoso y los gatos", "es"),
    ("", "unk"),
    ("zzz qqq xxx", "unk"),
]


def test_lang_id_hand_sentences(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(LANG_SENTENCES)],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r.lang
        for r in textkit.lang_id_table(df).collect()
    }
    for i, (text, want) in enumerate(LANG_SENTENCES):
        assert got[i] == want, text
        assert _py_lang_label(text) == want, text  # reference agrees


def test_lang_id_scores_and_ties_match_python_reference(spark):
    # includes a tie case: ' de ' scores es=2, fr=2 -> alphabetical first
    texts = [t for t, _ in LANG_SENTENCES] + ["de", "the der les los"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = {
        r.doc_id: r
        for r in textkit.lang_id_table(df).collect()
    }
    for i, text in enumerate(texts):
        ref = _py_lang_scores(text)
        for lang in ref:
            assert rows[i][f"score_{lang}"] == ref[lang], (text, lang)
        assert rows[i].lang == _py_lang_label(text), text


def test_winnow_arrow_impl_bit_identical_to_expr(spark, sf_dir):
    # the production (mapInPandas/numpy) kernel must produce the exact
    # fingerprint rowset of the expression/oracle form on real fixture
    # docs AND on the edge cases (empty, sub-k, single-window)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    expr_rows = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow.winnow_fingerprint_table(docs, 8, 8).collect()
    )
    arrow_rows = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow.winnow_fingerprint_table(
            docs, 8, 8, impl="arrow"
        ).collect()
    )
    assert expr_rows == arrow_rows and len(expr_rows) > 0

    edge = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "abcdefgh"), (4, "abcdefghij"),
         (5, "  spaced   out\ttabs\nand newlines  ")],
        "doc_id long, text string",
    )
    e = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow.winnow_fingerprint_table(edge, 8, 8).collect()
    )
    a = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow.winnow_fingerprint_table(
            edge, 8, 8, impl="arrow"
        ).collect()
    )
    assert e == a


def test_contamination_table_semantics(spark):
    from cdx_toolkit_spark import dedup

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains eval 5-gram
            (2, "totally unrelated words here none match at all"),
            (3, "alpha beta gamma delta epsilon"),  # exactly the eval doc
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_common_shingles, r.n_eval_docs)
        for r in dedup.contamination_table(train, evalset, n=5).collect()
    }
    # doc 1: shares the one 5-gram "alpha..epsilon"; doc 3: identical
    assert got == {1: (1, 1), 3: (1, 1)}

    cleaned = dedup.decontaminate(train, evalset, n=5)
    assert sorted(r.doc_id for r in cleaned.collect()) == [2]


def test_contamination_shared_shingles_frame(spark):
    # the shingles= contract: passing a pre-built train shingle table gives
    # the same flags (composition path used by a full-pipeline caller)
    from cdx_toolkit_spark import dedup

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),
            (2, "eight nine ten eleven twelve thirteen"),
            (100, "three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    train = docs.where(F.col("doc_id") < 100)
    ev = docs.where(F.col("doc_id") >= 100)
    direct = sorted(
        tuple(r) for r in dedup.contamination_table(train, ev, n=5).collect()
    )
    shared = dedup.shingle_table(train, 5)
    via_shared = sorted(
        tuple(r)
        for r in dedup.contamination_table(
            train, ev, n=5, shingles=shared
        ).collect()
    )
    assert direct == via_shared and len(direct) == 1


def test_winnow_plan_is_shuffle_free_and_python_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        winnow.winnow_fingerprint_table(docs, 8, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # r7: spread_for_map may add ONE round-robin exchange to raise map
    # parallelism over a single-row-group source (no-op at scale); keyed
    # hash/range exchanges stay forbidden — the kernel itself is still a
    # shuffle-free projection.
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
