"""vocab_topk + Gopher-style repetition stats — kernel pins."""

from pyspark.sql import functions as F

from cdx_toolkit_spark import textkit


def test_vocab_topk_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b a a c B"), (2, "a c d")], "doc_id long, text string"
    )
    # counts: a=3 (lowercased 'B' joins 'b'? no - 'B'->'b'), b=2, c=2, d=1
    rows = textkit.vocab_topk(df, k=3).collect()
    assert [(r.token, r.cnt) for r in rows] == [("a", 3), ("b", 2), ("c", 2)]
    # k boundary tie (b vs c both 2) resolved by token ASC: 'b' before 'c'
    rows2 = textkit.vocab_topk(df, k=2).collect()
    assert [(r.token, r.cnt) for r in rows2] == [("a", 3), ("b", 2)]


def test_repetition_fractions_match_python(spark):
    texts = [
        "a b a b a b",          # 2-grams: ab,ba,ab,ba,ab -> 2/5 distinct
        "x y z w",              # all distinct
        "solo",                 # no 2-grams
        "",                     # empty
        "r r r r r",            # fully repeated
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.dup_2gram_frac, r.dup_3gram_frac)
        for r in textkit.repetition_table(df).collect()
    }

    def ref(text, n):
        ws = text.strip().split()
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        if not grams or len(ws) < n:
            return 0.0
        return round(1.0 - len(set(grams)) / len(grams), 6)

    for i, t in enumerate(texts):
        assert got[i] == (ref(t, 2), ref(t, 3)), t


def test_repetition_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "each word here is different from the others entirely"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.dup_2gram_frac
        for r in textkit.repetition_table(df).collect()
    }
    assert got[1] > 0.8 and got[2] == 0.0
