"""Text extraction / digest / analysis kernels.

- ``text_from_html_udf``: the per-row invariant from BASELINE.json
  input_hint — `text` MUST be byte-identical to Python's
  ``html.decode('utf-8', errors='replace')`` (reference
  /root/reference/cdx_toolkit/__init__.py:129-134). We therefore define the
  kernel *as* that expression, Arrow-batched via pandas_udf. Spark's builtin
  ``decode(col,'UTF-8')`` has different malformed-byte behavior, so it is
  deliberately NOT used.
- ``digest_b32_col``: Common-Crawl-style content digest — SHA-1 computed
  JVM-side (``F.sha1`` inside codegen), then a constant-size hex->base32
  re-encode that is ALSO pure built-ins (conv + shiftright + substr over the
  4×40-bit chunks of the 160-bit hash), so the whole digest stays inside
  whole-stage codegen with zero Python (reference README.md:233-235).
  ``oracle_b32_from_hex40`` is the DuckDB twin of the re-encode, so the
  base32 kernel is end-to-end oracle-checked (DuckDB 1.0 lacks sha1, so the
  oracle feeds it md5-derived 40-hex input instead; the SHA-1 half is pinned
  by a hashlib golden in tests/test_round2_fixes.py).
- Analysis kernels (token count, quality score, language guess, fingerprint)
  are pure built-in Column expressions: JVM codegen, no Python, and each has
  a portable ANSI-SQL twin used by the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def text_from_html_udf(html: pd.Series) -> pd.Series:
    """bytes -> str via utf-8 errors='replace' (U+FFFD insertion), the exact
    reference decode. Arrow-batched; None-safe."""
    return html.map(
        lambda b: None if b is None else bytes(b).decode("utf-8", errors="replace")
    )


_B32_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def b32_from_hex40_col(hexcol) -> Column:
    """RFC-4648 base32 of exactly 40 hex chars (160 bits, the SHA-1 width).

    160 bits factor as 4 × 40-bit chunks, each chunk as 8 × 5-bit base32
    symbols — so no padding and every symbol boundary aligns. Each chunk is
    parsed with `conv(hex, 16, 10)` (fits a long), then 32 substr lookups
    into the alphabet. Pure built-ins: stays in whole-stage codegen, no
    Python/Arrow on the 10^10-row ingest path."""
    if isinstance(hexcol, str):
        hexcol = F.col(hexcol)
    h = F.lower(hexcol)
    parts = []
    for i in range(4):
        v = F.conv(F.substring(h, i * 10 + 1, 10), 16, 10).cast("long")
        for j in range(8):
            idx = F.shiftright(v, 35 - 5 * j).bitwiseAND(F.lit(31)) + F.lit(1)
            parts.append(F.substr(F.lit(_B32_ALPHABET), idx, F.lit(1)))
    return F.concat(*parts)


def oracle_b32_from_hex40(hex_expr: str) -> str:
    """DuckDB twin of ``b32_from_hex40_col``: inline SQL (list comprehensions
    + list_reduce hex parse) producing the identical 32-char base32 string
    for any 40-hex-char input expression."""
    return (
        "list_aggregate(flatten(list_transform("
        "[list_reduce([strpos('0123456789abcdef', x) - 1 "
        f"for x in string_split(substring(lower({hex_expr}), i*10 + 1, 10), '')], "
        "(a, b) -> a*16 + b) for i in range(4)], "
        f"v -> [substring('{_B32_ALPHABET}', (((v >> (35 - 5*j)) & 31))::INT + 1, 1) "
        "for j in range(8)])), 'string_agg', '')"
    )


def digest_b32_col(content) -> Column:
    """SHA-1 + base32, matching CC CDX `digest` format — all JVM built-ins."""
    if isinstance(content, str):
        content = F.col(content)
    return b32_from_hex40_col(F.sha1(content)).alias("digest")


def _col(c):
    return F.col(c) if isinstance(c, str) else c


def token_count_col(text) -> Column:
    """Whitespace token count. Oracle twin (DuckDB):
    ``len(string_split_regex(trim(text), '\\s+'))``."""
    t = F.trim(_col(text))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).alias("n_tokens")


# Tiny deterministic stopword list shared with the oracle SQL.
STOPWORDS = ("the", "a", "of", "and", "to")


def stopword_count_col(text) -> Column:
    """Count of stopword occurrences as standalone tokens.

    Computed via size(filter(split(...))) — vectorized JVM higher-order
    functions. Oracle twin uses the same split/filter in DuckDB list ops.
    """
    toks = F.split(F.trim(_col(text)), r"\s+")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(
        F.filter(toks, lambda x: F.array_contains(sw, x))
    ).alias("n_stopwords")


def quality_score_col(text) -> Column:
    """Heuristic quality score in [0,1]:
    0.5 * min(1, n_tokens/64) + 0.5 * min(1, 4*stopword_ratio).

    Rewards documents that are long enough and have natural-language
    stopword density. Deterministic, built-ins only, oracle-twinned.
    """
    nt = token_count_col(_col(text)).cast("double")
    sw = stopword_count_col(_col(text)).cast("double")
    len_part = F.least(F.lit(1.0), nt / F.lit(64.0))
    sw_ratio = F.when(nt > 0, sw / nt).otherwise(F.lit(0.0))
    sw_part = F.least(F.lit(1.0), F.lit(4.0) * sw_ratio)
    return F.round(F.lit(0.5) * len_part + F.lit(0.5) * sw_part, 6).alias(
        "quality"
    )


def lang_guess_col(text) -> Column:
    """N-gram-free heuristic language ID: 'en' when stopword-token density
    >= 2%, else 'unk'. (Real model hookup is a deployment concern; the
    Spark-side contract — pure column expression over `text` — is what we
    pin here.)"""
    nt = token_count_col(_col(text)).cast("double")
    sw = stopword_count_col(_col(text)).cast("double")
    ratio = F.when(nt > 0, sw / nt).otherwise(F.lit(0.0))
    return F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("unk")).alias(
        "lang_guess"
    )


# ---------------------------------------------------------------------------
# Trigram-profile language ID (Cavnar–Trenkle-style, profile-match scoring)
# ---------------------------------------------------------------------------
#
# Hand-curated character-trigram profiles (space-padded word boundaries,
# ASCII only so Spark's length/substr and DuckDB's len/substr agree
# char-for-char). A document's score for a language is the number of its
# trigram OCCURRENCES (frequency-weighted, not distinct) present in that
# language's profile; argmax wins, alphabetical-first on ties, 'unk' when
# no profile matches at all. All pure column expressions (the per-language
# membership test is an unrolled array_contains filter over a literal
# array — broadcast-free: the profiles are plan literals).

LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "de": (
        "der", " de", "die", " di", "und", " un", "nd ", "ein", " ei",
        "ich", "ch ", "cht", "sch", " sc", "ung", " ge", "gen", "ber",
        " mi", "mit", "das", " da", "en ", "er ",
    ),
    "en": (
        "the", " th", "he ", "ing", "ng ", " an", "and", " of", "of ",
        " to", "to ", "ion", " in", "in ", "ed ", "is ", " is", " be",
        "at ", "er ", "es ", "tio", "ent", " co",
    ),
    "es": (
        " de", "de ", "la ", " la", "os ", "los", " lo", " qu", "que",
        "ue ", "el ", " el", "en ", " en", "cio", "ado", "ar ", " co",
        "con", " es", "es ", "as ", " pa", "par",
    ),
    "fr": (
        "es ", " de", "de ", "le ", " le", "les", "ent", "nt ", "la ",
        " la", "que", " qu", "ue ", "re ", " pa", "par", "ion", " et",
        "et ", "des", " un", "une", "our", " po",
    ),
}


def _padded_norm_col(text) -> Column:
    """' ' + lowercase whitespace-collapsed text + ' ' — so word-boundary
    trigrams like ' th' appear at document edges too."""
    norm = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.concat(F.lit(" "), norm, F.lit(" "))


def char_trigrams_col(text) -> Column:
    """Array of overlapping character trigrams of the padded normalized
    text (frequency-preserving: NOT de-duplicated).

    The padded normalization is let-bound (winnow._let) before the
    per-position substr lambda: referencing the raw expression from
    inside the lambda would re-run the regexp_replace once PER TRIGRAM
    (~len(text) times per row — measured: the whole language-ID kernel
    was ~10x slower without this binding)."""
    from cdx_toolkit_spark.winnow import _let

    def build(padded):
        grams = F.transform(
            F.sequence(F.lit(1), F.length(padded) - 2),
            lambda i: F.substr(padded, i, F.lit(3)),
        )
        # sequence(1, n<1) would generate a DESCENDING range — guard it
        return F.when(F.length(padded) >= 3, grams).otherwise(
            F.array().cast("array<string>")
        )

    return _let(_padded_norm_col(text), build)


def lang_score_col(trigrams: Column, lang: str) -> Column:
    """Occurrences of `lang`'s profile trigrams in a trigram array."""
    profile = F.array(*[F.lit(t) for t in LANG_TRIGRAMS[lang]])
    return F.size(F.filter(trigrams, lambda t: F.array_contains(profile, t)))


def lang_id_packed_col(text) -> Column:
    """struct(score_de, score_en, score_es, score_fr, lang) — the whole
    language-ID kernel as ONE let-bound expression.

    Argmax unrolled over the sorted language list with a STRICT >
    comparison, so ties go to the alphabetically-first language; a
    document matching no profile at all is 'unk'. TWO let-bindings (see
    winnow._let): the trigram array is computed once per row (not once
    per language), and the score STRUCT is computed once before the
    argmax chain — the when-chain references each score ~2x per language,
    and without the binding every reference re-ran the interpreted
    profile-filter pass (measured 2x wall on the full kernel).
    """
    from cdx_toolkit_spark.winnow import _let

    langs = sorted(LANG_TRIGRAMS)

    def scores_struct(tg):
        return F.struct(
            *[lang_score_col(tg, lg).alias(f"score_{lg}") for lg in langs]
        )

    def with_label(sc):
        best_l, best_s = F.lit(langs[0]), sc[f"score_{langs[0]}"]
        for lg in langs[1:]:
            cond = sc[f"score_{lg}"] > best_s
            best_l = F.when(cond, F.lit(lg)).otherwise(best_l)
            best_s = F.when(cond, sc[f"score_{lg}"]).otherwise(best_s)
        label = F.when(best_s > 0, best_l).otherwise(F.lit("unk"))
        return F.struct(
            *[sc[f"score_{lg}"].alias(f"score_{lg}") for lg in langs],
            label.alias("lang"),
        )

    return _let(
        char_trigrams_col(text),
        lambda tg: _let(scores_struct(tg), with_label),
    )


def _lang_id_arrow_fn(id_col: str, text_col: str):
    """mapInPandas kernel: the SAME trigram-profile scores/label as
    lang_id_packed_col, vectorized with numpy per document. Each trigram
    is encoded as one int64 (c0*2^42 + c1*2^21 + c2 — codepoints < 2^21,
    so the packing is injective) and membership is np.isin against the
    pre-encoded profile arrays: exact string equality on codepoint
    triples, no float anywhere, so scores are bit-identical to the
    expression form (shared driver oracle + equality pytest).

    Normalization parity with the JVM expression (` `+lower/trim/collapse
    +` ` padding): Java \\s (Spark regexp_replace) = [ \\t\\n\\x0B\\f\\r];
    F.trim strips spaces only; ASCII lower() agrees between the JVM and
    Python — the same contract winnow._winnow_arrow_fn pins."""
    import re as _re

    import numpy as np

    langs = sorted(LANG_TRIGRAMS)

    def tri_code(t: str) -> int:
        return (ord(t[0]) << 42) | (ord(t[1]) << 21) | ord(t[2])

    profiles = [
        np.array(sorted(tri_code(t) for t in LANG_TRIGRAMS[lg]), dtype=np.int64)
        for lg in langs
    ]
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            scores = np.zeros((n, len(langs)), dtype=np.int32)
            for i, text in enumerate(pdf[text_col]):
                padded = " " + ws.sub(" ", (text or "").strip(" ").lower()) + " "
                if len(padded) < 3:
                    continue
                codes = np.frombuffer(
                    padded.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                tri = (codes[:-2] << 42) | (codes[1:-1] << 21) | codes[2:]
                for j, prof in enumerate(profiles):
                    scores[i, j] = int(np.isin(tri, prof).sum())
            # argmax with FIRST-wins ties over the sorted language list ==
            # the expression form's strict-> chain; all-zero rows -> 'unk'
            best = scores.argmax(axis=1)
            labels = np.where(
                scores.max(axis=1, initial=0) > 0,
                np.array(langs, dtype=object)[best],
                "unk",
            )
            out = pdf[[id_col]].copy()
            for j, lg in enumerate(langs):
                out[f"score_{lg}"] = scores[:, j]
            out["lang"] = labels
            yield out

    return fn


def lang_id_table(docs, id_col: str = "doc_id", text_col: str = "text",
                  impl: str = "arrow"):
    """(id, score_<lang>..., lang) — the DataFrame form of the language-ID
    kernel, and the form every caller should use.

    ``impl="arrow"`` (default): one mapInPandas stage running the
    numpy-vectorized twin — identical scores/label bit-for-bit (equality
    pytest + shared driver oracle), measured ~5x faster than the
    expression form (interpreted per-trigram array_contains lambdas vs
    one np.isin per language per doc). Zero shuffles either way.

    ``impl="expr"``: the pure-column-expression form (the portable/oracle
    reference). Unpacking the packed struct directly in one select
    references it once per output column, and Catalyst re-inlines the
    whole scoring kernel into EVERY reference (5 evaluations per row —
    measured 5x wall). The struct is pushed through an
    explode_outer(array(...)) Generate barrier instead, so the unpack
    reads a materialized attribute.
    """
    langs = sorted(LANG_TRIGRAMS)
    if impl == "arrow":
        from .parallel import spread_for_map

        id_type = docs.schema[id_col].dataType.simpleString()
        schema = (
            f"{id_col} {id_type}, "
            + ", ".join(f"score_{lg} int" for lg in langs)
            + ", lang string"
        )
        # spread before the kernel: a single-row-group source otherwise
        # runs the whole batch on one core (guide §2.5; no-op at scale)
        return spread_for_map(docs.select(id_col, text_col)).mapInPandas(
            _lang_id_arrow_fn(id_col, text_col), schema=schema
        )
    d = docs.select(
        F.col(id_col).alias(id_col),
        F.explode_outer(F.array(lang_id_packed_col(text_col))).alias("_lid"),
    )
    return d.select(
        id_col,
        *[F.col(f"_lid.score_{lg}").alias(f"score_{lg}") for lg in langs],
        F.col("_lid.lang").alias("lang"),
    )


def lang_id_sql(table: str = "documents", id_expr: str = "doc_id") -> str:
    """DuckDB twin of lang_id_cols (full query) — generated from the SAME
    profile constants so the two can't drift."""
    langs = sorted(LANG_TRIGRAMS)
    score_exprs = []
    for lg in langs:
        lits = ", ".join("'" + t.replace("'", "''") + "'" for t in LANG_TRIGRAMS[lg])
        score_exprs.append(
            f"len(list_filter(tg, t -> list_contains([{lits}], t)))"
            f" AS score_{lg}"
        )
    # argmax with alphabetical-first tie-break == strictly-greater chain
    best = f"score_{langs[0]}"
    label = f"'{langs[0]}'"
    for lg in langs[1:]:
        label = f"CASE WHEN score_{lg} > {best} THEN '{lg}' ELSE {label} END"
        best = f"greatest({best}, score_{lg})"
    scores_sel = ", ".join(f"score_{lg}" for lg in langs)
    return (
        f"WITH t AS (SELECT {id_expr},"
        f" ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' '"
        f" AS padded FROM {table}),\n"
        f"g AS (SELECT {id_expr}, list_transform(range(1, len(padded) - 1),"
        f" i -> substr(padded, i, 3)) AS tg FROM t),\n"
        f"s AS (SELECT {id_expr}, {', '.join(score_exprs)} FROM g)\n"
        f"SELECT {id_expr}, {scores_sel},"
        f" CASE WHEN {best} > 0 THEN {label} ELSE 'unk' END AS lang FROM s"
    )


def fingerprint_col(text) -> Column:
    """Normalized-document fingerprint: md5 of lowercase,
    whitespace-collapsed text. Portable (DuckDB md5 produces identical hex)."""
    norm = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.md5(norm).alias("fingerprint")


# GPT-2-style pre-tokenizer regex, restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): no lookarounds, no
# backrefs. Contractions | optional-space word | optional-space number |
# optional-space punctuation-run | whitespace-run.
BPE_TOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9\s]+"
    r"|\s+"
)


def bpe_token_count_col(text) -> Column:
    """BPE-ish token count: number of GPT-2-pretokenizer matches.

    JVM-side regexp_count (codegen, no Python). Oracle twin:
    ``len(regexp_extract_all(text, BPE_TOKEN_RE))`` in DuckDB — the pattern
    is written to the common Java/RE2 subset so both engines agree."""
    return F.regexp_count(_col(text), F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens")


def vocab_topk(docs, k: int = 200, id_col: str = "doc_id",
               text_col: str = "text"):
    """Global top-k token frequency table (token, cnt) — the vocabulary
    scan a BPE/tokenizer-training pipeline runs first.

    One explode + one map-side-combined count shuffle; the top-k is
    (cnt DESC, token ASC) with the token tie-break making the boundary
    set deterministic, and limit+order plans as TakeOrderedAndProject
    (per-partition heaps, no global sort) — the right 100 TB shape."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


def vocab_topk_sql(k: int = 200, table: str = "documents") -> str:
    """DuckDB twin of vocab_topk."""
    return (
        f"SELECT token, count(*) AS cnt FROM (\n"
        f"  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))"
        f" AS token FROM {table})\n"
        f"WHERE token <> '' GROUP BY token\n"
        f"ORDER BY cnt DESC, token LIMIT {k}"
    )


def repetition_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style intra-document repetition stats:
    (id, dup_2gram_frac, dup_3gram_frac) where dup_ngram_frac =
    1 - distinct/total over the doc's word n-grams (0.0 when the doc has
    no n-grams). High fractions mark boilerplate/spam for quality
    filtering. Pure let-bound column expressions, zero shuffles."""
    from cdx_toolkit_spark.winnow import _let

    def frac(n):
        def from_tokens(toks):
            grams = F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
            return _let(
                F.when(F.size(toks) >= n, grams).otherwise(
                    F.array().cast("array<string>")
                ),
                lambda g: F.when(
                    F.size(g) > 0,
                    F.round(
                        1.0
                        - F.size(F.array_distinct(g))
                        / F.size(g).cast("double"),
                        6,
                    ),
                ).otherwise(F.lit(0.0)),
            )

        return from_tokens

    toks_expr = F.split(F.trim(F.col(text_col)), r"\s+")
    packed = _let(
        toks_expr,
        lambda toks: F.struct(
            frac(2)(toks).alias("dup_2gram_frac"),
            frac(3)(toks).alias("dup_3gram_frac"),
        ),
    )
    d = docs.select(
        F.col(id_col).alias(id_col),
        F.explode_outer(F.array(packed)).alias("_rep"),
    )
    return d.select(
        id_col,
        F.col("_rep.dup_2gram_frac").alias("dup_2gram_frac"),
        F.col("_rep.dup_3gram_frac").alias("dup_3gram_frac"),
    )


def repetition_sql(table: str = "documents") -> str:
    """DuckDB twin of repetition_table."""
    def frac(n):
        gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
        return (
            f"CASE WHEN len(ws) >= {n} THEN round(1.0 -"
            f" CAST(len(list_distinct(list_transform("
            f"generate_series(1, len(ws)-{n - 1}), i -> {gram}))) AS DOUBLE)"
            f" / (len(ws)-{n - 1}), 6) ELSE 0.0 END"
        )

    return (
        f"WITH w AS (SELECT doc_id,"
        f" string_split_regex(trim(text), '\\s+') AS ws FROM {table})\n"
        f"SELECT doc_id, {frac(2)} AS dup_2gram_frac,"
        f" {frac(3)} AS dup_3gram_frac FROM w"
    )


SPLIT_GRANULARITY = 1_000_000


def split_assign_col(
    id_col="doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 0,
) -> Column:
    """Deterministic, seed-stable train/val/test split assignment.

    The standard shuffle-free way to split a 100 TB corpus: hash the
    document id into [0, SPLIT_GRANULARITY) and compare against cumulative
    weight thresholds. No sampling state, no shuffle, no ordering
    dependence — the assignment is a pure projected expression, stable
    across runs/partitionings/cluster sizes, and membership is computable
    for a single id without touching the rest of the corpus (the property
    randomSplit() does NOT have). Different `seed`s give independent
    splits.

    The hash is the portable md5-low-32 family (see dedup.hash64_col), so
    a DuckDB/ANSI-SQL twin reproduces the exact assignment:
    split_assign_sql() stays in lockstep.
    """
    assert len(weights) == len(names) and len(names) >= 2
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(id_col).cast("string"), F.lit(str(seed))
                    )
                ),
                9,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(SPLIT_GRANULARITY)
    )
    total = float(sum(weights))
    cum = 0.0
    expr = None
    for w, nm in zip(weights[:-1], names[:-1]):
        cum += w
        thr = int(round(cum / total * SPLIT_GRANULARITY))
        expr = (
            F.when(h < thr, F.lit(nm))
            if expr is None
            else expr.when(h < thr, F.lit(nm))
        )
    return expr.otherwise(F.lit(names[-1])).alias("split")


def split_assign_sql(
    id_expr: str = "doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 0,
) -> str:
    """DuckDB twin of split_assign_col — keep in lockstep."""
    h = (
        f"(CAST(concat('0x', substring(md5(CAST({id_expr} AS VARCHAR)"
        f" || ':{seed}'), 9, 8)) AS BIGINT) % {SPLIT_GRANULARITY})"
    )
    total = float(sum(weights))
    cum = 0.0
    cases = []
    for w, nm in zip(weights[:-1], names[:-1]):
        cum += w
        thr = int(round(cum / total * SPLIT_GRANULARITY))
        cases.append(f"WHEN {h} < {thr} THEN '{nm}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
