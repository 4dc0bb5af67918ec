"""Web-scale corpus quality gates over `documents`: duplicated-n-gram
coverage, PII detection/redaction, and C4-style heuristic filters.

These extend the curation surface (SURVEY §2 extension ops — the
reference has no analog) with the three remaining standard
training-data admission stages: cross-document duplicated-span
coverage (the Dolma/Gopher "dup n-gram fraction" signal),
regex PII scrubbing (RefinedWeb/Dolma-style), and the C4 heuristic
rule set (word-count bounds, mean word length, code/boilerplate
markers, symbol density).

Scale design: every per-doc feature is a scan-local expression (regex
counts, length math) or one map-side-combinable aggregation over the
shared shingle relation; the only join is shingle→document-frequency,
an equi-join on the shingle key co-partitioned with the df aggregate
that feeds it. Nothing is quadratic; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.dedup import _SHINGLES_CTE, _shingle_df
from oxford_data_pipeline_spark.plans.memo import bounded_once
from oxford_data_pipeline_spark.plans.textops import _TOKENS_CTE
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import fan_out, load_table

# --------------------------------------------------------------------------
# Duplicated-n-gram coverage (Dolma/Gopher dup-span signal)
# --------------------------------------------------------------------------
# Per document: the fraction of its distinct 3-gram shingles that occur
# in at least MIN_DF other documents.  High coverage marks boilerplate
# (navigation chrome, licence blocks, templated spam) that exact and
# near-dup removal both miss because no single pair clears the Jaccard
# bar.  Two shuffles total: shingle→df aggregation, then the per-doc
# rollup; the df side arrives already partitioned by the join key.
_DUP_COVERAGE_MIN_DF = 2  # shingle must appear in >= 2 distinct docs

_DUP_COVERAGE_ORACLE = f"""
WITH {_SHINGLES_CTE},
df AS (
    SELECT shingle, count(*) AS doc_freq FROM shingles GROUP BY 1
),
per_doc AS (
    SELECT s.doc_id,
           count(*) AS n_shingles,
           sum(CASE WHEN d.doc_freq >= {_DUP_COVERAGE_MIN_DF} THEN 1 ELSE 0 END) AS n_dup
    FROM shingles s JOIN df d ON s.shingle = d.shingle
    GROUP BY 1
)
SELECT doc_id, n_shingles, CAST(n_dup AS BIGINT) AS n_dup_shingles,
       round(CAST(n_dup AS DOUBLE) / n_shingles * 1000000 + 0.01, 0) / 1000000 + 0 AS dup_coverage,
       (CAST(n_dup AS DOUBLE) / n_shingles > 0.5) AS mostly_duplicated
FROM per_doc
"""


def dup_ngram_coverage(sh: DataFrame, min_df: int = _DUP_COVERAGE_MIN_DF) -> DataFrame:
    """Core transform over a (doc_id, shingle) relation (shingles
    distinct per doc): per-doc share of shingles whose corpus document
    frequency is >= min_df."""
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("doc_freq"))
    cov = F.col("n_dup_shingles").cast("double") / F.col("n_shingles")
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_freq") >= min_df, 1).otherwise(0)
            ).alias("n_dup_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup_shingles",
            round6(cov).alias("dup_coverage"),
            (cov > 0.5).alias("mostly_duplicated"),
        )
    )


@register("text_dup_ngram_coverage", _DUP_COVERAGE_ORACLE)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-3-gram coverage: share of a document's
    distinct shingles that appear in >= MIN_DF documents corpus-wide.
    The boilerplate signal Jaccard-pair dedup cannot see."""
    return dup_ngram_coverage(_shingle_df(spark, sf_dir))


# --------------------------------------------------------------------------
# Duplicated-span extraction (exact-substring dedup, Lee et al. 2022)
# --------------------------------------------------------------------------
# The span-level form of the coverage signal: per document, MAXIMAL
# contiguous token ranges whose every 3-gram occurs in >= MIN_DF
# documents corpus-wide — the spans an exact-substring dedup stage
# would cut, with token offsets so a downstream pass can splice.
# Relationally: positional shingles (kept, not distinct) -> document
# frequency on the distinct (doc, shingle) pairs -> dup-position
# gaps-and-islands (pos - row_number() per doc) -> per-island rollup.
# One window exchange keyed by doc_id; runs shorter than
# _SPAN_MIN_GRAMS grams are noise and dropped (logged volume is the
# span count itself).
_SPAN_MIN_GRAMS = 3  # >= 3 dup 3-grams = >= 5 duplicated tokens

# Shared span-derivation CTE chain (positional shingles -> df -> dup
# positions -> gaps-and-islands).  ONE definition used by BOTH the
# span-listing and span-cut oracles so the span semantics cannot
# silently diverge between them (same discipline as _TOKENS_CTE /
# _MINHASH_CAND_CTES).
_SPAN_ISL_CTES = f"""
ptoks AS (
    SELECT doc_id, CAST(i AS INTEGER) AS pos,
           t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
    FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
    WHERE len(t) >= 3
),
pdf AS (
    SELECT shingle, count(DISTINCT doc_id) AS doc_freq FROM ptoks GROUP BY 1
),
dup AS (
    SELECT p.doc_id, p.pos
    FROM ptoks p JOIN pdf USING (shingle)
    WHERE doc_freq >= {_DUP_COVERAGE_MIN_DF}
),
isl AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM dup
)"""

_DUP_SPANS_ORACLE = f"""
WITH {_TOKENS_CTE},
{_SPAN_ISL_CTES},
spans AS (
    SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
           CAST(max(pos) + 2 AS INTEGER) AS span_end,
           count(*) AS n_grams
    FROM isl GROUP BY doc_id, grp
)
SELECT doc_id, span_start, span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens,
       CAST(n_grams AS BIGINT) AS n_dup_grams
FROM spans WHERE n_grams >= {_SPAN_MIN_GRAMS}
"""


@register("text_dup_spans", _DUP_SPANS_ORACLE)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per document (1-based inclusive
    token offsets): contiguous runs of corpus-duplicated 3-grams, the
    exact-substring dedup cut list."""
    from oxford_data_pipeline_spark.plans.textops import tokens_relation

    from oxford_data_pipeline_spark.operators.textops import positional_gram_parts

    t = tokens_relation(spark, sf_dir)
    ptoks = t.filter(F.size("t") >= 3).select(
        "doc_id", F.posexplode(positional_gram_parts("t", 3)).alias("p", "g")
    ).select(
        "doc_id",
        (F.col("p") + 1).cast("int").alias("pos"),
        F.concat_ws(" ", "g.g0", "g.g1", "g.g2").alias("shingle"),
    )
    pdf = ptoks.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    dup = (
        ptoks.join(pdf, "shingle")
        .filter(F.col("doc_freq") >= _DUP_COVERAGE_MIN_DF)
        .select("doc_id", "pos")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + 2).cast("int").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .filter(F.col("n_grams") >= _SPAN_MIN_GRAMS)
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
            F.col("n_grams").cast("long").alias("n_dup_grams"),
        )
    )


# --------------------------------------------------------------------------
# PII detection + redaction (RefinedWeb/Dolma-style regex scrub)
# --------------------------------------------------------------------------
# Patterns are restricted to the syntax Java regex (Spark) and RE2
# (DuckDB) evaluate identically: character classes, bounded repetition,
# \\d, \\b — no lookaround, no backreferences.  The scrub is a pure
# scan-local expression chain (regexp_count + regexp_replace): zero
# shuffles, embarrassingly parallel, and the redacted fingerprint keeps
# the raw text out of the result relation.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
_PII_IDNUM = "\\b[0-9]{9,}\\b"

# DuckDB regexp_replace needs the 'g' flag for replace-all; counts via
# len(regexp_extract_all).  Replacement order matters (email before
# idnum etc. is irrelevant here because the classes are disjoint, but
# both engines apply the same fixed order).
_PII_ORACLE = f"""
WITH scrub AS (
    SELECT doc_id, source,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
           len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
           len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
           len(regexp_extract_all(text, '{_PII_IDNUM}')) AS n_idnum,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                     '{_PII_IPV4}', '<IP>', 'g'),
                     '{_PII_PHONE}', '<PHONE>', 'g'),
                     '{_PII_IDNUM}', '<ID>', 'g') AS redacted
    FROM documents
)
SELECT doc_id, source, n_email, n_ipv4, n_phone, n_idnum,
       n_email + n_ipv4 + n_phone + n_idnum AS n_pii,
       (n_email + n_ipv4 + n_phone + n_idnum > 0) AS has_pii,
       md5(redacted) AS redacted_fp
FROM scrub
"""


_PII_RULES = (
    (_PII_EMAIL, "<EMAIL>"),
    (_PII_IPV4, "<IP>"),
    (_PII_PHONE, "<PHONE>"),
    (_PII_IDNUM, "<ID>"),
)


def redact(col) -> "F.Column":
    """The PII redaction expression: every pattern replaced by its tag,
    in fixed rule order.  Idempotent — tags can never re-match
    (tested)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, tag in _PII_RULES:
        out = F.regexp_replace(out, pat, tag)
    return out


def with_pii_features(docs: DataFrame) -> DataFrame:
    """APPEND the PII feature columns (n_email/n_ipv4/n_phone/n_idnum/
    n_pii/has_pii/redacted_fp) to any relation with a `text` column —
    a pure stateless projection, so it composes with the other gates
    on batch AND streaming DataFrames alike."""
    redacted = redact("text")
    n_pii = (
        F.col("n_email") + F.col("n_ipv4") + F.col("n_phone") + F.col("n_idnum")
    )
    return (
        docs.withColumns(
            {
                "n_email": F.regexp_count("text", F.lit(_PII_EMAIL)),
                "n_ipv4": F.regexp_count("text", F.lit(_PII_IPV4)),
                "n_phone": F.regexp_count("text", F.lit(_PII_PHONE)),
                "n_idnum": F.regexp_count("text", F.lit(_PII_IDNUM)),
                "redacted_fp": F.md5(redacted.cast("binary")),
            }
        )
        .withColumn("n_pii", n_pii)
        .withColumn("has_pii", F.col("n_pii") > 0)
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Core transform: per-doc PII match counts + md5 of the redacted
    text, over any relation with (doc_id, source, text)."""
    return with_pii_features(docs).select(
        "doc_id",
        "source",
        "n_email",
        "n_ipv4",
        "n_phone",
        "n_idnum",
        "n_pii",
        "has_pii",
        "redacted_fp",
    )


@register("cur_pii_scrub", _PII_ORACLE)
def cur_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-doc match counts for email/IPv4/phone/long-ID
    patterns plus the md5 fingerprint of the redacted text.  Pure
    scan-local regex work — the 100 TB cost is one pass over the
    corpus with zero exchanges."""
    return pii_scrub(fan_out(load_table(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# C4-style heuristic quality gates
# --------------------------------------------------------------------------
# The classic C4 rule set re-expressed over whole documents (the corpus
# stores one text blob per doc): word-count bounds, mean word length in
# [3, 10], no curly braces (code), no 'lorem ipsum', no 'javascript'
# marker, bounded symbol density.  All scan-local; the `admitted` bit
# is the conjunction a curation pass filters on.
_C4_ORACLE = """
WITH feat AS (
    SELECT doc_id, source, text,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
           length(replace(text, ' ', '')) AS n_word_chars,
           length(text) AS n_chars_total,
           length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_symbols,
           contains(text, '{') OR contains(text, '}') AS has_curly,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           contains(lower(text), 'javascript') AS has_javascript
    FROM documents
)
SELECT doc_id, source, n_words,
       round(CAST(n_word_chars AS DOUBLE) / n_words * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_word_len,
       round(CAST(n_symbols AS DOUBLE) / n_chars_total * 1000000 + 0.01, 0) / 1000000 + 0 AS symbol_ratio,
       has_curly, has_lorem, has_javascript,
       (n_words BETWEEN 5 AND 100000
        AND CAST(n_word_chars AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
        AND NOT has_curly AND NOT has_lorem AND NOT has_javascript
        AND CAST(n_symbols AS DOUBLE) / n_chars_total < 0.1) AS admitted
FROM feat
WHERE n_words > 0
"""


def with_c4_features(docs: DataFrame) -> DataFrame:
    """APPEND the raw C4 feature columns (n_words/n_word_chars/
    n_chars_total/n_symbols/has_curly/has_lorem/has_javascript/
    c4_admitted) to any relation with a `text` column.  Stateless
    projection — streaming-safe.  Rows with zero words carry
    c4_admitted = false (callers that report ratios filter them)."""
    words = F.filter(F.split("text", " "), lambda x: x != "")
    lower = F.lower(F.col("text"))
    feat = docs.withColumns(
        {
            "n_words": F.size(words),
            "n_word_chars": F.length(F.regexp_replace("text", " ", "")),
            "n_chars_total": F.length("text"),
            "n_symbols": F.length("text")
            - F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", "")),
            "has_curly": F.contains("text", F.lit("{"))
            | F.contains("text", F.lit("}")),
            "has_lorem": F.contains(lower, F.lit("lorem ipsum")),
            "has_javascript": F.contains(lower, F.lit("javascript")),
        }
    )
    # try_divide: a zero-word/zero-char doc (possible on a raw ingest
    # stream) must gate to false, not raise under ANSI mode
    mean_wl = F.try_divide(F.col("n_word_chars").cast("double"), F.col("n_words"))
    sym_ratio = F.try_divide(
        F.col("n_symbols").cast("double"), F.col("n_chars_total")
    )
    return feat.withColumn(
        "c4_admitted",
        F.coalesce(
            F.col("n_words").between(5, 100000)
            & mean_wl.between(3.0, 10.0)
            & ~F.col("has_curly")
            & ~F.col("has_lorem")
            & ~F.col("has_javascript")
            & (sym_ratio < 0.1),
            F.lit(False),
        ),
    )


def c4_heuristics(docs: DataFrame) -> DataFrame:
    """Core transform: C4 heuristic features + admission bit over any
    relation with (doc_id, source, text)."""
    feat = with_c4_features(docs).filter(F.col("n_words") > 0)
    mean_wl = F.col("n_word_chars").cast("double") / F.col("n_words")
    sym_ratio = F.col("n_symbols").cast("double") / F.col("n_chars_total")
    return feat.select(
        "doc_id",
        "source",
        "n_words",
        round6(mean_wl).alias("mean_word_len"),
        round6(sym_ratio).alias("symbol_ratio"),
        "has_curly",
        "has_lorem",
        "has_javascript",
        F.col("c4_admitted").alias("admitted"),
    )


@register("cur_c4_heuristics", _C4_ORACLE)
def cur_c4_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 heuristic admission: word-count bounds, mean word length,
    code/boilerplate markers, symbol density — one scan, no shuffle."""
    return c4_heuristics(fan_out(load_table(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# Model-based quality scoring (linear classifier inference)
# --------------------------------------------------------------------------
# The fasttext-style quality filter shape (CCNet/LLaMA pipelines):
# a LINEAR model over cheap text features, scored corpus-wide.  The
# weights here are fixed literals standing in for an offline-trained
# classifier (production swaps the literal vector for the trained one
# — the PLAN is identical: scan-local feature extraction + a dot
# product + sigmoid, zero shuffles before the final filter).  Keeping
# inference relational is the point: no model server in the loop, the
# corpus is scored in one pass.
_QC_W0 = -2.0    # bias
_QC_W_LOGTOK = 0.9   # log(1 + n_tokens)
_QC_W_TTR = 1.5      # type-token ratio
_QC_W_STOP = -0.8    # stopword ratio
_QC_W_AVGLEN = 0.12  # mean token length

_QC_ORACLE = f"""
WITH {{tokens_cte}},
feat AS (
    SELECT doc_id, source,
           len(t) AS n_tokens,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
           CAST(len(list_filter(t, x -> list_contains({{stop_sql}}, x))) AS DOUBLE)
               / len(t) AS stop_ratio,
           CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(t) AS avg_len
    FROM toks WHERE len(t) > 0
),
scored AS (
    SELECT doc_id, source, n_tokens,
           {_QC_W0} + {_QC_W_LOGTOK} * ln(1 + n_tokens)
                    + {_QC_W_TTR} * ttr
                    + {_QC_W_STOP} * stop_ratio
                    + {_QC_W_AVGLEN} * avg_len AS logit
    FROM feat
)
SELECT doc_id, source, n_tokens,
       round(logit * 1000000 + 0.01, 0) / 1000000 + 0 AS logit,
       round(1.0 / (1.0 + exp(-logit)) * 1000000 + 0.01, 0) / 1000000 + 0 AS quality_prob,
       (1.0 / (1.0 + exp(-logit)) >= 0.5) AS admitted
FROM scored
"""


def _qc_oracle() -> str:
    from oxford_data_pipeline_spark.operators.textops import STOPWORDS
    from oxford_data_pipeline_spark.plans.textops import _TOKENS_CTE

    stop_sql = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return _QC_ORACLE.format(tokens_cte=_TOKENS_CTE, stop_sql=stop_sql)


def cur_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference: sigmoid of a fixed weight
    vector over length/diversity/stopword features — one corpus pass,
    zero shuffles (features come from the shared tokens relation)."""
    from oxford_data_pipeline_spark.operators.textops import (
        STOPWORDS,
        count_in_list,
    )
    from oxford_data_pipeline_spark.plans.textops import tokens_relation

    t = tokens_relation(spark, sf_dir).filter(F.size("t") > 0)
    n = F.size("t")
    feat = t.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        (F.size(F.array_distinct("t")).cast("double") / n).alias("ttr"),
        (count_in_list(F.col("t"), STOPWORDS).cast("double") / n).alias(
            "stop_ratio"
        ),
        (
            F.length(F.regexp_replace("norm", " ", "")).cast("double") / n
        ).alias("avg_len"),
    )
    logit = (
        F.lit(_QC_W0)
        + _QC_W_LOGTOK * F.log(1 + F.col("n_tokens"))
        + _QC_W_TTR * F.col("ttr")
        + _QC_W_STOP * F.col("stop_ratio")
        + _QC_W_AVGLEN * F.col("avg_len")
    )
    prob = 1.0 / (1.0 + F.exp(-logit))
    return feat.select(
        "doc_id",
        "source",
        "n_tokens",
        round6(logit).alias("logit"),
        round6(prob).alias("quality_prob"),
        (prob >= 0.5).alias("admitted"),
    )


register("cur_quality_classifier", _qc_oracle())(cur_quality_classifier)


# --------------------------------------------------------------------------
# Exact-substring cut application: splice the duplicated spans OUT
# --------------------------------------------------------------------------
# `text_dup_spans` produces the cut list; this query APPLIES it — the
# stage that actually emits deduplicated text downstream (Lee et al.
# 2022 apply step).  The span relation is joined back on doc_id (both
# sides partitioned on doc_id; spans are a small fraction of docs),
# then the splice itself is pure scan-local higher-order expressions:
# tokens tagged with positions, positions inside any span dropped, the
# remainder re-joined — no explode, no per-row Python, no second
# shuffle.  Output carries the md5 of the cleaned text (downstream
# hash-compares), not the text itself.
_SPAN_CUT_ORACLE = f"""
WITH {_TOKENS_CTE},
{_SPAN_ISL_CTES},
cut AS (
    SELECT doc_id, min(pos) AS span_start, max(pos) + 2 AS span_end
    FROM isl GROUP BY doc_id, grp
    HAVING count(*) >= {_SPAN_MIN_GRAMS}
),
positions AS (
    SELECT doc_id, CAST(i AS INTEGER) AS pos, t[i] AS tok
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
    SELECT p.doc_id, p.pos, p.tok
    FROM positions p
    WHERE NOT EXISTS (SELECT 1 FROM cut c
                      WHERE c.doc_id = p.doc_id
                        AND p.pos >= c.span_start AND p.pos <= c.span_end)
),
agg AS (
    SELECT doc_id, count(*) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS cleaned
    FROM kept GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       md5(coalesce(a.cleaned, '')) AS cleaned_fp
FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
WHERE len(t.t) > 0
"""


@register("text_dup_span_cut", _SPAN_CUT_ORACLE)
def text_dup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the exact-substring cut list: remove every token covered
    by a `text_dup_spans` span and emit per-doc removal counts plus
    the md5 fingerprint of the spliced text."""
    from oxford_data_pipeline_spark.plans.textops import tokens_relation

    spans = (
        text_dup_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("spans")
        )
    )
    t = tokens_relation(spark, sf_dir)
    base = t.filter(F.size("t") > 0).join(spans, "doc_id", "left")
    # Splice by SLICING the gaps between spans instead of tagging and
    # filtering every token (r15): the previous
    # filter(transform(t, ...), s -> ... exists(spans, ...)) chain paid
    # ~2|t| + |t|x|spans| INTERPRETED lambda calls per document
    # (higher-order functions are CodegenFallback); the fold below pays
    # |spans|+2 interpreted calls per document and does the heavy
    # lifting inside native array slice/concat kernels.  Spans are
    # disjoint in gram space but adjacent islands can share ONE
    # boundary token (B.span_start == A.span_end when the gram gap is
    # exactly 1), hence the greatest(0, ...) clamp on the gap length.
    kept = F.expr(
        "CASE WHEN spans IS NULL THEN t ELSE aggregate("
        " array_sort(spans),"
        " struct(CAST(array() AS ARRAY<STRING>) AS arr, 0 AS prev),"
        " (acc, sp) -> struct("
        "   concat(acc.arr, slice(t, acc.prev + 1,"
        "          greatest(0, sp.span_start - acc.prev - 1))) AS arr,"
        "   sp.span_end AS prev),"
        " acc -> concat(acc.arr, slice(t, acc.prev + 1,"
        "               size(t) - acc.prev))) END"
    )
    tagged = base.select(
        "doc_id", F.size("t").cast("long").alias("n_tokens"), kept.alias("kept")
    )
    return tagged.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("kept")).cast("long").alias("n_removed"),
        F.md5(F.array_join("kept", " ")).alias("cleaned_fp"),
    )


# --------------------------------------------------------------------------
# Quality-classifier TRAINING (relational IRLS logistic regression)
# --------------------------------------------------------------------------
# `cur_quality_classifier` scores the corpus with a weight vector and
# documents that "production swaps the literal vector for the trained
# one" — THIS query is that training step, in-engine: logistic
# regression fit by IRLS (iteratively reweighted least squares), each
# iteration one corpus aggregation + a closed-form 3×3 weighted
# normal-equations solve (Cramer), unrolled for a fixed iteration
# count exactly like the Lloyd quantizer.  The same shape scales to
# 100 TB because an iteration is ONE map-side-combinable aggregate
# over scan-local features — no gradient server, no per-row Python.
# Weak labels stand in for LLM-graded ones (the FineWeb-Edu recipe):
# y = (n_chars ≥ 350), predicted from token-side features x1 =
# ln(1+n_tokens), x2 = type-token ratio — related but not derived, so
# the problem is noisy and non-separable.  Ridge 1e-3 keeps the solve
# conditioned; every per-row float (eta, p, w, z) and every beta is
# round6-nudged so both engines walk the identical IRLS trajectory.
_LR_RIDGE = "0.001e0"
_LR_ITERS = 3
_LR_LABEL_CHARS = 350


def _lr_iter_ctes(i: int) -> str:
    r6 = lambda x: f"round(({x}) * 1000000 + 0.01, 0) / 1000000 + 0"  # noqa: E731
    return f"""it{i} AS (
    SELECT f.y, f.x1, f.x2,
           {r6(f"b.b0 + b.b1 * f.x1 + b.b2 * f.x2")} AS eta
    FROM feat f CROSS JOIN beta{i - 1} b
),
pw{i} AS (
    SELECT y, x1, x2, eta, p,
           greatest({r6("p * (1.0e0 - p)")}, 0.000001e0) AS w
    FROM (SELECT *, {r6("1.0e0 / (1.0e0 + exp(-eta))")} AS p FROM it{i})
),
zz{i} AS (
    SELECT y, x1, x2, w,
           {r6("eta + (CAST(y AS DOUBLE) - p) / w")} AS z
    FROM pw{i}
),
ag{i} AS (
    SELECT sum(w) + {_LR_RIDGE} AS sa, sum(w * x1) AS sb, sum(w * x2) AS sc,
           sum(w * x1 * x1) + {_LR_RIDGE} AS sd, sum(w * x1 * x2) AS se,
           sum(w * x2 * x2) + {_LR_RIDGE} AS sf,
           sum(w * z) AS r0, sum(w * x1 * z) AS r1, sum(w * x2 * z) AS r2
    FROM zz{i}
),
beta{i} AS (
    SELECT {r6("(r0 * (sd * sf - se * se) - sb * (r1 * sf - se * r2)"
               " + sc * (r1 * se - sd * r2)) / det")} AS b0,
           {r6("(sa * (r1 * sf - se * r2) - r0 * (sb * sf - se * sc)"
               " + sc * (sb * r2 - r1 * sc)) / det")} AS b1,
           {r6("(sa * (sd * r2 - se * r1) - sb * (sb * r2 - r1 * sc)"
               " + r0 * (sb * se - sd * sc)) / det")} AS b2
    FROM (SELECT *, sa * (sd * sf - se * se) - sb * (sb * sf - se * sc)
                    + sc * (sb * se - sd * sc) AS det
          FROM ag{i})
)"""


def _lr_train_oracle() -> str:
    from oxford_data_pipeline_spark.plans.textops import _TOKENS_CTE

    iters = ",\n".join(_lr_iter_ctes(i) for i in range(1, _LR_ITERS + 1))
    n = _LR_ITERS
    return f"""
WITH {_TOKENS_CTE},
feat AS (
    SELECT round(ln(1.0e0 + len(t)) * 1000000 + 0.01, 0) / 1000000 + 0 AS x1,
           round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS x2,
           CASE WHEN d.n_chars >= {_LR_LABEL_CHARS} THEN 1 ELSE 0 END AS y
    FROM toks k JOIN documents d ON d.doc_id = k.doc_id
    WHERE len(t) > 0
),
beta0 AS (SELECT 0.0e0 AS b0, 0.0e0 AS b1, 0.0e0 AS b2),
{iters},
final AS (
    SELECT f.y,
           round((b.b0 + b.b1 * f.x1 + b.b2 * f.x2) * 1000000 + 0.01, 0)
               / 1000000 + 0 AS eta
    FROM feat f CROSS JOIN beta{n} b
),
acc AS (
    SELECT round(avg(CASE WHEN (eta >= 0) = (y = 1) THEN 1.0e0 ELSE 0.0e0 END)
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS train_acc,
           count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
    FROM final
)
SELECT w.feature, w.weight, a.train_acc, a.n, a.n_pos
FROM (
    SELECT 'bias' AS feature, b0 AS weight FROM beta{n}
    UNION ALL SELECT 'log_tokens', b1 FROM beta{n}
    UNION ALL SELECT 'ttr', b2 FROM beta{n}
) w CROSS JOIN acc a
"""


@register("cur_classifier_train", _lr_train_oracle())
def cur_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine logistic-regression training (see section comment):
    3 unrolled IRLS iterations; per iteration the 1-row beta
    relation broadcasts into the scan-local feature pass, one
    aggregation produces the weighted normal equations, and Cramer's
    rule yields the next beta — checkpointed eagerly (3 doubles) so
    the lineage stays flat."""
    from oxford_data_pipeline_spark.plans.textops import tokens_relation

    ridge = float(_LR_RIDGE[:-2])
    toks = tokens_relation(spark, sf_dir).filter(F.size("t") > 0)
    nt = F.size("t")
    feat = (
        toks
        .select(
            round6(F.log(F.lit(1.0) + nt)).alias("x1"),
            round6(F.size(F.array_distinct("t")).cast("double") / nt).alias("x2"),
            (F.col("n_chars") >= _LR_LABEL_CHARS).cast("int").alias("y"),
        )
    )
    feat = bounded_once(feat)  # one feature pass feeds all iterations (lazy, r15)
    spark_session = feat.sparkSession
    beta = spark_session.createDataFrame(
        [(0.0, 0.0, 0.0)], "b0 double, b1 double, b2 double"
    )
    for _ in range(_LR_ITERS):
        t = feat.crossJoin(F.broadcast(beta))
        eta = round6(F.col("b0") + F.col("b1") * F.col("x1")
                     + F.col("b2") * F.col("x2"))
        t = t.withColumn("eta", eta)
        t = t.withColumn("p", round6(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta")))))
        t = t.withColumn(
            "w",
            F.greatest(round6(F.col("p") * (F.lit(1.0) - F.col("p"))),
                       F.lit(1e-6)),
        )
        t = t.withColumn(
            "z",
            round6(F.col("eta")
                   + (F.col("y").cast("double") - F.col("p")) / F.col("w")),
        )
        w, x1, x2, z = F.col("w"), F.col("x1"), F.col("x2"), F.col("z")
        ag = t.agg(
            (F.sum(w) + ridge).alias("sa"),
            F.sum(w * x1).alias("sb"),
            F.sum(w * x2).alias("sc"),
            (F.sum(w * x1 * x1) + ridge).alias("sd"),
            F.sum(w * x1 * x2).alias("se"),
            (F.sum(w * x2 * x2) + ridge).alias("sf"),
            F.sum(w * z).alias("r0"),
            F.sum(w * x1 * z).alias("r1"),
            F.sum(w * x2 * z).alias("r2"),
        )
        sa, sb, sc = F.col("sa"), F.col("sb"), F.col("sc")
        sd, se, sf_ = F.col("sd"), F.col("se"), F.col("sf")
        r0, r1, r2 = F.col("r0"), F.col("r1"), F.col("r2")
        det = (sa * (sd * sf_ - se * se) - sb * (sb * sf_ - se * sc)
               + sc * (sb * se - sd * sc))
        beta = ag.select(
            round6((r0 * (sd * sf_ - se * se) - sb * (r1 * sf_ - se * r2)
                    + sc * (r1 * se - sd * r2)) / det).alias("b0"),
            round6((sa * (r1 * sf_ - se * r2) - r0 * (sb * sf_ - se * sc)
                    + sc * (sb * r2 - r1 * sc)) / det).alias("b1"),
            round6((sa * (sd * r2 - se * r1) - sb * (sb * r2 - r1 * sc)
                    + r0 * (sb * se - sd * sc)) / det).alias("b2"),
        )
        beta = bounded_once(beta)
    scored = feat.crossJoin(F.broadcast(beta)).withColumn(
        "eta",
        round6(F.col("b0") + F.col("b1") * F.col("x1")
               + F.col("b2") * F.col("x2")),
    )
    acc = scored.agg(
        round6(
            F.avg(
                F.when((F.col("eta") >= 0) == (F.col("y") == 1), 1.0)
                .otherwise(0.0)
            )
        ).alias("train_acc"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    weights = beta.selectExpr(
        "stack(3, 'bias', b0, 'log_tokens', b1, 'ttr', b2)"
        " AS (feature, weight)"
    )
    return weights.crossJoin(F.broadcast(acc)).select(
        "feature", "weight", "train_acc", "n", "n_pos"
    )


# The train→serve composition: score the corpus with the TRAINED beta
# (the literal-weights inference query's production shape, end-to-end
# in-engine).  The trained beta is memoized like every model artifact.
_lr_beta_cache: dict[tuple, DataFrame] = {}


def _trained_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oxford_data_pipeline_spark.plans.memo import memoized

    def build() -> DataFrame:
        return (
            cur_classifier_train(spark, sf_dir)
            .groupBy()
            .pivot("feature", ["bias", "log_tokens", "ttr"])
            .agg(F.first("weight"))
            .select(
                F.col("bias").alias("b0"),
                F.col("log_tokens").alias("b1"),
                F.col("ttr").alias("b2"),
            )
        )

    return memoized(
        _lr_beta_cache, spark, (sf_dir, _LR_ITERS, _LR_LABEL_CHARS), build
    )


def _lr_scored_oracle() -> str:
    from oxford_data_pipeline_spark.plans.textops import _TOKENS_CTE

    iters = ",\n".join(_lr_iter_ctes(i) for i in range(1, _LR_ITERS + 1))
    return f"""
WITH {_TOKENS_CTE},
feat0 AS (
    SELECT doc_id,
           round(ln(1.0e0 + len(t)) * 1000000 + 0.01, 0) / 1000000 + 0 AS x1,
           round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS x2,
           CASE WHEN n_chars >= {_LR_LABEL_CHARS} THEN 1 ELSE 0 END AS y
    FROM toks
    WHERE len(t) > 0
),
feat AS (SELECT x1, x2, y FROM feat0),
beta0 AS (SELECT 0.0e0 AS b0, 0.0e0 AS b1, 0.0e0 AS b2),
{iters},
scored AS (
    SELECT f.doc_id, f.y,
           round((b.b0 + b.b1 * f.x1 + b.b2 * f.x2) * 1000000 + 0.01, 0)
               / 1000000 + 0 AS eta
    FROM feat0 f CROSS JOIN beta{_LR_ITERS} b
)
SELECT doc_id,
       eta AS logit,
       round(1.0e0 / (1.0e0 + exp(-eta)) * 1000000 + 0.01, 0) / 1000000 + 0
           AS quality_prob,
       eta >= 0 AS admitted,
       y = 1 AS weak_label
FROM scored
"""


@register("cur_classifier_scored", _lr_scored_oracle())
def cur_classifier_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scoring with the TRAINED classifier (train→serve,
    end-to-end in-engine), in EXACTLY the production shape the
    fixed-weights inference query documents ("production swaps the
    literal vector for the trained one"): the memoized trained beta —
    a 3-double model artifact — is embedded as plan literals (the
    `stream_ann.centroid_literal` convention), so scoring is the same
    scan-local zero-join pass as `cur_quality_classifier`."""
    from oxford_data_pipeline_spark.plans.textops import tokens_relation

    b = _trained_beta(spark, sf_dir).collect()[0]  # 3 doubles: the model
    toks = tokens_relation(spark, sf_dir).filter(F.size("t") > 0)
    nt = F.size("t")
    feat = toks.select(
        "doc_id",
        round6(F.log(F.lit(1.0) + nt)).alias("x1"),
        round6(F.size(F.array_distinct("t")).cast("double") / nt).alias("x2"),
        (F.col("n_chars") >= _LR_LABEL_CHARS).cast("int").alias("y"),
    )
    eta = round6(
        F.lit(b["b0"]) + F.lit(b["b1"]) * F.col("x1")
        + F.lit(b["b2"]) * F.col("x2")
    )
    return feat.withColumn("eta", eta).select(
        "doc_id",
        F.col("eta").alias("logit"),
        round6(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta")))).alias(
            "quality_prob"
        ),
        (F.col("eta") >= 0).alias("admitted"),
        (F.col("y") == 1).alias("weak_label"),
    )


# Calibration report over the trained classifier's scores: decile
# reliability bins (predicted probability vs observed weak-label rate)
# — the standard post-training audit before a probability threshold is
# trusted as an admission dial.  Bounded output (≤10 rows); the only
# corpus-sized work is the same scan the scoring query does.
def _lr_calibration_oracle() -> str:
    scored = _lr_scored_oracle()
    return f"""
WITH scored AS ({scored})
SELECT CAST(least(floor(quality_prob * 10), 9) AS INTEGER) AS bin,
       count(*) AS n,
       round(avg(quality_prob) * 1000000 + 0.01, 0) / 1000000 + 0
           AS mean_prob,
       round(avg(CASE WHEN weak_label THEN 1.0e0 ELSE 0.0e0 END)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS obs_rate
FROM scored
GROUP BY 1
"""


@register("cur_classifier_calibration", _lr_calibration_oracle())
def cur_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile reliability bins of the trained classifier (see comment):
    per bin, document count, mean predicted probability, and observed
    weak-label rate — the calibration audit that says whether
    `quality_prob >= τ` is a trustworthy admission dial."""
    scored = cur_classifier_scored(spark, sf_dir)
    bin_ = F.least(F.floor(F.col("quality_prob") * 10), F.lit(9)).cast("int")
    return (
        scored.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round6(F.avg("quality_prob")).alias("mean_prob"),
            round6(
                F.avg(F.when(F.col("weak_label"), 1.0).otherwise(0.0))
            ).alias("obs_rate"),
        )
    )


# --------------------------------------------------------------------------
# Full-feature classifier training (d-dimensional IRLS)
# --------------------------------------------------------------------------
# The 2-D trainer above is hash-checked against an unrolled-CTE oracle;
# its 3×3 Cramer solve does not scale past a couple of features.  This
# is the d ≤ ~8 tier (round-8 verdict item 7): the SAME IRLS trajectory
# discipline (every per-row float and every beta round6-nudged, fixed
# iteration count, ridge-conditioned), over the full feature set the
# quality plans already compute — log-tokens, type-token ratio,
# stopword ratio, mean token length, top-term concentration — with the
# normal equations assembled by ONE map-side-combinable aggregation
# (d(d+1)/2 + d sums) and solved by a 1-row grouped-Arrow kernel
# (np.linalg.solve on a d×d matrix — O(d³) on one row, never
# corpus-sized).  Registered rows-only: the d-feature solve is not
# SQL-expressible at hash grain; the numpy-replay property test pins
# the exact trajectory and the calibration-parity test pins quality
# vs the 2-D baseline.
_LR_FULL_NAMES = [
    "bias", "log_tokens", "ttr", "stop_ratio", "avg_len", "top_tf_ratio",
]


def _lr_full_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x: array<double>) — x[0] = 1.0 bias, then the five
    scan-local features, each round6-nudged (engine-deterministic
    trajectory)."""
    from oxford_data_pipeline_spark.operators.textops import (
        STOPWORDS,
        count_in_list,
    )
    from oxford_data_pipeline_spark.plans.textops import tokens_relation

    toks = tokens_relation(spark, sf_dir).filter(F.size("t") > 0)
    n = F.size("t")
    # max token multiplicity RELATIONALLY (explode -> per-(doc, token)
    # count -> per-doc max): the previous in-array
    # array_max(transform(array_distinct(t), u -> size(filter(t, ...))))
    # is O(|t|^2) INTERPRETED lambda evals per document — quadratic in
    # doc length and a straggler risk on long documents at scale; the
    # relational form is linear, codegen, and map-side-combinable.
    # Same value per doc (every toks row has size(t) > 0, so the inner
    # join drops nothing).
    top_tf_rel = (
        toks.select("doc_id", F.explode("t").alias("u"))
        .groupBy("doc_id", "u")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tf"))
    )
    return toks.join(top_tf_rel, "doc_id").select(
        "doc_id",
        F.array(
            F.lit(1.0),
            round6(F.log(F.lit(1.0) + n)),
            round6(F.size(F.array_distinct("t")).cast("double") / n),
            round6(count_in_list(F.col("t"), STOPWORDS).cast("double") / n),
            round6(
                F.length(F.regexp_replace("norm", " ", "")).cast("double") / n
            ),
            round6(F.col("top_tf").cast("double") / n),
        ).alias("x"),
        (F.col("n_chars") >= _LR_LABEL_CHARS).cast("int").alias("y"),
    )


@register("cur_classifier_train_full", None)
def cur_classifier_train_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d-feature IRLS logistic regression (see section comment):
    per iteration one corpus aggregation builds the weighted normal
    equations, a 1-row Arrow kernel solves them, and the d-double beta
    is checkpointed — identical scale shape to the 2-D trainer, the
    solve generalized."""
    import pandas as pd  # noqa: F401  (applyInPandas dependency)

    d = len(_LR_FULL_NAMES)
    ridge = float(_LR_RIDGE[:-2])
    feat = bounded_once(_lr_full_features(spark, sf_dir))
    sess = feat.sparkSession
    beta = sess.createDataFrame([([0.0] * d,)], "b array<double>")

    def xi(i: int):
        return F.element_at("x", i + 1)

    def solve(pdf):
        import numpy as np
        import pandas as pd

        A = np.zeros((d, d))
        rhs = np.zeros(d)
        for i in range(d):
            rhs[i] = float(pdf[f"r_{i}"].iloc[0])
            for j in range(i, d):
                A[i, j] = A[j, i] = float(pdf[f"s_{i}_{j}"].iloc[0])
        A += np.eye(d) * ridge
        nb = np.linalg.solve(A, rhs)
        nb = np.round(nb * 1e6 + 0.01) / 1e6  # the round6 nudge
        return pd.DataFrame({"b": [[float(v) for v in nb]]})

    # x . b unrolled over the d known features (codegen; float-identical
    # to the previous aggregate(zip_with(...)) fold — see pair_dot)
    from oxford_data_pipeline_spark.plans.projection import pair_dot

    for _ in range(_LR_ITERS):
        t = feat.crossJoin(F.broadcast(beta))
        eta = round6(pair_dot("x", "b", d))
        t = t.withColumn("eta", eta)
        t = t.withColumn(
            "p", round6(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta"))))
        )
        t = t.withColumn(
            "w",
            F.greatest(
                round6(F.col("p") * (F.lit(1.0) - F.col("p"))), F.lit(1e-6)
            ),
        )
        t = t.withColumn(
            "z",
            round6(
                F.col("eta")
                + (F.col("y").cast("double") - F.col("p")) / F.col("w")
            ),
        )
        w = F.col("w")
        aggs = [
            F.sum(w * xi(i) * xi(j)).alias(f"s_{i}_{j}")
            for i in range(d)
            for j in range(i, d)
        ] + [F.sum(w * xi(i) * F.col("z")).alias(f"r_{i}") for i in range(d)]
        sums = t.agg(*aggs)
        beta = bounded_once(
            sums.withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(solve, "b array<double>")
        )

    scored = feat.crossJoin(F.broadcast(beta)).withColumn(
        "eta", round6(pair_dot("x", "b", d))
    )
    acc = scored.agg(
        round6(
            F.avg(
                F.when((F.col("eta") >= 0) == (F.col("y") == 1), 1.0)
                .otherwise(0.0)
            )
        ).alias("train_acc"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    names = F.array(*[F.lit(s) for s in _LR_FULL_NAMES])
    weights = beta.select(
        F.posexplode("b").alias("pos", "weight")
    ).withColumn("feature", F.element_at(names, F.col("pos") + 1))
    return weights.crossJoin(F.broadcast(acc)).select(
        "feature", "weight", "train_acc", "n", "n_pos"
    )


# The d-feature train→serve→calibration chain (round-9 verdict item 4
# — "production would serve the better model"): the SAME production
# shape as the 2-D chain above, generalized.  The trained d-double
# beta is a memoized model artifact embedded as plan literals, so
# serving stays a scan-local zero-join pass; the calibration report is
# the same decile-reliability audit.  Registered rows-only (the
# d-feature solve is not SQL-expressible at hash grain); the parity
# floor test asserts the d=6 model is at least as reliable as the
# hash-checked 2-D baseline.
_lr_full_beta_cache: dict[tuple, DataFrame] = {}


def _trained_beta_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oxford_data_pipeline_spark.plans.memo import memoized

    def build() -> DataFrame:
        return (
            cur_classifier_train_full(spark, sf_dir)
            .groupBy()
            .pivot("feature", _LR_FULL_NAMES)
            .agg(F.first("weight"))
        )

    return memoized(
        _lr_full_beta_cache,
        spark,
        (sf_dir, _LR_ITERS, _LR_LABEL_CHARS, "full"),
        build,
    )


@register("cur_classifier_scored_full", None)
def cur_classifier_scored_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scoring with the TRAINED d-feature classifier — the 2-D
    `cur_classifier_scored` production shape with the richer model a
    deployment would actually serve: the memoized trained beta (d
    doubles) is embedded as plan literals, so scoring is the same
    scan-local zero-join feature pass + dot product, no join, no
    model relation at serve time."""
    b = _trained_beta_full(spark, sf_dir).collect()[0]  # d doubles
    eta_expr = None
    for i, name in enumerate(_LR_FULL_NAMES):
        term = F.lit(float(b[name])) * F.element_at("x", i + 1)
        eta_expr = term if eta_expr is None else eta_expr + term
    feat = _lr_full_features(spark, sf_dir)
    return feat.withColumn("eta", round6(eta_expr)).select(
        "doc_id",
        F.col("eta").alias("logit"),
        round6(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta")))).alias(
            "quality_prob"
        ),
        (F.col("eta") >= 0).alias("admitted"),
        (F.col("y") == 1).alias("weak_label"),
    )


@register("cur_classifier_calibration_full", None)
def cur_classifier_calibration_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decile reliability bins of the d-feature classifier — the same
    bounded (≤10-row) audit as `cur_classifier_calibration`, over the
    model a deployment would serve."""
    scored = cur_classifier_scored_full(spark, sf_dir)
    bin_ = F.least(F.floor(F.col("quality_prob") * 10), F.lit(9)).cast("int")
    return scored.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        round6(F.avg("quality_prob")).alias("mean_prob"),
        round6(
            F.avg(F.when(F.col("weak_label"), 1.0).otherwise(0.0))
        ).alias("obs_rate"),
    )


# --------------------------------------------------------------------------
# Exact-substring duplication: window profile + unbounded longest match
# --------------------------------------------------------------------------
# The exact-substring dedup family of Lee et al., "Deduplicating
# Training Data Makes Language Models Better" (ACL 2022): their
# suffix-array pass finds duplicated substrings of UNBOUNDED length,
# where the fixed-n shingle ops (`text_dup_spans`) only see one window
# size.  Spark-first re-expression: a suffix array's global sort is
# the wrong primitive on a shared-nothing engine; what the dedup
# decision needs is (a) the duplication mass at each scale and (b) the
# maximum duplicated length — and both reduce to the question "does
# any length-L window repeat", which is ONE map-side-combinable hash
# aggregation per L.  `text_dup_window_profile` answers (a) over a
# geometric L grid in a single pass union; `text_longest_dup_substring`
# answers (b) by BISECTING on L (duplication is monotone: a repeated
# L-window contains repeated shorter windows), ~log2(max_doc_len)
# rounds of one aggregation each — the same O(corpus) exchange volume
# per round as a suffix-array bucket sort, with no global sort and a
# bounded driver scalar per round.  Exchanges are keyed on md5(window)
# fingerprints, never window text (the paragraph-tier discipline);
# the final answer is re-verified on exact text.
_DUP_WINDOW_GRID = (8, 16, 32, 64, 128, 256, 512)


def _dup_window_branch_sql(L: int) -> str:
    return f"""
SELECT CAST({L} AS BIGINT) AS win_len,
       CAST(count(*) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS n_dup_positions
FROM (
    SELECT md5(substr(text, CAST(i AS INTEGER), {L})) AS w, count(*) AS c
    FROM documents,
         unnest(range(1, greatest(length(text) - {L} + 2, 1))) AS t(i)
    GROUP BY 1 HAVING count(*) >= 2
)"""


_DUP_WINDOW_ORACLE = "\nUNION ALL\n".join(
    _dup_window_branch_sql(L) for L in _DUP_WINDOW_GRID
)


def _dup_windows_at(docs: DataFrame, L: int, fingerprint: bool = True):
    """(window-key, count) for length-L windows occurring >= 2 times.
    Windows are generated scan-locally (sequence + substring, pure JVM
    array algebra) and hash-aggregated with map-side combine, so the
    exchange carries one row per DISTINCT window key — md5 fingerprints
    by default, exact text for the final verification pass."""
    pos = docs.select(
        "text",
        F.explode(
            F.expr(f"sequence(1, greatest(length(text) - {L} + 1, 1))")
        ).alias("pos"),
    ).filter(F.length("text") >= L)
    key = F.expr(f"substring(text, pos, {L})")
    if fingerprint:
        key = F.md5(key.cast("binary"))
    return (
        pos.select(key.alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
    )


@register("text_dup_window_profile", _DUP_WINDOW_ORACLE)
def text_dup_window_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication mass per window scale (see section comment): for
    each L in the geometric grid, how many distinct length-L windows
    repeat and how many positions they cover."""
    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    branches = []
    for L in _DUP_WINDOW_GRID:
        grp = _dup_windows_at(docs, L)
        branches.append(
            grp.agg(
                F.count("*").alias("n_dup_windows"),
                F.coalesce(F.sum("c"), F.lit(0)).alias("n_dup_positions"),
            ).select(
                F.lit(L).cast("long").alias("win_len"),
                F.col("n_dup_windows"),
                F.col("n_dup_positions"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


@register("text_longest_dup_substring", None)
def text_longest_dup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The longest substring occurring >= 2 times anywhere in the
    corpus (within or across documents), by bisection on window length
    (see section comment).  Rows-only by design: the bisection is
    iterative driver-side control flow over bounded scalars (one
    has-duplicate boolean per round), like the cross-validated ML
    loops.  The reported maximum is re-verified on EXACT window text
    (fingerprint probes could in principle collide); on a collision
    the search resumes below the refuted length.  Returns one row:
    (max_dup_len, n_dup_windows, n_dup_positions, sample_window)."""
    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    return longest_dup_substring_relation(spark, docs)


def longest_dup_substring_relation(
    spark: SparkSession, docs: DataFrame
) -> DataFrame:
    """Relation-form core of `text_longest_dup_substring` over any
    (text) relation — reused by the crawl example to quantify what the
    paragraph tier removed (the audit's max length shrinks when the
    repeated boilerplate is spliced out)."""
    docs = docs.select("text").persist()
    try:
        max_len = docs.agg(
            F.coalesce(F.max(F.length("text")), F.lit(0))
        ).first()[0]

        def has_dup(L: int) -> bool:
            return bool(_dup_windows_at(docs, L).limit(1).count())

        hi = int(max_len)
        while hi >= 1:
            # invariant: every length > hi is duplicate-free
            if not has_dup(1):
                break
            lo = 1  # longest length KNOWN duplicated
            while lo < hi:
                mid = (lo + hi + 1) // 2
                if has_dup(mid):
                    lo = mid
                else:
                    hi = mid - 1
            exact = (
                _dup_windows_at(docs, lo, fingerprint=False)
                .orderBy(F.col("c").desc(), F.col("w"))
                .limit(1)
                .collect()
            )
            if exact:
                stats = _dup_windows_at(docs, lo, fingerprint=False).agg(
                    F.count("*").alias("nw"), F.sum("c").alias("np")
                ).first()
                return spark.createDataFrame(
                    [(lo, stats["nw"], stats["np"], exact[0]["w"])],
                    "max_dup_len long, n_dup_windows long,"
                    " n_dup_positions long, sample_window string",
                )
            hi = lo - 1  # fingerprint collision refuted lo: resume below
        return spark.createDataFrame(
            [(0, 0, 0, "")],
            "max_dup_len long, n_dup_windows long, n_dup_positions long,"
            " sample_window string",
        )
    finally:
        docs.unpersist()
