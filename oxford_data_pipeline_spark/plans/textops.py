"""Text-analysis queries over `documents` (training-data pipeline ops:
quality scoring, token stats, language ID, fingerprinting).

All stay in JVM built-ins; each has a DuckDB oracle. Per-doc work is
embarrassingly parallel — no shuffles except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.operators.textops import (
    LANG_MARKERS,
    STOPWORDS,
    count_in_list,
    normalized,
    tokens,
)
from oxford_data_pipeline_spark.plans.memo import memoized
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import fan_out, load_table

# Shared oracle CTE: normalized text + token list per doc.
_TOKENS_CTE = """
toks AS (
    SELECT doc_id, lang, source, n_chars, text,
           trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')) AS norm,
           list_filter(regexp_split_to_array(
               trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +'),
               x -> x <> '') AS t
    FROM documents
)
"""

_tokens_cache: dict[tuple, DataFrame] = {}


def tokens_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical tokenized-documents relation: (doc_id, lang,
    source, n_chars, text, norm, t).  Persisted + memoized — five
    queries (text_quality/langid/fingerprint/token_count and
    dedup_simhash) re-derive it otherwise, and the regex tokenizer is
    the dominant per-doc cost.  In production this is a materialized
    tokenization table maintained alongside the corpus."""

    def build() -> DataFrame:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        return docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "text",
            normalized("text").alias("norm"),
            tokens(normalized("text")).alias("t"),
        )

    return memoized(_tokens_cache, spark, (sf_dir,), build)


def _tokens_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens_relation(spark, sf_dir)


# --------------------------------------------------------------------------
# Quality scoring + token counting
# --------------------------------------------------------------------------
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

_QUALITY_ORACLE = f"""
WITH {_TOKENS_CTE},
feat AS (
    SELECT doc_id, lang,
           length(replace(norm, ' ', '')) AS n_token_chars,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_types,
           len(list_filter(t, x -> list_contains({_STOP_SQL}, x))) AS n_stop
    FROM toks
)
SELECT doc_id, lang, n_tokens, n_types,
       round(CAST(n_types AS DOUBLE) / n_tokens * 1000000 + 0.01, 0) / 1000000 + 0 AS type_token_ratio,
       round(CAST(n_stop AS DOUBLE) / n_tokens * 1000000 + 0.01, 0) / 1000000 + 0 AS stopword_ratio,
       round(n_token_chars * 1.0 / n_tokens * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_token_len,
       round((least(n_tokens / 50.0, 1.0) * 0.5
             + (CAST(n_types AS DOUBLE) / n_tokens) * 0.3
             + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.2) * 1000000 + 0.01, 0) / 1000000 + 0 AS quality_score
FROM feat
WHERE n_tokens > 0
"""


@register("text_quality", _QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + token counting: length/type-token/stopword
    features combined into a deterministic [0,1] quality score."""
    t = _tokens_df(spark, sf_dir)
    feat = t.select(
        "doc_id",
        "lang",
        "norm",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_types"),
        count_in_list(F.col("t"), STOPWORDS).alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    ttr = F.col("n_types").cast("double") / F.col("n_tokens")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    return feat.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_types",
        round6(ttr).alias("type_token_ratio"),
        round6(stop_ratio).alias("stopword_ratio"),
        round6(
            F.length(F.regexp_replace("norm", " ", "")) * F.lit(1.0) / F.col("n_tokens")
        ).alias("avg_token_len"),
        round6(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.5
            + ttr * 0.3
            + (1.0 - stop_ratio) * 0.2
        ).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# --------------------------------------------------------------------------
_marker_sqls = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in LANG_MARKERS.items()
}
_score_cols_sql = ",\n           ".join(
    f"len(list_filter(t, x -> list_contains({arr}, x))) AS s_{lang}"
    for lang, arr in _marker_sqls.items()
)
_langs = list(LANG_MARKERS)
_best_sql = "GREATEST(" + ", ".join(f"s_{lang}" for lang in _langs) + ")"
_case_sql = "CASE " + " ".join(
    f"WHEN s_{lang} = {_best_sql} THEN '{lang}'" for lang in _langs
) + " END"

_LANGID_ORACLE = f"""
WITH {_TOKENS_CTE},
scored AS (
    SELECT doc_id, lang AS true_lang,
           {_score_cols_sql}
    FROM toks
)
SELECT doc_id, true_lang,
       CASE WHEN {_best_sql} = 0 THEN 'und' ELSE {_case_sql} END AS pred_lang,
       {_best_sql} AS marker_hits
FROM scored
"""


@register("text_langid", _LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: marker-word hit counts per language, argmax with a
    fixed language-priority tiebreak (en > es > de > fr > zh)."""
    t = _tokens_df(spark, sf_dir)
    scored = t.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        *[
            count_in_list(F.col("t"), words).alias(f"s_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _langs])
    pred = F.lit(None).cast("string")
    # build CASE chain in declaration order (first max wins)
    chain = None
    for lang in _langs:
        cond = F.col(f"s_{lang}") == best
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    return scored.select(
        "doc_id",
        "true_lang",
        F.when(best == 0, "und").otherwise(chain).alias("pred_lang"),
        best.alias("marker_hits"),
    )


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------
_FP_ORACLE = f"""
WITH {_TOKENS_CTE}
SELECT doc_id,
       md5(norm) AS exact_fp,
       md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bag_fp,
       len(t) AS n_tokens
FROM toks
"""


@register("text_fingerprint", _FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (`exact_fp` = content hash of normalized
    text; `bag_fp` = order-insensitive token-set hash)."""
    t = _tokens_df(spark, sf_dir)
    return t.select(
        "doc_id",
        F.md5("norm").alias("exact_fp"),
        F.md5(F.array_join(F.array_sort(F.array_distinct("t")), " ")).alias("bag_fp"),
        F.size("t").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# BPE-ish tokenization + rolling-hash fingerprint
# --------------------------------------------------------------------------
_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"
_ROLL_B, _ROLL_M = 1000003, 1000000007

_TOKCOUNT_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, lang,
           regexp_extract_all(lower(text), '{_BPE_PATTERN}') AS bpe,
           list_filter(regexp_split_to_array(
               trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +'),
               x -> x <> '') AS ws
    FROM documents
),
coded AS (
    SELECT doc_id, lang, len(bpe) AS n_bpe_tokens, len(ws) AS n_ws_tokens,
           list_transform(ws, t -> ascii(substr(t, 1, 1)) * 131 + length(t)) AS codes
    FROM tok
)
SELECT doc_id, lang, n_bpe_tokens, n_ws_tokens,
       round(CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens * 1000000 + 0.01, 0) / 1000000 + 0
           AS bpe_ws_ratio,
       CASE WHEN len(codes) > 0 THEN
           list_reduce(codes, (a, x) -> (a * {_ROLL_B} + x) % {_ROLL_M})
       END AS rolling_fp
FROM coded
WHERE n_ws_tokens > 0
"""


@register("text_token_count", _TOKCOUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, two tokenizers: whitespace words and a BPE-ish
    regex (words / digit runs / individual punctuation), plus a
    polynomial rolling-hash fingerprint over the word codes
    (acc = (acc·B + code) mod M — an order-sensitive content hash,
    unlike the bag fingerprint)."""
    tok = tokens_relation(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.expr(f"regexp_extract_all(lower(text), '{_BPE_PATTERN}', 0)").alias("bpe"),
        F.col("t").alias("ws"),
    )
    coded = tok.select(
        "doc_id",
        "lang",
        F.size("bpe").alias("n_bpe_tokens"),
        F.size("ws").alias("n_ws_tokens"),
        F.expr(
            "transform(ws, t -> cast(ascii(substring(t, 1, 1)) * 131 + length(t) as bigint))"
        ).alias("codes"),
    ).filter(F.col("n_ws_tokens") > 0)
    rolling = F.expr(
        f"aggregate(slice(codes, 2, size(codes) - 1), codes[0],"
        f" (a, x) -> (a * {_ROLL_B} + x) % {_ROLL_M})"
    )
    return coded.select(
        "doc_id",
        "lang",
        "n_bpe_tokens",
        "n_ws_tokens",
        round6(F.col("n_bpe_tokens").cast("double") / F.col("n_ws_tokens")).alias(
            "bpe_ws_ratio"
        ),
        F.when(F.size("codes") > 0, rolling).alias("rolling_fp"),
    )


# --------------------------------------------------------------------------
# BPE tokenizer training (relational merge loop) + compression report
# --------------------------------------------------------------------------
# The trainer runs on the VOCAB relation (distinct words + counts —
# Heaps-bounded, not corpus-sized); the corpus is touched once for
# word counting and once for the compression join.  The fixed merge
# count makes the iterative trainer ORACLE-CHECKABLE after all: the
# loop unrolls into an n_merges-stage CTE chain (pair counts ->
# argmax -> greedy merge per stage), generated below, so DuckDB
# reproduces the merge sequence exactly; the merge sequence is also
# cross-checked against a pure-Python reference BPE in
# tests/test_quality.py.
_BPE_N_MERGES = 20


def _bpe_oracle_ctes(n_merges: int) -> str:
    """Unrolled BPE trainer as a DuckDB CTE chain mirroring
    operators/bpe.py round-for-round.  State is a delimited symbol
    string per word: every symbol wrapped as ``|sym|`` (symbols are
    [a-z0-9]+ so '|' is safe), adjacent symbols sharing a double
    delimiter — making the greedy leftmost-first merge EXACTLY a
    left-to-right non-overlapping ``replace`` of ``|l||r|`` with
    ``|lr|`` (the wrapper consumes both symbols whole, so a pair
    can never match across a longer symbol's prefix, and consecutive
    disjoint pairs still both match).  MATERIALIZED stops DuckDB from
    inlining the chain exponentially."""
    parts = [
        r"""
words AS MATERIALIZED (
    SELECT w AS word, count(*) AS cnt
    FROM (SELECT unnest(t) AS w FROM toks)
    GROUP BY 1
),
state0 AS MATERIALIZED (
    SELECT word, regexp_replace(word, '(.)', '|\1|', 'g') AS s, cnt FROM words
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(f""",
pc{r} AS MATERIALIZED (
    SELECT syms[i] AS lft, syms[i + 1] AS rgt, sum(cnt) AS total
    FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms, cnt
          FROM state{p}),
         unnest(generate_series(1, len(syms) - 1)) AS u(i)
    GROUP BY 1, 2
),
best{r} AS MATERIALIZED (
    SELECT lft, rgt, total FROM pc{r} ORDER BY total DESC, lft, rgt LIMIT 1
),
state{r} AS MATERIALIZED (
    -- LEFT JOIN ON TRUE, not CROSS JOIN: when no pair remains before
    -- round {r} (degenerate corpora), best{r} is EMPTY and a cross
    -- join would empty the whole state chain — the Spark trainer
    -- early-breaks and keeps its state, so the oracle must too
    SELECT s.word,
           CASE WHEN b.lft IS NULL THEN s.s
                ELSE replace(s.s, '|' || b.lft || '||' || b.rgt || '|',
                             '|' || b.lft || b.rgt || '|') END AS s,
           s.cnt
    FROM state{p} s LEFT JOIN best{r} b ON TRUE
)""")
    return "".join(parts)


_BPE_MERGES_ORACLE = f"""
WITH {_TOKENS_CTE}, {_bpe_oracle_ctes(_BPE_N_MERGES)}
SELECT * FROM (
{" UNION ALL ".join(
    f'SELECT CAST({r} AS INTEGER) AS rank, lft AS "left", rgt AS "right",'
    f' CAST(total AS BIGINT) AS pair_count FROM best{r}'
    for r in range(1, _BPE_N_MERGES + 1)
)}
) ORDER BY rank
"""

_BPE_COMPRESSION_ORACLE = f"""
WITH {_TOKENS_CTE}, {_bpe_oracle_ctes(_BPE_N_MERGES)},
enc AS (
    SELECT word,
           len(list_filter(string_split(s, '|'), x -> x <> '')) AS n_syms
    FROM state{_BPE_N_MERGES}
),
occ AS (SELECT doc_id, source, unnest(t) AS word FROM toks)
SELECT o.source AS source,
       count(DISTINCT o.doc_id) AS n_docs,
       count(*) AS ws_tokens,
       CAST(sum(e.n_syms) AS BIGINT) AS bpe_symbols,
       round(sum(e.n_syms) * 1.0 / count(*) * 1000000 + 0.01, 0) / 1000000 + 0
           AS symbols_per_token
FROM occ o JOIN enc e USING (word)
GROUP BY 1
"""

_bpe_cache: dict[tuple, tuple] = {}


def _bpe_model(spark: SparkSession, sf_dir: str):
    """(merges, final vocab state) memoized per (app, sf_dir) — the
    tokenizer is a trained model artifact, like the IVF quantizer."""
    from oxford_data_pipeline_spark.operators.bpe import (
        free_local_checkpoint,
        train_bpe,
    )

    key = (spark.sparkContext.applicationId, sf_dir, _BPE_N_MERGES)
    for stale in [k for k in _bpe_cache if k[0] != key[0]]:
        # mirror plans/memo.py eviction: release the checkpointed final
        # state's blocks (no-op if the old session is already stopped)
        free_local_checkpoint(_bpe_cache[stale][1])
        del _bpe_cache[stale]
    if key not in _bpe_cache:
        words = (
            tokens_relation(spark, sf_dir)
            .select(F.explode("t").alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _bpe_cache[key] = train_bpe(words, _BPE_N_MERGES)
    return _bpe_cache[key]


@register("text_bpe_merges", _BPE_MERGES_ORACLE)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table (rank, left, right, pair_count) —
    deterministic: ties break (count desc, pair asc)."""
    merges, _state = _bpe_model(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


@register("text_bpe_compression", _BPE_COMPRESSION_ORACLE)
def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BPE compression: whitespace tokens vs BPE symbols
    after the learned merges.  Encoding = join each word occurrence
    against the trained vocab state (word -> |syms|); the corpus never
    re-walks the merge list."""
    _merges, state = _bpe_model(spark, sf_dir)
    occurrences = tokens_relation(spark, sf_dir).select(
        "doc_id", "source", F.explode("t").alias("word")
    )
    enc = state.select("word", F.size("syms").alias("n_syms"))
    return (
        occurrences.join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("n_syms").alias("bpe_symbols"),
            round6(
                F.sum("n_syms").cast("double") / F.count(F.lit(1))
            ).alias("symbols_per_token"),
        )
    )


def build_text_models(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Materialize the trained text-model artifacts (the BPE tokenizer)
    for the bench index-build phase — training is model building, not
    query work."""
    merges, state = _bpe_model(spark, sf_dir)
    return {"bpe_merges": len(merges), "bpe_vocab": state.count()}


# --------------------------------------------------------------------------
# Language-ID confusion audit
# --------------------------------------------------------------------------
# The quality gate on the langid heuristic itself: confusion counts of
# predicted vs labeled language and each cell's share of its true
# language (row-normalized recall).  In production this runs on a
# labeled sample and decides when the cheap n-gram heuristic needs a
# model upgrade; one groupBy + one broadcast-sized window.
_LANGID_CONF_ORACLE = f"""
WITH li AS ({_LANGID_ORACLE})
SELECT true_lang, pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY true_lang)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS true_share
FROM li GROUP BY 1, 2
"""


@register("text_langid_confusion", _LANGID_CONF_ORACLE)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word langid against the corpus
    `lang` label: per (true, predicted) cell, document count and the
    cell's share of its true language (row-normalized recall — the
    diagonal is per-language recall).  Composes the registered
    `text_langid` plan; the aggregate output is tiny, so the window
    runs over a broadcast-sized relation."""
    from pyspark.sql.window import Window as W

    li = text_langid(spark, sf_dir)
    cells = li.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = W.partitionBy("true_lang")
    return cells.select(
        "true_lang", "pred_lang", "n_docs",
        round6(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w)).alias("true_share"),
    )


# --------------------------------------------------------------------------
# Context-window chunking (RAG / training-sequence prep)
# --------------------------------------------------------------------------
# The standard pre-tokenization shape: each document split into
# fixed-size token windows with overlap (stride < size), one output
# row per chunk with its position and content fingerprint — what both
# RAG indexing and long-document training-sequence prep consume.
# Relationally: one bounded sequence-explode per doc (ceil(len/stride)
# rows) + scan-local slicing; no joins, no shuffle beyond the explode.
_CHUNK_SIZE = 64   # tokens per chunk
_CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = 16)

_CHUNK_ORACLE = f"""
WITH {_TOKENS_CTE},
starts AS (
    SELECT doc_id, t, CAST(s AS INTEGER) AS start_pos
    FROM toks, unnest(generate_series(1, greatest(len(t), 1), {_CHUNK_STRIDE})) AS u(s)
),
chunks AS (
    SELECT doc_id,
           CAST((start_pos - 1) / {_CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           start_pos,
           list_slice(t, start_pos, start_pos + {_CHUNK_SIZE} - 1) AS c
    FROM starts
)
SELECT doc_id, chunk_idx, start_pos,
       CAST(len(c) AS INTEGER) AS n_tokens,
       md5(array_to_string(c, ' ')) AS chunk_fp
FROM chunks
"""


@register("text_chunking", _CHUNK_ORACLE)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunks: {_CHUNK_SIZE}-token windows
    every {_CHUNK_STRIDE} tokens (16-token overlap), one row per chunk
    with start position, token count (tail chunks run short), and an
    md5 content fingerprint (the chunk-level dedup / retrieval key).
    Scan-local: a bounded sequence explode + array slice, no joins —
    the plan survives any corpus size because per-doc fan-out is
    ceil(len/stride)."""
    t = _tokens_df(spark, sf_dir)
    starts = t.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(_CHUNK_STRIDE)
            )
        ).alias("start_pos"),
    )
    c = F.slice("t", F.col("start_pos"), _CHUNK_SIZE)
    return starts.select(
        "doc_id",
        ((F.col("start_pos") - 1) / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("start_pos").cast("int"),
        F.size(c).alias("n_tokens"),
        F.md5(F.array_join(c, " ")).alias("chunk_fp"),
    )


# Chunk-level duplicate detection: the dedup granularity RAG indexes
# and boilerplate scrubbers actually operate at — a chunk fingerprint
# shared across documents marks repeated passages (headers, licenses,
# templates) that document-level dedup keeps.  Only FULL chunks
# participate (tail fragments under the window size would match
# trivially).  One groupBy over the chunk relation; candidate volume
# is bounded because the fingerprint is exact (no pair join at all).
_CHUNK_DEDUP_ORACLE = f"""
WITH ch AS ({_CHUNK_ORACLE})
SELECT chunk_fp,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM ch
WHERE n_tokens = {_CHUNK_SIZE}
GROUP BY 1
HAVING count(*) > 1
"""


@register("text_chunk_dedup", _CHUNK_DEDUP_ORACLE)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate chunks: full {_CHUNK_SIZE}-token
    windows whose exact fingerprint occurs more than once, with
    occurrence/document counts and the first (keeper) doc — the
    passage-granularity dedup cut list.  Exact-hash groupBy, no pair
    join: linear in chunk count at any corpus size."""
    ch = text_chunking(spark, sf_dir)
    return (
        ch.filter(F.col("n_tokens") == _CHUNK_SIZE)
        .groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


# --------------------------------------------------------------------------
# Collocations — PMI-scored adjacent bigrams (corpus phrase mining)
# --------------------------------------------------------------------------
# Pointwise mutual information over adjacent token pairs: the standard
# phrase-mining signal (Mikolov et al.'s word2phrase gate, spaCy's
# collocation surfacing) a training-data pipeline uses to find
# multi-word terms worth protecting from tokenization.  Scale shape:
# bigram construction is pure array algebra inside whole-stage codegen
# (slice + arrays_zip on the memoized tokens relation — no UDF, no
# window); unigram and bigram counts are each ONE map-side-combinable
# hash aggregation; the two vocabulary joins are co-partitioned
# shuffles on the word key (vocab ~ 100M rows at 100 TB — never
# broadcast); the single-row totals ARE broadcast; top-k is
# TakeOrderedAndProject (no single-partition window).  Ranking uses
# the 6-decimal-rounded PMI with (w1, w2) tie-breaks so the top-100
# cut is stable across engines' last-ulp ln() differences.
_COLLOCATIONS_ORACLE = f"""
WITH {_TOKENS_CTE},
uni AS (SELECT unnest(t) AS w FROM toks),
unic AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
nuni AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM unic),
big AS (
    SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
    FROM toks WHERE len(t) >= 2
),
bigc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
nbig AS (SELECT CAST(sum(c12) AS DOUBLE) AS m FROM bigc),
scored AS (
    SELECT b.w1, b.w2, CAST(b.c12 AS BIGINT) AS c12,
           round(ln((b.c12 / nb.m) / ((u1.c / nu.n) * (u2.c / nu.n)))
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS pmi
    FROM bigc b, nbig nb, nuni nu
    JOIN unic u1 ON b.w1 = u1.w
    JOIN unic u2 ON b.w2 = u2.w
    WHERE b.c12 >= 5
)
SELECT w1, w2, c12, pmi
FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk
      FROM scored)
WHERE rk <= 100
"""


@register("text_collocations", _COLLOCATIONS_ORACLE)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 PMI-scored adjacent bigram collocations with min count 5
    (see section comment for the scale shape)."""
    toks = tokens_relation(spark, sf_dir).select("t").filter(F.size("t") >= 1)
    unic = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    nuni = unic.agg(F.sum("c").cast("double").alias("n"))
    pairs = toks.filter(F.size("t") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1).alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("bg")
    )
    bigc = (
        pairs.select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    nbig = (
        pairs.groupBy()
        .agg(F.count("*").cast("double").alias("m"))
    )
    u1 = unic.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = unic.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bigc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nbig))
        .crossJoin(F.broadcast(nuni))
        .select(
            "w1",
            "w2",
            "c12",
            round6(
                F.log(
                    (F.col("c12") / F.col("m"))
                    / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(100)


# --------------------------------------------------------------------------
# Zipf rank-frequency fit — corpus health in one row
# --------------------------------------------------------------------------
# The log-log rank-frequency slope is the standard one-number corpus
# diagnostic (natural text sits near -1; boilerplate/spam floods and
# template corpora bend it): fit ln(freq) ~ ln(rank) by least squares
# over the top-R terms.  Scale shape: ONE map-side-combinable count
# aggregation over the exploded token relation (the only corpus-sized
# step — the same shared `tokens_relation` every text query reads),
# then a distributed top-R (TakeOrderedAndProject — never a global
# sort of the Heaps-law vocabulary), and the regression runs on the
# bounded R-row relation via the built-in least-squares aggregates
# (regr_slope/regr_intercept/regr_r2 — identical definitions in both
# engines).  Top-R mass share rides along from the same pass.
_ZIPF_TOP_R = 200

_ZIPF_ORACLE = f"""
WITH {{tokens}},
tf AS (
    SELECT tok AS token, count(*) AS freq
    FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
),
tot AS (SELECT sum(freq) AS n_tokens FROM tf),
ranked AS (
    SELECT freq,
           row_number() OVER (ORDER BY freq DESC, token) AS rank
    FROM tf
    ORDER BY freq DESC, token
    LIMIT {_ZIPF_TOP_R}
)
SELECT count(*) AS n_terms_ranked,
       round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE)))
             * 1000000 + 0.01, 0) / 1000000 + 0 AS zipf_slope,
       round(regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE)))
             * 1000000 + 0.01, 0) / 1000000 + 0 AS zipf_intercept,
       round(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE)))
             * 1000000 + 0.01, 0) / 1000000 + 0 AS zipf_r2,
       round(sum(freq) / (SELECT n_tokens FROM tot)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS top_r_mass_share
FROM ranked
""".format(tokens=_TOKENS_CTE.strip().removeprefix("\n"))


@register("text_zipf_fit", _ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic (see section comment): one count
    aggregation, a distributed top-R, least-squares fit on the bounded
    R-row relation."""
    exploded = (
        tokens_relation(spark, sf_dir)
        .filter(F.size("t") > 0)
        .select(F.explode("t").alias("token"))
    )
    tf = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    tot = tf.agg(F.sum("freq").cast("double").alias("n_tokens"))
    # distributed top-R (TakeOrderedAndProject), then rank the bounded
    # relation — the Heaps-law vocabulary is never globally sorted
    top = tf.orderBy(F.col("freq").desc(), F.col("token")).limit(_ZIPF_TOP_R)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("token"))
        ),
    )
    lf = F.log(F.col("freq").cast("double"))
    lr = F.log(F.col("rank").cast("double"))
    return ranked.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_terms_ranked"),
        round6(F.regr_slope(lf, lr)).alias("zipf_slope"),
        round6(F.regr_intercept(lf, lr)).alias("zipf_intercept"),
        round6(F.regr_r2(lf, lr)).alias("zipf_r2"),
        round6(F.sum("freq") / F.max("n_tokens")).alias("top_r_mass_share"),
    )


# --------------------------------------------------------------------------
# TEXT-SOURCE-DIVERSITY — per-source vocabulary richness / concentration
# --------------------------------------------------------------------------
# The corpus-mixture health check next to `text_zipf_fit`'s global
# fit: per SOURCE, how rich and how concentrated is the vocabulary?
# Type-token ratio (distinct types / token mass) falls when a source
# is repetitive boilerplate; the Simpson index (probability two
# randomly drawn tokens are the SAME type, sum n_i(n_i-1) / N(N-1))
# rises with concentration — together they flag the sources a mixture
# weight should down-sample before training.  Scale shape: ONE
# map-side-combinable count aggregation to the (source, token) grain
# (the only corpus-sized step — same posture as zipf's tf relation),
# then a per-source rollup bounded by |sources| x per-source
# vocabulary.  The Simpson sum runs in DOUBLE from the bounded grain.
_SOURCE_DIVERSITY_ORACLE = """
WITH {tokens},
tf AS (
    SELECT source, tok AS token, count(*) AS n
    FROM (SELECT source, unnest(t) AS tok FROM toks) GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       round(count(*) / CAST(sum(n) AS DOUBLE)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS ttr,
       round(sum(n * (n - 1.0)) / (sum(n) * (sum(n) - 1.0))
             * 1000000 + 0.01, 0) / 1000000 + 0 AS simpson_index,
       round(max(n) / CAST(sum(n) AS DOUBLE)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS top_token_share
FROM tf
GROUP BY 1
""".format(tokens=_TOKENS_CTE.strip().removeprefix("\n"))


@register("text_source_diversity", _SOURCE_DIVERSITY_ORACLE)
def text_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness and concentration (see section
    comment): one count aggregation to the (source, token) grain, then
    a bounded per-source rollup of TTR / Simpson / top-token share."""
    exploded = (
        tokens_relation(spark, sf_dir)
        .filter(F.size("t") > 0)
        .select("source", F.explode("t").alias("token"))
    )
    tf = exploded.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    n = F.col("n")
    tot = F.sum("n").cast("double")
    return tf.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        round6(F.count(F.lit(1)) / tot).alias("ttr"),
        round6(F.sum(n * (n - F.lit(1.0))) / (tot * (tot - F.lit(1.0)))).alias(
            "simpson_index"
        ),
        round6(F.max("n") / tot).alias("top_token_share"),
    )


# --------------------------------------------------------------------------
# TEXT-READABILITY — Flesch reading ease per language
# --------------------------------------------------------------------------
# Curation-grade readability profiling: per document, words (the
# shared token relation), sentences (runs of terminal punctuation in
# the RAW text, clamped >= 1), and a syllable proxy (vowel-group runs
# over the normalized text — the standard dictionary-free
# approximation); Flesch reading ease = 206.835 - 1.015 w/s - 84.6
# syl/w.  The per-language rollup reports the mean score, the mean
# sentence length, and the share of "easy" (>= 60) documents — the
# readability mix a curation pipeline balances against.  All per-doc
# work is scan-local regexp counting (embarrassingly parallel, no
# UDFs); the rollup is one combinable aggregation to |langs| rows.
_READ_EASY_BAR = 60.0

_READABILITY_ORACLE = """
WITH {tokens},
perdoc AS (
    SELECT lang,
           CAST(len(t) AS DOUBLE) AS words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                AS DOUBLE) AS sentences,
           CAST(len(regexp_extract_all(norm, '[aeiouy]+')) AS DOUBLE)
               AS syllables
    FROM toks WHERE len(t) > 0
),
scored AS (
    SELECT lang, words, sentences,
           206.835 - 1.015 * (words / sentences)
                   - 84.6 * (syllables / words) AS flesch
    FROM perdoc
)
SELECT lang,
       count(*) AS n_docs,
       round(avg(flesch) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_flesch,
       round(avg(words / sentences) * 1000000 + 0.01, 0) / 1000000 + 0
           AS avg_words_per_sentence,
       round(avg(CASE WHEN flesch >= {bar} THEN 1.0 ELSE 0.0 END)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS share_easy
FROM scored
GROUP BY 1
""".format(
    tokens=_TOKENS_CTE.strip().removeprefix("\n"), bar=_READ_EASY_BAR
)


@register("text_readability", _READABILITY_ORACLE)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease profile per language (see section comment):
    scan-local regexp counts per document, one bounded rollup."""
    toks = tokens_relation(spark, sf_dir).filter(F.size("t") > 0)
    perdoc = toks.select(
        "lang",
        F.size("t").cast("double").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))),
            F.lit(1),
        ).cast("double").alias("sentences"),
        F.size(F.regexp_extract_all("norm", F.lit("[aeiouy]+"), F.lit(0)))
        .cast("double")
        .alias("syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words") / F.col("sentences"))
        - F.lit(84.6) * (F.col("syllables") / F.col("words"))
    )
    scored = perdoc.select(
        "lang", "words", "sentences", flesch.alias("flesch")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round6(F.avg("flesch")).alias("avg_flesch"),
        round6(F.avg(F.col("words") / F.col("sentences"))).alias(
            "avg_words_per_sentence"
        ),
        round6(
            F.avg(
                F.when(F.col("flesch") >= _READ_EASY_BAR, 1.0).otherwise(0.0)
            )
        ).alias("share_easy"),
    )
