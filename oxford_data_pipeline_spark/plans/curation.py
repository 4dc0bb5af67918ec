"""Corpus-curation queries over `documents`: repetition filters,
stratified sampling, mixture weighting, benchmark decontamination.

These are the admission/composition stages of a training-data
pipeline (the reference has no analog — SURVEY §2 extension ops):
Gopher-style repetition gates decide per-document admission, stratified
sampling and mixture weighting decide corpus composition, and
decontamination removes documents overlapping an evaluation set.

Scale design: every per-doc feature is one map-side-combinable
aggregation over an exploded n-gram relation (no self-joins); the
decontamination join is corpus × BENCHMARK where the benchmark side is
small by construction — a broadcast equi-join on the shingle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.dedup import (
    _SHINGLES_CTE,
    _WALK_CTES,
    _shingle_df,
)
from oxford_data_pipeline_spark.plans.memo import bounded_once
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.plans.retrieval import (
    _TOKENIZE_TEXT_SQL,
)
from oxford_data_pipeline_spark.plans.textops import (
    _STOP_SQL as _CUR_STOP_SQL,
    _TOKENS_CTE,
    tokens_relation,
)

# --------------------------------------------------------------------------
# Repetition features + admission gate (Gopher-style filter rules)
# --------------------------------------------------------------------------
# Non-distinct word bigrams per doc (repetition is about multiplicity,
# so unlike the dedup shingles these must NOT be de-duplicated).
# Body split out so the end-to-end pipeline oracle can splice it into a
# CTE chain that already defines `toks`.
_BIGRAMS_BODY = """
bigrams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
    FROM toks
    WHERE len(t) >= 2
)
"""

_BIGRAMS_CTE = f"""
{_TOKENS_CTE},
{_BIGRAMS_BODY}
"""

_REPETITION_ORACLE = f"""
WITH {_BIGRAMS_CTE},
gram_counts AS (
    SELECT doc_id, gram, count(*) AS cnt FROM bigrams GROUP BY 1, 2
),
per_doc AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           count(*) AS n_distinct_bigrams,
           max(cnt) AS top_cnt
    FROM gram_counts GROUP BY 1
),
tok AS (
    SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_types
    FROM toks WHERE len(t) >= 2
)
SELECT p.doc_id, t.n_tokens,
       round((1.0 - CAST(p.n_distinct_bigrams AS DOUBLE) / p.n_bigrams) * 1000000 + 0.01, 0) / 1000000 + 0 AS dup_bigram_frac,
       round(CAST(p.top_cnt AS DOUBLE) / p.n_bigrams * 1000000 + 0.01, 0) / 1000000 + 0 AS top_bigram_share,
       round((1.0 - CAST(t.n_types AS DOUBLE) / t.n_tokens) * 1000000 + 0.01, 0) / 1000000 + 0 AS dup_token_frac,
       (t.n_tokens BETWEEN 10 AND 1000
        AND round((1.0 - CAST(p.n_distinct_bigrams AS DOUBLE) / p.n_bigrams) * 1000000 + 0.01, 0) / 1000000 + 0 <= 0.8
        AND round(CAST(p.top_cnt AS DOUBLE) / p.n_bigrams * 1000000 + 0.01, 0) / 1000000 + 0 <= 0.2) AS admitted
FROM per_doc p JOIN tok t ON p.doc_id = t.doc_id
"""


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gram, cnt) for non-distinct word bigrams, docs ≥ 2 tokens."""
    t = tokens_relation(spark, sf_dir).filter(F.size("t") >= 2)
    # arrays_zip of the two shifted slices + post-explode concat: fully
    # codegen (the previous transform(sequence, i -> concat_ws(...))
    # lambda was interpreted once per bigram)
    return (
        t.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("a"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("b"),
                )
            ).alias("g"),
        )
        .select("doc_id", F.concat_ws(" ", "g.a", "g.b").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register("cur_repetition", _REPETITION_ORACLE)
def cur_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-doc duplicate-bigram
    fraction, most-common-bigram share, duplicate-token fraction, and
    the resulting admission decision.

    One map-side-combinable aggregation over the exploded bigram
    relation — the (doc_id, gram) grouping is the only shuffle, and at
    100 TB it partitions on doc_id with bounded group sizes (a doc's
    bigram count ≤ its token count)."""
    per_doc = _bigram_counts(spark, sf_dir).groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("cnt").alias("top_cnt"),
    )
    tok = (
        tokens_relation(spark, sf_dir)
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.size(F.array_distinct("t")).alias("n_types"),
        )
    )
    dup_bigram = round6(
        F.lit(1.0) - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams")
    )
    top_share = round6(F.col("top_cnt").cast("double") / F.col("n_bigrams"))
    dup_token = round6(
        F.lit(1.0) - F.col("n_types").cast("double") / F.col("n_tokens")
    )
    return (
        per_doc.join(tok, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            dup_bigram.alias("dup_bigram_frac"),
            top_share.alias("top_bigram_share"),
            dup_token.alias("dup_token_frac"),
            (
                F.col("n_tokens").between(10, 1000)
                & (dup_bigram <= 0.8)
                & (top_share <= 0.2)
            ).alias("admitted"),
        )
    )


# --------------------------------------------------------------------------
# Stratified sampling: deterministic per-source quota
# --------------------------------------------------------------------------
_STRATIFIED_ORACLE = """
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
SELECT doc_id, source, n_chars, rk FROM ranked WHERE rk <= 5
"""


@register("cur_stratified_sample", _STRATIFIED_ORACLE)
def cur_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling: a fixed per-source quota drawn in
    md5-of-key order — the engine's seeded-sampling convention (O3),
    applied per stratum.  The window partitions on `source`, so at
    100 TB each stratum ranks independently; no global sort."""
    from oxford_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


# --------------------------------------------------------------------------
# Mixture weighting: per-source token shares vs a uniform target
# --------------------------------------------------------------------------
_MIXTURE_ORACLE = f"""
WITH {_TOKENS_CTE},
per_source AS (
    SELECT source, count(*) AS n_docs, CAST(sum(len(t)) AS BIGINT) AS n_tokens
    FROM toks GROUP BY 1
),
tot AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           count(*) AS n_sources
    FROM per_source
)
SELECT s.source, s.n_docs, s.n_tokens,
       round(CAST(s.n_tokens AS DOUBLE) / t.total_tokens * 1000000 + 0.01, 0) / 1000000 + 0 AS token_share,
       round(1.0 / t.n_sources / NULLIF(CAST(s.n_tokens AS DOUBLE) / t.total_tokens, 0) * 1000000 + 0.01, 0) / 1000000 + 0 AS mix_weight
FROM per_source s CROSS JOIN tot t
"""


@register("cur_mixture_weights", _MIXTURE_ORACLE)
def cur_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: each source's token share vs a uniform
    target mixture; `mix_weight` is the per-source up/down-sampling
    factor a sampler applies to hit the target.  Two tiny aggregations
    (per-source, then a broadcast single-row total) — the corpus is
    touched once.  A degenerate all-empty source (token_share = 0) gets
    a NULL mix_weight on both engines (Spark non-ANSI divide and DuckDB
    IEEE Infinity would otherwise disagree)."""
    per_source = (
        tokens_relation(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("t")).alias("n_tokens"),
        )
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("total_tokens")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        round6(share).alias("token_share"),
        round6(
            F.when(share > 0, F.lit(1.0) / F.col("n_sources") / share)
        ).alias("mix_weight"),
    )


# --------------------------------------------------------------------------
# Decontamination: flag corpus docs overlapping a benchmark set
# --------------------------------------------------------------------------
# Benchmark membership is deterministic (doc_id % 29 == 0) so the
# oracle can reproduce it; in production the benchmark shingle set
# comes from the eval suites themselves.  Production pipelines shingle
# at n=8..13; the engine's shared 3-gram relation keeps the plan shape
# identical while reusing the memoized relation.
_DECON_ORACLE = f"""
WITH {_SHINGLES_CTE},
bench AS (
    SELECT DISTINCT doc_id AS bench_id, shingle FROM shingles WHERE doc_id % 29 = 0
),
corpus AS (
    SELECT doc_id, shingle FROM shingles WHERE doc_id % 29 <> 0
),
sizes AS (
    SELECT doc_id, count(*) AS n_sh FROM corpus GROUP BY 1
),
hits AS (
    SELECT c.doc_id,
           count(DISTINCT c.shingle) AS n_shared,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.shingle = b.shingle
    GROUP BY 1
)
SELECT h.doc_id, h.n_shared, h.n_bench_docs,
       round(CAST(h.n_shared AS DOUBLE) / s.n_sh * 1000000 + 0.01, 0) / 1000000 + 0 AS contaminated_frac
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""


@register("cur_decontaminate", _DECON_ORACLE)
def cur_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    shingle with the (small) benchmark set, with per-doc overlap counts
    and the contaminated-shingle fraction.

    The join is corpus-shingles × benchmark-shingles on the shingle
    key with the benchmark side broadcast.  NOTE (round-3 advice): the
    broadcast hint encodes the PRODUCTION contract — a real eval-suite
    benchmark is bounded (a few thousand documents) regardless of
    corpus size.  This query's doc_id % 29 stand-in violates that
    assumption (it is a fixed ~3.4% of the corpus and grows with it);
    it exists only so the DuckDB oracle can reproduce the membership.
    Deployments must feed a genuinely bounded benchmark relation here
    or drop the hint."""
    sh = _shingle_df(spark, sf_dir)
    bench = (
        sh.filter(F.col("doc_id") % 29 == 0)
        .select(F.col("doc_id").alias("bench_id"), "shingle")
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 29 != 0)
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_shared",
        "n_bench_docs",
        round6(F.col("n_shared").cast("double") / F.col("n_sh")).alias(
            "contaminated_frac"
        ),
    )


# --------------------------------------------------------------------------
# Unigram-LM quality score: per-doc mean token surprisal
# --------------------------------------------------------------------------
# The relational form of LM-based quality filtering: train a unigram
# model on the corpus (one aggregation), score each document by the
# mean negative log-probability of its tokens (one broadcast join —
# the vocabulary is bounded, the corpus is not).
_UNIGRAM_MIN_COUNT = 2  # model floor: hapax tokens are not scored

_UNIGRAM_ORACLE = f"""
WITH {_TOKENS_CTE},
exploded AS (
    SELECT doc_id, unnest(t) AS token FROM toks WHERE len(t) > 0
),
model AS (
    SELECT token, count(*) AS cnt FROM exploded
    GROUP BY 1 HAVING count(*) >= {_UNIGRAM_MIN_COUNT}
),
tot AS (
    SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM model
)
SELECT e.doc_id,
       count(*) AS n_scored_tokens,
       round(avg(-ln(m.cnt / t.total)) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_surprisal
FROM exploded e
JOIN model m ON e.token = m.token
CROSS JOIN tot t
GROUP BY e.doc_id
"""


# --------------------------------------------------------------------------
# Bigram-LM quality score: per-doc mean conditional surprisal
# --------------------------------------------------------------------------
# The next step up from the unigram filter — the relational stand-in
# for KenLM-style perplexity scoring: P(v|u) with add-one smoothing
# over the corpus-trained bigram table, scored as the mean
# -ln P(v|u) over each document's adjacent token pairs.  Unlike the
# unigram model, the bigram table scales with the corpus (it is NOT
# broadcast): scoring is an equi-join on (u, v) co-partitioned with
# the count aggregate that feeds it, plus a context-total join on u;
# only the scalar vocabulary size is broadcast.  At 100 TB a count
# floor (as in the unigram model) prunes the Zipf tail of the table.
_BIGRAM_ORACLE = f"""
WITH {_TOKENS_CTE},
big AS (
    SELECT doc_id, t[i] AS u, t[i + 1] AS v
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
    WHERE len(t) >= 2
),
bc AS (
    SELECT u, v, count(*) AS cuv FROM big GROUP BY 1, 2
),
cc AS (
    SELECT u, sum(cuv) AS cu FROM bc GROUP BY 1
),
vs AS (
    SELECT CAST(count(DISTINCT v) AS DOUBLE) AS vsz FROM big
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       round(avg(-ln((c.cuv + 1) / (x.cu + s.vsz))) * 1000000 + 0.01, 0)
           / 1000000 + 0 AS avg_surprisal
FROM big b
JOIN bc c ON b.u = c.u AND b.v = c.v
JOIN cc x ON b.u = x.u
CROSS JOIN vs s
GROUP BY b.doc_id
"""


@register("cur_bigram_surprisal", _BIGRAM_ORACLE)
def cur_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring: per-doc mean -ln P(v|u) under an
    add-one-smoothed bigram model trained on the corpus itself.  The
    bigram table is corpus-scaled, so scoring joins it on (u, v)
    rather than broadcasting; only the vocabulary-size scalar is
    broadcast."""
    t = tokens_relation(spark, sf_dir).filter(F.size("t") >= 2)
    # consecutive-token pairs via arrays_zip of the two shifted slices:
    # fully codegen — the previous transform(sequence(...), i -> ...)
    # lambda was evaluated INTERPRETED once per bigram per evaluation
    # of this corpus-sized subtree
    big = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("u"),
                F.expr("slice(t, 2, size(t) - 1)").alias("v"),
            )
        ).alias("b"),
    ).select("doc_id", "b.u", "b.v")
    bc = big.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cuv"))
    cc = bc.groupBy("u").agg(F.sum("cuv").alias("cu"))
    # |V| from the bounded distinct-bigram relation (same distinct-v
    # set as the corpus relation) — not a third corpus-sized pass
    vs = bc.agg(F.countDistinct("v").cast("double").alias("vsz"))
    p = (F.col("cuv") + 1) / (F.col("cu") + F.col("vsz"))
    return (
        big.join(bc, ["u", "v"])
        .join(cc, "u")
        .crossJoin(F.broadcast(vs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round6(F.avg(-F.log(p))).alias("avg_surprisal"),
        )
    )


@register("cur_unigram_surprisal", _UNIGRAM_ORACLE)
def cur_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring: mean per-token surprisal under a
    model trained on the corpus itself (the cheap, fully-relational
    stand-in for perplexity filtering), with a min-count floor —
    standard for LM filters (hapax probabilities are noise) and it
    shrinks the model by the Zipf tail.

    Two passes over the exploded token relation: one aggregation to
    fit the model, one broadcast join + per-doc aggregation to score.
    The floor is what keeps the broadcast defensible (round-3 advice):
    raw vocabulary grows with corpus size (Heaps' law), and at 100 TB
    the floor is raised with corpus size to hold the model inside the
    broadcast budget — the standard LM-filter tuning knob."""
    exploded = (
        tokens_relation(spark, sf_dir)
        .filter(F.size("t") > 0)
        .select("doc_id", F.explode("t").alias("token"))
    )
    model = (
        exploded.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _UNIGRAM_MIN_COUNT)
    )
    tot = model.agg(F.sum("cnt").cast("double").alias("total"))
    return (
        exploded.join(F.broadcast(model), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored_tokens"),
            round6(F.avg(-F.log(F.col("cnt") / F.col("total")))).alias(
                "avg_surprisal"
            ),
        )
    )


# --------------------------------------------------------------------------
# Corpus length profile: exact per-source token-count percentiles
# --------------------------------------------------------------------------
_LENGTH_ORACLE = f"""
WITH {_TOKENS_CTE},
lens AS (
    SELECT source, len(t) AS n FROM toks
)
SELECT source,
       count(*) AS n_docs,
       round(avg(n) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_tokens,
       round(quantile_cont(n, 0.5) * 1000000 + 0.01, 0) / 1000000 + 0 AS p50_tokens,
       round(quantile_cont(n, 0.9) * 1000000 + 0.01, 0) / 1000000 + 0 AS p90_tokens,
       min(n) AS min_tokens,
       max(n) AS max_tokens
FROM lens GROUP BY 1
"""


@register("cur_length_profile", _LENGTH_ORACLE)
def cur_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length profile (exact p50/p90 token counts)
    — the corpus-composition report a curation pass starts from.  Exact
    percentiles group by source, so each group sorts independently; at
    100 TB swap in approx_percentile for a single-pass sketch."""
    lens = tokens_relation(spark, sf_dir).select(
        "source", F.size("t").alias("n")
    )
    return lens.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round6(F.avg("n")).alias("mean_tokens"),
        round6(F.percentile("n", F.lit(0.5))).alias("p50_tokens"),
        round6(F.percentile("n", F.lit(0.9))).alias("p90_tokens"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# Embedding quality: distance-to-centroid outlier scoring
# --------------------------------------------------------------------------
# The embedding-side analog of the text admission gate: vectors far
# from their label centroid are candidate mislabels/noise.  Both sides
# compute the centroid relationally (one aggregation on (label, dim))
# and score with a (label, dim) equi-join — the centroid relation is
# labels × dims rows, broadcastable at any corpus size.
_EMB_OUTLIER_ORACLE = """
WITH long AS (
    SELECT e.vec_id, e.label, CAST(r.range AS INTEGER) AS dim,
           CAST(e.embedding[CAST(r.range AS INTEGER) + 1] AS DOUBLE) AS val
    FROM embeddings e CROSS JOIN range(64) r
),
cent AS (
    SELECT label, dim, avg(val) AS cval FROM long GROUP BY 1, 2
),
scored AS (
    SELECT l.vec_id, l.label,
           sum(l.val * c.cval) AS dot,
           sqrt(sum(l.val * l.val)) AS vn,
           sqrt(sum(c.cval * c.cval)) AS cn
    FROM long l JOIN cent c ON l.label = c.label AND l.dim = c.dim
    GROUP BY 1, 2
)
SELECT vec_id, label,
       round(dot / (vn * cn) * 1000000 + 0.01, 0) / 1000000 + 0 AS cos_centroid,
       CAST(row_number() OVER (
           PARTITION BY label
           ORDER BY round(dot / (vn * cn) * 1000000 + 0.01, 0) / 1000000 + 0, vec_id
       ) AS BIGINT) AS outlier_rank
FROM scored
"""


# --------------------------------------------------------------------------
# End-to-end curation pipeline: dedup → decontaminate → gate → weight → sample
# --------------------------------------------------------------------------
_CONTAM_MAX = 0.2

_PIPELINE_ORACLE = f"""
WITH RECURSIVE {_WALK_CTES},
removed AS (
    SELECT doc_id FROM walk GROUP BY doc_id HAVING doc_id <> min(label)
),
survivors AS (
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
),
bench AS (
    SELECT DISTINCT doc_id AS bench_id, shingle FROM shingles WHERE doc_id % 29 = 0
),
csh AS (
    SELECT doc_id, shingle FROM shingles WHERE doc_id % 29 <> 0
),
csizes AS (
    SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1
),
chits AS (
    SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
    FROM csh c JOIN bench b ON c.shingle = b.shingle
    GROUP BY 1
),
{_BIGRAMS_BODY},
gram_counts AS (
    SELECT doc_id, gram, count(*) AS cnt FROM bigrams GROUP BY 1, 2
),
rep_doc AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           count(*) AS n_distinct_bigrams,
           max(cnt) AS top_cnt
    FROM gram_counts GROUP BY 1
),
rep_tok AS (
    SELECT doc_id, len(t) AS n_tokens FROM toks WHERE len(t) >= 2
),
admitted AS (
    SELECT p.doc_id
    FROM rep_doc p JOIN rep_tok t ON p.doc_id = t.doc_id
    WHERE t.n_tokens BETWEEN 10 AND 1000
      AND round((1.0 - CAST(p.n_distinct_bigrams AS DOUBLE) / p.n_bigrams) * 1000000 + 0.01, 0) / 1000000 + 0 <= 0.8
      AND round(CAST(p.top_cnt AS DOUBLE) / p.n_bigrams * 1000000 + 0.01, 0) / 1000000 + 0 <= 0.2
),
kept_docs AS (
    SELECT v.doc_id, v.source, v.n_chars
    FROM survivors v
    LEFT JOIN chits h ON v.doc_id = h.doc_id
    LEFT JOIN csizes s ON v.doc_id = s.doc_id
    WHERE v.doc_id % 29 <> 0
      AND coalesce(round(CAST(h.n_shared AS DOUBLE) / s.n_sh * 1000000 + 0.01, 0) / 1000000 + 0, 0) <= {_CONTAM_MAX}
      AND v.doc_id IN (SELECT doc_id FROM admitted)
),
per_source AS (
    SELECT k.source, CAST(sum(len(t.t)) AS BIGINT) AS n_tokens
    FROM kept_docs k JOIN toks t ON k.doc_id = t.doc_id
    GROUP BY 1
),
tot AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens, count(*) AS n_sources
    FROM per_source
),
weights AS (
    SELECT s.source,
           round(1.0 / t.n_sources / NULLIF(CAST(s.n_tokens AS DOUBLE) / t.total_tokens, 0) * 1000000 + 0.01, 0) / 1000000 + 0 AS mix_weight
    FROM per_source s CROSS JOIN tot t
),
sampled AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM kept_docs
)
SELECT s.doc_id, s.source, s.n_chars, s.rk, w.mix_weight
FROM sampled s JOIN weights w ON s.source = w.source
WHERE s.rk <= 5
"""


_curated_cache: dict[tuple, DataFrame] = {}


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted curated-corpus stage boundary (dedup survivors →
    decontamination gate → repetition admission), memoized per
    (session, sf_dir) — the relation a production pipeline maintains
    as a table between curation stages.  Consumed three times inside
    `cur_pipeline`; build cost is charged to the bench index-build
    phase (`build_curation_index`)."""
    from oxford_data_pipeline_spark.plans.dedup import dedup_survivors
    from oxford_data_pipeline_spark.plans.memo import memoized

    def build_kept() -> DataFrame:
        surv = dedup_survivors(spark, sf_dir).filter(F.col("doc_id") % 29 != 0)
        decon = cur_decontaminate(spark, sf_dir).select(
            "doc_id", "contaminated_frac"
        )
        clean = (
            surv.join(decon, "doc_id", "left")
            .filter(F.coalesce(F.col("contaminated_frac"), F.lit(0.0)) <= _CONTAM_MAX)
            .select("doc_id", "source", "n_chars")
        )
        admitted = cur_repetition(spark, sf_dir).filter("admitted").select("doc_id")
        # eager checkpoint: the build runs as its own jobs, so every
        # consumer's final plan — including the very first — starts
        # from the materialized boundary instead of inlining the
        # dedup+gate subtree (the plan test pins this)
        return clean.join(admitted, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )

    return memoized(_curated_cache, spark, (sf_dir, _CONTAM_MAX), build_kept)


def build_curation_index(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Materialize the curated-corpus stage table AND the trained
    classifier model artifacts for the bench index-build phase —
    curation-stage persistence and model TRAINING are build work, not
    query work.  The two memoized IRLS betas (2-D and d-feature) are
    exactly the model artifacts production persists after training;
    without this the first query touching each chain absorbed the
    whole train (bench flagged cur_classifier_calibration at 11.5x
    rep1/min, cur_classifier_scored_full at 11.5x — pure first-touch
    accounting, same disease as the r10 serving memos)."""
    from oxford_data_pipeline_spark.plans.quality import (
        _trained_beta,
        _trained_beta_full,
    )

    return {
        "curated_docs": curated_corpus(spark, sf_dir).count(),
        "classifier_beta_2d": _trained_beta(spark, sf_dir).count(),
        "classifier_beta_full": _trained_beta_full(spark, sf_dir).count(),
    }


@register("cur_pipeline", _PIPELINE_ORACLE)
def cur_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline — the training-data analog of the
    neuroscience Entry-A pipeline: MinHash-dedup survivors →
    decontamination gate (round6 contaminated_frac ≤ {max}) →
    Gopher-style repetition admission → per-source mixture weights →
    stratified md5-order sample, one composed plan.

    Every stage composes the registered queries (shared memoized
    shingle/pair relations, so the corpus-scale inputs are scanned
    once), every inter-stage join is keyed on doc_id — Spark reuses
    the hashpartitioning across consecutive doc_id joins instead of
    re-shuffling the corpus — and the two source-level relations
    (weights, totals) are broadcast.  Output: the sampled curated
    corpus with each doc's stratum rank and its source's mixing
    weight."""
    # Stage boundary: the curated corpus is materialized once (what a
    # production pipeline persists between stages) and memoized per
    # (session, sf_dir) like the shingle/pair relations — without it
    # Spark re-evaluates the dedup+decontaminate+admission subtree for
    # each of the three downstream consumers (per-source totals,
    # weights, sample), re-shuffling the corpus per consumer.
    kept = curated_corpus(spark, sf_dir)

    toks = tokens_relation(spark, sf_dir).select(
        "doc_id", F.size("t").alias("n_tok")
    )
    per_source = (
        kept.join(toks, "doc_id")
        .groupBy("source")
        .agg(F.sum("n_tok").alias("n_tokens"))
    )
    # source-level relation: a handful of rows, checkpointed (lazily,
    # r15) so the totals/weights double-reference reads it instead of
    # twice re-aggregating the corpus
    per_source = bounded_once(per_source)
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("total_tokens")
    weights = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        round6(
            F.when(share > 0, F.lit(1.0) / F.col("n_sources") / share)
        ).alias("mix_weight"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    sampled = (
        kept.select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )
    return sampled.join(F.broadcast(weights), "source").select(
        "doc_id", "source", "n_chars", "rk", "mix_weight"
    )


@register("emb_outliers", _EMB_OUTLIER_ORACLE)
def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier scoring: cosine of each vector to its label
    centroid, plus the within-label outlier rank (1 = farthest).  The
    rank orders by the ROUNDED cosine with a vec_id tie-break so every
    engine ranks identically."""
    from pyspark.sql import Window as W

    from oxford_data_pipeline_spark.plans.projection import embeddings_long

    long = embeddings_long(spark, sf_dir)
    cent = long.groupBy("label", "dim").agg(F.avg("val").alias("cval"))
    scored = (
        long.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("val") * F.col("cval")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn"),
            F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn"),
        )
    )
    cos = round6(F.col("dot") / (F.col("vn") * F.col("cn")))
    w = W.partitionBy("label").orderBy(cos, "vec_id")
    return scored.select(
        "vec_id",
        "label",
        cos.alias("cos_centroid"),
        F.row_number().over(w).cast("long").alias("outlier_rank"),
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture weights (multilingual/multi-source sampling)
# --------------------------------------------------------------------------
# The standard temperature trick (alpha = 1/tau power on the share
# vector, renormalized): tau = 1 reproduces natural proportions, large
# tau flattens toward uniform — the knob multilingual-corpus samplers
# use to up-weight tail sources.  The per-source relation is bounded by
# |sources|, so the tau grid cross-join and its window renormalization
# cost nothing at any corpus scale; the corpus itself is touched once
# by the shared tokens_relation aggregate.
_TEMPERATURE_ORACLE = f"""
WITH {_TOKENS_CTE},
per_source AS (
    SELECT source, CAST(sum(len(t)) AS DOUBLE) AS n_tokens
    FROM toks GROUP BY 1
),
shares AS (
    SELECT source, n_tokens,
           n_tokens / sum(n_tokens) OVER () AS share
    FROM per_source
),
grid AS (
    SELECT * FROM shares CROSS JOIN (VALUES (1.0), (2.0), (4.0)) AS g(tau)
),
powed AS (
    SELECT source, tau, share, pow(share, 1.0 / tau) AS w
    FROM grid
)
SELECT source, tau,
       round(share * 1000000 + 0.01, 0) / 1000000 + 0 AS token_share,
       round(w / sum(w) OVER (PARTITION BY tau) * 1000000 + 0.01, 0) / 1000000 + 0 AS sampling_prob
FROM powed
"""


@register("cur_temperature_mix", _TEMPERATURE_ORACLE)
def cur_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights: share^(1/tau)
    renormalized per tau in {1, 2, 4}."""
    per_source = (
        tokens_relation(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size("t")).cast("double").alias("n_tokens"))
    )
    w_all = Window.partitionBy(F.lit(1))
    shares = per_source.withColumn(
        "share", F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    )
    taus = spark.range(1).select(
        F.explode(F.array(F.lit(1.0), F.lit(2.0), F.lit(4.0))).alias("tau")
    )
    powed = shares.crossJoin(F.broadcast(taus)).withColumn(
        "w", F.pow("share", F.lit(1.0) / F.col("tau"))
    )
    w_tau = Window.partitionBy("tau")
    return powed.select(
        "source",
        "tau",
        round6(F.col("share")).alias("token_share"),
        round6(F.col("w") / F.sum("w").over(w_tau)).alias("sampling_prob"),
    )


# --------------------------------------------------------------------------
# Embedding label cohesion: centroid purity + margin (cluster eval)
# --------------------------------------------------------------------------
# The embedding-space quality report a labeled corpus (or a k-means
# assignment) is judged by: score every vector against EVERY label
# centroid, take own-label cosine vs the best other label, and roll up
# per label (mean cohesion, mean margin, purity = share of vectors
# whose own centroid wins).  The centroid relation is labels x dims
# rows — broadcastable at any corpus size — so the all-centroids
# scoring is a broadcast equi-join on dim with map-side-combining
# sums, NOT a vector-vector pair space.  Purity compares the
# round6-stabilized cosines so the engines agree at the boundary.
_LABEL_COHESION_ORACLE = """
WITH long AS (
    SELECT e.vec_id, e.label, CAST(r.range AS INTEGER) AS dim,
           CAST(e.embedding[CAST(r.range AS INTEGER) + 1] AS DOUBLE) AS val
    FROM embeddings e CROSS JOIN range(64) r
),
cent AS (
    SELECT label AS clabel, dim, avg(val) AS cval FROM long GROUP BY 1, 2
),
cnorm AS (
    SELECT clabel, sqrt(sum(cval * cval)) AS cn FROM cent GROUP BY 1
),
scored AS (
    SELECT l.vec_id, l.label, c.clabel,
           sum(l.val * c.cval) AS dot,
           sqrt(sum(l.val * l.val)) AS vn
    FROM long l JOIN cent c ON l.dim = c.dim
    GROUP BY 1, 2, 3
),
coss AS (
    SELECT s.vec_id, s.label, s.clabel,
           round(s.dot / (s.vn * n.cn) * 1000000 + 0.01, 0) / 1000000 + 0 AS cos
    FROM scored s JOIN cnorm n ON s.clabel = n.clabel
),
per_vec AS (
    SELECT vec_id, label,
           max(CASE WHEN clabel = label THEN cos END) AS own_cos,
           max(CASE WHEN clabel <> label THEN cos END) AS best_other_cos
    FROM coss GROUP BY 1, 2
)
SELECT label,
       count(*) AS n_vecs,
       round(avg(own_cos) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_own_cos,
       round(avg(own_cos - best_other_cos) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_margin,
       round(avg(CASE WHEN own_cos > best_other_cos THEN 1.0 ELSE 0.0 END) * 1000000 + 0.01, 0) / 1000000 + 0 AS purity
FROM per_vec
GROUP BY 1
"""


@register("emb_label_cohesion", _LABEL_COHESION_ORACLE)
def emb_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cohesion: mean own-centroid cosine, mean
    margin over the best other centroid, and purity (share of vectors
    whose own centroid wins)."""
    from oxford_data_pipeline_spark.plans.projection import embeddings_long

    long = embeddings_long(spark, sf_dir)
    cent = long.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.avg("val").alias("cval")
    )
    cnorm = cent.groupBy("clabel").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
    )
    scored = (
        long.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(F.col("val") * F.col("cval")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn"),
        )
    )
    coss = scored.join(F.broadcast(cnorm), "clabel").select(
        "vec_id",
        "label",
        "clabel",
        round6(F.col("dot") / (F.col("vn") * F.col("cn"))).alias("cos"),
    )
    per_vec = coss.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("cos"))).alias(
            "own_cos"
        ),
        F.max(F.when(F.col("clabel") != F.col("label"), F.col("cos"))).alias(
            "best_other_cos"
        ),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        round6(F.avg("own_cos")).alias("mean_own_cos"),
        round6(F.avg(F.col("own_cos") - F.col("best_other_cos"))).alias(
            "mean_margin"
        ),
        round6(
            F.avg(
                F.when(F.col("own_cos") > F.col("best_other_cos"), 1.0).otherwise(
                    0.0
                )
            )
        ).alias("purity"),
    )


# --------------------------------------------------------------------------
# Sketch-based corpus profile (the 100 TB swap-in for exact percentiles)
# --------------------------------------------------------------------------
# cur_length_profile documents "swap in approx_percentile at scale";
# this query IS that swap-in, registered so the sketch path is part of
# the tested contract: per-source HyperLogLog distinct-token
# cardinality and KLL-sketch token-length percentiles — single-pass,
# map-side-combinable, bounded sketch memory per partition regardless
# of corpus size.  Sketches are estimates, so there is no cross-engine
# oracle; the accuracy bound vs the exact aggregates is pinned by
# tests/test_quality.py::test_sketch_profile_accuracy.
@register("cur_profile_sketch")
def cur_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch profile: approx distinct tokens (HLL) + approx p50/p90
    token counts per source — the single-pass bounded-memory variant
    of cur_length_profile."""
    toks = tokens_relation(spark, sf_dir)
    per_doc = toks.select("source", F.size("t").alias("n"), F.col("t"))
    exploded = toks.select("source", F.explode("t").alias("token"))
    card = exploded.groupBy("source").agg(
        F.approx_count_distinct("token", 0.02).alias("approx_distinct_tokens")
    )
    lens = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_percentile("n", F.lit(0.5), F.lit(10000)).alias("p50_tokens_approx"),
        F.approx_percentile("n", F.lit(0.9), F.lit(10000)).alias("p90_tokens_approx"),
    )
    return lens.join(card, "source").select(
        "source",
        "n_docs",
        "approx_distinct_tokens",
        "p50_tokens_approx",
        "p90_tokens_approx",
    )


# --------------------------------------------------------------------------
# DSIR-style importance weights (data selection for a target domain)
# --------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al., 2023): score
# every raw document by how much more likely its tokens are under a
# TARGET-domain unigram model than under the raw-corpus model; docs
# are then resampled proportional to exp(log_importance).  Target
# membership here is the deterministic source = 'src1' stand-in (in
# production: the curated target corpus).  Both models share one
# min-count-floored vocabulary with Laplace smoothing, so every token
# has mass under both and the log ratio is finite.  Same scale shape
# as cur_unigram_surprisal: one aggregation fits BOTH models (the
# target flag is a conditional sum, not a second pass), one broadcast
# score join — the corpus never shuffles.
_DSIR_TARGET = "src1"

_DSIR_ORACLE = f"""
WITH {_TOKENS_CTE},
exploded AS (
    SELECT doc_id, source, unnest(t) AS token FROM toks WHERE len(t) > 0
),
model AS (
    SELECT token,
           CAST(sum(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS DOUBLE) AS cnt_t,
           CAST(sum(CASE WHEN source <> '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS DOUBLE) AS cnt_r
    FROM exploded
    GROUP BY 1 HAVING count(*) >= {_UNIGRAM_MIN_COUNT}
),
consts AS (
    SELECT sum(cnt_t) AS tot_t, sum(cnt_r) AS tot_r,
           CAST(count(*) AS DOUBLE) AS v
    FROM model
)
SELECT e.doc_id, e.source,
       count(*) AS n_scored_tokens,
       round(sum(ln((m.cnt_t + 1) / (c.tot_t + c.v))
                 - ln((m.cnt_r + 1) / (c.tot_r + c.v))) * 1000000 + 0.01, 0) / 1000000 + 0 AS log_importance,
       round(avg(ln((m.cnt_t + 1) / (c.tot_t + c.v))
                 - ln((m.cnt_r + 1) / (c.tot_r + c.v))) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_log_ratio
FROM exploded e
JOIN model m ON e.token = m.token
CROSS JOIN consts c
WHERE e.source <> '{_DSIR_TARGET}'
GROUP BY 1, 2
"""


@register("cur_dsir_weights", _DSIR_ORACLE)
def cur_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-doc sum/mean of the smoothed
    target-vs-raw unigram log ratio over a shared floored vocabulary."""
    exploded = (
        tokens_relation(spark, sf_dir)
        .filter(F.size("t") > 0)
        .select("doc_id", "source", F.explode("t").alias("token"))
    )
    is_t = F.col("source") == _DSIR_TARGET
    model = (
        exploded.groupBy("token")
        .agg(
            F.sum(F.when(is_t, 1).otherwise(0)).cast("double").alias("cnt_t"),
            F.sum(F.when(~is_t, 1).otherwise(0)).cast("double").alias("cnt_r"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") >= _UNIGRAM_MIN_COUNT)
        .drop("cnt")
    )
    consts = model.agg(
        F.sum("cnt_t").alias("tot_t"),
        F.sum("cnt_r").alias("tot_r"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ratio = F.log((F.col("cnt_t") + 1) / (F.col("tot_t") + F.col("v"))) - F.log(
        (F.col("cnt_r") + 1) / (F.col("tot_r") + F.col("v"))
    )
    return (
        exploded.filter(~is_t)
        .join(F.broadcast(model), "token")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_scored_tokens"),
            round6(F.sum(ratio)).alias("log_importance"),
            round6(F.avg(ratio)).alias("avg_log_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Training-sequence packing stats (concat-and-chunk, shard-parallel)
# --------------------------------------------------------------------------
# The last batch-prep stage before training: documents concatenate in
# a deterministic order and split into fixed-length sequences.  A
# single global order would serialize the running sum, so packing runs
# WITHIN md5 shards (the way production writers pack per output
# shard): embarrassingly parallel, deterministic, and the only
# cross-shard cost is the 16-row rollup.  Per shard: how many
# sequences of length L the shard yields, the tail fill, and how many
# documents straddle a sequence boundary (the packing-quality signal
# that decides whether you pad, split, or re-order).
_PACK_SEQ_LEN = 256

_PACK_ORACLE = f"""
WITH {_TOKENS_CTE},
docs AS (
    SELECT doc_id, len(t) AS n,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           md5(CAST(doc_id AS VARCHAR)) AS ord
    FROM toks WHERE len(t) > 0
),
placed AS (
    SELECT shard, doc_id, n,
           sum(n) OVER (PARTITION BY shard ORDER BY ord, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS start
    FROM docs
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST((sum(n) + {_PACK_SEQ_LEN} - 1) // {_PACK_SEQ_LEN} AS BIGINT) AS n_sequences,
       CAST(sum(n) - ((sum(n) + {_PACK_SEQ_LEN} - 1) // {_PACK_SEQ_LEN} - 1) * {_PACK_SEQ_LEN} AS BIGINT) AS tail_fill,
       CAST(sum(CASE WHEN start // {_PACK_SEQ_LEN} <> (start + n - 1) // {_PACK_SEQ_LEN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_crossing
FROM placed
GROUP BY 1
"""


@register("cur_pack_stats", _PACK_ORACLE)
def cur_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing stats: concat-and-chunk into L=256-token
    sequences within md5 shards; per-shard sequence count, tail fill,
    and boundary-crossing docs."""
    L = _PACK_SEQ_LEN
    docs = (
        tokens_relation(spark, sf_dir)
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            F.size("t").alias("n"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
            F.md5(F.col("doc_id").cast("string")).alias("ord"),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = docs.withColumn("start", F.sum("n").over(w) - F.col("n"))
    crossing = F.when(
        (F.col("start") / L).cast("long")
        != ((F.col("start") + F.col("n") - 1) / L).cast("long"),
        1,
    ).otherwise(0)
    total = F.sum("n")
    n_sequences = F.floor((total + L - 1) / L).cast("long")
    return placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("long").alias("total_tokens"),
        n_sequences.alias("n_sequences"),
        (total - (n_sequences - 1) * L).cast("long").alias("tail_fill"),
        F.sum(crossing).cast("long").alias("n_boundary_crossing"),
    )


# --------------------------------------------------------------------------
# Corpus snapshot diff (CDC): what changed between two corpus versions
# --------------------------------------------------------------------------
# Continuous-ingest corpora are re-crawled and re-filtered; every
# downstream consumer (dedup index, ANN index, tokenized shards) wants
# the CHANGE LOG between snapshot N and N+1, not a full rebuild.  The
# diff is one full-outer join on the primary key with md5-fingerprint
# comparison — both sides partitioned on doc_id, so at 100 TB this is
# a co-partitioned sort-merge join with no broadcast assumption on
# either side (either snapshot may be the big one).
#
# Snapshot derivation is deterministic so the oracle reproduces it:
#   old = docs where doc_id % 7 != 3, text truncated when doc_id % 5 == 2
#   new = docs where doc_id % 11 != 5
# giving all four classes: inserts (new-only), deletes (old-only),
# updates (both, fingerprint moved), unchanged (dropped from the log).
_DIFF_ORACLE = """
WITH old AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 2
                THEN substr(text, 1, CAST(greatest(n_chars - 7, 1) AS INTEGER))
                ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 3
),
new_snap AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 5
),
joined AS (
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           md5(o.text) AS old_fp, md5(n.text) AS new_fp
    FROM old o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN old_fp IS NULL THEN 'insert'
            WHEN new_fp IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       old_fp, new_fp
FROM joined
WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
"""


@register("cur_corpus_diff", _DIFF_ORACLE)
def cur_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus change log (CDC): full-outer join of
    two corpus versions on doc_id, rows classified insert / delete /
    update by md5 fingerprint; unchanged rows never leave the join.
    The incremental-maintenance feed for every derived artifact
    (dedup/ANN indexes, tokenized shards)."""
    from oxford_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 2,
                F.substring(
                    "text", 1, F.greatest(F.col("n_chars") - 7, F.lit(1)).cast("int")
                ),
            ).otherwise(F.col("text"))
        ).alias("old_fp"),
    )
    new_snap = docs.filter(F.col("doc_id") % 11 != 5).select(
        "doc_id", F.md5("text").alias("new_fp")
    )
    joined = old.join(new_snap, "doc_id", "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), "insert")
        .when(F.col("new_fp").isNull(), "delete")
        .otherwise("update")
    )
    return joined.filter(
        F.col("old_fp").isNull()
        | F.col("new_fp").isNull()
        | (F.col("old_fp") != F.col("new_fp"))
    ).select("doc_id", change.alias("change_type"), "old_fp", "new_fp")


# --------------------------------------------------------------------------
# Per-source adaptive quality gate (quantile-threshold admission)
# --------------------------------------------------------------------------
# A fixed global quality cut over-filters clean sources and
# under-filters noisy ones; the production shape (the FineWeb /
# RefinedWeb per-dump discipline) sets the cut PER SOURCE at a fixed
# quantile of that source's own score distribution.  Relationally:
# one per-source percentile aggregation (a #sources-row relation,
# broadcast back over the scored corpus) and one admission projection
# — nothing corpus-sized shuffles twice, and at 100 TB the exact
# percentile swaps to approx_percentile exactly as cur_length_profile
# documents.
_ADAPTIVE_GATE_ORACLE = f"""
WITH {{tokens_cte}},
feat AS (
    SELECT doc_id, source,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_types,
           len(list_filter(t, x -> list_contains({{stop_sql}}, x))) AS n_stop
    FROM toks
),
scored AS (
    SELECT doc_id, source,
           round((least(n_tokens / 50.0, 1.0) * 0.5
                 + (CAST(n_types AS DOUBLE) / n_tokens) * 0.3
                 + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.2)
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS q
    FROM feat WHERE n_tokens > 0
),
cuts AS (
    SELECT source,
           round(quantile_cont(q, 0.25) * 1000000 + 0.01, 0) / 1000000 + 0 AS cut
    FROM scored GROUP BY 1
),
gated AS (
    SELECT s.source, s.q, c.cut,
           CASE WHEN s.q >= c.cut THEN 1 ELSE 0 END AS admit
    FROM scored s JOIN cuts c ON s.source = c.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       any_value(cut) + 0 AS cut,
       CAST(sum(admit) AS BIGINT) AS n_admitted,
       round(CAST(sum(admit) AS DOUBLE) / count(*) * 1000000 + 0.01, 0)
           / 1000000 + 0 AS admit_rate,
       min(CASE WHEN admit = 1 THEN q END) + 0 AS min_admitted,
       max(CASE WHEN admit = 0 THEN q END) + 0 AS max_rejected
FROM gated GROUP BY 1
""".format(tokens_cte=_TOKENS_CTE, stop_sql=_CUR_STOP_SQL)


@register("cur_adaptive_quality_gate", _ADAPTIVE_GATE_ORACLE)
def cur_adaptive_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive admission: each source's cut is the p25 of
    its OWN quality-score distribution (same deterministic score as
    `text_quality`), so clean and noisy sources are gated on their own
    terms.  min_admitted / max_rejected straddle the cut in the output
    as direct evidence the gate was applied where claimed."""
    from oxford_data_pipeline_spark.operators.textops import STOPWORDS, count_in_list

    t = tokens_relation(spark, sf_dir)
    feat = t.select(
        "doc_id",
        "source",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_types"),
        count_in_list(F.col("t"), STOPWORDS).alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    ttr = F.col("n_types").cast("double") / F.col("n_tokens")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    scored = feat.select(
        "doc_id",
        "source",
        round6(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.5
            + ttr * 0.3
            + (1.0 - stop_ratio) * 0.2
        ).alias("q"),
    )
    cuts = scored.groupBy("source").agg(
        round6(F.percentile("q", F.lit(0.25))).alias("cut")
    )
    gated = scored.join(F.broadcast(cuts), "source").withColumn(
        "admit", (F.col("q") >= F.col("cut")).cast("int")
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.any_value("cut") + F.lit(0.0)).alias("cut"),
        F.sum("admit").cast("long").alias("n_admitted"),
        round6(F.sum("admit").cast("double") / F.count(F.lit(1))).alias("admit_rate"),
        (F.min(F.when(F.col("admit") == 1, F.col("q"))) + F.lit(0.0)).alias("min_admitted"),
        (F.max(F.when(F.col("admit") == 0, F.col("q"))) + F.lit(0.0)).alias("max_rejected"),
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination pre-filter (the bounded-broadcast shape)
# --------------------------------------------------------------------------
# cur_decontaminate broadcasts the benchmark SHINGLE relation, whose
# size tracks the benchmark; its docstring carries a production caveat
# for exactly that reason.  The sketch tier removes the caveat: the
# benchmark is folded into a Bloom filter represented RELATIONALLY —
# K = 3 independent arrays, each addressed by a 3-hex-char block of
# md5(k || '|' || shingle), so the whole filter is a DISTINCT (k, pos)
# relation of AT MOST 3 x 4096 rows no matter how large the benchmark
# grows.  Probing is scan-local hashing + one broadcast join against
# that constant-size relation; only the Bloom-POSITIVE shingles reach
# the exact verify join (two-stage: sketch bounds the expensive join),
# and the output reports the false-positive mass the sketch admitted —
# the number that sizes M/K for a deployment.  Everything is md5
# string arithmetic: bit-identical on both engines, no numeric
# conversion anywhere.
_BLOOM_K = 3
_BLOOM_HEX = 3  # 3 hex chars -> 4096 slots per array

_BLOOM_ORACLE = f"""
WITH {{shingles_cte}},
bench AS (
    SELECT DISTINCT shingle FROM shingles WHERE doc_id % 29 = 0
),
corpus AS (
    SELECT DISTINCT doc_id, shingle FROM shingles WHERE doc_id % 29 <> 0
),
ks AS (SELECT unnest(range({_BLOOM_K})) AS k),
bits AS (
    SELECT DISTINCT k.k,
           substr(md5(CAST(k.k AS VARCHAR) || '|' || b.shingle), 1, {_BLOOM_HEX}) AS pos
    FROM bench b CROSS JOIN ks k
),
probe AS (
    SELECT c.doc_id, c.shingle, k.k,
           substr(md5(CAST(k.k AS VARCHAR) || '|' || c.shingle), 1, {_BLOOM_HEX}) AS pos
    FROM corpus c CROSS JOIN ks k
),
bloom_pos AS (
    SELECT p.doc_id, p.shingle
    FROM probe p JOIN bits t ON p.k = t.k AND p.pos = t.pos
    GROUP BY 1, 2
    HAVING count(*) = {_BLOOM_K}
),
confirmed AS (
    SELECT bp.doc_id, bp.shingle
    FROM bloom_pos bp JOIN bench b ON bp.shingle = b.shingle
)
SELECT bp.doc_id,
       CAST(count(*) AS BIGINT) AS n_bloom_pos,
       CAST(coalesce(cf.n_conf, 0) AS BIGINT) AS n_confirmed,
       CAST(count(*) - coalesce(cf.n_conf, 0) AS BIGINT) AS n_false_pos
FROM bloom_pos bp
LEFT JOIN (
    SELECT doc_id, count(*) AS n_conf FROM confirmed GROUP BY 1
) cf ON bp.doc_id = cf.doc_id
GROUP BY 1, cf.n_conf
""".format(shingles_cte=_SHINGLES_CTE)


@register("cur_bloom_prefilter", _BLOOM_ORACLE)
def cur_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage benchmark decontamination: constant-size relational
    Bloom filter pre-filter + exact verify of only the Bloom-positive
    shingles (see section comment).  Output per contaminated-candidate
    doc: Bloom-positive shingles, exactly-confirmed shingles, and the
    sketch's false-positive count."""
    sh = _shingle_df(spark, sf_dir)
    bench = (
        sh.filter(F.col("doc_id") % 29 == 0).select("shingle").distinct()
    )
    corpus = (
        sh.filter(F.col("doc_id") % 29 != 0)
        .select("doc_id", "shingle")
        .distinct()
    )
    ks = F.array(*[F.lit(i) for i in range(_BLOOM_K)])
    pos = F.substring(
        F.md5(F.concat_ws("|", F.col("k").cast("string"), F.col("shingle"))),
        1,
        _BLOOM_HEX,
    )
    bits = (
        bench.select(F.explode(ks).alias("k"), "shingle")
        .select("k", pos.alias("pos"))
        .distinct()
    )
    probe = corpus.select(
        "doc_id", "shingle", F.explode(ks).alias("k")
    ).select("doc_id", "shingle", "k", pos.alias("pos"))
    bloom_pos = (
        probe.join(F.broadcast(bits), ["k", "pos"])
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("n_k"))
        .filter(F.col("n_k") == _BLOOM_K)
        .select("doc_id", "shingle")
    )
    confirmed = (
        bloom_pos.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_conf"))
    )
    return (
        bloom_pos.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_pos"))
        .join(confirmed, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_bloom_pos").cast("long").alias("n_bloom_pos"),
            F.coalesce(F.col("n_conf"), F.lit(0)).cast("long").alias("n_confirmed"),
            (F.col("n_bloom_pos") - F.coalesce(F.col("n_conf"), F.lit(0)))
            .cast("long")
            .alias("n_false_pos"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch term frequencies (the bounded-memory counter tier)
# --------------------------------------------------------------------------
# The frequency-sketch sibling of cur_profile_sketch's HLL and the
# Bloom pre-filter above: corpus term counts folded into K = 3
# hex-addressed counter arrays (4096 slots each), kept RELATIONALLY as
# a (k, pos, cnt) relation of at most 3 x 4096 rows — a constant-size
# summary of an unbounded term distribution, maintained by the same
# map-side-combinable aggregation that builds it.  A term's estimate
# is the MIN over its K counters; CMS guarantees estimate >= exact
# (collisions only ever ADD), which the output exposes per probe term
# as `overestimate` — and the property test pins.  Probe set = the
# corpus's exact top-10 terms (deterministic tie-break), so the query
# is self-contained and also audits the sketch exactly where the
# heavy hitters are.
_CMS_K = 3
_CMS_HEX = 1  # 1 hex char -> 16 counters per array: the synthetic
# corpus has only ~31 distinct terms, so a production-sized width
# would never collide and the min-over-K behavior + overestimate
# column would be inert at test scale; 16 slots force collisions so
# the sketch's defining property is EXERCISED (and property-tested).
# Production sizes width to the tolerated epsilon the usual way —
# the relation stays K x width rows regardless
_CMS_PROBE_N = 10

_CMS_ORACLE = f"""
WITH {{tokens_cte}},
tf AS (
    SELECT term, CAST(count(*) AS BIGINT) AS exact_tf
    FROM (SELECT unnest(t) AS term FROM toks)
    GROUP BY 1
),
ks AS (SELECT unnest(range({_CMS_K})) AS k),
counters AS (
    SELECT k.k,
           substr(md5(CAST(k.k AS VARCHAR) || '|' || tf.term), 1, {_CMS_HEX}) AS pos,
           sum(tf.exact_tf) AS cnt
    FROM tf CROSS JOIN ks k
    GROUP BY 1, 2
),
probe AS (
    SELECT term, exact_tf FROM tf
    ORDER BY exact_tf DESC, term LIMIT {_CMS_PROBE_N}
),
est AS (
    SELECT p.term, p.exact_tf, min(c.cnt) AS cms_est
    FROM probe p
    CROSS JOIN ks k
    JOIN counters c
      ON c.k = k.k
     AND c.pos = substr(md5(CAST(k.k AS VARCHAR) || '|' || p.term), 1, {_CMS_HEX})
    GROUP BY 1, 2
)
SELECT term, exact_tf, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_tf AS BIGINT) AS overestimate
FROM est
""".format(tokens_cte=_TOKENS_CTE)


def cms_counters(tf: DataFrame, count_col: str) -> DataFrame:
    """(… term, <count_col> …) -> the (k, pos, cnt) CMS counter
    relation (K={k} hex-addressed arrays).  A pure map-side-combinable
    SUM, so per-shard / per-micro-batch counter relations merge by
    addition (asserted in tests; the streaming maintainer in
    `streaming/stream_profile.py` relies on exactly this)."""
    ks = F.array(*[F.lit(i) for i in range(_CMS_K)])
    pos = F.substring(
        F.md5(F.concat_ws("|", F.col("k").cast("string"), F.col("term"))),
        1,
        _CMS_HEX,
    )
    return (
        tf.select("term", count_col, F.explode(ks).alias("k"))
        .select("k", pos.alias("pos"), count_col)
        .groupBy("k", "pos")
        .agg(F.sum(count_col).alias("cnt"))
    )


@register("cur_term_cms", _CMS_ORACLE)
def cur_term_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the corpus's top-10
    terms, with the exact count and the sketch's overestimate side by
    side (see section comment for the relational sketch shape)."""
    t = tokens_relation(spark, sf_dir)
    tf = (
        t.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_tf"))
    )
    ks = F.array(*[F.lit(i) for i in range(_CMS_K)])
    pos = F.substring(
        F.md5(F.concat_ws("|", F.col("k").cast("string"), F.col("term"))),
        1,
        _CMS_HEX,
    )
    counters = cms_counters(tf, "exact_tf")
    probe = tf.orderBy(F.col("exact_tf").desc(), "term").limit(_CMS_PROBE_N)
    est = (
        probe.select("term", "exact_tf", F.explode(ks).alias("k"))
        .select("term", "exact_tf", "k", pos.alias("pos"))
        .join(F.broadcast(counters), ["k", "pos"])
        .groupBy("term", "exact_tf")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "term",
        "exact_tf",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_tf")).cast("long").alias("overestimate"),
    )


# --------------------------------------------------------------------------
# Pipeline provenance — why every document was kept or dropped
# --------------------------------------------------------------------------
# cur_pipeline reports the survivors; production operators need the
# inverse view: for EVERY input document, the first stage that
# rejected it ('where did my doc go').  One labeled row per document,
# verdict precedence matching the pipeline's stage order exactly:
# dedup_removed -> benchmark_member -> contaminated ->
# rejected_quality -> admitted.  Pure composition of the stage
# relations cur_pipeline already shares (memoized shingles/pairs/
# survivors), left-joined flag relations + one CASE — no stage is
# recomputed differently from the pipeline itself, so the verdicts
# cannot drift from what the pipeline actually did.
_PROVENANCE_ORACLE = """
WITH RECURSIVE {walk_ctes},
removed AS (
    SELECT doc_id FROM walk GROUP BY doc_id HAVING doc_id <> min(label)
),
bench AS (
    SELECT DISTINCT shingle FROM shingles WHERE doc_id % 29 = 0
),
csh AS (
    SELECT doc_id, shingle FROM shingles WHERE doc_id % 29 <> 0
),
csizes AS (
    SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1
),
chits AS (
    SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
    FROM csh c JOIN bench b ON c.shingle = b.shingle
    GROUP BY 1
),
{bigrams_body},
gram_counts AS (
    SELECT doc_id, gram, count(*) AS cnt FROM bigrams GROUP BY 1, 2
),
rep_doc AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           count(*) AS n_distinct_bigrams,
           max(cnt) AS top_cnt
    FROM gram_counts GROUP BY 1
),
rep_tok AS (
    SELECT doc_id, len(t) AS n_tokens FROM toks WHERE len(t) >= 2
),
admitted AS (
    SELECT p.doc_id
    FROM rep_doc p JOIN rep_tok t ON p.doc_id = t.doc_id
    WHERE t.n_tokens BETWEEN 10 AND 1000
      AND round((1.0 - CAST(p.n_distinct_bigrams AS DOUBLE) / p.n_bigrams) * 1000000 + 0.01, 0) / 1000000 + 0 <= 0.8
      AND round(CAST(p.top_cnt AS DOUBLE) / p.n_bigrams * 1000000 + 0.01, 0) / 1000000 + 0 <= 0.2
)
SELECT d.doc_id, d.source,
       CASE
         WHEN d.doc_id IN (SELECT doc_id FROM removed) THEN 'dedup_removed'
         WHEN d.doc_id % 29 = 0 THEN 'benchmark_member'
         WHEN coalesce(round(CAST(h.n_shared AS DOUBLE) / s.n_sh * 1000000 + 0.01, 0) / 1000000 + 0, 0) > {contam_max}
             THEN 'contaminated'
         WHEN d.doc_id NOT IN (SELECT doc_id FROM admitted) THEN 'rejected_quality'
         ELSE 'admitted'
       END AS verdict
FROM documents d
LEFT JOIN chits h ON d.doc_id = h.doc_id
LEFT JOIN csizes s ON d.doc_id = s.doc_id
""".format(walk_ctes=_WALK_CTES, bigrams_body=_BIGRAMS_BODY, contam_max=_CONTAM_MAX)


@register("cur_provenance", _PROVENANCE_ORACLE)
def cur_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation provenance: the first pipeline stage that
    rejected each doc, or 'admitted' (see section comment).  Flags come
    from the SAME registered stage queries cur_pipeline composes, so
    this report cannot disagree with the pipeline."""
    from oxford_data_pipeline_spark.plans.dedup import dedup_survivors
    from oxford_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    surv = dedup_survivors(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("is_surv")
    )
    decon = cur_decontaminate(spark, sf_dir).select(
        "doc_id", "contaminated_frac"
    )
    adm = (
        cur_repetition(spark, sf_dir)
        .filter("admitted")
        .select("doc_id", F.lit(1).alias("is_adm"))
    )
    verdict = (
        F.when(F.col("is_surv").isNull(), "dedup_removed")
        .when(F.col("doc_id") % 29 == 0, "benchmark_member")
        .when(
            F.coalesce(F.col("contaminated_frac"), F.lit(0.0)) > _CONTAM_MAX,
            "contaminated",
        )
        .when(F.col("is_adm").isNull(), "rejected_quality")
        .otherwise("admitted")
    )
    return (
        docs.join(surv, "doc_id", "left")
        .join(decon, "doc_id", "left")
        .join(adm, "doc_id", "left")
        .select("doc_id", "source", verdict.alias("verdict"))
    )


# --------------------------------------------------------------------------
# Corpus drift report — the monitoring signal between snapshots
# --------------------------------------------------------------------------
# The third leg of the CDC chain (diff -> index delta -> DRIFT): how
# the term distribution moved between the old and new corpus
# snapshots (same snapshot definitions as cur_corpus_diff), reported
# as the top terms by absolute relative-frequency change.  This is
# the retrain/alert trigger a corpus-monitoring dashboard reads (a
# sudden distribution shift means scraped content changed, a source
# went bad, or a filter broke).  Two map-side-combinable term
# aggregations + one small join; top-N on the vocab-sized result —
# no ln/KL anywhere, so the report is exact integer/ratio arithmetic
# on both engines.
_DRIFT_TOPN = 20

_DRIFT_ORACLE = f"""
WITH old_docs AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 2
                THEN substr(text, 1, CAST(greatest(n_chars - 7, 1) AS INTEGER))
                ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 3
),
new_docs AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 5
),
otf AS (
    SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest({_TOKENIZE_TEXT_SQL}) AS term
        FROM old_docs
    ) GROUP BY 1
),
ntf AS (
    SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest({_TOKENIZE_TEXT_SQL}) AS term
        FROM new_docs
    ) GROUP BY 1
),
osum AS (SELECT sum(n) AS tot FROM otf),
nsum AS (SELECT sum(n) AS tot FROM ntf),
joined AS (
    SELECT coalesce(o.term, nw.term) AS term,
           coalesce(o.n, 0) AS old_n, coalesce(nw.n, 0) AS new_n
    FROM otf o FULL OUTER JOIN ntf nw ON o.term = nw.term
),
freqs AS (
    SELECT term, old_n, new_n,
           round(CAST(old_n AS DOUBLE) / osum.tot * 1000000 + 0.01, 0) / 1000000 + 0 AS old_freq,
           round(CAST(new_n AS DOUBLE) / nsum.tot * 1000000 + 0.01, 0) / 1000000 + 0 AS new_freq
    FROM joined CROSS JOIN osum CROSS JOIN nsum
)
SELECT term, old_n, new_n, old_freq, new_freq,
       round(abs(new_freq - old_freq) * 1000000 + 0.01, 0) / 1000000 + 0 AS abs_shift
FROM freqs
ORDER BY abs_shift DESC, term LIMIT {_DRIFT_TOPN}
"""


@register("cur_corpus_drift", _DRIFT_ORACLE)
def cur_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{N} term-distribution shifts between the old and new corpus
    snapshots (see section comment) — the CDC chain's monitoring leg."""
    from oxford_data_pipeline_spark.operators.textops import normalized, tokens
    from oxford_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    old_text = F.when(
        F.col("doc_id") % 5 == 2,
        F.substring(
            "text", 1, F.greatest(F.col("n_chars") - 7, F.lit(1)).cast("int")
        ),
    ).otherwise(F.col("text"))
    otf = (
        docs.filter(F.col("doc_id") % 7 != 3)
        .select(F.explode(tokens(normalized(old_text))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("old_n"))
    )
    ntf = (
        docs.filter(F.col("doc_id") % 11 != 5)
        .select(F.explode(tokens(normalized("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("new_n"))
    )
    osum = otf.agg(F.sum("old_n").alias("otot"))
    nsum = ntf.agg(F.sum("new_n").alias("ntot"))
    joined = (
        otf.join(ntf, "term", "full_outer")
        .select(
            "term",
            F.coalesce("old_n", F.lit(0)).alias("old_n"),
            F.coalesce("new_n", F.lit(0)).alias("new_n"),
        )
        .crossJoin(F.broadcast(osum))
        .crossJoin(F.broadcast(nsum))
    )
    freqs = joined.select(
        "term",
        "old_n",
        "new_n",
        round6(F.col("old_n").cast("double") / F.col("otot")).alias("old_freq"),
        round6(F.col("new_n").cast("double") / F.col("ntot")).alias("new_freq"),
    )
    return (
        freqs.withColumn(
            "abs_shift", round6(F.abs(F.col("new_freq") - F.col("old_freq")))
        )
        .orderBy(F.col("abs_shift").desc(), "term")
        .limit(_DRIFT_TOPN)
    )


# --------------------------------------------------------------------------
# Topic-balanced corpus sampling through the trained quantizer
# --------------------------------------------------------------------------
# Cluster-balanced data selection (the DoReMi / cluster-dedup family's
# rebalancing step): assign every embedding to its learned k-means
# topic cell — the SAME trained coarse quantizer the IVF ANN tier
# maintains, reused as a topic model — then draw an equal per-topic
# quota in seeded md5 order so over-represented topics are capped and
# the curated mix is uniform across learned topics.
#
# Scale shape: the only full-corpus step is the one-pass cell
# assignment, which the ANN index already maintains (memoized here,
# incrementally appendable via sim_ivf_incremental's path) — the
# balance pass itself is a per-cell count + a per-cell md5-rank
# selection.  The rank window partitions on cell; because the
# selection key is a uniform hash, at 100 TB the same selection is a
# constant-time md5-threshold filter (keep if md5 < quota/n_cells
# quantile) with the window only re-ranking the bounded survivor set —
# the relation below IS that contract at test scale.
def _topic_balance_oracle() -> str:
    from oxford_data_pipeline_spark.plans.similarity import _IVF_CHAIN

    return f"""
WITH {_IVF_CHAIN},
bal_assign AS (
    SELECT a.vec_id,
           CASE WHEN n.nrm > 0 THEN CAST(a.cell AS INTEGER)
                ELSE -1 END AS cell
    FROM assignment a JOIN norms n ON n.vec_id = a.vec_id
),
sizes AS (SELECT cell, count(*) AS n_vecs FROM bal_assign GROUP BY 1),
tot AS (
    SELECT CAST(ceil(CAST(count(*) AS DOUBLE) / count(DISTINCT cell)) AS BIGINT)
               AS quota
    FROM bal_assign
),
bal_ranked AS (
    SELECT vec_id, cell,
           CAST(row_number() OVER (
               PARTITION BY cell
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) AS rk
    FROM bal_assign
)
SELECT r.vec_id, r.cell, r.rk, s.n_vecs, t.quota
FROM bal_ranked r
JOIN sizes s ON s.cell = r.cell
CROSS JOIN tot t
WHERE r.rk <= t.quota
"""


@register("cur_topic_balance", _topic_balance_oracle())
def cur_topic_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced sampling (see section comment): equal per-cell
    quotas over the trained IVF quantizer's cell assignment, drawn in
    md5(vec_id) order.  Output carries the per-cell size and the
    global quota so the kept/eligible accounting is part of the
    hash-checked relation.  Zero-norm vectors sit in the -1
    quarantine cell and compete for its quota like any topic."""
    from oxford_data_pipeline_spark.plans.similarity import _ivf_candidates

    _long, _norms, _cent, assignment, _cand = _ivf_candidates(spark, sf_dir)
    assignment = assignment.select("vec_id", F.col("cell").cast("int").alias("cell"))
    sizes = assignment.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = assignment.agg(
        F.ceil(
            F.count(F.lit(1)).cast("double") / F.countDistinct("cell")
        ).alias("quota")
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        assignment.withColumn("rk", F.row_number().over(w).cast("int"))
        .join(F.broadcast(sizes), "cell")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("rk") <= F.col("quota"))
        .select("vec_id", "cell", "rk", "n_vecs", "quota")
    )


# --------------------------------------------------------------------------
# Leakage-guarded train/val/test split (cluster-aware)
# --------------------------------------------------------------------------
# The split hygiene step every serious pre-training pipeline needs:
# a per-DOCUMENT random split leaks near-duplicates across train and
# eval (the classic inflated-eval bug); the correct unit of assignment
# is the near-dup CLUSTER.  Split key = md5 of the cluster id, so (a)
# every member of a cluster lands in the same split by construction,
# (b) the assignment is seeded/deterministic across engines and runs,
# and (c) at 100 TB it is a scan-local hash on the maintained cluster
# label — no shuffle beyond the label join the dedup tier already owns.
# Thresholds: first byte of md5 in [0,204) → train, [204,230) → val,
# else test (⌊0.8·256⌋ / ⌊0.9·256⌋ — the standard hash-bucket split).
_CLUSTER_SPLIT_ORACLE = f"""
WITH RECURSIVE {_WALK_CTES},
labels AS (SELECT doc_id, min(label) AS grp FROM walk GROUP BY doc_id),
grps AS (
    SELECT d.doc_id, coalesce(l.grp, d.doc_id) AS group_id
    FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
),
sizes AS (SELECT group_id, count(*) AS n_members FROM grps GROUP BY 1),
keyed AS (
    SELECT doc_id, group_id,
           (strpos('0123456789abcdef',
                   substr(md5('split|' || CAST(group_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5('split|' || CAST(group_id AS VARCHAR)), 2, 1)) - 1) AS v
    FROM grps
)
SELECT k.doc_id, k.group_id, s.n_members,
       CASE WHEN k.v < 204 THEN 'train'
            WHEN k.v < 230 THEN 'val'
            ELSE 'test' END AS split
FROM keyed k JOIN sizes s ON s.group_id = k.group_id
"""


@register("cur_cluster_split", _CLUSTER_SPLIT_ORACLE)
def cur_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware split (see section comment): every document joins
    its maintained near-dup cluster label (singletons are their own
    cluster), and the whole cluster is hashed into train/val/test
    together — the leakage guard a per-doc split lacks.  The label
    relation is the SAME memoized `_cc_labels` table the dedup tier
    maintains; the split itself is one broadcast-joinable aggregation
    plus a scan-local hash."""
    from oxford_data_pipeline_spark.plans.dedup import _cc_labels
    from oxford_data_pipeline_spark.sources.catalog import load_table

    labels = _cc_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    grps = docs.join(
        labels.select("doc_id", F.col("label").alias("grp")), "doc_id", "left"
    ).select("doc_id", F.coalesce("grp", "doc_id").alias("group_id"))
    sizes = grps.groupBy("group_id").agg(F.count(F.lit(1)).alias("n_members"))
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split|"), F.col("group_id").cast("string"))),
            1, 2,
        ),
        16, 10,
    ).cast("long")
    return (
        grps.withColumn("v", v)
        .join(sizes, "group_id")
        .select(
            "doc_id",
            "group_id",
            "n_members",
            F.when(F.col("v") < 204, "train")
            .when(F.col("v") < 230, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


# --------------------------------------------------------------------------
# Weighted corpus sampling (Efraimidis–Spirakis, seeded)
# --------------------------------------------------------------------------
# Weighted sampling without replacement at corpus scale: the A-ES
# scheme (Efraimidis & Spirakis 2006) — key = u^(1/w) per item with
# u ~ U(0,1), global top-k by key IS an exact weighted sample.  Here
# w = n_chars, i.e. token-budget-proportional selection (long docs
# proportionally likelier — the standard way to sample a fixed-doc
# preview whose mass tracks the corpus).  u derives from md5(doc_id)
# (6 nibbles → (v+0.5)/16^6), so the sample is seeded/deterministic
# and engine-identical; keys are compared in log space (ln(u)/w,
# order-isomorphic to u^(1/w)), round6-nudged before ranking with a
# doc_id tie-break.  Scale shape: one scan-local key per doc + a
# global top-k — TakeOrdered, never a global sort; the final rank
# window runs over k rows.
_ES_SAMPLE_K = 20
_ES_V_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (5 - i)}"
    for i in range(6)
)

_WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, source, n_chars, {_ES_V_SQL} AS v
    FROM documents
    WHERE n_chars > 0
),
es AS (
    SELECT doc_id, source, n_chars,
           round(ln((CAST(v AS DOUBLE) + 0.5e0) / 16777216.0e0)
                 / CAST(n_chars AS DOUBLE) * 1000000 + 0.01, 0) / 1000000 + 0
               AS es_key
    FROM keyed
)
SELECT doc_id, source, n_chars, es_key, rk FROM (
    SELECT *, CAST(row_number() OVER (ORDER BY es_key DESC, doc_id)
                   AS INTEGER) AS rk
    FROM es
) WHERE rk <= {_ES_SAMPLE_K}
"""


def es_keyed(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_chars, …) → + es_key: the A-ES selection key
    ln(u)/n_chars with u md5-derived, round6-nudged.  Shared by the
    batch query and the streaming sample maintainer.  Empty documents
    (n_chars = 0) are excluded: ln(u)/0 is -inf on both engines and
    NaN/-inf ordering is engine-divergent, so weight-0 rows can never
    be sampled — the A-ES contract anyway (weight 0 ⇒ probability 0)."""
    docs = docs.filter(F.col("n_chars") > 0)
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    return docs.select(
        "doc_id", "source", "n_chars",
        round6(
            F.log((v.cast("double") + F.lit(0.5)) / F.lit(16777216.0))
            / F.col("n_chars").cast("double")
        ).alias("es_key"),
    )


def es_top_k(keyed: DataFrame, k: int = _ES_SAMPLE_K) -> DataFrame:
    """Global top-k by A-ES key (TakeOrdered — no global sort), ranked
    within the k survivors only."""
    top = keyed.orderBy(F.col("es_key").desc(), "doc_id").limit(k)
    w = Window.orderBy(F.col("es_key").desc(), "doc_id")
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


@register("cur_weighted_sample", _WEIGHTED_SAMPLE_ORACLE)
def cur_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded weighted sample (see section comment): per-doc A-ES key
    via `es_keyed`, global top-k via `es_top_k`."""
    from oxford_data_pipeline_spark.sources.catalog import load_table

    return es_top_k(es_keyed(load_table(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# HyperLogLog vocabulary sketch (register relation)
# --------------------------------------------------------------------------
# The third sketch tier beside count-min (`cur_term_cms`) and Bloom
# (`cur_bloom_prefilter`): distinct-count at corpus scale as a FIXED
# 256-register relation (Flajolet et al. 2007).  bucket = first 8 bits
# of md5(term); rho = 1 + leading-zero count of the next 48 bits
# (capped: all-zero → 49); register = max(rho) per bucket.  max() is
# duplicate-insensitive, so the sketch builds straight off the posting
# relation with NO distinct — one map-side-combinable aggregation into
# ≤256 rows, mergeable across shards/streams by the same max.  The
# register relation is the hash-checked artifact; the cardinality
# estimate derived from it is audited against the exact vocabulary
# count in tests (the estimate itself is a float formula — registers
# are the engine-exact contract, same split as the CMS counters).
# Both engines compute rho by EXACT integer/string logic (no
# float log2 — its boundary rounding could flip a register).
_HLL_ORACLE = f"""
WITH {{postings}},
hashed AS (
    SELECT md5(term) AS h FROM tf
),
rhos AS (
    SELECT
        (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
        length(regexp_extract(substr(h, 3, 12), '^0*')) AS lead0,
        strpos('0123456789abcdef',
               substr(h, 3 + length(regexp_extract(substr(h, 3, 12), '^0*')), 1)
        ) - 1 AS nz
    FROM hashed
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(max(CASE WHEN lead0 = 12 THEN 49
                     ELSE lead0 * 4
                          + (4 - CASE WHEN nz >= 8 THEN 4
                                      WHEN nz >= 4 THEN 3
                                      WHEN nz >= 2 THEN 2
                                      ELSE 1 END) + 1 END)
            AS INTEGER) AS mreg
FROM rhos
GROUP BY 1
"""


def _hll_oracle() -> str:
    from oxford_data_pipeline_spark.plans.retrieval import _POSTINGS_CTE

    return _HLL_ORACLE.format(postings=_POSTINGS_CTE)


def hll_registers(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """(…, term) → the (bucket, mreg) HLL register relation.  rho on
    the Spark side: conv(hex→binary string) has no leading zeros, so
    49 − length(binary) IS the exact leading-zero-plus-one count —
    pure string/integer ops, engine-identical with the oracle's nibble
    CASE logic.  Shared by the batch query and the streaming
    maintainer (`streaming/stream_profile.py`)."""
    h = F.md5(F.col(term_col))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    bitlen = F.length(F.conv(F.substring(h, 3, 12), 16, 2))
    rho = F.when(v == 0, F.lit(49)).otherwise(F.lit(49) - bitlen)
    return (
        terms.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("mreg"))
    )


@register("cur_vocab_hll", _hll_oracle())
def cur_vocab_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register relation (see section comment) over the maintained
    posting table, via the shared `hll_registers` builder."""
    from oxford_data_pipeline_spark.plans.retrieval import postings_relation

    return hll_registers(postings_relation(spark, sf_dir))


# --------------------------------------------------------------------------
# Domain mixing: per-host corpus shares off the normalized URL host
# --------------------------------------------------------------------------
# The domain analog of `cur_mixture_weights`: crawl pipelines weight
# their sampling by registered host (RefinedWeb's per-domain caps,
# Dolma's domain mixing), keyed on the SAME normalized host the
# URL-tier dedup uses (`operators/urlops.py`, fed by the WARC
# connector's preserved WARC-Target-URI).  Shape: scan-local URL
# algebra → one per-host aggregation → a broadcast single-row total;
# the corpus is touched once, output is |hosts| rows.  A degenerate
# all-empty host (char_share = 0) gets a NULL mix_weight on both
# engines, same convention as cur_mixture_weights.
def _domain_mix_oracle() -> str:
    from oxford_data_pipeline_spark.operators.urlops import (
        SYNTH_URLS_CTE,
        URL_NORM_SQL,
    )

    return f"""
WITH {SYNTH_URLS_CTE.strip()},
{URL_NORM_SQL.strip()},
per_host AS (
    SELECT host, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM normed GROUP BY 1
),
tot AS (
    SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(*) AS n_hosts
    FROM per_host
)
SELECT h.host, h.n_docs, h.n_chars,
       round(CAST(h.n_chars AS DOUBLE) / t.total_chars * 1000000 + 0.01, 0) / 1000000 + 0 AS char_share,
       round(1.0 / t.n_hosts / NULLIF(CAST(h.n_chars AS DOUBLE) / t.total_chars, 0) * 1000000 + 0.01, 0) / 1000000 + 0 AS mix_weight
FROM per_host h CROSS JOIN tot t
"""


def host_counts(docs_with_url: DataFrame) -> DataFrame:
    """(…, n_chars, url) → (host, n_docs, n_chars): the additive
    per-host count relation — the maintained table the domain-mix
    rollup reads.  Addition-mergeable across shards and stream
    batches (the same algebra as the CMS counters), so the streaming
    maintainer (`streaming/stream_curation.host_mix_maintenance_stream`)
    folds micro-batches into it with no rescan."""
    from oxford_data_pipeline_spark.operators.urlops import normalize_urls

    return (
        normalize_urls(docs_with_url)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


@register("cur_domain_mix", _domain_mix_oracle())
def cur_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host docs/chars + mixing weights vs a uniform-host target
    (see section comment)."""
    from oxford_data_pipeline_spark.operators.urlops import synthetic_url
    from oxford_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        synthetic_url(F.col("doc_id"), F.col("source")).alias("url"),
    )
    per_host = host_counts(docs)
    tot = per_host.agg(
        F.sum("n_chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_hosts"),
    )
    share = F.col("n_chars").cast("double") / F.col("total_chars")
    return per_host.crossJoin(F.broadcast(tot)).select(
        "host",
        "n_docs",
        "n_chars",
        round6(share).alias("char_share"),
        round6(
            F.when(share > 0, F.lit(1.0) / F.col("n_hosts") / share)
        ).alias("mix_weight"),
    )


# --------------------------------------------------------------------------
# Domain blocklist filter (per-host admission off the normalized host)
# --------------------------------------------------------------------------
# The companion first-pass crawl op to `dedup_url`: cc_net and
# RefinedWeb both drop documents whose registered host is on a
# blocklist BEFORE any content processing.  The blocklist is a tiny
# relation (thousands of hosts vs billions of docs), so the filter is
# a broadcast anti-join against the scan-local normalized host — zero
# corpus-sized shuffles before admission.  Here the blocklist derives
# deterministically from the host hash (first md5 nibble < '2',
# ~12.5% of hosts) so the query is self-contained and engine-exact;
# production swaps in the curated host relation at the same seam.
# Output = per-host admitted tallies (blocked hosts anti-joined out),
# the relation a domain-mix sampler consumes post-filter.
def _domain_blocklist_oracle() -> str:
    from oxford_data_pipeline_spark.operators.urlops import (
        SYNTH_URLS_CTE,
        URL_NORM_SQL,
    )

    return f"""
WITH {SYNTH_URLS_CTE.strip()},
{URL_NORM_SQL.strip()},
blocklist AS (
    SELECT DISTINCT host FROM normed
    WHERE substr(md5(host), 1, 1) < '2'
)
SELECT n.host, count(*) AS n_docs,
       CAST(sum(n.n_chars) AS BIGINT) AS n_chars
FROM normed n
WHERE n.host NOT IN (SELECT host FROM blocklist)
GROUP BY 1
"""


@register("cur_domain_blocklist", _domain_blocklist_oracle())
def cur_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-filtered per-host admission (see section comment):
    derive the blocklist relation, broadcast anti-join it against the
    normalized host, aggregate the admitted remainder per host."""
    from oxford_data_pipeline_spark.operators.urlops import (
        normalize_urls,
        synthetic_url,
    )
    from oxford_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        synthetic_url(F.col("doc_id"), F.col("source")).alias("url"),
    )
    normed = normalize_urls(docs)
    blocklist = (
        normed.select("host")
        .distinct()
        .filter(F.substring(F.md5("host"), 1, 1) < "2")
    )
    return (
        normed.join(F.broadcast(blocklist), "host", "left_anti")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
