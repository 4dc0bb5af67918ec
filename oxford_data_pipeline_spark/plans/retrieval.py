"""Lexical retrieval over `documents`: BM25 top-k search and TF-IDF
keyword extraction.

Training-data pipelines use lexical retrieval for targeted data
selection (pull documents matching a benchmark's topics), near-match
curation review, and keyword-profile reporting — the same posting-list
relations the dedup family already maintains.

Scale design: the posting relation (doc_id, term, tf) is the classic
inverted index expressed relationally — one explode + one
map-side-combinable groupBy over the corpus.  BM25 filters postings to
the (tiny) query vocabulary BEFORE any aggregation, so the only
corpus-wide work is the scan; document-frequency and corpus-size
relations are a handful of rows and broadcast.  TF-IDF keyword
extraction keeps the full vocabulary but is two aggregations plus one
per-doc window — no self-joins, no pair products.

Cross-engine float discipline: every score is produced by a SHARED SQL
fragment (identical text run through Spark's and DuckDB's parsers) in
which each literal carries `e0` so BOTH engines parse pure DOUBLE
(bare `0.5` is DECIMAL in each) and every integer input is cast to
DOUBLE at the same node — the two engines then execute the identical
IEEE-754 op tree, and `round6` absorbs the ≤1-ulp libm `ln` slack.
Ranking windows order by the ROUNDED score with a doc_id/term
tie-break, so rank assignment cannot diverge on summation noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.plans.textops import _TOKENS_CTE, tokens_relation

# --------------------------------------------------------------------------
# Shared relations
# --------------------------------------------------------------------------
# Fixed benchmark query set (query_id, term) — literal in both engines.
_BM25_QUERIES: list[tuple[int, str]] = [
    (1, "spark"), (1, "join"), (1, "window"),
    (2, "customer"), (2, "order"), (2, "data"),
    (3, "hash"), (3, "merge"), (3, "stream"), (3, "table"),
]
_QUERY_VALUES_SQL = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)

_K1 = "1.2e0"
_B1 = "0.75e0"  # b
_TOPK = 10
_TFIDF_TOPK = 3

# Postings + corpus-stats CTEs shared by both oracle queries.
_POSTINGS_CTE = f"""
{_TOKENS_CTE},
docs AS (
    SELECT doc_id, len(t) AS dl FROM toks WHERE len(t) > 0
),
stats AS (
    SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs
),
post AS (
    SELECT doc_id, unnest(t) AS term FROM toks
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM post GROUP BY 1, 2
)
"""

# The per-(query-term, doc) BM25 contribution.  Lucene's BM25+1 idf —
# always positive, so a term in >half the corpus still contributes.
# Identical text is evaluated by both engines (see module docstring).
_BM25_TERM_FRAG = (
    "ln((CAST(n_docs - df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0)"
    " + 1.0e0)"
    " * (CAST(tf AS DOUBLE) * 2.2e0)"
    " / (CAST(tf AS DOUBLE) + 1.2e0 * (0.25e0 + 0.75e0"
    " * (CAST(dl * n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))"
)

# Plain TF-IDF keyword weight: (tf/dl) * ln(N/df).  No sums at all —
# every factor is a deterministic scalar, so the value is bit-identical
# across engines before rounding.
_TFIDF_FRAG = (
    "(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))"
    " * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"
)


_BM25_ORACLE = f"""
WITH {_POSTINGS_CTE},
qt(query_id, term) AS (VALUES {_QUERY_VALUES_SQL}),
qvocab AS (SELECT DISTINCT term FROM qt),
qtf AS (
    SELECT t.doc_id, t.term, t.tf FROM tf t JOIN qvocab USING (term)
),
dfreq AS (
    SELECT term, count(DISTINCT doc_id) AS df FROM qtf GROUP BY 1
),
contrib AS (
    SELECT q.query_id, p.doc_id,
           {_BM25_TERM_FRAG} AS term_score
    FROM qt q
    JOIN qtf p USING (term)
    JOIN dfreq USING (term)
    JOIN docs d ON d.doc_id = p.doc_id
    CROSS JOIN stats
),
scored AS (
    SELECT query_id, doc_id,
           round(sum(term_score) * 1000000 + 0.01, 0) / 1000000 + 0 AS score
    FROM contrib GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rnk
    FROM scored
)
SELECT query_id, CAST(rnk AS INTEGER) AS rank, doc_id, score
FROM ranked WHERE rnk <= {_TOPK}
"""


@register("text_bm25_topk", _BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{10} retrieval for a fixed benchmark query set.

    Plan shape: the corpus-wide work is ONE scan producing the posting
    relation, immediately semi-joined (broadcast) to the query
    vocabulary — everything after operates on |matching postings|
    rows.  df / corpus stats are tiny aggregates joined broadcast; the
    only per-query shuffle is the final top-k window on query_id.
    At 100 TB: the posting relation is the maintained inverted-index
    table; queries are pure broadcast probes against it.
    """
    t = tokens_relation(spark, sf_dir)
    docs = t.filter(F.size("t") > 0).select(
        "doc_id", F.size("t").cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qt = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    qvocab = qt.select("term").distinct()
    # restrict postings to query vocabulary BEFORE the tf aggregation:
    # only matching tokens ever shuffle.
    qtf = (
        t.select("doc_id", F.explode("t").alias("term"))
        .join(F.broadcast(qvocab), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = qtf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        qt.join(qtf, "term")
        .join(F.broadcast(dfreq), "term")
        .join(docs, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc_id", F.expr(_BM25_TERM_FRAG).alias("term_score")
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        round6(F.sum("term_score")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


_TFIDF_ORACLE = f"""
WITH {_POSTINGS_CTE},
dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
),
weighted AS (
    SELECT t.doc_id, t.term,
           round({_TFIDF_FRAG} * 1000000 + 0.01, 0) / 1000000 + 0 AS weight
    FROM tf t
    JOIN dfreq USING (term)
    JOIN docs d ON d.doc_id = t.doc_id
    CROSS JOIN stats
    WHERE df < n_docs
),
ranked AS (
    SELECT doc_id, term, weight,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY weight DESC, term) AS rnk
    FROM weighted
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rank, term, weight
FROM ranked WHERE rnk <= {_TFIDF_TOPK}
"""


@register("text_tfidf_top_terms", _TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction: top-{3} terms by
    (tf/dl)·ln(N/df), ubiquitous terms (df == N) excluded.

    Two map-side-combinable aggregations over the posting relation
    (tf per doc-term, df per term) and one per-doc ranking window —
    the keyword-profile report a curation dashboard reads.  df per
    (doc,term) posting needs `tf` distinct doc counting, but since the
    tf relation is already one row per (doc, term), df = count(*).
    """
    t = tokens_relation(spark, sf_dir)
    docs = t.filter(F.size("t") > 0).select(
        "doc_id", F.size("t").cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        t.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = (
        tf.join(dfreq, "term")
        .join(docs, "doc_id")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") < F.col("n_docs"))
        .select("doc_id", "term", round6(F.expr(_TFIDF_FRAG)).alias("weight"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("term")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TFIDF_TOPK)
        .select("doc_id", "rank", "term", "weight")
    )
