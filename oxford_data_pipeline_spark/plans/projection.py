"""M5 relational matmul + M3 weight normalization + §2.8 z-score.

The reference's projection operator is `proj = zscore(X) @ W[:, :k]`
(`perform_session_cca.m:402-464`; `cross_trial_type_cca_analysis.py:
662-713`). In long form a matmul is a join + groupBy-sum — pure
DataFrame algebra, fully oracle-verifiable, and it scales: the join is
an equi-join on `dim`, the aggregate combines map-side.

Here X = the embeddings table (vec_id × 64 dims) and W = per-label
centroid vectors derived from the same data — i.e. "project every
embedding onto every class centroid", a real training-data scoring op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.memo import memoized
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

N_DIMS = 64

_LONG_SQL = f"""
    SELECT e.vec_id, e.label, CAST(r.range AS INTEGER) AS dim,
           CAST(e.embedding[CAST(r.range AS INTEGER) + 1] AS DOUBLE) AS val
    FROM embeddings e CROSS JOIN range({N_DIMS}) r
"""


_emb_long_cache: dict[tuple, DataFrame] = {}


def embeddings_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long (vec_id, label, dim, val) view of the embedding column.

    posexplode is the Spark-native unnest; at 100 TB this long layout is
    the storage layout and the explode disappears.

    Persisted + memoized like the shingle/token relations: the three
    ANN queries, embedding dedup, and M3/M5 each reference it 2-4×
    (self-join sides, norm + score passes) and Spark does not reuse the
    exchange across those subtrees.  In production this is the
    materialized long table itself, so the persist models a table scan.
    """

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return (
            emb.select(
                "vec_id",
                "label",
                F.posexplode("embedding").alias("dim", "val_f"),
            )
            .withColumn("val", F.col("val_f").cast("double"))
            .drop("val_f")
        )

    return memoized(_emb_long_cache, spark, ("emb_long", sf_dir), build)


_emb_vec_cache: dict[tuple, DataFrame] = {}


def embeddings_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, vec: array<double>, nrm) — the ARRAY-form twin
    of `embeddings_long`, for exact pair verification: a pair dot
    product folds the two arrays in one JVM expression
    (zip_with + aggregate), so each candidate pair is ONE row through
    the join instead of N_DIMS rows plus an aggregation exchange.
    The long relation stays the right shape for dim-keyed math
    (hyperplane/centroid joins); this one is the right shape for
    pair-keyed math.  Persisted + memoized like its twin."""

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return emb.select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("vec"),
        ).withColumn("nrm", F.sqrt(vec_sumsq("vec")))

    return memoized(_emb_vec_cache, spark, ("emb_vec", sf_dir), build)


import re as _re

_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _assert_ident(name: str) -> None:
    """Both dot helpers interpolate column names into a raw SQL string;
    a reserved word or non-identifier name would misparse or silently
    bind as a struct path (r14 advisor item 1).  Every caller passes a
    plain identifier — enforce that instead of quoting, so the emitted
    expression text (and thus the codegen cache key) stays unchanged."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"pair_dot/vec_sumsq need a plain identifier, got {name!r}")


def pair_dot(a: str, b: str, n: int = N_DIMS):
    """dot(a, b) of two length-`n` array<double> columns, unrolled to a
    whole-stage-codegen-able left-associative sum.

    Float-identical to the previous
    ``aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)``
    fold: same ((0 + a0*b0) + a1*b1) + ... addition order, same NULL
    propagation.  The fold form's lambdas are evaluated INTERPRETED per
    element (higher-order functions are CodegenFallback), which at
    |pairs| x n elements dominates every dense scoring pass; the
    unrolled sum runs inside WholeStageCodegen at columnar speed.

    Emitted as ONE SQL string parsed JVM-side (r14): the Column-API
    form issued ~3n py4j calls per use, which showed up as ~0.5-1 s of
    DRIVER-side plan construction on every dense-scoring query; the
    parser builds the identical left-associative expression tree."""
    _assert_ident(a)
    _assert_ident(b)
    terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(n))
    return F.expr(f"0.0D + {terms}" if n else "0.0D")


def vec_sumsq(col: str, n: int = N_DIMS):
    """sum of squares of a length-`n` array<double> column, unrolled —
    float-identical to ``aggregate(col, 0D, (acc, x) -> acc + x * x)``
    (same addition order), codegen-able like `pair_dot` and emitted as
    one JVM-parsed SQL string like it."""
    _assert_ident(col)
    terms = " + ".join(f"{col}[{i}] * {col}[{i}]" for i in range(n))
    return F.expr(f"0.0D + {terms}" if n else "0.0D")


def zscore_by_dim(long: DataFrame) -> DataFrame:
    """§2.8 z-score by column (`perform_session_cca.m:423-424`):
    per-dim mean/std aggregated once, broadcast back — never a window
    over fact rows."""
    stats = long.groupBy("dim").agg(
        F.avg("val").alias("mu"), F.stddev_samp("val").alias("sigma")
    )
    return (
        long.join(F.broadcast(stats), "dim")
        .withColumn("z", (F.col("val") - F.col("mu")) / F.col("sigma"))
        .drop("mu", "sigma")
    )


_M5_ORACLE = f"""
WITH long AS ({_LONG_SQL}),
stats AS (
    SELECT dim, avg(val) AS mu, stddev_samp(val) AS sigma FROM long GROUP BY 1
),
z AS (
    SELECT l.vec_id, l.label, l.dim, (l.val - s.mu) / s.sigma AS z
    FROM long l JOIN stats s ON l.dim = s.dim
),
centroids AS (
    SELECT label AS c_label, dim, avg(z) AS w FROM z GROUP BY 1, 2
)
SELECT z.vec_id, c.c_label,
       round(sum(z.z * c.w) * 1000000 + 0.01, 0) / 1000000 + 0 AS score
FROM z JOIN centroids c ON z.dim = c.dim
GROUP BY 1, 2
"""


@register("m5_relational_matmul", _M5_ORACLE)
def m5_relational_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — canonical projection as relational matmul: z-score X, build
    label-centroid weights W, score = Σ_dim z·w per (vec, label).
    Join on `dim`, map-side-combining sum — the 100 TB-safe matmul."""
    z = zscore_by_dim(embeddings_long(spark, sf_dir))
    centroids = z.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.avg("z").alias("w")
    )
    return (
        z.join(F.broadcast(centroids), "dim")
        .groupBy("vec_id", "c_label")
        .agg(round6(F.sum(F.col("z") * F.col("w"))).alias("score"))
    )


_M3_ORACLE = f"""
WITH long AS ({_LONG_SQL}),
stats AS (
    SELECT dim, avg(val) AS mu, stddev_samp(val) AS sigma FROM long GROUP BY 1
),
z AS (
    SELECT l.vec_id, l.label, l.dim, (l.val - s.mu) / s.sigma AS z
    FROM long l JOIN stats s ON l.dim = s.dim
),
centroids AS (
    SELECT label, dim, avg(z) AS w FROM z GROUP BY 1, 2
),
extrema AS (
    SELECT label, min(abs(w)) AS lo, max(abs(w)) AS hi FROM centroids GROUP BY 1
)
SELECT c.label, c.dim,
       round((c.w - e.lo) / (e.hi - e.lo) * 1000000 + 0.01, 0) / 1000000 + 0 AS w_norm
FROM centroids c JOIN extrema e ON c.label = e.label
"""


@register("m3_weight_minmax_norm", _M3_ORACLE)
def m3_weight_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — CCA-weight min-max post-normalization: per component, the
    min/max of |w| applied to the SIGNED w (`perform_session_cca.m:
    196-236` — the reference deliberately keeps the sign)."""
    z = zscore_by_dim(embeddings_long(spark, sf_dir))
    centroids = z.groupBy("label", "dim").agg(F.avg("z").alias("w"))
    extrema = centroids.groupBy("label").agg(
        F.min(F.abs("w")).alias("lo"), F.max(F.abs("w")).alias("hi")
    )
    return (
        centroids.join(F.broadcast(extrema), "label")
        .select(
            "label",
            "dim",
            round6((F.col("w") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias(
                "w_norm"
            ),
        )
    )
