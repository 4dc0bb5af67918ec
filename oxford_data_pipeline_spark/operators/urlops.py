"""URL normalization for crawl-corpus operators.

URL-normalized exact dedup is the first pass of every real crawl
pipeline (cc_net deduplicates per-URL before paragraph hashing;
RefinedWeb and Dolma both run a URL-keyed exact pass before fuzzy
dedup), and domain mixing keys on the registered host.  The WARC
connector preserves `WARC-Target-URI` in the `source` column
precisely so these operators can key on it (`sources/warc.py`).

Normalization contract (the common subset of the cited pipelines):
- strip the fragment (`#...` is client-side only),
- strip the scheme (http/https distinction is not content identity),
- strip userinfo, lowercase the host, strip a leading `www.` and a
  default `:80`/`:443` port,
- strip tracking query parameters (`utm_*`, `fbclid`, `gclid`,
  `msclkid`, `ref`) while preserving real parameters and their order,
- strip trailing slashes from the path.

Everything is a pure column expression — scan-local, zero joins, zero
UDFs — and every step is mirrored token-for-token in the DuckDB oracle
snippets below so the driver's value-hash comparison is exact.

The `documents` testdata has label-style sources (`srcN`), so the
registered queries synthesize URLs deterministically from
(doc_id, source) — same convention as the %-mod query sets — with
deliberate case/port/trailing-slash/tracking-param noise that the
normalizer must remove to find the planted duplicate groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never affect content identity
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add `host` and `norm_url` columns derived from `url_col`.

    All other input columns pass through unchanged.  The expression
    chain is scan-local (no shuffle, no UDF); Catalyst collapses the
    intermediate projections into one whole-stage-codegen span.
    """
    d = (
        df.withColumn("_nofrag", F.regexp_replace(F.col(url_col), r"#.*$", ""))
        .withColumn("_noscheme", F.regexp_replace("_nofrag", _SCHEME_RE, ""))
        .withColumn("_hp_raw", F.regexp_extract("_noscheme", r"^[^/?]*", 0))
        .withColumn("_rest", F.expr("substring(_noscheme, length(_hp_raw) + 1)"))
    )
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_replace("_hp_raw", r"^[^@]*@", "")), r"^www\.", ""
        ),
        r":(80|443)$",
        "",
    )
    d = (
        d.withColumn("host", host)
        .withColumn(
            "_path",
            F.regexp_replace(F.regexp_extract("_rest", r"^[^?]*", 0), r"/+$", ""),
        )
        .withColumn("_q", F.regexp_extract("_rest", r"\?(.*)$", 1))
        .withColumn(
            "_qn",
            F.array_join(
                F.filter(
                    F.split("_q", "&"),
                    lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
                ),
                "&",
            ),
        )
    )
    norm = F.concat(
        F.col("host"),
        F.col("_path"),
        F.when(F.col("_qn") != "", F.concat(F.lit("?"), F.col("_qn"))).otherwise(
            F.lit("")
        ),
    )
    return d.withColumn("norm_url", norm).drop(
        "_nofrag", "_noscheme", "_hp_raw", "_rest", "_path", "_q", "_qn"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirror: given a CTE `urls(doc_id, n_chars, url)`, the
# snippet produces `normed(doc_id, n_chars, host, norm_url)`.  Every
# regex and case branch matches the Spark expressions above literally.
# ---------------------------------------------------------------------------
URL_NORM_SQL = f"""
_u1 AS (
    SELECT doc_id, n_chars,
           regexp_replace(regexp_replace(url, '#.*$', ''),
                          '{_SCHEME_RE}', '') AS noscheme
    FROM urls
),
_u2 AS (
    SELECT doc_id, n_chars, noscheme,
           regexp_extract(noscheme, '^[^/?]*') AS hp_raw
    FROM _u1
),
_u3 AS (
    SELECT doc_id, n_chars,
           regexp_replace(regexp_replace(lower(
               regexp_replace(hp_raw, '^[^@]*@', '')),
               '^www\\.', ''), ':(80|443)$', '') AS host,
           regexp_replace(regexp_extract(
               substr(noscheme, length(hp_raw) + 1), '^[^?]*'),
               '/+$', '') AS path,
           regexp_extract(substr(noscheme, length(hp_raw) + 1),
                          '\\?(.*)$', 1) AS q
    FROM _u2
),
normed AS (
    SELECT doc_id, n_chars, host,
           host || path ||
           (CASE WHEN qn <> '' THEN '?' || qn ELSE '' END) AS norm_url
    FROM (
        SELECT doc_id, n_chars, host, path,
               array_to_string(list_filter(string_split(q, '&'),
                   p -> p <> '' AND NOT regexp_matches(p,
                        '{_TRACKING_RE}')), '&') AS qn
        FROM _u3
    )
)
"""


# ---------------------------------------------------------------------------
# Deterministic synthetic URLs for the label-style testdata: case,
# default-port, trailing-slash, tracking-param, and fragment noise on
# top of a (source, doc_id%8, doc_id%2) collision key, so the planted
# duplicate groups only surface through correct normalization.
# ---------------------------------------------------------------------------
def synthetic_url(doc_id: Column, source: Column) -> Column:
    """(doc_id, source) → the deterministic noisy URL (Spark side)."""
    return F.concat(
        F.when(doc_id % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://www.")
        ),
        source,
        F.lit(".Example.COM"),
        F.when(doc_id % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        (doc_id % 8).cast("string"),
        F.when(doc_id % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed"),
        (doc_id % 5).cast("string"),
        F.lit("&page="),
        (doc_id % 2).cast("string"),
        F.lit("#sec"),
        doc_id.cast("string"),
    )


SYNTH_URLS_CTE = """
urls AS (
    SELECT doc_id, n_chars,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.'
                 ELSE 'https://www.' END)
           || source || '.Example.COM'
           || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
           || '/Docs/' || CAST(doc_id % 8 AS VARCHAR)
           || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
           || '?utm_source=feed' || CAST(doc_id % 5 AS VARCHAR)
           || '&page=' || CAST(doc_id % 2 AS VARCHAR)
           || '#sec' || CAST(doc_id AS VARCHAR) AS url
    FROM documents
)
"""
