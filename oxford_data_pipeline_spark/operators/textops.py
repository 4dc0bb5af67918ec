"""Text-analysis operators for training-data pipelines.

All tokenization/shingling/hashing is expressed with JVM-side built-in
functions (split/transform/md5/aggregate) — no Python UDFs — so the hot
path stays inside whole-stage codegen and every op has a DuckDB oracle.

Engine-wide determinism convention: anything "random" (hash seeds,
hyperplanes) is derived from md5 of explicit keys, so results are
identical across engines, partitionings, and retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Language marker words for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "un", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"],
}

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "that", "it"]


def normalized(text: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace.

    Oracle SQL: trim(regexp_replace(lower(t), '[^a-z0-9 ]', ' ', 'g')).
    """
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    return F.trim(F.regexp_replace(c, "[^a-z0-9 ]", " "))


def tokens(norm: Column) -> Column:
    """Whitespace tokens of a normalized string; empty strings dropped.

    Oracle SQL: list_filter(regexp_split_to_array(norm, ' +'), x -> x <> '').
    """
    return F.filter(F.split(norm, " +"), lambda x: x != "")


def positional_gram_parts(col: str, k: int) -> Column:
    """array<struct<g0..g{k-1}>>: element i-1 holds the k tokens of the
    k-gram STARTING at 1-based token position i of array column `col`
    — positions kept (and duplicates kept), unlike `word_shingles`'
    distinct set.  Built as `arrays_zip` of k shifted slices, which is
    pure codegen; the previous form
    (`transform(sequence(1, n-k+1), i -> struct(i, concat_ws(...)))`)
    evaluated an INTERPRETED lambda per gram (higher-order functions
    are CodegenFallback — the r14 bigram defect, fixed here for the
    positional relations too, r15).  Callers must pre-filter
    `size(col) >= k`, then `posexplode` the result (1-based pos =
    index + 1) and build the shingle string with `concat_ws` AFTER the
    explode so the concat runs once per row in codegen.
    Oracle SQL twin: `t[i] || ' ' || ... ` over
    `unnest(generate_series(1, len(t) - k + 1))`."""
    return F.arrays_zip(
        *[
            F.expr(f"slice({col}, {j + 1}, size({col}) - {k - 1})").alias(
                f"g{j}"
            )
            for j in range(k)
        ]
    )


PARA_BOUNDARY_CHARS = ("0", "8")  # 1-in-8 md5 bucket => ~8-token paragraphs


def paragraph_array(toks: Column) -> Column:
    """Content-defined paragraph segmentation of a token array: a new
    paragraph starts at token i (i > 0) when md5(prev_token || ' ' ||
    token) begins with a PARA_BOUNDARY_CHARS nibble.  Boundaries
    depend only on local content, so identical token runs segment
    identically in every document containing them — the cross-document
    alignment property newline boundaries give natural corpora (the
    CDC rolling-hash chunking trick, applied to paragraphs).

    Pure array algebra — transform / array_join / split inside
    whole-stage codegen, O(n) per doc, no UDF, no shuffle: boundary
    tokens are prefixed with a \\x01 sentinel, the array is joined and
    re-split on it.  Oracle SQL twin: per-position is_start flags via
    `substr(md5(t[i-1] || ' ' || t[i]), 1, 1) IN ('0','8')` and a
    running sum per doc (see `_PARA_DEDUP_ORACLE`)."""
    marked = F.transform(
        toks,
        lambda tok, i: F.when(
            (i > F.lit(0))
            & F.substring(
                F.md5(
                    F.concat(
                        F.element_at(toks, F.greatest(i, F.lit(1))),
                        F.lit(" "),
                        tok,
                    )
                ),
                1,
                1,
            ).isin(*PARA_BOUNDARY_CHARS),
            F.concat(F.lit("\x01"), tok),
        ).otherwise(tok),
    )
    return F.transform(
        F.split(F.array_join(marked, " "), "\x01"), lambda p: F.trim(p)
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; short docs fall back to the whole
    token sequence as one shingle.

    Oracle SQL (n=3): CASE WHEN len(toks) >= 3 THEN list_distinct(
    list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' ||
    toks[i+1] || ' ' || toks[i+2])) ELSE [array_to_string(toks, ' ')] END.
    """
    if n != 3:
        raise NotImplementedError("oracle parity is defined for n=3")
    gram = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return F.when(F.size(toks) >= 3, F.array_distinct(gram)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def count_in_list(toks: Column, words: list[str]) -> Column:
    """Number of tokens contained in a literal word list (with repeats).

    Oracle SQL: len(list_filter(toks, x -> list_contains([...], x))).
    """
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(lit_arr, x)))


def minhash_band_signatures(
    shingle_df: DataFrame, n_hashes: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """MinHash + LSH banding in one aggregation pass.

    Per doc: mh_i = lexicographic min over shingles of md5(i|shingle)
    (a string-min MinHash is a valid permutation-min — md5 is a uniform
    permutation of the shingle space — and is bit-identical in every
    engine); band signature = md5 of the seed-ordered minhashes in each
    band of `rows_per_band` rows.

    Plan shape: the 16 hashes are computed as ONE named array column per
    shingle row, aggregated with 16 min() expressions — one shuffle of
    the compact shingle table, no seed-explosion (16× fewer shuffled
    rows than the naive crossJoin formulation).

    Input: (doc_id, shingle) distinct rows. Output: (doc_id, band, sig).
    Docs sharing any (band, sig) are near-dup candidates — the O(n²)
    pair space never materializes.
    """
    seeds = list(range(n_hashes))
    harr = F.array(
        *[
            F.md5(F.concat_ws("|", F.lit(str(s)), F.col("shingle")))
            for s in seeds
        ]
    )
    hashed = shingle_df.select("doc_id", harr.alias("harr"))
    per_doc = hashed.groupBy("doc_id").agg(
        *[F.min(F.element_at("harr", s + 1)).alias(f"mh{s}") for s in seeds]
    )
    n_bands = n_hashes // rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return per_doc.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def simhash_signature(token_counts: DataFrame, n_bits: int = 64) -> DataFrame:
    """SimHash 64-bit signature per doc WITHOUT row expansion.

    The naive formulation (see `simhash_bits`) crossJoins every
    (doc, token, cnt) row with 64 bit positions before aggregating —
    64× the shuffle volume.  Here the 16 hex digits of md5(token) are
    decoded once per row and the 64 signed votes become 64 partial-agg
    `sum` expressions, so the shuffle carries exactly one row of 64
    longs per (doc, partition): map-side combine does the heavy lifting
    and everything stays inside whole-stage codegen.

    Input: (doc_id, token, cnt).  Output: (doc_id, simhash, n_ones)
    where simhash is the 64-char '0'/'1' string (bit b = sign of
    Σ cnt·±1 from bit b of md5(token), MSB-first per hex digit — same
    bit convention as `simhash_bits` and the DuckDB oracle).
    """
    n_digits = n_bits // 4
    hashed = token_counts.withColumn("h", F.md5("token"))
    digits = [
        F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int").alias(f"d{i}")
        for i in range(n_digits)
    ]
    hd = hashed.select("doc_id", "cnt", *digits)

    def vote(b: int):
        bit = F.shiftright(F.col(f"d{b // 4}"), 3 - b % 4).bitwiseAND(F.lit(1))
        return F.col("cnt") * (2 * bit - 1)

    sums = hd.groupBy("doc_id").agg(
        *[F.sum(vote(b)).alias(f"s{b}") for b in range(n_bits)]
    )
    bitvals = [F.when(F.col(f"s{b}") > 0, 1).otherwise(0) for b in range(n_bits)]
    n_ones = bitvals[0]
    for bv in bitvals[1:]:
        n_ones = n_ones + bv
    return sums.select(
        "doc_id",
        F.concat(*[bv.cast("string") for bv in bitvals]).alias("simhash"),
        n_ones.cast("long").alias("n_ones"),
    )


def simhash_bits(token_counts: DataFrame, n_bits: int = 64) -> DataFrame:
    """SimHash: per (doc_id, bit) the sign of Σ count·(±1) where the ±1
    comes from bit `b` of md5(token).

    Input: (doc_id, token, cnt). Output: (doc_id, bit, bitval∈{0,1}).
    Bit b of the md5 = hex digit b//4, shifted by 3-b%4 — reproduced in
    the oracle with strpos('0123456789abcdef', digit).
    """
    spark = token_counts.sparkSession
    bits = spark.range(n_bits).select(F.col("id").cast("int").alias("bit"))
    # md5 materialized ONCE per token before the 64× bit expansion —
    # an inline md5 would be re-hashed per exploded row (measured ~3×).
    hashed = token_counts.withColumn("h", F.md5("token"))
    bitof = F.expr(
        "shiftright(instr('0123456789abcdef',"
        " substring(h, bit DIV 4 + 1, 1)) - 1,"
        " 3 - bit % 4) % 2"
    )
    return (
        hashed.crossJoin(F.broadcast(bits))
        .withColumn("signed", F.col("cnt") * (2 * bitof - 1))
        .groupBy("doc_id", "bit")
        .agg(F.when(F.sum("signed") > 0, 1).otherwise(0).alias("bitval"))
    )
