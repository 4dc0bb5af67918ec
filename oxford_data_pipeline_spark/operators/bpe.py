"""Relational BPE tokenizer training (byte-pair encoding, word-level).

The classic GPT-2-style trainer re-expressed on DataFrames: state is
the VOCABULARY relation (word, symbol array, corpus count) — bounded
by distinct-word count (Heaps' law), never corpus size — and each
merge round is

    1. explode adjacent symbol pairs, weight by word count (one
       map-side-combinable aggregation over the vocab relation),
    2. argmax pair by (total desc, pair asc) — a 1-row collect,
    3. apply the merge with a LEFT FOLD over each symbol array
       (`aggregate`, JVM-side): greedy leftmost-first, exactly the
       reference BPE behavior.

Scale: the corpus is touched ONCE (word counting); all n_merges
rounds run on the vocab relation with `localCheckpoint` per round
(same lineage discipline as operators/iterate.py).  After training,
the final state IS the encoded vocabulary — corpus encoding is a join
against it, not a re-walk of the merge list.

Determinism: ties break on (count desc, left asc, right asc); no
randomness anywhere, so the merge sequence is identical on any engine
or cluster layout (pytest cross-checks against a pure-Python
reference implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the block-manager storage behind a ``localCheckpoint``-ed
    DataFrame.  ``DataFrame.unpersist`` goes through the CacheManager and
    does NOT touch checkpoint blocks; the blocks belong to the
    ``LogicalRDD``'s underlying RDD, reachable via the analyzed plan.
    Best-effort: silently a no-op for non-checkpointed frames or stopped
    sessions."""
    try:
        lp = df._jdf.queryExecution().analyzed()
        if lp.getClass().getName().endswith("LogicalRDD"):
            lp.rdd().unpersist(False)
    except Exception:
        pass


def chars_state(words: DataFrame) -> DataFrame:
    """Initial BPE state: (word, syms = character array, cnt)."""
    return words.select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
        "cnt",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair totals over the weighted vocab relation.  Counts
    overlapping occurrences (aab -> (a,a), (a,b)) like reference BPE."""
    return (
        state.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS left,"
                    "             element_at(syms, i + 1) AS right))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("total"))
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy leftmost-first merge of (left, right) -> left||right via
    a left fold over the symbol array — one JVM expression, no UDF."""
    a = left.replace("\\", "\\\\").replace("'", "\\'")
    b = right.replace("\\", "\\\\").replace("'", "\\'")
    fold = (
        "aggregate(syms, cast(array() as array<string>),"
        " (acc, x) -> CASE WHEN size(acc) > 0"
        f"   AND element_at(acc, -1) = '{a}' AND x = '{b}'"
        f"  THEN concat(slice(acc, 1, size(acc) - 1), array('{a}{b}'))"
        "   ELSE concat(acc, array(x)) END)"
    )
    return state.withColumn("syms", F.expr(fold))


def train_bpe(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges on a (word, cnt) relation.

    Returns (merge list [(left, right, pair_count)...] in training
    order, final state (word, syms, cnt)) — the final state is the
    encoded vocabulary.  Stops early when no pair remains."""
    state = chars_state(words).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(state)
            .orderBy(F.col("total").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, total = best[0]["left"], best[0]["right"], int(best[0]["total"])
        merges.append((left, right, total))
        prev = state
        state = _apply_merge(state, left, right).localCheckpoint(eager=True)
        # the new checkpoint is materialized (eager) — the prior round's
        # blocks are dead weight; free them so storage stays O(1) in
        # n_merges, not O(n_merges)
        free_local_checkpoint(prev)
    return merges, state
