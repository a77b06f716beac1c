"""Fuzzy string matching: edit-distance joins without an O(N²) compare.

Candidate generation is the deletion-neighborhood (SymSpell) scheme:
two strings within Levenshtein distance *d* always share at least one
member of their depth-*d* deletion neighborhoods (delete the positions
an optimal edit script touches), so an equi-join on deletion keys is a
COMPLETE candidate filter — every true pair survives — and the exact
``levenshtein`` check on the candidates removes the false positives.

Scale shape: each string of length L fans out to O(L^d) keys (L+1 at
d=1), the join is a plain hash equi-join on the key, and the verify
filter is a JVM ``levenshtein`` on pairs only — never all-pairs.  Key
skew comes from very short strings (every 1-char string shares the ""
key at d=1); those form a finite, alphabet-bounded set, so AQE's skew
split handles them, or pre-filter to ``length >= min_len`` when the
application allows.

A training-data curation primitive (typo-variant collapse, near-key
entity resolution) the same way the n-gram/MinHash family handles
document-level near-duplication — see pipelines/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["deletion_keys", "fuzzy_join", "fuzzy_self_join"]


def _dels(s: Column) -> Column:
    """All single-character deletions of ``s`` (empty array for '')."""
    return F.when(F.length(s) > 0, F.transform(
        F.sequence(F.lit(0), F.length(s) - 1),
        lambda i: F.concat(F.substr(s, F.lit(1), i), F.substr(s, i + 2)),
    )).otherwise(F.array().cast("array<string>"))


def deletion_keys(s: Column, depth: int = 1) -> Column:
    """The depth-``depth`` deletion neighborhood of ``s`` including the
    string itself, deduplicated — the join-key set."""
    if depth not in (1, 2):
        raise ValueError("deletion_keys supports depth 1 or 2")
    level1 = _dels(s)
    keys = F.array_union(F.array(s), level1)
    if depth == 2:
        level2 = F.array_distinct(F.flatten(F.transform(level1, _dels)))
        keys = F.array_union(keys, level2)
    return keys


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """All (left, right) string pairs within ``max_distance`` edits
    (1 or 2).  Output: ``(left_col, right_col, distance)``, distinct.

    One explode per side, one equi-join on the deletion key, pair-level
    dedup BEFORE the levenshtein verify (a pair can share many keys —
    verifying per key would redo the same comparison L times).
    """
    lk = left.select(
        F.col(left_col).alias("_l"),
        F.explode(deletion_keys(F.col(left_col), max_distance)).alias("_k"),
    )
    rk = right.select(
        F.col(right_col).alias("_r"),
        F.explode(deletion_keys(F.col(right_col), max_distance)).alias("_k"),
    )
    cands = lk.join(rk, "_k").select("_l", "_r").distinct()
    return (
        cands.withColumn("distance", F.levenshtein("_l", "_r"))
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("_l").alias(left_col),
            F.col("_r").alias(right_col),
            "distance",
        )
    )


def fuzzy_self_join(
    df: DataFrame, col: str, max_distance: int = 1
) -> DataFrame:
    """Distinct unordered pairs within ``max_distance`` edits inside one
    column.  Output: ``(word_a, word_b, distance)`` with word_a < word_b.
    """
    words = df.select(F.col(col).alias("_w")).distinct()
    pairs = fuzzy_join(
        words.withColumnRenamed("_w", "word_a"),
        words.withColumnRenamed("_w", "word_b"),
        "word_a",
        "word_b",
        max_distance,
    )
    return pairs.filter(F.col("word_a") < F.col("word_b"))
