"""Tests for pipelines/fuzzy.py — deletion-neighborhood (SymSpell)
edit-distance joins, verified complete against brute force."""

import itertools
import random

import pyspark.sql.functions as F

from rhq_metrics_spark.pipelines.fuzzy import (
    deletion_keys,
    fuzzy_join,
    fuzzy_self_join,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_keys_depth1(spark):
    out = spark.range(1).select(
        deletion_keys(F.lit("abc"), 1).alias("k")
    ).collect()[0]["k"]
    assert set(out) == {"abc", "bc", "ac", "ab"}


def test_deletion_keys_depth2_and_empty(spark):
    out = spark.range(1).select(
        deletion_keys(F.lit("abc"), 2).alias("k")
    ).collect()[0]["k"]
    assert set(out) == {"abc", "bc", "ac", "ab", "a", "b", "c"}
    empty = spark.range(1).select(
        deletion_keys(F.lit(""), 2).alias("k")
    ).collect()[0]["k"]
    assert empty == [""]


def test_known_pairs_distance1(spark):
    df = spark.createDataFrame(
        [("cold",), ("old",), ("bold",), ("banana",), ("red",), ("rod",)],
        "w string",
    )
    got = {
        (r["word_a"], r["word_b"], r["distance"])
        for r in fuzzy_self_join(df, "w", 1).collect()
    }
    assert got == {
        ("cold", "old", 1),
        ("bold", "old", 1),
        ("bold", "cold", 1),
        ("red", "rod", 1),
    }


def test_complete_vs_brute_force_random(spark):
    rng = random.Random(3)
    alphabet = "abcde"
    words = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(60)
    })
    df = spark.createDataFrame([(w,) for w in words], "w string")
    for d in (1, 2):
        got = {
            (r["word_a"], r["word_b"], r["distance"])
            for r in fuzzy_self_join(df, "w", d).collect()
        }
        want = {
            (min(a, b), max(a, b), _lev(a, b))
            for a, b in itertools.combinations(words, 2)
            if _lev(a, b) <= d
        }
        assert got == want, f"depth {d} mismatch"


def test_cross_table_fuzzy_join(spark):
    left = spark.createDataFrame([("color",), ("colour",), ("shade",)], "name string")
    right = spark.createDataFrame([("colour",), ("shady",), ("tint",)], "term string")
    got = {
        (r["name"], r["term"], r["distance"])
        for r in fuzzy_join(left, right, "name", "term", 1).collect()
    }
    assert got == {
        ("color", "colour", 1),
        ("colour", "colour", 0),
        ("shade", "shady", 1),
    }
