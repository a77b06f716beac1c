"""Tests for pipelines/profile.py dataset_profile — the data card."""

from __future__ import annotations


def test_dataset_profile_counts_and_total_row(spark):
    from rhq_metrics_spark.pipelines.profile import dataset_profile

    rows = [
        # s1: 3 docs, one corpus-wide dup pair WITHIN s1
        (1, "same text here", "en", "s1"),
        (2, "same text here", "en", "s1"),
        (3, "unique alpha", "en", "s1"),
        # s2: 2 docs, one copy of an s1 text (cross-source dup) and one
        # unique doc in another language
        (4, "same text here", "en", "s2"),
        (5, "otro texto", "es", "s2"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["source"]: r for r in dataset_profile(df).collect()}
    assert set(out) == {"s1", "s2", "ALL"}

    s1, s2, al = out["s1"], out["s2"], out["ALL"]
    assert (s1["n_docs"], s2["n_docs"], al["n_docs"]) == (3, 2, 5)
    # "same text here"=3 tokens x2 + "unique alpha"=2 -> 8 in s1
    assert s1["n_tokens"] == 8
    assert al["n_tokens"] == s1["n_tokens"] + s2["n_tokens"]
    assert (s1["n_langs"], s2["n_langs"], al["n_langs"]) == (1, 2, 2)
    # dup flag is CORPUS-wide: all 3 copies of "same text here" count,
    # including the single copy held by s2
    assert (s1["dup_docs"], s2["dup_docs"], al["dup_docs"]) == (2, 1, 3)
    assert s1["uniq_texts"] == 2 and s2["uniq_texts"] == 2
    assert al["uniq_texts"] == 3
    # floor fixed point
    assert s2["dup_ppm"] == 500_000
    assert al["dup_ppm"] == 3 * 1_000_000 // 5
    assert s1["mean_tokens_micro"] == 8 * 1_000_000 // 3


def test_dataset_profile_null_group_does_not_collide_with_total(spark):
    from rhq_metrics_spark.pipelines.profile import dataset_profile

    rows = [
        (1, "a b", "en", None),  # genuinely-NULL source
        (2, "c d e", "en", "s1"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = dataset_profile(df).collect()
    srcs = sorted(r["source"] if r["source"] is not None else "<null>"
                  for r in out)
    # three rows: the null group, s1, and the total — no collision
    assert srcs == ["<null>", "ALL", "s1"]
    al = next(r for r in out if r["source"] == "ALL")
    assert al["n_docs"] == 2 and al["n_tokens"] == 5


def test_dataset_diff_statuses_and_token_delta(spark):
    from rhq_metrics_spark.pipelines.profile import dataset_diff

    old = spark.createDataFrame(
        [
            (1, "a b c", "s1"),      # unchanged
            (2, "old text", "s1"),   # changed in new
            (3, "bye bye", "s2"),    # removed
        ],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "new longer text here", "s1"),
            (4, "hello", "s2"),      # added
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in dataset_diff(old, new).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["added"], s1["removed"], s1["changed"], s1["unchanged"]) == (
        0, 0, 1, 1,
    )
    # removed docs report under their OLD group
    assert (s2["added"], s2["removed"], s2["changed"], s2["unchanged"]) == (
        1, 1, 0, 0,
    )
    assert s1["tokens_old"] == 5 and s1["tokens_new"] == 7
    assert s1["token_delta"] == 2
    assert s2["token_delta"] == 1 - 2  # added 1 token, removed 2


def test_dataset_diff_identical_snapshots_are_all_unchanged(spark):
    from rhq_metrics_spark.pipelines.profile import dataset_diff

    df = spark.createDataFrame(
        [(i, f"text {i}", "s") for i in range(10)],
        "doc_id long, text string, source string",
    )
    r = dataset_diff(df, df).collect()[0]
    assert (r["added"], r["removed"], r["changed"], r["unchanged"]) == (
        0, 0, 0, 10,
    )
    assert r["token_delta"] == 0


def test_ngram_diversity_hand_computed(spark):
    from rhq_metrics_spark.pipelines.profile import ngram_diversity

    docs = spark.createDataFrame(
        [
            (0, "a", "x y x y"),      # 1grams: 4 tot / 2 distinct
            (1, "a", "x y"),          # a 2grams: "x y","y x","x y","x y" = 4 tot/2 distinct
            (2, "b", "z z z"),        # b: 3 tot / 1 distinct; 2grams 2/1; 3grams 1/1
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r["source"], r["n"]): (
            r["total_ngrams"], r["distinct_ngrams"], r["diversity_ppm"]
        )
        for r in ngram_diversity(docs).collect()
    }
    assert out[("a", 1)] == (6, 2, 2 * 1_000_000 // 6)
    assert out[("a", 2)] == (4, 2, 500_000)
    assert out[("a", 3)] == (2, 2, 1_000_000)   # "x y x", "y x y"
    assert out[("b", 1)] == (3, 1, 333_333)
    assert out[("b", 2)] == (2, 1, 500_000)
    assert out[("b", 3)] == (1, 1, 1_000_000)


def test_ngram_diversity_flags_repetitive_source(spark):
    from rhq_metrics_spark.pipelines.profile import ngram_diversity

    import pytest as _pytest

    rep = " ".join(["the cat sat"] * 10)
    var = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, "rep", rep), (1, "var", var)], "doc_id long, source string, text string"
    )
    out = {
        (r["source"], r["n"]): r["diversity_ppm"]
        for r in ngram_diversity(docs).collect()
    }
    assert out[("var", 2)] > out[("rep", 2)]
    assert out[("var", 3)] > out[("rep", 3)]

    with _pytest.raises(ValueError, match="ns must be"):
        ngram_diversity(docs, ns=())


def test_length_histogram_hand_computed(spark):
    """Power-of-two buckets by bit length, per-group shares, and the
    zero/one-length floor."""
    from rhq_metrics_spark.pipelines.profile import length_histogram

    rows = [
        (1, "a", 1), (2, "a", 1), (3, "a", 7), (4, "a", 8),
        (5, "b", 100), (6, "b", 0),   # 0 floors to bucket 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {
        (r["source"], r["bucket_log2"]): r
        for r in length_histogram(df).collect()
    }
    # len 1 -> bucket 1 [1,1]; len 7 -> bucket 3 [4,7]; len 8 -> bucket 4
    assert out[("a", 1)]["n_docs"] == 2 and out[("a", 1)]["lo"] == 1
    assert out[("a", 1)]["hi"] == 1
    assert out[("a", 3)]["n_docs"] == 1 and out[("a", 3)]["lo"] == 4
    assert out[("a", 3)]["hi"] == 7
    assert out[("a", 4)]["n_docs"] == 1
    assert out[("a", 1)]["share_ppm"] == 500_000
    # len 100 -> bucket 7 [64,127]; the 0-length doc floors to bucket 1
    assert out[("b", 7)]["n_docs"] == 1 and out[("b", 7)]["lo"] == 64
    assert out[("b", 1)]["n_docs"] == 1
    assert out[("b", 1)]["total_chars"] == 0  # chars sum stays exact


def test_lang_confusion_hand_computed(spark):
    """Declared-vs-predicted cells with per-declared-row ppm shares;
    the und prediction lands in its own column cell."""
    from rhq_metrics_spark.pipelines.profile import lang_confusion

    rows = [
        (1, "en", "the cat and the dog in a house is that it for"),
        (2, "en", "der hund und die katze ist von dem haus nicht"),  # mislabeled
        (3, "de", "der hund und die katze ist von dem haus nicht"),
        (4, "en", "xyzzy qwerty plugh"),                             # und
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["lang"], r["lang_pred"]): (r["n_docs"], r["share_ppm"])
        for r in lang_confusion(df).collect()
    }
    assert out[("en", "en")] == (1, 333_333)
    assert out[("en", "de")] == (1, 333_333)
    assert out[("en", "und")] == (1, 333_333)
    assert out[("de", "de")] == (1, 1_000_000)
    assert len(out) == 4
