"""Deterministic sampling/splitting — stability is the contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from rhq_metrics_spark.pipelines.sampling import (
    cap_per_group,
    deterministic_sample,
    hash_fraction,
    hash_split,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("domain"),
    )


def test_hash_fraction_uniform_and_deterministic(spark):
    df = _docs(spark).withColumn("f", hash_fraction(F.col("doc_id"), "s"))
    rows = df.collect()
    fs = [r["f"] for r in rows]
    assert all(0.0 <= f < 1.0 for f in fs)
    assert abs(sum(fs) / len(fs) - 0.5) < 0.06  # roughly uniform
    again = {r["doc_id"]: r["f"] for r in df.collect()}
    assert all(again[r["doc_id"]] == r["f"] for r in rows)  # stable


def test_sample_stable_under_growth(spark):
    small = deterministic_sample(_docs(spark, 200), 0.3, salt="x")
    big = deterministic_sample(_docs(spark, 400), 0.3, salt="x")
    kept_small = {r["doc_id"] for r in small.collect()}
    kept_big = {r["doc_id"] for r in big.collect()}
    # appending rows never evicts previously-kept rows
    assert kept_small == {i for i in kept_big if i < 200}
    assert 0.2 < len(kept_big) / 400 < 0.4


def test_hash_split_weights_and_partition(spark):
    out = hash_split(_docs(spark), {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 400  # exact partition of the corpus


def test_cap_per_group(spark):
    out = cap_per_group(_docs(spark), ["domain"], k=5)
    sizes = [r["n"] for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()]
    assert sizes == [5, 5, 5, 5]
    # stable: same rows kept on re-run
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in cap_per_group(_docs(spark), ["domain"], k=5).collect()}
    assert a == b
    # physical order doesn't matter: shuffled input keeps the same set
    shuffled = _docs(spark).orderBy(F.rand(7))
    c = {r["doc_id"] for r in cap_per_group(shuffled, ["domain"], k=5).collect()}
    assert a == c


def test_mixture_sample_rates_and_stability(spark):
    from rhq_metrics_spark.pipelines.sampling import mixture_sample

    docs = _docs(spark, 2000)
    out = mixture_sample(
        docs, {"0": 1.0, "1": 0.5, "2": 0.0}, "domain", default_rate=0.25
    )
    by = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by["0"] == 500          # rate 1.0 keeps everything
    assert "2" not in by           # rate 0.0 drops the group
    assert 200 < by.get("1", 0) < 300   # ~0.5 of 500
    assert 80 < by.get("3", 0) < 170    # default 0.25 of 500
    # stability: kept set is identical on recompute
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in out.collect()
    }


def test_leakage_safe_split_keeps_clusters_together(spark):
    from rhq_metrics_spark.pipelines.sampling import hash_split, leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # 100 clusters of 2: doc 2k and 2k+1 share cluster id 2k
    clusters = spark.createDataFrame(
        [(i, (i // 2) * 2) for i in range(200)], "doc_id long, cluster_id long"
    )
    out = leakage_safe_split(
        docs, clusters, weights={"train": 0.8, "test": 0.2}
    ).collect()
    by_doc = {r["doc_id"]: r["split"] for r in out}
    assert len(by_doc) == 200
    for k in range(100):
        assert by_doc[2 * k] == by_doc[2 * k + 1], k
    assert set(by_doc.values()) == {"train", "test"}

    # singleton clusters degrade to plain hash_split on the doc id
    singles = spark.createDataFrame([(i, i) for i in range(200)],
                                    "doc_id long, cluster_id long")
    a = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        docs, singles, weights={"train": 0.8, "test": 0.2}).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(
        docs, {"train": 0.8, "test": 0.2}).collect()}
    assert a == b


def test_token_mixture_plan_and_sample(spark):
    """Token-budget mixture: exact integer plan (targets/rates/epochs),
    up-sampling emits copy_idx 1..n, fractional copies are hash-stable,
    groups with zero part drop out, realized tokens track targets."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sampling import (
        token_mixture_plan,
        token_mixture_sample,
    )

    rows = []
    # source A: 10 docs x 10 tokens = 100 tokens; B: same; C: same
    for j, src in enumerate(("A", "B", "C")):
        for i in range(10):
            rows.append((j * 100 + i, src, " ".join(f"t{k}" for k in range(10))))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    parts = {"A": 3, "B": 1}  # C absent -> dropped
    plan = {r["group"]: r for r in
            token_mixture_plan(df, parts, budget_tokens=400).collect()}
    assert plan["A"]["target_tokens"] == 300  # 400 * 3 // 4
    assert plan["B"]["target_tokens"] == 100
    assert plan["A"]["rate_ppm"] == 3_000_000  # 3 epochs exactly
    assert (plan["A"]["n_full_copies"], plan["A"]["frac_ppm"]) == (3, 0)
    assert (plan["B"]["n_full_copies"], plan["B"]["frac_ppm"]) == (1, 0)
    assert plan["C"]["target_tokens"] == 0 and plan["C"]["rate_ppm"] == 0

    out = token_mixture_sample(df, parts, budget_tokens=400)
    got = out.groupBy("group").agg(
        F.count(F.lit(1)).alias("copies"), F.sum("n_tokens").alias("toks"),
        F.max("copy_idx").alias("max_idx"),
    ).collect()
    by = {r["group"]: r for r in got}
    assert by["A"]["copies"] == 30 and by["A"]["toks"] == 300
    assert by["A"]["max_idx"] == 3
    assert by["B"]["copies"] == 10 and by["B"]["toks"] == 100
    assert "C" not in by

    # fractional rate: budget 250 -> A target 187, rate 1.87M ppm:
    # every doc gets 1 copy, ~87% a second (hash-decided, deterministic)
    out2 = token_mixture_sample(df, parts, budget_tokens=250)
    a2 = out2.filter("group = 'A'").groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in a2}
    assert len(counts) == 10 and set(counts.values()) <= {1, 2}
    assert sum(counts.values()) > 10  # some docs did get the extra copy
    # rerun identical (stability)
    a3 = token_mixture_sample(df, parts, budget_tokens=250) \
        .filter("group = 'A'").groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in a3} == counts


def test_importance_sample_rates_and_expectation(spark):
    """Quality-weighted sampling: rate_ppm is the exact integer
    min(1e6, n*1e6*w div sum_w); high-weight docs keep with probability
    ~rate; realized count sits near the (clamp-adjusted) expectation;
    the decision equals the Python md5 twin exactly."""
    import hashlib

    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sampling import importance_sample

    n_docs = 2000
    # weights 1..4: doc_id % 4 + 1 (sum = 2000 * 2.5)
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 4) + 1).cast("long").alias("w"),
    )
    expected_n = 500
    kept = importance_sample(df, "w", expected_n).collect()
    sum_w = sum(i % 4 + 1 for i in range(n_docs))
    by_id = {r["doc_id"]: r for r in kept}
    # exact rate arithmetic + exact hash decision (Python twin)
    n_exp = 0
    for i in range(n_docs):
        w = i % 4 + 1
        rate = min(1_000_000, expected_n * 1_000_000 * w // sum_w)
        h20 = int(hashlib.md5(f"impsamp:{i}".encode()).hexdigest()[:5], 16)
        keep = h20 * 1_000_000 < rate * 1_048_576
        n_exp += keep
        assert (i in by_id) == keep, i
        if keep:
            assert by_id[i]["rate_ppm"] == rate
    assert len(kept) == n_exp
    # realized count near the target (hash is uniform; 3 sigma slack)
    assert abs(len(kept) - expected_n) < 3 * (expected_n ** 0.5) + 10
    # weight-4 docs kept ~4x as often as weight-1 docs
    k4 = sum(1 for r in kept if r["w"] == 4)
    k1 = sum(1 for r in kept if r["w"] == 1)
    assert k4 > 2 * k1


def test_importance_sample_clamp_and_validation(spark):
    import pyspark.sql.functions as F
    import pytest

    from rhq_metrics_spark.pipelines.sampling import importance_sample

    df = spark.createDataFrame(
        [(1, 1_000_000), (2, 1), (3, 1)], "doc_id long, w long"
    )
    # the huge-weight doc clamps at 1e6 ppm (always kept)
    kept = {r["doc_id"]: r["rate_ppm"] for r in
            importance_sample(df, "w", 100).collect()}
    assert kept[1] == 1_000_000
    with pytest.raises(ValueError, match="expected_n"):
        importance_sample(df, "w", 0)
    bad = spark.createDataFrame([(1, 0)], "doc_id long, w long")
    with pytest.raises(Exception, match="out of"):
        importance_sample(bad, "w", 10).collect()


def test_priority_sample_matches_reference_and_estimates(spark):
    """Top-k by q = w/u with u from md5 must match an independent
    pure-Python recomputation exactly (same 60-bit hash, same IEEE
    arithmetic), and the DLT estimate is max(w, tau)."""
    import hashlib

    from rhq_metrics_spark.pipelines.sampling import priority_sample

    n, k = 300, 25
    rows = [(i, (i * 37) % 900 + 1) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")

    def u_of(i):
        h = hashlib.md5(f"prio:{i}".encode()).hexdigest()[:15]
        return (int(h, 16) + 1) / float(1 << 60)

    ref = sorted(
        ((w / u_of(i), i, w) for i, w in rows), key=lambda t: (-t[0], t[1])
    )
    tau = ref[k][0]
    expect = [
        (i, w, round(q, 6), round(max(float(w), tau), 6))
        for q, i, w in ref[:k]
    ]

    got = [
        (r["doc_id"], r["weight"], r["priority_r"], r["est_weight_r"])
        for r in priority_sample(df, k=k).collect()
    ]
    assert got == expect


def test_priority_sample_small_input_and_validation(spark):
    from rhq_metrics_spark.pipelines.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "doc_id long, n_chars long"
    )
    out = priority_sample(df, k=10).collect()
    # n <= k: everything sampled, tau = 0 so the estimate is exact
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    assert all(r["est_weight_r"] == float(r["weight"]) for r in out)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        priority_sample(df, k=0)
    bad = spark.createDataFrame([(1, 0)], "doc_id long, n_chars long")
    with _pytest.raises(Exception, match="must be > 0"):
        priority_sample(bad, k=1).collect()


def test_priority_sample_per_group_matches_global_per_group(spark):
    """Each group's sample+estimates == the global operator run on that
    group alone (same hash, same tau rule)."""
    from rhq_metrics_spark.pipelines.sampling import (
        priority_sample,
        priority_sample_per_group,
    )

    rows = [(i, ["web", "code", "tiny"][i % 3] if i < 60 else "tiny",
             (i * 37) % 900 + 1) for i in range(62)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = priority_sample_per_group(df, k=5, group_cols=["source"]).collect()
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r["source"], []).append(
            (r["doc_id"], r["weight"], r["priority_r"], r["est_weight_r"])
        )
    for g in ["web", "code", "tiny"]:
        solo = priority_sample(
            df.filter(F.col("source") == g).select("doc_id", "n_chars"), k=5
        ).collect()
        want = [
            (r["doc_id"], r["weight"], r["priority_r"], r["est_weight_r"])
            for r in solo
        ]
        assert by_grp[g] == want, g


def test_priority_sample_per_group_windowgrouplimit_plan(spark):
    """The rank filter must trigger WindowGroupLimit — the exchange
    carries O(groups*k), never the corpus."""
    from rhq_metrics_spark.pipelines.sampling import priority_sample_per_group

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(id % 7 AS STRING) AS source",
        "id % 100 + 1 AS n_chars"
    )
    out = priority_sample_per_group(df, k=3, group_cols=["source"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
