"""Count-min sketch: overestimate guarantee, exactness at low load,
mergeability, and the seasonal-baseline operator vs a Python oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from rhq_metrics_spark.pipelines.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)


def _tokens_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "w string")


def test_cms_exact_at_low_load_and_overestimates(spark):
    words = ["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 1
    df = _tokens_df(spark, words)
    sketch = cms_build(df, "w")
    probes = _tokens_df(spark, ["alpha", "beta", "gamma", "missing"]).distinct()
    est = {r["w"]: r["est_n"] for r in cms_estimate(sketch, probes, "w").collect()}
    true = Counter(words)
    # guarantee: never under
    for w in ("alpha", "beta", "gamma"):
        assert est[w] >= true[w]
    # 3 distinct values in 4x256 cells: collisions essentially impossible
    assert est == {"alpha": 7, "beta": 3, "gamma": 1, "missing": 0}


def test_cms_error_bound_under_load(spark):
    # 2000 occurrences over 500 distinct values in a 4x256 sketch:
    # eps = 2/width -> est - true <= 2N/width = 15.6 w.p. 1 - 2^-4 per
    # probe; assert the guarantee (>=) everywhere and the bound on all
    # but a small fraction
    words = [f"w{i % 500}" for i in range(2000)]
    df = _tokens_df(spark, words)
    sketch = cms_build(df, "w")
    probes = df.distinct()
    est = {r["w"]: r["est_n"] for r in cms_estimate(sketch, probes, "w").collect()}
    true = Counter(words)
    n = len(words)
    bound = 2 * n / CMS_WIDTH
    over = [w for w in true if est[w] - true[w] > bound]
    assert all(est[w] >= true[w] for w in true)
    assert len(over) <= 0.10 * len(true)  # 2^-depth = 6.25% expected


def test_cms_merges_exactly(spark):
    words = [f"t{i % 40}" for i in range(300)]
    half_a, half_b = words[:150], words[150:]
    import pyspark.sql.functions as F

    whole = cms_build(_tokens_df(spark, words), "w")
    merged = (
        cms_build(_tokens_df(spark, half_a), "w")
        .unionByName(cms_build(_tokens_df(spark, half_b), "w"))
        .groupBy("row", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    a = {(r["row"], r["bucket"]): r["n"] for r in whole.collect()}
    b = {(r["row"], r["bucket"]): r["n"] for r in merged.collect()}
    assert a == b
    assert len(a) <= CMS_DEPTH * CMS_WIDTH


def test_seasonal_baseline_matches_python(spark):
    from rhq_metrics_spark.operators.anomaly import seasonal_baseline

    hour = 3_600_000
    # metric m: hour-0 points 10,20 (baseline 15); hour-1 points 30
    rows = [
        ("m", 0 * hour + 5, 10.0),
        ("m", 24 * hour + 7, 20.0),  # next day, same bin 0
        ("m", 1 * hour + 1, 30.0),
        ("x", 0 * hour + 2, 100.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {
        (r["metric"], r["ts"]): r
        for r in seasonal_baseline(df, on=["metric"]).collect()
    }
    assert out[("m", 5)]["bin"] == 0 and out[("m", 24 * hour + 7)]["bin"] == 0
    assert out[("m", 5)]["baseline"] == 15.0
    assert out[("m", 5)]["residual"] == -5.0
    assert out[("m", 24 * hour + 7)]["residual"] == 5.0
    assert out[("m", hour + 1)]["baseline"] == 30.0
    assert out[("m", hour + 1)]["residual"] == 0.0
    assert out[("m", 5)]["bin_samples"] == 2
    # series are independent
    assert out[("x", 2)]["baseline"] == 100.0


def test_seasonal_baseline_quantization_is_exact(spark):
    from rhq_metrics_spark.operators.anomaly import seasonal_baseline

    # mean 1/3 -> 0.3333 at 4 dp HALF_UP; residuals are exact integers
    rows = [("m", i, v) for i, v in enumerate([0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    r = {x["ts"]: x for x in seasonal_baseline(df, on=["metric"]).collect()}
    assert r[0]["baseline"] == pytest.approx(0.3333, abs=1e-12)
    assert r[2]["residual"] == pytest.approx(1.0 - 0.3333, abs=1e-12)


def test_streaming_cms_matches_batch(spark, tmp_path):
    """Streaming CMS twin: a finalized slice's cells equal cms_build
    over that slice's rows, and summing the per-slice cells reproduces
    the whole-range sketch (mergeability, live)."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.streaming.cms import streaming_cms

    src = tmp_path / "cms_in"
    src.mkdir()
    base = 1_700_000_000
    rows1 = [
        {"sec": base + i * 60, "w": f"tok{(i * 13) % 9}"} for i in range(50)
    ]
    rows2 = [{"sec": base + 7200, "w": "late"}]  # watermark push
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = (
        spark.readStream.schema("sec long, w string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    out = streaming_cms(stream, "w", "30 minutes", watermark_delay="5 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )

    batch = spark.createDataFrame([(r["w"],) for r in rows1], "w string")
    whole = {
        (r["row"], r["bucket"]): r["n"] for r in cms_build(batch, "w").collect()
    }
    try:
        deadline = time.time() + 90
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
        while (
            spark.sql(
                "select sum(n) from cms_out"
            ).collect()[0][0] or 0
        ) < 50 * CMS_DEPTH and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    slices = spark.sql("select * from cms_out").collect()
    # per-slice cells == batch cms_build over the slice's rows
    per_slice: dict = {}
    for r in slices:
        key = (r["row"], r["bucket"])
        per_slice[key] = per_slice.get(key, 0) + r["n"]
        s0 = int(r["slice_start"].timestamp())
        rows_in = [
            (x["w"],) for x in rows1 if s0 <= x["sec"] < s0 + 1800
        ]
        exp = {
            (b["row"], b["bucket"]): b["n"]
            for b in cms_build(
                spark.createDataFrame(rows_in, "w string"), "w"
            ).collect()
        }
        assert exp[(r["row"], r["bucket"])] == r["n"]
    # summed per-slice cells == the whole-range sketch
    assert per_slice == whole


def test_bucket_mad_outliers_flags_spike_not_constant(spark):
    from rhq_metrics_spark.model import Buckets
    from rhq_metrics_spark.operators.anomaly import bucket_mad_outliers

    # bucket 0: tight cluster + one wild spike; bucket 1: constant
    rows = (
        [(i, 10.0 + (i % 3) * 0.1) for i in range(10)]
        + [(10, 500.0)]
        + [(100 + i, 7.0) for i in range(8)]
    )
    df = spark.createDataFrame(rows, "ts long, value double")
    out = bucket_mad_outliers(df, Buckets(0, 100, 2), k=3)
    got = {r["ts"]: r for r in out.collect()}
    assert got[10]["is_outlier"]
    assert not any(got[t]["is_outlier"] for t in range(10))
    # MAD of the spike bucket resisted the spike itself
    assert got[10]["mad"] <= 0.1
    # constant bucket: mad == 0 -> nothing flagged (zero-spread guard)
    assert all(not got[100 + i]["is_outlier"] for i in range(8))
    assert got[100]["mad"] == 0.0


def test_bucket_mad_matches_python_oracle(spark):
    import statistics

    from rhq_metrics_spark.model import Buckets
    from rhq_metrics_spark.operators.anomaly import bucket_mad_outliers

    vals = [3.17, -2.4, 8.88, 0.01, 5.5, 5.5, -7.23, 12.0, 0.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, value double"
    )
    r = bucket_mad_outliers(df, Buckets(0, 50, 1)).collect()[0]
    q = [round(v * 100) for v in vals]
    med = statistics.median(q)
    mad = statistics.median(abs(x - med) for x in q)
    assert r["med"] == med / 100 and r["mad"] == mad / 100


def test_streaming_seasonal_profile_matches_batch(spark, tmp_path):
    """Streaming seasonal-profile partials: finalized slices sum to the
    batch profile exactly, and seasonal_apply over the merged partials
    reproduces seasonal_baseline end to end."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.operators.anomaly import (
        _seasonal_binned,
        seasonal_apply,
        seasonal_baseline,
        seasonal_profile,
    )
    from rhq_metrics_spark.streaming.seasonal import streaming_seasonal_profile

    src = tmp_path / "sp_in"
    src.mkdir()
    base = 1_700_000_000
    rows1 = [
        {
            "metric": "m",
            "sec": base + i * 300,
            "value": float((i * 11) % 17) + 0.25,
        }
        for i in range(48)
    ]
    rows2 = [{"metric": "m", "sec": base + 90_000, "value": 1.0}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = (
        spark.readStream.schema("metric string, sec long, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
        .withColumn("ts", F.col("sec") * 1000)
    )
    out = streaming_seasonal_profile(
        stream, "60 minutes", watermark_delay="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sp_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sp_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    batch = spark.createDataFrame(
        [(r["metric"], r["sec"] * 1000, r["value"]) for r in rows1],
        "metric string, ts long, value double",
    )
    binned = _seasonal_binned(batch, "ts", "value", 86_400_000, 24, 100)
    want = {
        (r["metric"], r["bin"]): (r["sum_vq"], r["sum_sq_vq"], r["bin_samples"])
        for r in seasonal_profile(binned, ["metric"]).collect()
    }
    try:
        deadline = time.time() + 90
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
        while (
            spark.sql("select coalesce(sum(bin_samples),0) from sp_out")
            .collect()[0][0]
        ) < len(rows1) and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    parts = spark.sql("select * from sp_out")
    merged = {
        (r["metric"], r["bin"]): (r["sum_vq"], r["sum_sq_vq"], r["bin_samples"])
        for r in parts.groupBy("metric", "bin")
        .agg(
            F.sum("sum_vq").alias("sum_vq"),
            F.sum("sum_sq_vq").alias("sum_sq_vq"),
            F.sum("bin_samples").alias("bin_samples"),
        )
        .collect()
    }
    assert merged == want
    # end-to-end: scoring with the merged partials == the one-shot op
    prof = parts.groupBy("metric", "bin").agg(
        F.sum("sum_vq").alias("sum_vq"),
        F.sum("bin_samples").alias("bin_samples"),
    )
    served = {
        (r["metric"], r["ts"]): (r["baseline"], r["residual"])
        for r in seasonal_apply(binned, prof, ["metric"]).collect()
    }
    direct = {
        (r["metric"], r["ts"]): (r["baseline"], r["residual"])
        for r in seasonal_baseline(batch, on=["metric"]).collect()
    }
    assert served == direct


def test_seasonal_apply_novel_bin_and_scale_validation(spark):
    """Scoring against an attached long-run profile must SURFACE a point
    whose bin has no historical row (null baseline/residual, 0 samples)
    instead of dropping it, and reject a value_scale the 4-dp fixed-point
    arithmetic cannot represent."""
    from rhq_metrics_spark.operators.anomaly import (
        _seasonal_binned,
        seasonal_apply,
        seasonal_profile,
    )

    hist = spark.createDataFrame(
        [("m", 0, 10.0), ("m", 600_000, 14.0), ("m", 3_600_000, 12.0)],
        "metric string, ts long, value double",
    )
    bh = _seasonal_binned(hist, "ts", "value", 86_400_000, 24, 100)
    prof = seasonal_profile(bh, ["metric"])
    req = spark.createDataFrame(
        [("m", 1_000, 11.0), ("m", 7_200_000, 5.0)],  # bin 0 known, bin 2 novel
        "metric string, ts long, value double",
    )
    br = _seasonal_binned(req, "ts", "value", 86_400_000, 24, 100)
    out = {r["ts"]: r for r in seasonal_apply(br, prof, ["metric"]).collect()}
    assert len(out) == 2  # the novel-bin point is NOT dropped
    assert out[1_000]["baseline"] == 12.0 and out[1_000]["bin_samples"] == 2
    assert out[1_000]["residual"] == -1.0
    novel = out[7_200_000]
    assert novel["baseline"] is None and novel["residual"] is None
    assert novel["bin_samples"] == 0
    for bad in (3, 100_000, 0):
        with pytest.raises(ValueError, match="divisor of 10000"):
            seasonal_apply(br, prof, ["metric"], value_scale=bad)


def test_ewma_weights_overflow_guard():
    """ewma_weights raises past the 2**53 exact budget (ADVICE r9:
    alpha_den=4 with window_n>=33 silently exceeded int64 before)."""
    from rhq_metrics_spark.operators.anomaly import ewma_weights

    with pytest.raises(ValueError, match="2\\*\\*53"):
        ewma_weights(33, 1, 4)
    with pytest.raises(ValueError, match="2\\*\\*53"):
        ewma_weights(64, 1, 2)
    assert len(ewma_weights(20, 1, 4)) == 20  # inside the budget


# -- HyperLogLog (portable registers) -----------------------------------------


def _hll_py_est(true_vals, m=64, salt="hll"):
    """Pure-Python twin of hll_registers + hll_estimate (same md5 bits)."""
    import hashlib
    import math

    regs = {}
    for v in true_vals:
        hr = hashlib.md5(f"{salt}:r:{v}".encode()).hexdigest()
        reg = int(hr[:8], 16) % m
        hh = hashlib.md5(f"{salt}:h:{v}".encode()).hexdigest()[:15]
        stripped = hh.lstrip("0")
        first = stripped[:1]
        extra = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
            first, 0
        )
        rho = min((15 - len(stripped)) * 4 + extra + 1, 40)
        regs[reg] = max(regs.get(reg, 0), rho)
    zeros = m - len(regs)
    sum_scaled = sum(1 << (40 - r) for r in regs.values()) + zeros * (1 << 40)
    raw = 0.709 * m * m * float(1 << 40) / sum_scaled
    if zeros > 0 and raw <= 2.5 * m:
        return m * math.log(m / zeros), zeros, sum_scaled
    return raw, zeros, sum_scaled


def test_hll_matches_python_and_accuracy(spark):
    """Register table + estimate equal the pure-Python md5 twin exactly
    (sum_scaled is exact int64), and the estimate lands within ~3 sigma
    (1.04/sqrt(64) ~ 13%) of the true cardinality."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 4000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("item-"), F.col("id")).alias("v")
    )
    # duplicates must not move the sketch
    df = df.union(df.limit(500))
    est = hll_estimate(hll_registers(df, "g", "v"), "g").collect()[0]
    want, zeros, sum_scaled = _hll_py_est([f"item-{i}" for i in range(n)])
    assert est["sum_scaled"] == sum_scaled
    assert est["zeros"] == zeros
    assert est["est"] == want  # bit-identical raw-branch double
    assert abs(est["est"] - n) / n < 0.4  # 3 sigma at m=64


def test_hll_linear_counting_small_range(spark):
    import pyspark.sql.functions as F
    import pytest

    from rhq_metrics_spark.pipelines.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(10).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    est = hll_estimate(hll_registers(df, "g", "v"), "g").collect()[0]
    want, _, _ = _hll_py_est([f"x{i}" for i in range(10)])
    assert est["est"] == pytest.approx(want, abs=1e-3)
    assert est["zeros"] > 0 and est["est"] < 2.5 * 64
    with pytest.raises(ValueError, match="m must be"):
        hll_registers(df, "g", "v", m=48)


def test_hll_registers_merge_equals_whole(spark):
    """Mergeable-summaries contract: per-half register tables merged by
    max(rho) == the whole corpus's registers, hence identical estimate."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(3000).select(
        (F.col("id") % 2).alias("half"),
        F.lit("g").alias("g"),
        F.concat(F.lit("m"), (F.col("id") % 1700)).alias("v"),
    )
    whole = hll_registers(df, "g", "v")
    halves = [
        hll_registers(df.filter(F.col("half") == i), "g", "v")
        for i in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    assert {(r["reg"], r["rho"]) for r in merged.collect()} == {
        (r["reg"], r["rho"]) for r in whole.collect()
    }
    assert (
        hll_estimate(merged, "g").collect()[0]["est"]
        == hll_estimate(whole, "g").collect()[0]["est"]
    )


# -- Bloom filter --------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """The Bloom guarantee: every inserted value probes true; the FP
    rate on non-members sits near the published (1-e^{-kn/m})^k."""
    import math

    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import bloom_build, bloom_probe

    n, m, k = 800, 8192, 4
    members = spark.range(n).select(
        F.concat(F.lit("in-"), F.col("id")).alias("v")
    )
    outsiders = spark.range(4000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("v")
    )
    bloom = bloom_build(members, "v", n_bits=m, n_hashes=k)
    hits = {
        r["v"]: r["maybe_present"]
        for r in bloom_probe(
            bloom, members.union(outsiders), "v", n_bits=m, n_hashes=k
        ).collect()
    }
    assert all(hits[f"in-{i}"] for i in range(n))  # NO false negatives
    fp = sum(hits[f"out-{i}"] for i in range(4000)) / 4000
    expected = (1 - math.exp(-k * n / m)) ** 4
    assert fp < 3 * expected + 0.02, (fp, expected)


def test_bloom_probe_duplicate_values_no_false_negative(spark):
    """ADVICE r10 (medium): a probe value appearing TWICE (two batch
    docs sharing one content fingerprint — the dedup pre-filter
    composition) must still read maybe_present=true.  The old
    count==n_hashes aggregation saw 2×n_hashes hit rows and returned
    false — a false negative that silently let real duplicates skip
    the index."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import bloom_build, bloom_probe

    members = spark.range(50).select(
        F.concat(F.lit("m-"), F.col("id")).alias("v")
    )
    bloom = bloom_build(members, "v")
    # every member probed 3×, plus a triplicated outsider
    probes = (
        members.union(members).union(members)
        .union(spark.createDataFrame([("nope",)] * 3, "v string"))
    )
    hits = {
        r["v"]: r["maybe_present"]
        for r in bloom_probe(bloom, probes, "v").collect()
    }
    assert all(hits[f"m-{i}"] for i in range(50)), "false negative on dup probe"
    assert len(hits) == 51  # one row per distinct value


def test_bloom_merge_equals_whole_and_validation(spark):
    import pyspark.sql.functions as F
    import pytest

    from rhq_metrics_spark.pipelines.sketches import bloom_build, bloom_probe

    a = spark.range(200).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(200).select(F.concat(F.lit("b"), F.col("id")).alias("v"))
    whole = bloom_build(a.union(b), "v")
    merged = (
        bloom_build(a, "v").unionByName(bloom_build(b, "v"))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert {(r["word_idx"], r["bits"]) for r in merged.collect()} == {
        (r["word_idx"], r["bits"]) for r in whole.collect()
    }
    with pytest.raises(ValueError, match="multiple"):
        bloom_build(a, "v", n_bits=100)


def test_bloom_prefilter_composes_with_incremental_dedup(spark):
    """The scale composition the bloom exists for: a corpus-fingerprint
    bloom in front of the standing dedup index — docs that miss the
    bloom CANNOT be exact dups (no false negatives), so only bloom hits
    probe the index; decisions on the surviving docs are unchanged."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import bloom_build, bloom_probe
    from rhq_metrics_spark.streaming.dedup import content_fingerprint

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different corpus document body")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),  # exact dup
         (11, "a novel batch document nothing like the corpus")],
        "doc_id long, text string",
    )
    bloom = bloom_build(
        corpus.select(content_fingerprint().alias("v")), "v"
    )
    probed = bloom_probe(
        bloom, batch.select("doc_id", content_fingerprint().alias("v")), "v"
    )
    flags = {
        r["doc_id"]: r["maybe_present"]
        for r in batch.select("doc_id", content_fingerprint().alias("v"))
        .join(probed, "v").collect()
    }
    assert flags[10] is True  # the dup always survives the pre-filter
    # exact membership agrees with the bloom-gated subset
    exact = {
        r["doc_id"]
        for r in batch.withColumn("v", content_fingerprint())
        .join(corpus.select(content_fingerprint().alias("v")), "v", "left_semi")
        .collect()
    }
    assert exact == {10}
    assert all(flags[d] for d in exact)  # no dup is ever pre-filtered away


# -- temperature mixture --------------------------------------------------------


def test_temperature_mixture_flattens_shares(spark):
    """alpha < 1 up-weights small sources: at alpha=1 the plan equals
    the proportional token_mixture; at alpha=1/2 the small source's
    rate_ppm strictly exceeds its proportional rate; weights match the
    pure-Python sqrt composition exactly."""
    import math

    import pyspark.sql.functions as F
    import pytest

    from rhq_metrics_spark.pipelines.sampling import (
        temperature_mixture_plan,
        temperature_mixture_sample,
        token_mixture_plan,
    )

    rows = [(i, "big", "word " * 50) for i in range(40)] + [
        (100 + i, "small", "word " * 10) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    p1 = {r["group"]: r for r in temperature_mixture_plan(df, 4, 1000).collect()}
    prop = {
        r["group"]: r
        for r in token_mixture_plan(
            df, F.col("available_tokens"), 1000
        ).collect()
    }
    assert p1["small"]["target_tokens"] == prop["small"]["target_tokens"]

    p_half = {
        r["group"]: r for r in temperature_mixture_plan(df, 2, 1000).collect()
    }
    assert p_half["small"]["rate_ppm"] > prop["small"]["rate_ppm"]
    assert p_half["big"]["rate_ppm"] < prop["big"]["rate_ppm"]
    # exact integer weights: floor(sqrt(n) * 1e6)
    for g in ("big", "small"):
        n = p_half[g]["available_tokens"]
        assert p_half[g]["part"] == math.floor(math.sqrt(n) * 1_000_000)

    out = temperature_mixture_sample(df, 2, 1000)
    assert out.count() > 0
    assert set(out.columns) == {"doc_id", "group", "copy_idx", "n_tokens"}
    with pytest.raises(ValueError, match="alpha_quarters"):
        temperature_mixture_plan(df, 5, 1000)


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Streaming HLL twin: a finalized slice's registers equal
    hll_registers over that slice's rows, and max-merging the per-slice
    registers + hll_estimate reproduces the whole-range estimate."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import (
        hll_estimate,
        hll_registers,
    )
    from rhq_metrics_spark.streaming.hll import streaming_hll_registers

    src = tmp_path / "hll_in"
    src.mkdir()
    base = 1_700_000_000
    rows1 = [
        {"g": "a", "sec": base + i * 60, "v": f"val{(i * 7) % 40}"}
        for i in range(60)
    ]
    rows2 = [{"g": "a", "sec": base + 7200, "v": "late"}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = (
        spark.readStream.schema("g string, sec long, v string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    out = streaming_hll_registers(
        stream, "g", "v", "30 minutes", watermark_delay="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    batch = spark.createDataFrame(
        [(r["g"], r["sec"], r["v"]) for r in rows1],
        "g string, sec long, v string",
    )
    # completeness target (see the bloom twin: "slices present" can
    # observe a partially-written finalization batch)
    starts = sorted({r["sec"] - (r["sec"] % 1800) for r in rows1})
    expected_rows = sum(
        hll_registers(
            batch.filter((F.col("sec") >= s0) & (F.col("sec") < s0 + 1800)),
            "g", "v",
        ).count()
        for s0 in starts
    )
    try:
        deadline = time.time() + 120
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
        while (
            spark.sql("select count(*) from hll_out").collect()[0][0]
            < expected_rows and time.time() < deadline
        ):
            time.sleep(0.5)
    finally:
        q.stop()

    slices = spark.sql("select * from hll_out").collect()
    assert slices
    # per-slice registers == batch hll_registers over the slice's rows
    for s0 in {int(r["slice_start"].timestamp()) for r in slices}:
        in_slice = batch.filter(
            (F.col("sec") >= s0) & (F.col("sec") < s0 + 1800)
        )
        exp = {
            (r["g"], r["reg"]): r["rho"]
            for r in hll_registers(in_slice, "g", "v").collect()
        }
        got = {
            (r["g"], r["reg"]): r["rho"]
            for r in slices
            if int(r["slice_start"].timestamp()) == s0
        }
        # memory-sink rows for this slice
        got = {
            (r["g"], r["reg"]): r["rho"]
            for r in slices
            if int(r["slice_start"].timestamp()) == s0
        }
        assert got == exp, s0
    # max-merged per-slice registers -> whole-range estimate
    merged = (
        spark.sql("select g, reg, rho from hll_out")
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(batch, "g", "v")
    assert (
        hll_estimate(merged, "g").collect()[0]["est"]
        == hll_estimate(whole, "g").collect()[0]["est"]
    )


def test_seasonal_forecast_bands_python_twin(spark):
    """W13: per-bin baseline ± k·sigma from the profile's exact moments
    equals the same fixed op sequence in Python, bit for bit."""
    import math

    from rhq_metrics_spark.operators.anomaly import (
        _seasonal_binned,
        seasonal_forecast_bands,
        seasonal_profile,
    )

    hour = 3_600_000
    rows = [
        ("m", 0 * hour + 1, 10.0), ("m", 24 * hour + 2, 14.0),
        ("m", 48 * hour + 3, 12.33), ("m", 1 * hour + 4, 30.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    binned = _seasonal_binned(df, "ts", "value", 86_400_000, 24, 100)
    prof = seasonal_profile(binned, ["metric"])
    out = {r["bin"]: r for r in
           seasonal_forecast_bands(prof, ["metric"], k=2.0).collect()}
    vq0 = [1000, 1400, 1233]
    n, sv, sq = len(vq0), sum(vq0), sum(x * x for x in vq0)
    m = sv / n
    sd = math.sqrt(max(sq / n - m * m, 0.0))
    b0 = out[0]
    assert b0["bin_samples"] == 3
    assert b0["baseline"] == m / 100 and b0["sd"] == sd / 100
    assert b0["lo"] == (m - 2.0 * sd) / 100
    assert b0["hi"] == (m + 2.0 * sd) / 100
    # single-point bin: sd 0, band collapses to the baseline
    b1 = out[1]
    assert b1["sd"] == 0.0 and b1["lo"] == b1["hi"] == b1["baseline"] == 30.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisor"):
        seasonal_forecast_bands(prof, ["metric"], value_scale=3)


def test_service_seasonal_forecast_routed_zero_raw_reads(spark, tmp_path):
    """The forecast serves ENTIRELY from attached profile partials —
    no raw-point files in the plan — and equals the history-scan
    route over the same data."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources.store import MetricsStore

    store = MetricsStore(spark, str(tmp_path / "store"))
    svc = MetricsService(spark, store)
    rows = [
        ("t", "cpu", d * 86_400_000 + h * 3_600_000 + 5,
         float((h * 13 + d * 7) % 40) + 0.5, None)
        for d in range(3) for h in range(24)
    ]
    svc.add_data_points("gauge", spark.createDataFrame(
        rows, "tenant_id string, metric string, ts long, value double, "
              "tags map<string,string>"))

    from rhq_metrics_spark.operators.anomaly import (
        _seasonal_binned,
        seasonal_profile,
    )

    binned = _seasonal_binned(
        store.points("gauge").select("tenant_id", "metric", "ts", "value"),
        "ts", "value", 86_400_000, 24, 100,
    )
    seasonal_profile(binned, ["tenant_id", "metric"]).write.parquet(
        str(tmp_path / "prof")
    )
    svc.attach_seasonal_profile(str(tmp_path / "prof"))

    start, end = 3 * 86_400_000, 4 * 86_400_000  # the NEXT (unseen) day
    fc = svc.seasonal_forecast("t", "cpu", start, end)
    assert not any("points" in f for f in fc.inputFiles())
    got = {r["ts"]: r for r in fc.collect()}
    assert len(got) == 24
    assert all(r["bin_samples"] == 3 for r in got.values())
    # history-scan route over the same data gives identical bands
    svc._seasonal_profiles = {}
    raw = {r["ts"]: r for r in svc.seasonal_forecast(
        "t", "cpu", start, end, history=(0, 3 * 86_400_000)
    ).collect()}
    for ts, r in got.items():
        for c in ("bin", "baseline", "sd", "lo", "hi"):
            assert r[c] == raw[ts][c], (ts, c)
    # band sanity: lo <= baseline <= hi everywhere
    assert all(r["lo"] <= r["baseline"] <= r["hi"] for r in got.values())
    # no attachment + no history -> loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="history"):
        svc.seasonal_forecast("t", "cpu", start, end)

    # ADVICE r10: a MIXED attachment (pre-r10 partials without
    # sum_sq_vq unioned with new ones → nulls in old rows) must NOT be
    # used for the band's second moment — the forecast falls back to
    # the history scan and the bands stay exact instead of silently
    # deflating sd.
    prof_df = spark.read.parquet(str(tmp_path / "prof"))
    mixed = prof_df.unionByName(
        prof_df.limit(1).withColumn(
            "sum_sq_vq", F.lit(None).cast("long")
        ).withColumn("bin", F.lit(999))
    )
    svc.attach_seasonal_profile(mixed)
    with _pytest.raises(ValueError, match="history"):
        svc.seasonal_forecast("t", "cpu", start, end)
    mixed_hist = {r["ts"]: r for r in svc.seasonal_forecast(
        "t", "cpu", start, end, history=(0, 3 * 86_400_000)
    ).collect()}
    for ts, r in got.items():
        assert r["sd"] == mixed_hist[ts]["sd"], ts
    # seasonal_profile scoring (first moment only) still accepts it
    scored = svc.seasonal_profile("t", "cpu", 0, 86_400_000)
    assert scored.count() == 24


def test_streaming_bloom_matches_batch(spark, tmp_path):
    """Streaming Bloom twin: a finalized slice's words equal bloom_build
    over that slice's rows; OR-ing the per-slice words reproduces the
    whole-range filter, so every inserted value still probes true."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sketches import bloom_build, bloom_probe
    from rhq_metrics_spark.streaming.bloom import streaming_bloom

    src = tmp_path / "bl_in"
    src.mkdir()
    base = 1_700_000_000
    rows1 = [
        {"sec": base + i * 60, "v": f"member-{i}"} for i in range(50)
    ]
    rows2 = [{"sec": base + 7200, "v": "late"}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = (
        spark.readStream.schema("sec long, v string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    out = streaming_bloom(
        stream, "v", "30 minutes", watermark_delay="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bl_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bl_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    batch = spark.createDataFrame([(r["v"],) for r in rows1], "v string")
    # completeness target: the finalization micro-batch writes one row
    # per (slice, word) — waiting on "slices present" can observe a
    # PARTIALLY-written batch and stop() would truncate it (flaked once)
    # true window grid: F.window aligns to the EPOCH, not to base
    starts = sorted({r["sec"] - (r["sec"] % 1800) for r in rows1})
    expected_rows = sum(
        bloom_build(
            spark.createDataFrame(
                [(x["v"],) for x in rows1 if s0 <= x["sec"] < s0 + 1800],
                "v string",
            ),
            "v",
        ).count()
        for s0 in starts
    )
    try:
        deadline = time.time() + 120
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
        while (
            spark.sql("select count(*) from bl_out").collect()[0][0]
            < expected_rows and time.time() < deadline
        ):
            time.sleep(0.5)
    finally:
        q.stop()

    slices = spark.sql("select * from bl_out").collect()
    assert slices
    # per-slice words == batch bloom_build over the slice's rows
    for s0 in {int(r["slice_start"].timestamp()) for r in slices}:
        rows_in = [
            (x["v"],) for x in rows1 if s0 <= x["sec"] < s0 + 1800
        ]
        exp = {
            (b["word_idx"], b["bits"])
            for b in bloom_build(
                spark.createDataFrame(rows_in, "v string"), "v"
            ).collect()
        }
        got = {
            (r["word_idx"], r["bits"])
            for r in slices
            if int(r["slice_start"].timestamp()) == s0
        }
        assert got == exp, s0
    # OR-merged per-slice words == the whole-range filter; no false
    # negatives through the batch probe
    merged = (
        spark.sql("select word_idx, bits from bl_out")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    whole = {
        (r["word_idx"], r["bits"]) for r in bloom_build(batch, "v").collect()
    }
    assert {(r["word_idx"], r["bits"]) for r in merged.collect()} == whole
    hits = bloom_probe(merged, batch, "v")
    assert hits.filter("NOT maybe_present").count() == 0
