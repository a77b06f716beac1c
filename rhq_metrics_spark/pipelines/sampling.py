"""Deterministic sampling / splitting for training-data curation.

All decisions are pure functions of ``md5(salt || id)`` — no RNG state,
no ``rand()``: a row's split/sample fate is reproducible across runs,
engines, partitionings, and cluster sizes (the property a 100 TB corpus
refresh needs: re-running the pipeline after appending data must not
reshuffle existing rows between train and test).  Everything is a
JVM-side column expression — filters fuse with the scan, no shuffle for
split/sample, one window shuffle for per-group caps.

- ``hash_fraction``: uniform [0, 1) per row from the first 60 bits of
  the md5 — the shared primitive.
- ``deterministic_sample``: keep rows with fraction < p.
- ``hash_split``: assign train/val/test (any weights) by threshold.
- ``cap_per_group``: at most k rows per group, chosen by hash order
  (stable "max documents per domain" dedup-adjacent curation rule).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: 60 bits of md5 (15 hex chars) — fits a signed long exactly, matching
#: DuckDB's CAST(concat('0x', substr(md5(..), 1, 15)) AS BIGINT)
_HASH_BITS = 60
_HASH_DENOM = float(1 << _HASH_BITS)


def hash_fraction(id_col: Column, salt: str = "") -> Column:
    """Uniform pseudo-random fraction in [0, 1), deterministic in
    ``(salt, id)``.  Byte-identical md5 arithmetic exists in DuckDB, so
    sampling decisions are oracle-checkable."""
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, _HASH_BITS // 4), 16, 10).cast("long") / F.lit(
        _HASH_DENOM
    )


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a stable ``fraction`` of rows (by id hash).  Appending new
    rows later never changes which existing rows are kept."""
    return df.filter(hash_fraction(F.col(id_col), salt) < fraction)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | Sequence[tuple[str, float]],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label with the given weights (need not
    sum to 1 — they are normalized).  Thresholding one hash keeps the
    assignment stable under data growth; iteration order of ``weights``
    fixes which side of a boundary each label owns."""
    items = list(weights.items()) if isinstance(weights, Mapping) else list(weights)
    total = sum(w for _, w in items)
    frac = hash_fraction(F.col(id_col), salt)
    expr = F.lit(items[-1][0])
    acc = 0.0
    bounds = []
    for name, w in items[:-1]:
        acc += w / total
        bounds.append((name, acc))
    for name, b in reversed(bounds):
        expr = F.when(frac < b, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-source mixture weighting: keep each row with its group's
    sampling rate (e.g. ``{"web": 0.5, "code": 1.0}`` re-weights a
    pretraining mixture).  One hash threshold per row — a pure filter
    that fuses with the scan, no shuffle; deterministic and stable under
    corpus growth like every sampler here.  Groups absent from ``rates``
    fall back to ``default_rate`` (0 drops them)."""
    frac = hash_fraction(F.col(id_col), salt)
    rate = F.lit(float(default_rate))
    for g, r in reversed(list(rates.items())):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.filter(frac < rate)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """At most ``k`` rows per group, selected by hash order (ties broken
    by id) — the stable per-source document cap.  One window shuffle on
    the group key; the hash order makes the kept set independent of
    physical row order."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_fraction(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    weights: Mapping[str, float] | Sequence[tuple[str, float]],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Train/test split that can't leak near-duplicates across the
    boundary: the split hash is keyed on the document's dup-CLUSTER id
    (``dup_clusters`` output), so every member of a near-dup cluster
    lands in the same split.  Docs without a cluster row fall back to
    their own id — identical to :func:`hash_split` for singletons.
    """
    j = docs.join(
        clusters.select(F.col(id_col), F.col(cluster_col)), id_col, "left"
    )
    key = F.coalesce(
        F.col(cluster_col).cast("string"), F.col(id_col).cast("string")
    )
    out = hash_split(
        j.withColumn("_split_key", key),
        weights,
        id_col="_split_key",
        salt=salt,
        out_col=out_col,
    )
    return out.drop("_split_key")


def token_mixture_plan(
    df: DataFrame,
    parts: Mapping[str, int] | Column,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture PLAN: given per-source target weights
    (integer ``parts``, the exact-arithmetic form of mixture
    percentages) and a total token budget, compute each source's
    sampling plan — the data-mixing calculation behind pretraining
    recipes that up-sample small high-quality sources (rate > 1 =
    epochs) and down-sample bulk web text.

    Everything is exact int64: ``target_tokens = budget * part div
    sum(parts)``, ``rate_ppm = target * 1e6 div available`` (parts-per-
    million), ``n_full_copies = rate_ppm div 1e6``, ``frac_ppm =
    rate_ppm mod 1e6`` — bit-identical in any engine, no float
    normalization.  ``parts`` may be a Mapping (rendered as a CASE) or
    a Column computing the part from the group value.

    One hash-agg on the group key (tiny — #sources rows); nothing else
    touches the corpus."""
    toks = df.select(
        F.col(group_col).alias("group"),
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("_nt"),
    )
    if isinstance(parts, Mapping):
        part_col = F.lit(0)
        for g, p in reversed(list(parts.items())):
            part_col = F.when(F.col("group") == g, F.lit(int(p))).otherwise(
                part_col
            )
        sum_parts = sum(int(p) for p in parts.values())
        avail = toks.groupBy("group").agg(
            F.sum("_nt").alias("available_tokens")
        ).withColumn("part", part_col.cast("long")).withColumn(
            "_sum_parts", F.lit(int(sum_parts)).cast("long")
        )
    else:
        avail = toks.groupBy("group").agg(
            F.sum("_nt").alias("available_tokens")
        ).withColumn("part", parts.cast("long"))
        avail = avail.withColumn(
            "_sum_parts",
            F.sum("part").over(Window.partitionBy()),
        )
    return avail.selectExpr(
        "group", "available_tokens", "part",
        f"cast({int(budget_tokens)}L * part div _sum_parts as bigint)"
        " AS target_tokens",
    ).selectExpr(
        "*",
        "CASE WHEN available_tokens > 0"
        " THEN target_tokens * 1000000L div available_tokens"
        " ELSE 0L END AS rate_ppm",
    ).selectExpr(
        "group", "available_tokens", "part", "target_tokens", "rate_ppm",
        "rate_ppm div 1000000L AS n_full_copies",
        "rate_ppm % 1000000L AS frac_ppm",
    )


def token_mixture_sample(
    df: DataFrame,
    parts: Mapping[str, int] | Column,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "tokmix",
) -> DataFrame:
    """Realize a :func:`token_mixture_plan`: emit each document
    ``n_full_copies`` times plus one more with probability
    ``frac_ppm/1e6`` — decided by a 20-bit md5 hash compared in exact
    integers (``h20 * 1e6 < frac_ppm * 2^20``; both sides ≤ 2^40, no
    overflow, bit-identical cross-engine).  Deterministic and stable
    under corpus growth like every sampler here; up-sampled sources get
    ``copy_idx`` 1..n so downstream packing can interleave epochs.

    Output: one row per emitted copy ``(id, group, copy_idx,
    n_tokens)``.  100 TB shape: the plan is a broadcast of #sources
    rows; the copy explode is bounded by the epoch count; the hash
    filter fuses with the scan."""
    plan = token_mixture_plan(df, parts, budget_tokens, group_col, text_col)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("group"),
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("n_tokens"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit(":"),
                               F.col(id_col).cast("string"))),
                1, 5,
            ),
            16, 10,
        ).cast("long").alias("_h20"),
    )
    return (
        toks.join(F.broadcast(plan), "group")
        .selectExpr(
            "_id", "group", "n_tokens",
            "n_full_copies + CASE WHEN _h20 * 1000000L"
            " < frac_ppm * 1048576L THEN 1 ELSE 0 END AS _n_copies",
        )
        .filter("_n_copies > 0")
        .selectExpr(
            f"_id AS {id_col}", "group",
            "explode(sequence(1, _n_copies)) AS copy_idx",
            "cast(n_tokens as bigint) AS n_tokens",
        )
    )


def temperature_parts(
    alpha_quarters: int, avail_col: str = "available_tokens"
) -> Column:
    """Integer mixture weights ``floor(n^alpha * 1e6)`` for TEMPERATURE
    sampling (multilingual pretraining's ``p_g ∝ n_g^alpha``, public
    from the mBERT/XLM-R recipes): alpha is restricted to quarters
    (1/4, 1/2, 3/4, 1) so ``n^alpha`` is a composition of IEEE
    correctly-rounded ``sqrt``s (+ one rounded multiply for 3/4) — the
    same double in every engine, hence the floored integer weight, and
    with it every downstream ppm rate, is bit-identical cross-engine.
    An arbitrary float alpha would route through ``pow``, whose last
    ulp is not pinned across engines.

    Feed as the ``parts`` Column of :func:`token_mixture_plan` /
    :func:`token_mixture_sample` (it is evaluated on the aggregated
    per-group frame, where ``available_tokens`` exists)."""
    if alpha_quarters not in (1, 2, 3, 4):
        raise ValueError(
            "alpha_quarters must be 1..4 (alpha = 1/4, 1/2, 3/4 or 1); "
            "dyadic-quarter temperatures are the cross-engine-exact set"
        )
    x = F.col(avail_col).cast("double")
    r2 = F.sqrt(x)
    r4 = F.sqrt(r2)
    w = {1: r4, 2: r2, 3: r2 * r4, 4: x}[alpha_quarters]
    return F.floor(w * F.lit(1_000_000.0)).cast("long")


def temperature_mixture_plan(
    df: DataFrame,
    alpha_quarters: int,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture PLAN with temperature-derived weights: the
    per-group share flattens as ``n_g^alpha`` (alpha < 1 up-weights
    small sources — the standard multilingual balance dial) and the
    rest of the plan is :func:`token_mixture_plan`'s exact integer
    arithmetic.  One hash-agg on the group key; nothing else touches
    the corpus."""
    return token_mixture_plan(
        df,
        temperature_parts(alpha_quarters),
        budget_tokens,
        group_col=group_col,
        text_col=text_col,
    )


def temperature_mixture_sample(
    df: DataFrame,
    alpha_quarters: int,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "tokmix",
) -> DataFrame:
    """Realize a :func:`temperature_mixture_plan` — same deterministic
    20-bit-hash epoch/fraction mechanics as
    :func:`token_mixture_sample`, so the realization is bit-identical
    cross-engine and stable under corpus growth."""
    return token_mixture_sample(
        df,
        temperature_parts(alpha_quarters),
        budget_tokens,
        group_col=group_col,
        id_col=id_col,
        text_col=text_col,
        salt=salt,
    )


def importance_sample(
    df: DataFrame,
    weight_col: str,
    expected_n: int,
    id_col: str = "doc_id",
    salt: str = "impsamp",
) -> DataFrame:
    """Quality-WEIGHTED document sampling: keep each row with
    probability proportional to its integer weight (a quantized
    classifier/quality score), targeting ``expected_n`` kept rows —
    the resampling step of classifier-curated corpora (keep the good
    docs with high probability, the mediocre ones occasionally,
    instead of a hard threshold).

    Exact integer plan: ``rate_ppm = min(1e6, expected_n * 1e6 * w div
    sum(w))`` (probabilities clamp at 1, so the realized expectation
    undershoots ``expected_n`` exactly by the clamped mass — the
    standard weighted-sampling contract); the keep decision is the
    repo's 20-bit-hash compare (``h20 * 1e6 < rate_ppm * 2^20``, both
    sides well inside int64) — deterministic, stable under corpus
    growth, bit-identical cross-engine.

    Bounds: requires ``0 < weight <= 1e6`` (quantize scores first) and
    ``expected_n <= 1e6`` so ``expected_n * 1e6 * w`` stays inside
    int64; violations raise/filter loudly rather than overflow.

    100 TB shape: ONE scalar aggregate (sum of weights) broadcast onto
    the corpus; the hash filter fuses with the scan — no shuffle of
    data rows.  Output: the kept rows + ``rate_ppm``.
    """
    if not 0 < expected_n <= 1_000_000:
        raise ValueError("expected_n must be in 1..1e6 (int64 headroom)")
    w = F.col(weight_col).cast("long")
    checked = df.withColumn(
        "_w",
        F.when((w > 0) & (w <= 1_000_000), w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"importance_sample: {weight_col} out of (0, 1e6]: "),
                    w.cast("string"),
                )
            )
        ),
    )
    total = checked.select(F.sum("_w").alias("_sw"))
    h20 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
            1, 5,
        ),
        16, 10,
    ).cast("long")
    rated = checked.crossJoin(F.broadcast(total)).withColumn(
        "rate_ppm",
        # integer div keeps the rate an exact long (/, by contrast,
        # widens to double)
        F.expr(
            f"least(1000000L, {int(expected_n) * 1_000_000}L * _w div _sw)"
        ).cast("long"),
    )
    return (
        rated.withColumn("_h20", h20)
        .filter(F.col("_h20") * 1_000_000 < F.col("rate_ppm") * 1_048_576)
        .drop("_w", "_sw", "_h20")
    )


def priority_q(weight: Column, id_col: Column, salt: str = "prio") -> Column:
    """The DLT priority ``q = w / u`` with ``u ∈ (0, 1]`` drawn
    deterministically from ``md5(salt:id)`` — the shared kernel of
    :func:`priority_sample` and its streaming twin
    (``streaming/priority.py``).  The ``+ 1`` is applied BEFORE the
    int→double conversion so both engines round the same sum."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))),
            1, _HASH_BITS // 4,
        ),
        16, 10,
    ).cast("long")
    return weight.cast("double") / ((h + F.lit(1)) / F.lit(_HASH_DENOM))


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007): a
    weight-sensitive size-``k`` sample with unbiased subset-sum
    estimators — the sampler to use when downstream wants "a fixed
    budget of documents, biased toward the heavy ones, but still able
    to estimate any subpopulation's total weight".

    Each row draws ``u ∈ (0, 1]`` deterministically from
    ``md5(salt:id)`` (same 60-bit primitive as every sampler here, so a
    DuckDB oracle reproduces the draw bit-for-bit) and gets priority
    ``q = w / u``.  The sample is the top ``k`` by priority; with
    ``τ`` = the (k+1)-th priority, each sampled row's weight estimate
    is ``max(w, τ)`` — E[Σ estimates over any subset] equals that
    subset's true total weight (DLT Theorem 1).  If the input has ≤ k
    rows, everything is sampled and the estimate is the exact weight
    (τ = 0).

    Scale shape: priorities are scan-fused column expressions; the
    top-(k+1) is a ``TakeOrderedAndProject`` (per-partition partial
    top-k, no global sort shuffle), and τ comes from that ≤ k+1-row
    frame — nothing data-sized is collected or re-scanned.  All
    arithmetic is int64 → IEEE double division, identical in any
    engine.

    Output: ``(id, weight, priority_r, est_weight_r)`` (doubles rounded
    to 6 dp for display; selection uses full precision), ordered by
    priority descending.

    Reference analogue: the reference has no weighted sampler; this
    extends its uniform sampling surface the way its own stats
    operators extend raw scans (core/metrics-core-service/.../
    MetricsServiceImpl.java query-shaping conventions).
    """
    if k <= 0:
        raise ValueError(f"priority_sample: k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    checked = df.withColumn(
        "_w",
        F.when(w > 0, w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"priority_sample: {weight_col} must be > 0: "),
                    w.cast("string"),
                )
            )
        ),
    )
    prio = checked.withColumn(
        "_q", priority_q(F.col("_w"), F.col(id_col), salt)
    )
    # top-(k+1): TakeOrderedAndProject — per-partition partial top-k.
    top = (
        prio.select(id_col, "_w", "_q")
        .orderBy(F.col("_q").desc(), F.col(id_col).asc())
        .limit(k + 1)
        .localCheckpoint(eager=True)  # ≤ k+1 rows; scan runs once
    )
    # τ = (k+1)-th priority, or 0 when the input had ≤ k rows.
    tau = top.agg(
        F.when(F.count(F.lit(1)) > k, F.min("_q")).otherwise(F.lit(0.0)).alias("_tau")
    )
    return (
        top.orderBy(F.col("_q").desc(), F.col(id_col).asc())
        .limit(k)
        .crossJoin(F.broadcast(tau))
        .select(
            F.col(id_col),
            F.col("_w").cast("long").alias("weight"),
            F.round("_q", 6).alias("priority_r"),
            F.round(F.greatest(F.col("_w"), F.col("_tau")), 6).alias("est_weight_r"),
        )
        .orderBy(F.col("priority_r").desc(), F.col(id_col).asc())
    )


def priority_sample_per_group(
    df: DataFrame,
    k: int,
    group_cols: Sequence[str],
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """Per-group priority sampling: :func:`priority_sample`'s top-k and
    ``max(w, τ)`` estimators, independently per group — the WEIGHTED
    analogue of :func:`cap_per_group` ("at most k docs per source,
    biased toward the heavy ones, with unbiased per-source subset-sum
    estimates"), the shape a mixture builder actually wants.

    One window shuffle on the group key; the rank filter triggers
    Spark's ``WindowGroupLimit`` rewrite, so each task keeps k+2 rows
    per group BEFORE the exchange — the shuffle carries O(groups · k),
    never the corpus.  τ is each group's (k+1)-th priority (0 when the
    group has ≤ k rows), read from the same window pass.

    Output: ``(group_cols..., id, weight, priority_r, est_weight_r)``.
    """
    if k <= 0:
        raise ValueError(f"priority_sample_per_group: k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    checked = df.withColumn(
        "_w",
        F.when(w > 0, w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"priority_sample_per_group: {weight_col} must be > 0: "),
                    w.cast("string"),
                )
            )
        ),
    ).withColumn("_q", priority_q(F.col(weight_col), F.col(id_col), salt))
    rank_w = Window.partitionBy(*group_cols).orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    grp_w = Window.partitionBy(*group_cols)
    ranked = (
        checked.withColumn("_r", F.row_number().over(rank_w))
        .filter(F.col("_r") <= k + 1)
        .withColumn(
            "_tau",
            F.max(F.when(F.col("_r") == k + 1, F.col("_q"))).over(grp_w),
        )
    )
    return (
        ranked.filter(F.col("_r") <= k)
        .select(
            *group_cols,
            F.col(id_col),
            F.col("_w").cast("long").alias("weight"),
            F.round("_q", 6).alias("priority_r"),
            F.round(
                F.greatest(F.col("_w"), F.coalesce(F.col("_tau"), F.lit(0.0))), 6
            ).alias("est_weight_r"),
        )
        .orderBy(*group_cols, F.col("priority_r").desc(), F.col(id_col).asc())
    )
