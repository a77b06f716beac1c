"""Mergeable cardinality sketches for corpus statistics at 100 TB.

KMV (k-minimum-values) estimates a group's distinct-value count from
the k smallest hash fractions of its values: ``est = (k-1) / h_k``
where ``h_k`` is the k-th smallest.  Unlike ``approx_count_distinct``
(HLL, whose register layout is engine-private), KMV over the repo's
md5 hash fraction is **deterministic and oracle-checkable**: DuckDB
reproduces the identical bottom-k and the identical estimate double.

The bottom-k itself is exact and order-independent, so it distributes:
per-partition partial bottom-k's merged anywhere yield the global
bottom-k.  Here that is expressed as a two-level ranked selection —
level 1 ranks within (group, salt-bucket) so each of ``n_salts`` tasks
sorts only its slice (a single window over a 4-language corpus would
serialize each language through one task); level 2 ranks the ≤
``n_salts × k`` survivors.  Distinct-ing (group, value) first keeps
the ranked input minimal and absorbs value skew in map-side partials.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from rhq_metrics_spark.localrel import local_df

#: 60-bit md5 prefix → fraction in [0, 1); matches sampling.hash_fraction
_HASH_BITS = 60
_HASH_DENOM = float(1 << _HASH_BITS)


def _hash_frac(value: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), value.cast("string")))
    return F.conv(F.substring(h, 1, _HASH_BITS // 4), 16, 10).cast("long") / F.lit(
        _HASH_DENOM
    )


def kmv_sketch_rows(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
    n_salts: int = 32,
) -> DataFrame:
    """Per-group bottom-k sketch ROWS — ``(grp, val, h)``, ≤ k rows per
    group, the k smallest portable hash fractions of the group's
    distinct values.  This is the KMV synopsis itself: store it, merge
    it (union rows, re-rank), estimate from it (:func:`kmv_distinct`),
    or combine two groups' rows for set algebra (:func:`kmv_set_ops`).
    State per group is ~k × (value + double), independent of group
    size."""
    vals = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("val"))
        .distinct()
        .withColumn("h", _hash_frac(F.col("val"), salt))
        .withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.lit(":b:"), F.col("val").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_salts,
        )
    )
    w1 = Window.partitionBy("grp", "bucket").orderBy(F.col("h").asc(), F.col("val").asc())
    survivors = vals.withColumn("r1", F.row_number().over(w1)).filter(F.col("r1") <= k)
    w2 = Window.partitionBy("grp").orderBy(F.col("h").asc(), F.col("val").asc())
    return (
        survivors.withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= k)
        .select("grp", "val", "h")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: ``(group, k_used, hk, est)`` — ``k_used`` < k means the
    group had fewer than k distinct values and ``est`` is exact
    (``k_used``); otherwise ``est = (k-1)/hk``, one correctly-rounded
    IEEE division over the portable hash fraction.
    """
    bottomk = kmv_sketch_rows(df, group_col, value_col, k, salt, n_salts)
    return (
        bottomk.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.max("h").alias("hk"),
        )
        .withColumn(
            "est",
            F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.col("hk")
            ),
        )
    )


def kmv_set_ops(
    sketch: DataFrame, k: int = 64, max_pairs: int = 100_000
) -> DataFrame:
    """Pairwise set algebra over per-group KMV sketch rows (the
    multiset-synopsis estimators of Beyer et al., SIGMOD 2007): for
    every unordered group pair, estimate ``|A ∪ B|``, ``|A ∩ B|``, and
    the Jaccard similarity — from the sketches alone, never the data.

    ``sketch`` is :func:`kmv_sketch_rows` output (``grp, val, h``) built
    with the same ``k``/salt.  Per pair: the combined bottom-k ``M`` of
    the two groups' sketch values is itself the union's KMV sketch, so
    ``union_est = (k-1)/h_k(M)``; ``rho = |{v ∈ M : v in BOTH
    sketches}|`` gives ``jaccard_est = rho/k`` and ``inter_est =
    jaccard × union``.  When the combined sketch has fewer than k
    values, BOTH sets are entirely inside their sketches and all three
    outputs are exact (``union = k_used``, ``inter = rho``, ``jaccard =
    rho/k_used``).

    Deterministic end-to-end (md5 fractions, value-tie-broken ranks) —
    the estimates, not just the contract, are oracle-checkable.

    Output: ``(grp_a, grp_b, k_used, rho, union_est, inter_est,
    jaccard)`` with ``grp_a < grp_b``.

    100 TB shape: the data-sized work already happened in
    :func:`kmv_sketch_rows` (one distinct + two bounded rank passes);
    this operator touches ≤ G²·k sketch rows — for 10k groups × k=64
    that is ~6×10⁹ tiny rows at the theoretical worst, but pairs are
    normally constrained by the caller (languages, sources, dated
    snapshots), and the pair fan-out is a broadcast nested-loop over a
    G-row dimension, never a shuffle of data.

    The sketch plan is consumed twice (group list + fan join) and
    Catalyst does not reuse common subtrees, so a live sketch pipeline
    is checkpointed lazily first — the data-sized build runs ONCE; a
    sketch already read from storage (the streaming twin's standing
    state) checkpoints its few rows for free.

    ``max_pairs`` ENFORCES the constrained-pairs contract (no silent
    caps): the G-row group list is counted (cheap — it is collected
    into the broadcast anyway) and a fan-out beyond the bound raises
    with the measured pair count, so an unconstrained 10k-group call
    fails loudly instead of materializing G²·k rows.  Raise the bound
    deliberately when the pair count is the point."""
    sketch = sketch.localCheckpoint(eager=False)
    groups = sketch.select("grp").distinct()
    n_groups = groups.count()
    n_pairs = n_groups * (n_groups - 1) // 2
    if n_pairs > max_pairs:
        raise ValueError(
            f"kmv_set_ops: {n_groups} groups -> {n_pairs} pairs exceeds "
            f"max_pairs={max_pairs}; constrain the groups (filter the "
            f"sketch) or raise max_pairs explicitly"
        )
    pairs = (
        groups.select(F.col("grp").alias("grp_a"))
        .join(
            groups.select(F.col("grp").alias("grp_b")),
            F.col("grp_a") < F.col("grp_b"),
        )
    )
    fan = sketch.join(
        F.broadcast(pairs),
        (F.col("grp") == F.col("grp_a")) | (F.col("grp") == F.col("grp_b")),
    )
    per_val = fan.groupBy("grp_a", "grp_b", "val").agg(
        F.min("h").alias("h"),  # same val -> same h; min is just "the"
        F.max((F.col("grp") == F.col("grp_a")).cast("int")).alias("in_a"),
        F.max((F.col("grp") == F.col("grp_b")).cast("int")).alias("in_b"),
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy(
        F.col("h").asc(), F.col("val").asc()
    )
    m = per_val.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    agg = m.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("rho"),
    )
    exact = F.col("k_used") < k
    union_est = F.when(exact, F.col("k_used").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("hk")
    )
    jaccard = F.when(exact, F.col("rho") / F.col("k_used")).otherwise(
        F.col("rho") / F.lit(float(k))
    )
    return agg.select(
        "grp_a",
        "grp_b",
        "k_used",
        "rho",
        union_est.alias("union_est"),
        (jaccard * union_est).alias("inter_est"),
        jaccard.alias("jaccard"),
    )


def heavy_hitters(
    values: DataFrame,
    col: str,
    phi: float,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT frequent items above frequency ``phi`` without a full-vocab
    shuffle: a per-partition Misra-Gries candidate pass, then an exact
    recount of candidates only.

    Guarantee (the pigeonhole form of the MG bound): if an item's global
    count exceeds ``n / (capacity+1)`` then some partition holds it at
    local frequency above ``n_p / (capacity+1)``, where it survives that
    partition's MG summary — so the UNION of per-partition summaries is
    a complete candidate set for threshold ``phi`` when
    ``capacity >= 1/phi``.  The exact second pass then removes every
    false positive; the output is exactly ``{v : count(v) > phi * n}``,
    no approximation.

    Scale shape: pass 1 is ``mapInPandas`` with O(capacity) state per
    task emitting ≤ tasks × capacity candidate rows (plus one row of
    partition-count accounting) — nothing shuffles; pass 2 recounts ONLY
    candidates (broadcast membership filter pushed into the scan), so
    the aggregation shuffles candidates × partitions partial rows
    instead of the whole vocabulary.  Contrast with a naive
    explode→groupBy→filter, which shuffles every distinct value.

    Accepts string / integral / boolean value columns (the discrete
    domains frequency analysis makes sense over); other types raise —
    their Python-vs-JVM string forms diverge, which would silently break
    the candidate membership filter.

    Output: ``(value, cnt)`` with cnt the exact count (value cast to
    string), descending.
    """
    import math

    import pandas as pd

    if not 0 < phi < 1:
        raise ValueError("phi must be in (0, 1)")
    dt = values.schema[col].dataType.simpleString()
    if dt not in ("string", "tinyint", "smallint", "int", "bigint", "boolean"):
        raise TypeError(
            f"heavy_hitters needs a string/integral/boolean column, got "
            f"{col}: {dt} — cast it to string explicitly first"
        )
    min_cap = math.ceil(1.0 / phi)
    if capacity is not None and capacity < min_cap:
        raise ValueError(
            f"capacity={capacity} voids the Misra-Gries completeness bound "
            f"for phi={phi}: need capacity >= ceil(1/phi) = {min_cap}"
        )
    k = capacity or min_cap
    # Cast to string JVM-SIDE before the pandas pass: Arrow converts a
    # nullable bigint to float64 (str() -> '7.0') and Python booleans to
    # 'True', neither of which matches Spark's cast-to-string form in
    # the recount ('7', 'true') — candidates would silently never match.
    # One canonical string form on both passes removes the divergence.
    values = values.select(F.col(col).cast("string").alias(col))

    def _mg(batches):
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            n_rows += int(pdf[col].count())
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # batched MG decrement: subtracting the (k+1)-th largest
                # from everyone zeroes at least len-k items; each unit
                # removed from a survivor is matched across >= k+1 items,
                # preserving the n_p/(k+1) undercount bound
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - delta for v, c in counters.items() if c > delta
                }
        yield pd.DataFrame(
            {
                # keys are already Spark-canonical strings (cast above)
                "value": list(counters) + [None],
                "part_rows": [0] * len(counters) + [n_rows],
            }
        )

    summary = values.mapInPandas(
        _mg, "value string, part_rows long"
    ).collect()
    total = sum(r["part_rows"] for r in summary if r["value"] is None)
    cands = sorted({r["value"] for r in summary if r["value"] is not None})
    if not cands or total == 0:
        spark = values.sparkSession
        return local_df(spark, [], "value string, cnt long")
    threshold = phi * total
    svals = values.select(F.col(col).cast("string").alias("_v"))
    if len(cands) <= 1000:
        counted = svals.filter(F.col("_v").isin(cands))
    else:
        cdf = F.broadcast(
            local_df(
                values.sparkSession, [(c,) for c in cands], "_v string"
            )
        )
        counted = svals.join(cdf, "_v", "left_semi")
    return (
        counted.groupBy(F.col("_v").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public): mergeable
# frequency estimation with a one-sided error guarantee.

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_bucket(value: Column, row: int, width: int, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}:{row}:"), value.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
    ).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``value_col``'s frequency
    distribution: ``(row, bucket, n)`` with ``depth × width`` cells.

    MERGEABLE by construction — cells of two sketches (same
    depth/width/salt) add, so per-partition / per-day sketches union +
    re-aggregate into the global one (same contract as the histogram
    rollups; equality-tested).  Deterministic md5 bucketing (the
    repo-standard portable hash), so the sketch — and every estimate —
    is oracle-checkable cross-engine, unlike engine-private HLL/CMS
    registers.

    100 TB shape: one hash-agg over depth×|input| exploded rows whose
    key space is depth×width cells (≤1024 by default) — map-side
    partials absorb ALL skew; the sketch itself is broadcast-sized.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(F.col(value_col), j, width, salt).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("_w"),
    )
    return rows.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(F.sum("_w").cast("long").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each probe value's frequency from the sketch:
    ``est = min over rows of cell(row, bucket_row(value))``.  The CMS
    guarantee — ``est >= true`` always, within ``2N/width`` with
    probability ``1 - 2^-depth`` — is pinned in tests.

    The probe side fans out depth rows per value and joins the
    BROADCAST sketch on the (row, bucket) key; one small agg takes the
    min.  Probe sets are top-k/watchlist sized, so this is a serving
    lookup, not a scan.
    """
    fan = probes.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(F.col(value_col), j, width, salt).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(value_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    joined = fan.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, public) with PORTABLE registers:
# unlike approx_count_distinct (whose HLL register layout is engine-
# private), these registers derive from the repo-standard md5 hash, so
# the sketch — and the estimate — is oracle-checkable cross-engine.
# Complements KMV above: HLL state is FIXED at m registers merged by
# MAX (per-slice sketches union + re-aggregate like the histogram
# rollups), where KMV state is k values merged by re-ranking.

HLL_M = 64
#: published bias-correction constants (Flajolet 2007 §4); m >= 128
#: uses the closed form — the supported m's here are exact literals so
#: the numerator is ONE precomputed double, divided once.
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}
#: register cap: rho <= 40 keeps the scaled harmonic sum exact in int64
#: (sum <= m * 2**40 = 2**46 at m=64) — the sum is order-independent
#: exact integer arithmetic, so Spark's nondeterministic reduction
#: order cannot wobble the estimate (an unscaled double sum of 2^-rho
#: terms needs > 53 mantissa bits and WOULD be order-sensitive).  The
#: cap fires with probability 2^-40 per item and both engines apply it
#: identically.
_HLL_RHO_CAP = 40


def _hll_rho(value: Column, salt: str) -> Column:
    """Position of the first 1-bit (leading zeros + 1) of the 60-bit md5
    fraction, capped at ``_HLL_RHO_CAP`` — computed from the HEX STRING
    (strip leading '0' chars = 4 zero bits each, then a 1-of-15 lookup
    for the first nonzero hex digit), so no float log2 whose last-ulp
    could flip a floor() differently per engine."""
    h15 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:h:"), value.cast("string"))), 1, 15
    )
    stripped = F.regexp_replace(h15, "^0*", "")
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    zero_bits = (F.lit(15) - F.length(stripped)) * 4 + extra
    return F.least(zero_bits + 1, F.lit(_HLL_RHO_CAP)).cast("int")


def hll_registers(
    df: DataFrame,
    group_col,
    value_col: str,
    m: int = HLL_M,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL register table ``(group..., reg, rho)`` — MERGEABLE
    by ``max(rho)`` per (group, reg): per-slice / per-partition register
    tables union + re-aggregate into any range's sketch (equality-
    tested), the same serving contract as the histogram rollups.
    ``group_col`` may be one column name or a sequence (composite key —
    e.g. the activity-register partials key on (slice, tenant,
    period), r13).

    100 TB shape: one hash-agg whose key space is #groups × m registers
    — map-side partials absorb all value skew; the sketch itself is
    broadcast-sized (m rows per group) regardless of cardinality."""
    if m not in _HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(_HLL_ALPHA)}; got {m}")
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    reg = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:r:"), F.col(value_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % m
    ).cast("int")
    return (
        df.select(
            *[F.col(c) for c in gcols],
            reg.alias("reg"),
            _hll_rho(F.col(value_col), salt).alias("_rho"),
        )
        .groupBy(*gcols, "reg")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_col: str, m: int = HLL_M
) -> DataFrame:
    """Finalize HLL register tables into per-group estimates: ``raw =
    alpha_m * m^2 / sum_j 2^-rho_j`` with empty registers contributing
    ``2^0``, linear counting ``m * ln(m/zeros)`` below ``2.5m`` (the
    published small-range correction).

    Exactness: the harmonic sum is the exact int64 ``sum 2^(CAP-rho)``
    (order-independent); the numerator ``alpha * m^2 * 2^CAP`` is ONE
    precomputed double literal; ``raw`` is one IEEE division — the
    estimate double is bit-identical cross-engine, emitted UNROUNDED
    (like the KMV estimate: decimal re-rounding, not the arithmetic,
    is the cross-engine trap).  The linear-counting branch calls
    ``ln``, whose last ulp is not pinned across engines — exact only
    within one engine (the oracled driver query stays in the raw
    branch; tests pin this branch approximately).

    Output: ``(group, regs_used, zeros, sum_scaled, est)``."""
    if m not in _HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(_HLL_ALPHA)}; got {m}")
    numerator = _HLL_ALPHA[m] * m * m * float(1 << _HLL_RHO_CAP)
    agg = registers.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("regs_used"),
        F.sum(
            F.expr(f"cast(pow(2, {_HLL_RHO_CAP} - rho) as bigint)")
        ).alias("_sum_present"),
    )
    cap_term = 1 << _HLL_RHO_CAP
    out = agg.select(
        group_col,
        "regs_used",
        (F.lit(m) - F.col("regs_used")).cast("long").alias("zeros"),
        (
            F.col("_sum_present")
            + (F.lit(m) - F.col("regs_used")) * F.lit(cap_term)
        ).cast("long").alias("sum_scaled"),
    )
    raw = F.lit(numerator) / F.col("sum_scaled").cast("double")
    est = F.when(
        (F.col("zeros") > 0) & (raw <= 2.5 * m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
    ).otherwise(raw)
    return out.withColumn("est", est)


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970, public) over the repo-standard md5 hash:
# a broadcast-sized membership pre-filter with NO false negatives —
# the classic cheap gate in front of an expensive index probe (e.g.
# the incremental-dedup joins: a batch doc whose fingerprint misses the
# corpus bloom cannot be a dup and skips the index entirely).

BLOOM_BITS = 8192
BLOOM_HASHES = 4
#: bits per stored word: 32 bits in a BIGINT keeps every shift/mask in
#: the positive range both engines handle identically (bit 63 of a
#: signed 64-bit word is a portability trap).
_BLOOM_WORD_BITS = 32


def _bloom_pos(value: Column, j: int, n_bits: int, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}:{j}:"), value.cast("string")))
    return (
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % n_bits
    ).cast("long")


def bloom_build(
    df: DataFrame,
    value_col: str,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter of ``value_col``: ``(word_idx, bits)`` rows,
    32 bits per word, ``n_bits/32`` words total.  MERGEABLE via
    ``bit_or`` per word (union of two blooms = bloom of the union;
    equality-tested), so per-slice blooms roll up like every other
    sketch here.  Deterministic md5 positions → DuckDB reproduces the
    identical words, so probes are oracle-checkable.

    100 TB shape: one hash-agg over ``n_hashes × |input|`` position rows
    into ≤ ``n_bits/32`` cells — map-side partials absorb all skew; the
    result is broadcast-sized by construction (the point: it rides a
    broadcast join as a pre-filter where the full index cannot)."""
    if n_bits % _BLOOM_WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of {_BLOOM_WORD_BITS}")
    pos = df.select(
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col(value_col), j, n_bits, salt).alias("p")
                    for j in range(n_hashes)
                ]
            )
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            F.expr(
                f"cast(pow(2, p % {_BLOOM_WORD_BITS}) as bigint)"
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(_bit)").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
    salt: str = "bloom",
) -> DataFrame:
    """Probe values against a built bloom: ``maybe_present`` is true iff
    ALL ``n_hashes`` positions are set — never a false negative (the
    Bloom guarantee, property-tested), false positives at the classic
    ``(1 - e^{-kn/m})^k`` rate (measured, not assumed, in the bench
    fixture).  The bloom side is broadcast; the probe fan-out is
    ``n_hashes`` rows per value with one small agg back."""
    fan = probes.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col(value_col), j, n_bits, salt).alias("p")
                    for j in range(n_hashes)
                ]
            )
        ).alias("p"),
    ).select(
        value_col,
        (F.col("p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"cast(pow(2, p % {_BLOOM_WORD_BITS}) as bigint)").alias("_mask"),
    )
    joined = fan.join(F.broadcast(bloom), "word_idx", "left")
    hit = F.coalesce(
        F.col("bits").bitwiseAND(F.col("_mask")) != 0, F.lit(False)
    )
    # bool_and over the fan rows, NOT count == n_hashes: a duplicated
    # probe value (two docs sharing one fingerprint — exactly the dedup
    # pre-filter composition) contributes 2×n_hashes fan rows, which a
    # count comparison would read as "not all set" — a false negative.
    # bool_and is invariant under row multiplicity and under two hash
    # functions colliding on one position.
    return (
        joined.withColumn("_hit", hit)
        .groupBy(value_col)
        .agg(F.expr("bool_and(_hit)").alias("maybe_present"))
    )
