"""Embedding-column transforms for training-data pipelines: random-
projection dimensionality reduction and int8 quantization.

Both are engine-portable by construction (the repo's oracle convention):
embeddings are fixed-point quantized (``floor(v * 2^20)`` — exact for
float32 input), projection weights are md5-derived int64, and every
floating step is a single correctly-rounded IEEE operation — so outputs
are bit-identical between Spark and a SQL oracle.

Both emit FLAT rows (one per vector component), not arrays: flat longs
hash-compare across engines without array-serialization hazards, and
downstream consumers (a feature store, a quantized index builder)
re-assemble with one ``groupBy(id)`` when they need vectors back.

Scale shape: reduction is one Arrow-batched matmul against a broadcast
(out_dim × dim) weight matrix — no shuffle until the caller aggregates;
quantization is pure per-row column expressions fused with the scan.

Reference parity: the reference has no embedding ops (it is a metrics
engine); these extend the engine for LLM-corpus work per SURVEY.md §6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rhq_metrics_spark.localrel import local_df

from rhq_metrics_spark.pipelines.similarity import (
    EMB_SCALE,
    _vec_matrix,
    md5_plane_weights,
)

#: semantic_dedup snapshots its (id, fixed-point vector, norm, cluster)
#: working set when the INPUT's estimated size reaches this, so the
#: three downstream references stop re-running the clustering; smaller
#: corpora skip the materialization (recompute is cheaper — measured).
#: Same dial class as the session's 64 MB broadcast threshold.
SEMDD_SNAPSHOT_BYTES = 64 * 1024 * 1024


def rp_reduce(
    df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-projection (Johnson–Lindenstrauss) reduction to
    ``out_dim`` integer components: ``y[p] = Σ_d floor(v[d]*2^20) *
    w[p,d]`` with md5-derived int64 weights (``similarity.
    md5_plane_weights``, table 0).  Exact int64 arithmetic end-to-end:
    |term| ≤ 2^21 · 2^28 = 2^49, so dim ≤ 4096 stays far inside int64.

    One pandas UDF does the whole (batch × dim) @ (dim × out_dim)
    matmul per Arrow batch; per-component scalar expressions would
    build out_dim × dim Catalyst nodes instead.  Output: one row per
    ``(id, dim_idx)`` with the int64 ``component``.
    """
    cache: dict[int, np.ndarray] = {}

    @F.pandas_udf("array<long>")
    def _project(vecs: pd.Series) -> pd.Series:
        mat = _vec_matrix(vecs)
        dim = mat.shape[1]
        if dim not in cache:
            cache[dim] = md5_plane_weights(1, out_dim, dim, seed)[0]
        ints = np.floor(mat * EMB_SCALE).astype(np.int64)
        return pd.Series(list(ints @ cache[dim].T))

    reduced = df.select(
        F.col(id_col), _project(F.col(vec_col)).alias("_y")
    )
    return reduced.select(
        id_col, F.posexplode("_y").alias("dim_idx", "component")
    ).select(id_col, F.col("dim_idx").cast("long"), "component")


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q[d] = floor(xi[d] *
    127.0 / maxabs)`` over the fixed-point components ``xi = floor(v *
    2^20)``; ``maxabs`` is the vector's largest |xi| (the scale, emitted
    so a consumer can dequantize).  ``xi * 127`` ≤ 2^28 is exactly
    representable, the division is one correctly-rounded IEEE op, and
    ``floor`` is exact — bit-identical across engines.

    All-JVM column expressions (``transform``/``aggregate`` inside
    codegen), zero shuffles — fuses with the scan.  ``maxabs`` is
    projected to a concrete column BEFORE the per-element lambda uses
    it: referencing the unbound aggregate expression inside
    ``transform`` would inline (re-evaluate) the whole reduction per
    element (documented Catalyst trap, see dedup._shingle_df).
    Output: one row per ``(id, dim_idx)`` with ``q`` and ``scale``.
    """
    ints = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * EMB_SCALE)
    )
    base = df.select(F.col(id_col), ints.alias("_xi"))
    base = base.withColumn(
        "_maxabs",
        F.aggregate(
            "_xi", F.lit(0).cast("long"), lambda a, x: F.greatest(a, F.abs(x))
        ),
    )
    q = F.transform(
        F.col("_xi"),
        lambda x: F.when(F.col("_maxabs") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x * F.lit(127.0) / F.col("_maxabs"))
        ),
    )
    return (
        base.withColumn("_q", q)
        .select(id_col, F.col("_maxabs").alias("scale"), F.posexplode("_q").alias("dim_idx", "q"))
        .select(id_col, F.col("dim_idx").cast("long"), "q", "scale")
    )


def synthetic_clustered_embeddings(
    spark,
    n: int = 8000,
    dim: int = 64,
    n_clusters: int = 64,
    sigma: float = 0.1,
    seed: int = 7,
) -> DataFrame:
    """Deterministic mixture-of-Gaussians embedding corpus — the
    clusterable fixture IVF needs to demonstrate its partial-probe
    contract (on uniform random vectors NO coarse quantizer can beat a
    full probe: there is no cluster structure to exploit, which is why
    the uniform-corpus KPI reports probe_for_r90 == n_cells).

    Cluster c's centroid is a random unit vector; members are centroid +
    N(0, sigma^2) per dim.  At dim=64/sigma=0.1, within-cluster cosine
    ~0.6 vs ~0 across clusters — separated, so a trained coarse
    quantizer recovers the mixture and few probes suffice.  Vectors are
    generated driver-side with one seeded RandomState (a fixture, not a
    data path: n*dim doubles, megabytes) and parallelized; schema
    matches the embeddings table (vec_id, embedding, label=true
    cluster)."""
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_clusters, dim)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = np.arange(n) % n_clusters
    vecs = cents[labels] + sigma * rng.randn(n, dim)
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i]))
        for i in range(n)
    ]
    # Partition count sized to the DATA (≈2k vectors / ~1 MiB per
    # partition at dim=64), capped at defaultParallelism — not pinned to
    # the core count: a driver-bounded fixture (megabytes) split 32 ways
    # yields ~128 KiB tasks whose cost is pure scheduling plus a
    # 32-wide Python-worker fork wave inside every downstream
    # Arrow-UDF stage (measured: the fork queue + handshake was the
    # whole cost of the clustered partial-probe KPI).  At corpus scale
    # the same formula saturates the cluster (guide §2.5/§6: size
    # partitions to bytes, not cores).
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 2048))
    return local_df(
        spark, rows, "vec_id long, embedding array<float>, label int"
    ).repartition(n_parts)


_SM64_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 — a counter-based PRNG: the
    value depends only on the input counter, never on call order or
    partitioning, which is what makes distributed generation
    deterministic."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _SM64_MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _SM64_MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _SM64_MASK
    return x ^ (x >> np.uint64(31))


def synthetic_clustered_embeddings_distributed(
    spark,
    n: int,
    dim: int = 64,
    n_clusters: int = 64,
    sigma: float = 0.1,
    seed: int = 7,
) -> DataFrame:
    """Distributed twin of :func:`synthetic_clustered_embeddings` for
    corpus sizes the driver can't hold: ``spark.range(n)`` →
    ``mapInPandas``, with per-cell noise from counter-based splitmix64
    keyed on ``(seed, vec_id, dim_index)`` — identical vectors for the
    same ids under ANY partitioning, so fixtures are reproducible at
    millions of rows.  Noise is Box-Muller over two independent
    counter streams; centroids come from one small driver-side seeded
    RandomState (n_clusters × dim, broadcast via closure)."""
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_clusters, dim)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            labels = (ids % np.uint64(n_clusters)).astype(np.int64)
            # counters: (seed stream, id, j) flattened
            base = ids[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)[None, :]
            u1 = _splitmix64(base + np.uint64(seed) * np.uint64(0x10000000000)).astype(np.float64)
            u2 = _splitmix64(base + np.uint64(seed) * np.uint64(0x10000000000) + np.uint64(0x8000000000000000)).astype(np.float64)
            u1 = (u1 + 1.0) / 18446744073709551616.0  # (0, 1]
            u2 = u2 / 18446744073709551616.0          # [0, 1)
            gauss = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
            vecs = cents[labels] + sigma * gauss
            yield pd.DataFrame({
                "vec_id": ids.astype(np.int64),
                "embedding": [row.astype(np.float32) for row in vecs],
                "label": labels.astype(np.int32),
            })

    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_gen, "vec_id long, embedding array<float>, label int")
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic fixed-point Lloyd k-means over an embedding column
    — the cluster primitive behind cluster-balanced curation and
    SemDeDup-style semantic dedup (cluster first, dedup within
    clusters), engine-portable by construction.

    Everything is exact int64 arithmetic so a SQL oracle reproduces it
    bit-for-bit: components are fixed-point ``floor(v * 2^20)`` (exact
    for float32 input) OFFSET by ``+2^20`` so every value is
    non-negative — squared L2 distances are invariant to a constant
    per-component offset, and keeping operands non-negative makes
    integer division identical across engines (no trunc-vs-floor
    divergence on negatives).  Init is the k lowest-id vectors (a
    deterministic seed, not k-means++ — curation pipelines re-run
    nightly and need reproducible cluster ids); each Lloyd iteration
    recomputes centroids as the element-wise integer mean of members;
    ties in assignment break to the lowest centroid id.

    Scale shape at 100 TB: assignment is a broadcast of k centroids +
    one nested higher-order-function expression per row (argmin over k
    of a zip_with dot — zero shuffle, whole-stage fused with the scan);
    the centroid update is one posexplode + hash-agg on (cluster, pos)
    whose map-side partials collapse to k x dim rows per task, so the
    shuffle is tiny no matter the corpus.  Nothing collects vectors to
    the driver.

    Output: ``(id, cluster, dist2)`` — final assignment and squared
    fixed-point distance to the final centroid.
    """
    scale = EMB_SCALE
    spark = df.sparkSession
    q = df.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(floor(x * cast({scale} as double)) as bigint)"
            f" + {scale}L)"
        ).alias("_v"),
    )

    # For iters >= 2, centroids MATERIALIZE driver-side between
    # iterations (r16 opt, guide §5: the k × dim int64 table is
    # bounded — k centroids, not data).  The fully-lazy formulation
    # nested each iteration's centroid aggregation inside the next
    # assignment's broadcast subtree, so every broadcast build
    # re-executed ALL prior iterations' corpus passes — iteration cost
    # grew quadratically and an `iters=2, m=8` PQ training re-scanned
    # the corpus dozens of times.  Collecting the k exact-int centroid
    # rows per iteration keeps one corpus pass per Lloyd step (the
    # algorithmic minimum) and the local relation broadcasts without
    # a job.  For iters <= 1 the nesting depth is trivially bounded,
    # and the LAZY form wins instead: the whole train+encode evaluates
    # inside ONE action, so independent instances (the m per-subspace
    # trainings of pq_train_encode) run their passes CONCURRENTLY as
    # broadcast subqueries rather than as 2m serialized driver jobs —
    # the eager form measured 5× slower on the one-shot bench query
    # (embed_pq_codes 0.44 → 2.29 s).  Both forms share the identical
    # exact-int64 arithmetic (the driver _cents_row replays
    # sort_array(collect_list(...)) ordering), so assignments and
    # dist2 are bit-identical either way (oracle-pinned;
    # test_kmeans_eager_matches_lazy pins the form equivalence).
    def _cents_row(rows) -> DataFrame:
        data = [
            (
                [
                    (int(r["cid"]), [int(x) for x in r["cv"]])
                    for r in sorted(rows, key=lambda r: r["cid"])
                ],
            )
        ]
        return local_df(
            spark, data, "_cents: array<struct<cid: int, cv: array<bigint>>>"
        )

    def _assign(cents_row: DataFrame) -> DataFrame:
        # argmin over k: struct ordering is (d2, cid) lexicographic, so
        # array_min computes each dot once AND breaks ties to lowest cid
        return q.crossJoin(F.broadcast(cents_row)).select(
            "_id",
            "_v",
            F.expr(
                "array_min(transform(_cents, c -> struct("
                " aggregate(zip_with(_v, c.cv, (a, b) -> (a - b) * (a - b)),"
                "           0L, (s, x) -> s + x) as d2,"
                " c.cid as cid)))"
            ).alias("_best"),
        )

    def _one_row_cents(cdf: DataFrame) -> DataFrame:
        return cdf.agg(
            F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("_cents")
        )

    def _update(assigned: DataFrame) -> DataFrame:
        # element-wise integer mean per cluster; operands non-negative,
        # so `div` is floor division in every engine
        upd = (
            assigned.select(
                F.col("_best.cid").alias("cid"),
                F.posexplode("_v").alias("pos", "val"),
            )
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        return upd.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s div n as c))),"
                " p -> p.c)"
            ).alias("cv")
        )

    init_plan = (
        q.orderBy("_id")
        .limit(k)
        .select(
            (
                F.row_number().over(Window.orderBy("_id")) - F.lit(1)
            ).alias("cid"),
            F.col("_v").alias("cv"),
        )
    )
    if iters <= 1:
        assigned = _assign(_one_row_cents(init_plan))
        for _ in range(iters):
            assigned = _assign(_one_row_cents(_update(assigned)))
    else:
        assigned = _assign(_cents_row(init_plan.collect()))
        for _ in range(iters):
            assigned = _assign(_cents_row(_update(assigned).collect()))
    return assigned.select(
        F.col("_id").alias(id_col),
        F.col("_best.cid").alias("cluster"),
        F.col("_best.d2").alias("dist2"),
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication [Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"]: cluster the corpus (:func:`kmeans_assign`), then
    WITHIN each cluster drop every document that has a cosine-near
    neighbor with a smaller id — the kept set is exactly the documents
    with no smaller near-duplicate cluster-mate (the paper's
    keep-one-per-near-dup-group rule with lowest-id as the
    deterministic representative).

    Output: ``(id, cluster, is_kept, dup_of)`` — ``dup_of`` the
    smallest qualifying cluster-mate (NULL when kept).

    Exact cross-engine arithmetic: components in SIGNED fixed point
    ``floor(v * 2^20)`` (exact for float32 input), integer dot products
    and norms (dim 64 × (2^20)² = 2^46, no overflow), and the cosine
    test as ``dot > 0 AND dot² ≥ t²·‖a‖²·‖b‖²`` evaluated in double
    AFTER the exact integer dots (each int ≤ 2^46 converts to double
    exactly; the multiplications round identically under IEEE in any
    engine, left-associated the same way in the SQL oracle).

    100 TB shape: this is the standard SemDeDup cost model — the
    all-pairs work is confined to clusters, so ``k`` is the dial (the
    paper uses k ≈ √n; the within-cluster self-join shuffles on the
    cluster key and never crosses clusters).  Skewed giant clusters
    are visible in ``kmeans_assign``'s output before committing to the
    pair stage."""
    assigned = kmeans_assign(df, k=k, iters=iters, id_col=id_col,
                             vec_col=vec_col)
    q = df.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(floor(cast(x as double) * {EMB_SCALE}.0d) as bigint))"
        ).alias("_w"),
    ).withColumn(
        "_n",
        F.expr("aggregate(zip_with(_w, _w, (a, b) -> a * b),"
               " 0L, (s, x) -> s + x)"),
    )
    # ``side`` is referenced three times below (both legs of the
    # within-cluster self-join and the final keep/drop projection);
    # without a materialization each reference re-executes the ENTIRE
    # clustering pipeline (kmeans centroid aggregation + assignment +
    # fixed-point re-encode) — three k-means runs per call.  Snapshot
    # it when the corpus is big enough that recomputing dominates the
    # materialization (the 100 TB shape); below the threshold the
    # fused recompute is measurably cheaper than writing and re-reading
    # blocks (A/B at 2k vectors: 0.9-1.2 s vs 1.4-1.6 s per call).
    # Driver-side size estimate from catalog/file statistics — no job.
    side = q.join(
        assigned.select(F.col(id_col).alias("_id"), "cluster"), "_id"
    )
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # noqa: BLE001 — stats are advisory; default big
        est = 1 << 62
    if est >= SEMDD_SNAPSHOT_BYTES:
        # eager localCheckpoint, not persist: no cache-registry entry
        # to leak or serve stale on a later call over a grown source
        side = side.localCheckpoint(eager=True)
    t2 = repr(threshold * threshold)
    dup = (
        side.alias("a")
        .join(side.alias("b"),
              (F.col("a.cluster") == F.col("b.cluster"))
              & (F.col("b._id") < F.col("a._id")))
        .select(
            F.col("a._id").alias("_id"),
            F.col("b._id").alias("_other"),
            F.expr("aggregate(zip_with(a._w, b._w, (x, y) -> x * y),"
                   " 0L, (s, x) -> s + x)").alias("_dot"),
            F.col("a._n").alias("_na"), F.col("b._n").alias("_nb"),
        )
        .where(
            f"_dot > 0 AND cast(_dot as double) * cast(_dot as double)"
            f" >= {t2}d * cast(_na as double) * cast(_nb as double)"
        )
        .groupBy("_id")
        .agg(F.min("_other").alias("dup_of"))
    )
    return (
        side.select("_id", "cluster")
        .join(dup, "_id", "left")
        .select(
            F.col("_id").alias(id_col), "cluster",
            F.col("dup_of").isNull().alias("is_kept"), "dup_of",
        )
    )
