"""Similarity search over an embedding column (``array<float>``).

- **cosine_topk** — exact brute-force top-k: broadcast the (small)
  query set against the corpus, compute cosine JVM-side
  (``zip_with`` + ``aggregate`` stay inside codegen), rank with one
  window.  At 100 TB the corpus side stays partition-parallel and the
  query side is a broadcast — no corpus shuffle at all; the final
  top-k is a per-query partial (map-side) top-k under AQE.
- **lsh_cosine_topk** — the scale path: random-hyperplane LSH.  Each
  vector gets a ``num_planes``-bit sign signature from deterministic
  (seeded) hyperplanes; candidates share a signature bucket in at
  least one of ``tables`` tables; exact cosine re-ranks candidates.
  Recall is tunable via tables × planes; the bucket join replaces the
  N×Q cross product.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import types as _T

from rhq_metrics_spark.localrel import local_df

#: fixed-point scale for integer-exact signature dots: float32 inputs
#: times 2^20 are exactly representable, so ``floor(v * EMB_SCALE)`` is
#: bit-identical in numpy and in any SQL engine reading the same parquet
EMB_SCALE = 1 << 20
#: md5-derived plane weights use the first 7 hex chars -> [0, 16^7)
PLANE_HEX = 7
PLANE_MOD = 16 ** PLANE_HEX


def _as_double(vec_col) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def _l2norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Output: ``(query_id, neighbor_id, cosine, rank)`` — ties broken by
    neighbor id (deterministic).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _l2norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _l2norm(F.col("_qv")))

    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 10_000,
    iters: int = 10,
) -> np.ndarray:
    """Train an IVF coarse quantizer: spherical k-means on a driver-side
    sample (deterministic seed).  The centroid table is tiny (cells ×
    dim) and broadcasts; training cost is independent of corpus size —
    the standard IVF recipe at 100 TB (train on a sample, assign
    distributed)."""
    # the SAMPLE SELECTION must also depend only on corpus CONTENT: a
    # bare limit() takes a partition-layout-dependent subset whenever
    # the corpus exceeds sample_size, so "same quantizer anywhere"
    # would only hold for small corpora.  Order by a content hash
    # before the limit (Catalyst turns orderBy+limit into a
    # TakeOrderedAndProject — per-partition top-K, no global sort) so
    # the selected subset is a deterministic pseudo-random sample; the
    # vector itself tie-breaks hash collisions.  Then sort the
    # collected rows so training order is content-determined too (the
    # maintenance rebuild relies on re-trains being bit-identical).
    sample = np.array(
        sorted(
            tuple(r[0])
            for r in corpus.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col)), F.col(vec_col))
            .limit(sample_size)
            .collect()
        ),
        dtype=np.float64,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = sample / np.clip(norms, 1e-12, None)
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def _assign_cells_np(mat: np.ndarray, centroids: np.ndarray, top: int) -> np.ndarray:
    """Indices of the ``top`` nearest centroids (by dot product) per row
    of ``mat`` — the ONE assignment arithmetic shared by the Arrow UDF
    (corpus side) and the driver path (bounded query batches), so both
    produce bit-identical cells by construction.  Deterministic: sort by
    (-sim, cell index)."""
    top = min(top, len(centroids))
    sims = mat @ centroids.T  # (batch, cells)
    order = np.lexsort(
        (np.arange(sims.shape[1])[None, :].repeat(len(mat), 0), -sims), axis=1
    )
    return order[:, :top].astype(np.int32)


def _cell_assignment_udf(centroids: np.ndarray, top: int):
    """Indices of the ``top`` nearest centroids (by dot product) as an
    array column — one Arrow-batched matmul against the broadcast
    centroid matrix (cells × dim)."""

    @F.pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        mat = _vec_matrix(vecs)
        return pd.Series(list(_assign_cells_np(mat, centroids, top)))

    return _cells


#: query batches at or below this row count resolve their probed cells
#: DRIVER-side (one bounded collect + a numpy matmul — the same
#: arithmetic as the Arrow UDF) instead of paying a full ArrowEvalPython
#: job per serve call; larger/unbounded query frames fall back to the
#: distributed UDF path.  Measured locally: every ArrowEvalPython stage
#: costs ~0.6-0.9 s of fixed wall at local[32] regardless of row count
#: (guide §4 — the JVM↔Python boundary), so a 10-row query batch paid
#: as much as the 8k-row corpus pass.
DRIVER_QUERY_CAP = 4096


def _driver_query_rows(queries: DataFrame, query_id_col: str, vec_col: str):
    """Collect a BOUNDED query batch driver-side as ``(query_id, _qv)``
    rows.  Returns ``(schema, rows)`` or ``None`` when the batch exceeds
    :data:`DRIVER_QUERY_CAP` (caller falls back to the distributed
    Arrow path, which handles unbounded query frames)."""
    q0 = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
    )
    rows = q0.limit(DRIVER_QUERY_CAP + 1).collect()
    if len(rows) > DRIVER_QUERY_CAP:
        return None
    return q0.schema, rows


def _driver_query_cells(
    queries: DataFrame,
    query_id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    top: int,
):
    """Driver-side probed-cell assignment for a BOUNDED query batch.

    Returns ``(schema, rows, cells)`` — the ``(query_id, _qv)`` schema,
    the collected rows, and the per-row ``top`` nearest cells — or
    ``None`` when the batch exceeds :data:`DRIVER_QUERY_CAP` (caller
    falls back to the distributed Arrow path, which handles unbounded
    query frames)."""
    got = _driver_query_rows(queries, query_id_col, vec_col)
    if got is None:
        return None
    schema, rows = got
    if rows:
        mat = np.array([r["_qv"] for r in rows], dtype=np.float64)
        cells = _assign_cells_np(mat, centroids, top)
    else:
        cells = np.empty((0, 0), dtype=np.int32)
    return schema, rows, cells


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest centroid's cell;
    each query probes its ``n_probe`` nearest cells and exact-reranks
    only those candidates.  Scan cost drops to ~n_probe/n_cells of the
    corpus; recall is the n_probe dial.  Same output shape as
    :func:`cosine_topk`."""
    if centroids is None:
        centroids = ivf_train_centroids(corpus, n_cells, vec_col, seed)

    assign1 = _cell_assignment_udf(centroids, 1)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    c = c.select(
        "neighbor_id", "_cv", F.explode(assign1(F.col("_cv"))).alias("_cell")
    )
    # query side: probed cells resolve driver-side for bounded batches
    # (same numpy arithmetic — bit-identical cells) and re-materialize
    # as a LocalRelation, so the broadcast build needs no Python job
    # (r16 opt, guide §4); unbounded query frames keep the Arrow path
    got = _driver_query_cells(queries, query_id_col, vec_col, centroids, n_probe)
    if got is None:
        assignp = _cell_assignment_udf(centroids, n_probe)
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("_qv"),
        ).select(
            "query_id", "_qv", F.explode(assignp(F.col("_qv"))).alias("_cell")
        )
    else:
        schema, rows, cells = got
        q_schema = _T.StructType(
            list(schema.fields) + [_T.StructField("_cell", _T.IntegerType(), False)]
        )
        q = local_df(corpus.sparkSession,
            [
                (r["query_id"], r["_qv"], int(cell))
                for r, crow in zip(rows, cells)
                for cell in crow
            ],
            q_schema,
        )
    cands = c.join(F.broadcast(q), "_cell").drop("_cell")
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    # no pair dedup needed (unlike the LSH multi-table path): each
    # corpus vector lives in exactly ONE cell and a query's probed
    # cells are distinct, so a (query, neighbor) pair matches at most
    # once — and scoring BEFORE any shuffle means only narrow
    # (ids, cosine) rows ever move, not the embedding arrays
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("_cv"), F.col("_qv")) / (_l2norm(F.col("_cv")) * _l2norm(F.col("_qv")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(tables, num_planes, dim))


def lsh_signatures_udf(planes: np.ndarray):
    """All-tables sign-bit signatures as ONE Arrow-vectorized pandas UDF:
    a (batch × dim) @ (dim × planes) matmul per table, bits packed into a
    long per table.  Per-plane scalar column expressions would build
    tables × planes × dim Catalyst nodes — planning/codegen cost grows
    with the index configuration instead of staying O(1)."""
    tables, num_planes, _ = planes.shape
    weights = np.arange(num_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sigs(vecs: pd.Series) -> pd.Series:
        mat = _vec_matrix(vecs)
        sigs = np.empty((len(mat), tables), dtype=np.int64)
        for t in range(tables):
            bits = (mat @ planes[t].T) >= 0
            sigs[:, t] = (bits << weights).sum(axis=1)
        return pd.Series(list(sigs))

    return _sigs


def lsh_signatures_udf_seeded(num_planes: int, tables: int, seed: int):
    """Like :func:`lsh_signatures_udf` but the hyperplanes are derived
    from ``(seed, dim)`` INSIDE the UDF, with dim read off the first
    Arrow batch — avoids the driver-side ``first()`` probe job that a
    pre-built plane matrix needs.  Deterministic: every batch (and every
    executor) regenerates the identical planes from the same seed."""
    weights = np.arange(num_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sigs(vecs: pd.Series) -> pd.Series:
        mat = _vec_matrix(vecs)
        planes = np.random.RandomState(seed).normal(
            size=(tables, num_planes, mat.shape[1])
        )
        sigs = np.empty((len(mat), tables), dtype=np.int64)
        for t in range(tables):
            bits = (mat @ planes[t].T) >= 0
            sigs[:, t] = (bits << weights).sum(axis=1)
        return pd.Series(list(sigs))

    return _sigs


def md5_plane_weights(tables: int, num_planes: int, dim: int, seed: int) -> np.ndarray:
    """Integer hyperplane weights derived from md5 — engine-portable:
    ``w[t,p,d] = 2 * int(md5(f"lsh:{seed}:{t}:{p}:{d}")[:7], 16) - 16^7``
    is reproducible bit-for-bit in DuckDB SQL
    (``2*('0x'||substr(md5(...),1,7))::BIGINT - 268435456``), so sign-LSH
    signatures computed from these planes can be oracle-checked.  The
    weights are i.i.d. symmetric around ~0, which is all random-projection
    LSH needs."""
    w = np.empty((tables, num_planes, dim), dtype=np.int64)
    for t in range(tables):
        for p in range(num_planes):
            for d in range(dim):
                h = hashlib.md5(f"lsh:{seed}:{t}:{p}:{d}".encode()).hexdigest()
                w[t, p, d] = 2 * int(h[:PLANE_HEX], 16) - PLANE_MOD
    return w


#: md5 plane weights are seed-derived CONSTANTS (no input data in the
#: key) — memoizing them only avoids re-hashing tables×planes×dim md5s
#: per Arrow batch / driver call.
_PLANE_CACHE: dict[tuple[int, int, int, int], np.ndarray] = {}


def _cached_plane_weights(
    tables: int, num_planes: int, dim: int, seed: int
) -> np.ndarray:
    key = (tables, num_planes, dim, seed)
    if key not in _PLANE_CACHE:
        _PLANE_CACHE[key] = md5_plane_weights(tables, num_planes, dim, seed)
    return _PLANE_CACHE[key]


def _lsh_sigs_np(
    mat: np.ndarray, num_planes: int, tables: int, seed: int
) -> np.ndarray:
    """The md5-plane sign-LSH signature arithmetic, shared VERBATIM by
    the Arrow UDF and the driver fast path so the two are bit-identical
    by construction (the same discipline as ``_assign_cells_np``)."""
    planes = _cached_plane_weights(tables, num_planes, mat.shape[1], seed)
    weights = np.arange(num_planes, dtype=np.int64)
    ints = np.floor(mat * EMB_SCALE).astype(np.int64)
    sigs = np.empty((len(mat), tables), dtype=np.int64)
    for t in range(tables):
        bits = (ints @ planes[t].T) >= 0
        sigs[:, t] = (bits << weights).sum(axis=1)
    return sigs


def lsh_signatures_udf_md5(num_planes: int, tables: int, seed: int):
    """Sign-LSH signatures with **integer-exact** dots: embeddings are
    fixed-point quantized (``floor(v * 2^20)``, exact for float32 input)
    and planes are md5-derived int64 weights, so the sign of every dot —
    hence every signature bit — is identical in numpy and in a SQL
    oracle, with no float-summation-order hazard.  Max |term| is
    2^21 * 2^28 = 2^49; at dim ≤ 4096 the sum stays far inside int64."""

    @F.pandas_udf("array<long>")
    def _sigs(vecs: pd.Series) -> pd.Series:
        mat = _vec_matrix(vecs)
        return pd.Series(list(_lsh_sigs_np(mat, num_planes, tables, seed)))

    return _sigs


def lsh_plane_sql(tables: int, num_planes: int, dim: int, seed: int) -> str:
    """DuckDB CTE body reproducing :func:`md5_plane_weights` — one row
    per (t, p, d) with the identical int64 weight."""
    return (
        f"SELECT t, p, d, 2*(('0x'||substr(md5('lsh:{seed}:'||CAST(t AS VARCHAR)"
        f"||':'||CAST(p AS VARCHAR)||':'||CAST(d AS VARCHAR)),1,{PLANE_HEX}))::BIGINT)"
        f" - {PLANE_MOD} AS w\n"
        f"      FROM range({tables}) rt(t), range({num_planes}) rp(p), range({dim}) rd(d)"
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    num_planes: int = 8,
    tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    plane_gen: str = "md5",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing + exact
    re-rank of candidates.  Same output shape as :func:`cosine_topk`
    (rank is within retrieved candidates).

    ``plane_gen='md5'`` (default) uses integer-exact md5-derived planes —
    deterministic across engines, so the whole query is SQL-oracle-able;
    ``'seeded'`` keeps the float Gaussian planes."""
    if plane_gen == "md5":
        sigs_udf = lsh_signatures_udf_md5(num_planes, tables, seed)
    else:
        sigs_udf = lsh_signatures_udf_seeded(num_planes, tables, seed)

    def bucketed(df: DataFrame, ident: str, idc: str) -> DataFrame:
        bound = df.select(
            F.col(idc).alias(ident),
            _as_double(F.col(vec_col)).alias(f"_{ident}_v"),
        ).withColumn("_sigs", sigs_udf(F.col(f"_{ident}_v")))
        return bound.select(
            ident,
            f"_{ident}_v",
            F.explode(
                F.transform(
                    F.col("_sigs"),
                    lambda s, i: F.concat(i.cast("string"), F.lit(":"), s.cast("string")),
                )
            ).alias("_bucket"),
        )

    cb = bucketed(corpus, "neighbor_id", id_col)
    # Bounded query batches (the serve shape) compute their signatures
    # DRIVER-side through the same _lsh_sigs_np arithmetic the Arrow UDF
    # runs — bit-identical by construction — and re-materialize as
    # LocalRelations: the query-side ArrowEvalPython stage and its
    # broadcast-build job disappear (the r16/r17 IVF discipline).
    # Unbounded query frames keep the distributed UDF path (100 TB
    # fallback).  Seeded float planes stay on the UDF path: only the
    # md5 planes have the exact-integer contract.
    qb = None
    qvecs = None
    if plane_gen == "md5":
        got = _driver_query_rows(queries, query_id_col, vec_col)
        if got is not None:
            schema, rows = got
            spark = queries.sparkSession
            if rows:
                mat = np.array([r["_qv"] for r in rows], dtype=np.float64)
                sigs = _lsh_sigs_np(mat, num_planes, tables, seed)
                qb_rows = [
                    (r["query_id"], f"{t}:{sigs[i, t]}")
                    for i, r in enumerate(rows)
                    for t in range(tables)
                ]
            else:
                qb_rows = []
            id_type = schema["query_id"].dataType.simpleString()
            qb = local_df(
                spark, qb_rows, f"query_id {id_type}, _bucket string"
            )
            qvecs = local_df(spark, [tuple(r) for r in rows], schema)
    if qb is None:
        qb = bucketed(queries, "query_id", query_id_col).drop("_query_id_v")
        qvecs = queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("_qv"),
        )
    # dedup candidate PAIRS on ids only — shuffling the embedding arrays
    # through the distinct would move tables× more bytes for nothing
    cands = (
        cb.drop("_neighbor_id_v")
        .join(F.broadcast(qb), "_bucket")
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    scored = (
        cands.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("_cv"), F.col("_qv"))
                / (_l2norm(F.col("_cv")) * _l2norm(F.col("_qv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Persist an IVF index: centroids + the corpus PARTITIONED BY CELL.

    The expensive full-corpus pass (cell assignment, one Arrow matmul
    per batch) runs exactly once at build time; the layout makes every
    later query a *partition-pruned* read — probing 4 of 64 cells scans
    4/64ths of the bytes, which is the entire point of IVF on a 100 TB
    corpus.  Returns the trained centroids."""
    spark = corpus.sparkSession
    centroids = ivf_train_centroids(corpus, n_cells, vec_col, seed)
    assign1 = _cell_assignment_udf(centroids, 1)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("vec")
    )
    c = c.select(
        "vec_id", "vec", F.explode(assign1(F.col("vec"))).alias("cell")
    )
    c.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    local_df(spark,
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def ivf_append(
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF maintenance: assign NEW rows to the existing
    centroids and partition-append them — no re-train, no rewrite of
    the resident cells.

    A training-data pipeline appends embeddings continuously; rebuilding
    the index per batch would re-shuffle the whole corpus.  Appending
    instead costs one Arrow matmul over just the new rows plus a
    partitioned parquet append, and queries see the new vectors on
    their next cell listing (same partition pruning).  The tradeoff is
    drift: centroids trained on yesterday's distribution mis-assign a
    shifted distribution, packing some cells — watch
    :func:`ivf_index_stats` and re-train (``ivf_build_index``) when
    :func:`ivf_retrain_recommended` fires."""
    spark = new_vectors.sparkSession
    centroids = ivf_load_centroids(spark, path)
    assign1 = _cell_assignment_udf(centroids, 1)
    c = new_vectors.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("vec")
    )
    c = c.select(
        "vec_id", "vec", F.explode(assign1(F.col("vec"))).alias("cell")
    )
    c.write.mode("append").partitionBy("cell").parquet(f"{path}/cells")
    spark.catalog.refreshByPath(f"{path}/cells")


def _read_index_component(spark: SparkSession, path: str, comp: str) -> DataFrame:
    """Read a persisted-index component (``cells`` / ``centroids`` /
    ``codebook``), retrying once on a missing path: the two-rename
    publish (:func:`ivf_rebuild`, the store's ``_swap_in`` pattern) has
    an instant where the component is ABSENT — live→trash has happened
    but staging→live has not — so a reader racing maintenance would
    otherwise fail with a path-not-found.  One short-pause retry spans
    the rename window (two ``os.rename`` calls, microseconds); a
    second failure is a genuinely missing index and propagates."""
    import time as _time

    full = f"{path}/{comp}"
    try:
        df = spark.read.parquet(full)
        df.schema  # force resolution so a missing path surfaces HERE
        return df
    except Exception:
        _time.sleep(0.05)
        spark.catalog.refreshByPath(full)
        return spark.read.parquet(full)


def ivf_index_stats(spark: SparkSession, path: str) -> dict:
    """Cell-occupancy profile of a persisted IVF index: one count-agg
    over the cells table (cell is a partition column — the scan reads
    footers, not vectors).  Returns total/occupied/max plus
    ``imbalance`` = max cell count / mean over ALL trained cells (an
    empty cell drags the mean down, which is itself a drift signal)."""
    n_cells = _read_index_component(spark, path, "centroids").count()
    counts = [
        r["count"]
        for r in _read_index_component(spark, path, "cells")
        .groupBy("cell").count().collect()
    ]
    total = sum(counts)
    mean = total / n_cells if n_cells else 0.0
    return {
        "n_cells": int(n_cells),
        "occupied_cells": len(counts),
        "total_vectors": int(total),
        "max_cell": int(max(counts, default=0)),
        "imbalance": (max(counts, default=0) / mean) if mean else 0.0,
    }


def ivf_retrain_recommended(
    stats: dict, max_imbalance: float = 4.0, min_occupancy: float = 0.5
) -> bool:
    """Drift dial for append-maintained indexes: recommend a re-train
    when occupancy skews — the hottest cell holds > ``max_imbalance``×
    its fair share (probing it scans that multiple of the intended
    bytes), or fewer than ``min_occupancy`` of the trained cells hold
    anything (the index has degenerated toward a linear scan of a few
    mega-cells).  Pure arithmetic on :func:`ivf_index_stats` output."""
    if stats["n_cells"] == 0 or stats["total_vectors"] == 0:
        return False
    if stats["imbalance"] > max_imbalance:
        return True
    return stats["occupied_cells"] / stats["n_cells"] < min_occupancy


def ivf_rebuild(
    spark: SparkSession,
    path: str,
    n_cells: int | None = None,
    seed: int = 42,
) -> dict:
    """Re-train + atomically republish a drifted IVF index IN PLACE —
    the consequence the :func:`ivf_retrain_recommended` dial asks for.

    The resident vectors (original build + every :func:`ivf_append`)
    are re-read from the cell layout, fresh centroids train on them,
    and the new index builds into a STAGING dir next to the live one;
    the publish is the store's committed-dir swap (two atomic renames
    per component: live → trash, staging → live — the
    ``sources/store.py _swap_in`` pattern), so a reader racing the
    swap sees either the old or the new index (or, for the instant
    between the two renames, NEITHER — the same caveat ``_swap_in``
    documents; :func:`_read_index_component` spans that window with a
    single short-pause retry, so queries racing maintenance succeed),
    never a half-written mix, and serving never pauses.  Cell ids stay
    ``0..n_cells-1``
    through the swap, so a query that read old centroids against new
    cells (or vice versa, in the instant between renames) still
    returns valid rows — at worst one query's recall dips to
    append-drift level, which is where it already was.

    Cost is one full pass over the RESIDENT index (train on a sample,
    one Arrow matmul assignment, one partitioned write) — the same as
    the original build, which is exactly why it runs from the
    maintenance loop on the drift dial instead of per append.

    Returns the post-rebuild :func:`ivf_index_stats`."""
    import os
    import shutil
    import uuid

    if n_cells is None:
        n_cells = _read_index_component(spark, path, "centroids").count()
    resident = _read_index_component(spark, path, "cells").select("vec_id", "vec")
    staging = f"{path}/_rebuild-{uuid.uuid4().hex}"
    ivf_build_index(
        resident, staging, n_cells=n_cells,
        id_col="vec_id", vec_col="vec", seed=seed,
    )
    for comp in ("cells", "centroids"):
        live = os.path.join(path, comp)
        trash = os.path.join(path, f"_trash-{uuid.uuid4().hex}")
        if os.path.exists(live):
            os.rename(live, trash)
        os.rename(os.path.join(staging, comp), live)
        shutil.rmtree(trash, ignore_errors=True)
        spark.catalog.refreshByPath(live)
    shutil.rmtree(staging, ignore_errors=True)
    return ivf_index_stats(spark, path)


def _delete_kept(spark: SparkSession, path: str, ids: Sequence[int]) -> DataFrame:
    """The surviving cell rows of an :func:`ivf_delete` — mirrors the
    BM25 tombstone discipline (``_drop_tombstoned``): a literal
    ``NOT IN`` beyond ~64 ids costs seconds of Catalyst analysis per
    10k-literal predicate, so large takedown lists broadcast anti-join
    on a driver-bounded LocalRelation id frame instead (VERDICT r16
    item 5; plan-pinned in tests)."""
    resident = _read_index_component(spark, path, "cells")
    if len(ids) <= 64:
        kept = resident.filter(~F.col("vec_id").isin(list(ids)))
    else:
        ids_df = local_df(spark, [(int(i),) for i in ids], "vec_id long")
        kept = resident.join(F.broadcast(ids_df), "vec_id", "left_anti")
    return kept.select("vec_id", "vec", "cell")


def ivf_delete(
    spark: SparkSession, path: str, vec_ids: Sequence[int]
) -> dict:
    """Retraction for a persisted IVF index (VERDICT r15 item 2): drop
    ``vec_ids`` from the cell lists so queries serve as if they were
    never indexed — the takedown/decontamination flow, without waiting
    for a drift-dial rebuild.

    Mechanics: the resident cell table minus the ids (a pushed
    ``NOT IN`` filter up to 64 ids; a broadcast anti-join on a
    LocalRelation id frame beyond that — a 10k-literal predicate costs
    seconds of Catalyst analysis, the ``_drop_tombstoned`` lesson)
    rewrites into a staging dir and republishes via the same
    two-rename committed-dir swap as :func:`ivf_rebuild`; centroids are
    untouched (deletes shift occupancy, not the quantizer — the
    :func:`ivf_retrain_recommended` dial covers accumulated skew, and
    ``occupied_cells`` dropping is exactly one of its inputs).  A
    FULL-probe query after delete is bit-identical to one over an
    index rebuilt without the ids (pytest-pinned: full probe scans all
    candidates, so only membership matters); a partial probe can never
    return a deleted id.  Cost is one cell-table rewrite (vectors are
    spread across cells, so this is index-sized IO) — takedowns are
    rare events; batch them.

    Unlike the BM25 store (whose scoring depends on corpus-wide
    N/Σdl/df, hence its tombstone algebra), an IVF index holds no
    corpus statistics — physical removal is exact by construction.
    """
    ids = sorted({int(i) for i in vec_ids})
    if not ids:
        return ivf_index_stats(spark, path)
    import os
    import shutil
    import uuid

    def _local(p: str) -> str:
        return p[len("file:"):] if p.startswith("file:") else p

    kept = _delete_kept(spark, path, ids)
    staging = f"{path}/_delete-{uuid.uuid4().hex}"
    kept.write.mode("overwrite").partitionBy("cell").parquet(
        f"{staging}/cells"
    )
    wrote_rows = any(
        name.startswith("cell=")
        for name in os.listdir(_local(f"{staging}/cells"))
    )
    if not wrote_rows:
        # every vector deleted: keep the component readable (the BM25
        # zero-postings discipline — a zero-row partitioned write
        # leaves no parquet behind)
        kept.limit(0).write.mode("overwrite").parquet(f"{staging}/cells")
    live = os.path.join(_local(path), "cells")
    trash = os.path.join(_local(path), f"_trash-{uuid.uuid4().hex}")
    if os.path.exists(live):
        os.rename(live, trash)
    os.rename(os.path.join(_local(staging), "cells"), live)
    shutil.rmtree(trash, ignore_errors=True)
    spark.catalog.refreshByPath(live)
    shutil.rmtree(_local(staging), ignore_errors=True)
    return ivf_index_stats(spark, path)


def ivf_seeded_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroid_ids: Sequence[int],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """PARTIAL-probe IVF top-k with a SQL-expressible coarse quantizer
    (VERDICT r15 item 4): centroids are the corpus rows named by
    ``centroid_ids`` (Forgy seeding, zero Lloyd iterations — a crude
    but real quantizer), and BOTH assignment and probing are plain JVM
    column expressions, so the ACTUAL served ranking of a partial
    probe — candidates restricted to the probed cells, the thing the
    full-probe==brute-force identity can never pin — has an exact
    DuckDB twin.  The production partial-probe path stays
    :func:`ivf_query_index` (k-means centroids, persisted cell-pruned
    layout); this operator exists so the cell-restriction semantics
    are themselves oracled, and as the honest fallback quantizer when
    the numpy path is unavailable.

    Determinism: the collected centroid vectors embed as exact double
    literals, every cosine is the sequential ``_dot``/``_l2norm``
    expression tree (the established ``list_dot_product`` twin), and
    ties break (cosine desc, cell asc) via a struct max/sort — no
    numpy matmul anywhere, hence no blocked-summation drift against
    the SQL replay.

    Plan shape at 100 TB: assignment is SCAN-FUSED — an
    ``array_max`` over |centroids| inline cosine structs per corpus
    row, no shuffle, no Python, embedding arrays never enter an
    exchange; probes broadcast (|queries| × n_probe rows); the only
    shuffle is the final rank window over ALREADY-SCORED scalar rows
    (query_id, neighbor_id, cosine) in the probed cells —
    ~n_probe/n_cells of the corpus, the IVF contract.

    Output: ``(query_id, neighbor_id, cosine, rank)``.
    """
    ids = sorted({int(i) for i in centroid_ids})
    if not ids:
        raise ValueError("ivf_seeded_topk: centroid_ids must be non-empty")
    if n_probe < 1:
        raise ValueError(f"ivf_seeded_topk: n_probe must be >= 1: {n_probe}")
    if k < 1:
        raise ValueError(f"ivf_seeded_topk: k must be >= 1: {k}")
    qidc = query_id_col or id_col
    cent_rows = (
        corpus.filter(F.col(id_col).isin(ids))
        .select(
            F.col(id_col).cast("long").alias("cell"),
            _as_double(F.col(vec_col)).alias("v"),
        )
        .collect()
    )
    if len(cent_rows) != len(ids):
        have = sorted(r["cell"] for r in cent_rows)
        raise ValueError(
            f"ivf_seeded_topk: centroid ids missing from corpus: "
            f"{sorted(set(ids) - set(have))}"
        )
    cent_rows.sort(key=lambda r: r["cell"])

    def _cell_structs(vcol: Column) -> Column:
        out = []
        for r in cent_rows:
            ce = F.array(*[F.lit(float(x)) for x in r["v"]])
            cos = _dot(vcol, ce) / (_l2norm(vcol) * _l2norm(ce))
            out.append(
                F.struct(
                    cos.alias("c"),
                    F.lit(-int(r["cell"])).cast("long").alias("nc"),
                    F.lit(int(r["cell"])).cast("long").alias("cell"),
                )
            )
        # struct comparison is lexicographic: max = (cosine desc,
        # then nc desc == cell ASC) — the deterministic argmax
        return F.array(*out)

    c = corpus.select(
        F.col(id_col).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
    )
    assigned = c.withColumn(
        "cell", F.array_max(_cell_structs(F.col("_cv")))["cell"]
    )
    q = queries.select(
        F.col(qidc).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    probes = q.select(
        "query_id",
        "_qv",
        F.explode(
            F.slice(
                F.sort_array(_cell_structs(F.col("_qv")), asc=False),
                1,
                n_probe,
            )
        ).alias("_p"),
    ).select("query_id", "_qv", F.col("_p.cell").alias("cell"))
    cands = assigned.join(F.broadcast(probes), "cell")
    if exclude_self:
        cands = cands.filter(F.col("_cid") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col("_cid").alias("neighbor_id"),
        (
            _dot(F.col("_cv"), F.col("_qv"))
            / (_l2norm(F.col("_cv")) * _l2norm(F.col("_qv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_load_centroids(spark: SparkSession, path: str) -> np.ndarray:
    # driver-side pyarrow read first (r17 opt, guide §5): the centroid
    # table is cells × dim — serving metadata, not data — and reading
    # it through a Spark job cost two scheduling round trips per serve
    # call.  Non-posix stores / unreadable files fall back to the Spark
    # read (same discipline as the BM25 serve metadata).
    from rhq_metrics_spark.pipelines.retrieval import _local_component_rows

    rows = _local_component_rows([f"{path}/centroids"], ["cell", "centroid"])
    if not rows:  # None (non-posix / unreadable) or empty (mid-swap
        # window): the Spark read owns the rename-swap retry
        rows = _read_index_component(spark, path, "centroids").collect()
    rows = sorted(rows, key=lambda r: r["cell"])
    return np.array([r["centroid"] for r in rows])


def ivf_query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k over a persisted IVF index.  The probed cell set (≤
    n_cells values) is resolved driver-side so the cell filter is a
    literal IN-list — Catalyst prunes the unprobed partitions and the
    scan never touches them."""
    centroids = ivf_load_centroids(spark, path)
    # query side: probed cells resolve driver-side for bounded serving
    # batches (same numpy arithmetic as the Arrow UDF — bit-identical
    # cells) and the query frame re-materializes as a LocalRelation —
    # no Python job, no localCheckpoint, no collect job per serve call
    # (r16 opt, guide §4/§5); unbounded query frames keep the Arrow
    # path with its serving-safe eager localCheckpoint
    got = _driver_query_cells(queries, query_id_col, vec_col, centroids, n_probe)
    if got is None:
        assignp = _cell_assignment_udf(centroids, n_probe)
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("_qv"),
        ).select("query_id", "_qv", F.explode(assignp(F.col("_qv"))).alias("cell"))
        # eager localCheckpoint, not persist: this is a SERVING-loop entry
        # point (standing index, repeated query batches) — a cache-registry
        # entry keyed on the analyzed plan would leak per call and serve
        # stale cells after the query source grows
        q = q.localCheckpoint(eager=True)
        # dedup driver-side over the map-only collected rows — the probed
        # set is ≤ n_cells values; a .distinct() here costs a full
        # exchange for a frame this small (r16 opt, guide §2.4)
        probed = sorted({r["cell"] for r in q.select("cell").collect()})
    else:
        schema, rows, cells = got
        q_schema = _T.StructType(
            list(schema.fields) + [_T.StructField("cell", _T.IntegerType(), False)]
        )
        q = local_df(spark,
            [
                (r["query_id"], r["_qv"], int(cell))
                for r, crow in zip(rows, cells)
                for cell in crow
            ],
            q_schema,
        )
        probed = sorted({int(cell) for crow in cells for cell in crow})
    c = (
        _read_index_component(spark, path, "cells")
        .filter(F.col("cell").isin(probed))
        .select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("_cv"), "cell")
    )
    cands = c.join(F.broadcast(q), "cell").drop("cell")
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    # no pair dedup (see ivf_cosine_topk): one cell per corpus vector +
    # distinct probed cells ⇒ each pair matches once; scoring before
    # any shuffle keeps the embedding arrays out of the exchanges
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("_cv"), F.col("_qv"))
            / (_l2norm(F.col("_cv")) * _l2norm(F.col("_qv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    ``k`` MOST similar corpus vectors whose cosine stays BELOW
    ``max_cosine`` — the classic training-pair construction for
    bi-encoder retrieval models (Karpukhin et al. 2020 DPR; Gao et al.
    2021 SimCSE): near-duplicates at/above the ceiling are positives
    or leakage, not negatives, and the most informative negatives are
    the hardest ones just under it.

    Exact brute-force leg (this function): the :func:`cosine_topk`
    scoring subtree with the ceiling filter applied BEFORE the rank
    window, so excluded near-dups never occupy a rank.  At corpus
    scale, compose the same ceiling+rank over an ANN shortlist instead
    (:func:`ivf_query_index` / :func:`lsh_cosine_topk` with k inflated
    by the expected near-dup count) — the filter is a one-line
    post-pass on any candidate frame.

    Output: ``(query_id, neighbor_id, cosine, rank)``, rank 1 = the
    hardest negative; ties broken by neighbor id (deterministic).
    """
    if not 0 < max_cosine <= 1:
        raise ValueError(
            f"hard_negatives: max_cosine out of (0, 1]: {max_cosine}"
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cn", _l2norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
    ).withColumn("_qn", _l2norm(F.col("_qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") < max_cosine)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negatives_from_candidates(
    candidates: DataFrame,
    k: int = 5,
    max_cosine: float = 0.95,
) -> DataFrame:
    """The ceiling+rank post-pass of :func:`hard_negatives` over ANY
    scored candidate frame in the ``(query_id, neighbor_id, cosine)``
    shape — the composition point the brute-force docstring prescribes
    for corpus scale: feed it an ANN shortlist (:func:`ivf_cosine_topk`,
    :func:`ivf_query_index`, :func:`lsh_cosine_topk`) instead of the
    full cross product.  Near-dups at/above the ceiling are filtered
    BEFORE the rank window, so they never occupy a rank; any ``rank``
    column already on the shortlist is discarded and recomputed over
    the surviving rows.

    Cost: one filter + one per-query row_number over shortlist-sized
    input — candidate-linear, corpus-independent."""
    if k < 1:
        raise ValueError(f"hard_negatives_from_candidates: k must be >= 1: {k}")
    if not 0 < max_cosine <= 1:
        raise ValueError(
            f"hard_negatives_from_candidates: max_cosine out of (0, 1]: {max_cosine}"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.select("query_id", "neighbor_id", "cosine")
        .filter(F.col("cosine") < max_cosine)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negatives_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_cosine: float = 0.95,
    shortlist_k: int | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """ANN-composed hard-negative mining (VERDICT r13 item 4): the
    :func:`hard_negatives` ceiling+rank post-pass over an
    :func:`ivf_cosine_topk` shortlist instead of the brute-force cross
    product — the corpus-scale leg.  Per-query scan cost drops to
    ~``n_probe / n_cells`` of the corpus (the IVF contract); recall vs
    the exact leg is the ``n_probe`` dial, pinned in tests.

    ``shortlist_k`` must over-fetch by the expected per-query count of
    above-ceiling near-dups: every neighbor with cosine >= ``max_cosine``
    outranks every admissible negative in the shortlist (cosine sorts
    the shortlist), so with allowance ``a`` the post-pass returns the
    true (within-probe) top-k negatives whenever a query has <= ``a``
    near-dups.  Default ``2*k + 8``.  With ``n_probe == n_cells`` (full
    probe) and enough allowance the output EQUALS the brute-force
    :func:`hard_negatives` — that identity is both the correctness
    oracle and the pytest pin.

    Output: ``(query_id, neighbor_id, cosine, rank)``, same contract as
    the exact leg."""
    if shortlist_k is None:
        shortlist_k = 2 * k + 8
    if shortlist_k < k:
        raise ValueError(
            f"hard_negatives_ann: shortlist_k {shortlist_k} < k {k}"
        )
    shortlist = ivf_cosine_topk(
        corpus,
        queries,
        k=shortlist_k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        n_cells=n_cells,
        n_probe=n_probe,
        seed=seed,
        exclude_self=True,
        centroids=centroids,
    )
    return hard_negatives_from_candidates(shortlist, k=k, max_cosine=max_cosine)


# -- recall measurement & sizing (the target-recall dial) --------------------


def topk_recall(truth: DataFrame, approx: DataFrame) -> float:
    """Mean recall@k of an approximate top-k result against brute-force
    ground truth (both in the ``cosine_topk`` output shape).  One
    semi-join + two tiny aggregates — corpus-size independent given the
    result frames."""
    t = truth.select("query_id", "neighbor_id")
    # ONE driver action: a left join preserves t's cardinality ((query,
    # neighbor) pairs are unique on both sides — row_number output), so
    # denom and hits ride the same aggregate (r16 opt, guide §5)
    a = approx.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    row = (
        t.join(a, ["query_id", "neighbor_id"], "left")
        .agg(F.count(F.lit(1)).alias("denom"), F.count("_hit").alias("hits"))
        .collect()[0]
    )
    return row["hits"] / row["denom"] if row["denom"] else 1.0


def lsh_tables_for_recall(
    target_recall: float, cosine: float, num_planes: int
) -> int:
    """Size the LSH index for a recall target: the smallest number of
    hash tables such that a neighbor at similarity ``cosine`` becomes a
    candidate with probability >= ``target_recall``.

    Random-hyperplane LSH (Charikar, STOC'02): two vectors at angle
    theta agree on one sign bit with probability ``1 - theta/pi``, so a
    ``p``-plane table matches with ``s**p`` and ``T`` independent tables
    with ``1 - (1 - s**p)**T`` — solve for ``T``.  More planes → smaller
    buckets (cheaper join) but more tables for the same recall."""
    if not 0 < target_recall < 1:
        raise ValueError("target_recall must be in (0, 1)")
    if not -1.0 <= cosine <= 1.0:
        raise ValueError("cosine must be in [-1, 1]")
    s = 1.0 - math.acos(cosine) / math.pi
    p_table = s**num_planes
    if p_table >= 1.0:
        return 1
    if p_table <= 0.0:
        raise ValueError("zero table-match probability; reduce num_planes")
    return max(1, math.ceil(math.log1p(-target_recall) / math.log1p(-p_table)))


def ivf_probe_for_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int,
    target_recall: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> tuple[int, float]:
    """Empirically size ``n_probe`` for an IVF index: measure recall@k
    of partial-probe against brute force on the given query sample,
    doubling ``n_probe`` until the target is met (IVF recall depends on
    the data's cell structure, so unlike LSH there is no closed form).
    Returns ``(n_probe, measured_recall)``; run on a bounded query
    sample — cost is one partial-probe search per doubling, ~log2(cells)
    rounds worst case.  Pass pre-trained ``centroids`` to size an
    existing index without re-training."""
    truth = cosine_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    if centroids is None:
        centroids = ivf_train_centroids(corpus, n_cells, vec_col, seed)

    # IVF recall identity (r16 opt, guide §1.2 — don't re-search per
    # doubling): a true top-k neighbor appears in the partial-probe
    # result IFF its cell is among the query's first n_probe cells —
    # any candidate ordered above it (cosine desc, id asc) is itself in
    # the true top-k, so a candidate true-neighbor always ranks ≤ k.
    # Hence every doubling's recall derives from ONE truth search + ONE
    # bounded cell lookup, instead of a full partial-probe search per
    # doubling.  Same (n_probe, recall) as the search loop, bit-exactly;
    # test_ivf_probe_for_recall_matches_search pins the identity.
    got = _driver_query_cells(queries, query_id_col, vec_col, centroids, n_cells)
    if got is not None:
        _schema, qrows, qcells = got
        truth_pairs = [
            (r["query_id"], r["neighbor_id"])
            for r in truth.select("query_id", "neighbor_id").collect()
        ]
        denom = len(truth_pairs)
        n_ids = sorted({n for _, n in truth_pairs})
        nrows = (
            corpus.filter(F.col(id_col).isin(n_ids))
            .select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
            .collect()
        )
        if nrows:
            ncells = _assign_cells_np(
                np.array([r["_v"] for r in nrows], dtype=np.float64), centroids, 1
            )[:, 0]
            cell_of = {r["_id"]: int(c) for r, c in zip(nrows, ncells)}
        else:
            cell_of = {}
        probe_pos = {
            r["query_id"]: {int(c): i for i, c in enumerate(crow)}
            for r, crow in zip(qrows, qcells)
        }
        n_probe, best = 1, 0.0
        while True:
            hits = sum(
                1
                for qid, nid in truth_pairs
                if probe_pos[qid].get(cell_of[nid], n_cells) < n_probe
            )
            best = hits / denom if denom else 1.0
            if best >= target_recall or n_probe >= n_cells:
                return n_probe, best
            n_probe = min(n_cells, n_probe * 2)

    # unbounded query frames: the original search-per-doubling loop
    truth = truth.persist()
    truth.count()
    n_probe, best = 1, 0.0
    try:
        while True:
            approx = ivf_cosine_topk(
                corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
                query_id_col=query_id_col, n_cells=n_cells, n_probe=n_probe,
                seed=seed, centroids=centroids,
            )
            best = topk_recall(truth, approx)
            if best >= target_recall or n_probe >= n_cells:
                return n_probe, best
            n_probe = min(n_cells, n_probe * 2)
    finally:
        truth.unpersist()


def ivf_candidate_fraction(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> float:
    """Fraction of (corpus × queries) pairs an IVF partial probe
    actually scores — the SCALE-relevant cost metric.  At toy corpus
    sizes the probe's fixed overhead (two Arrow assignment passes, a
    join) can exceed a trivial brute scan, so wall-clock comparisons
    there are misleading; the candidate fraction is what divides the
    per-query scan cost at any size (candidates ≈ fraction × corpus).
    Cost: one assignment pass over each side + one tiny aggregate."""
    a1 = _cell_assignment_udf(centroids, 1)
    sizes = (
        corpus.select(_as_double(F.col(vec_col)).alias("_cv"))
        .select(F.explode(a1(F.col("_cv"))).alias("_cell"))
        .groupBy("_cell")
        .agg(F.count(F.lit(1)).alias("_sz"))
    )
    got = _driver_query_cells(queries, query_id_col, vec_col, centroids, n_probe)
    if got is not None:
        # ONE corpus pass: the per-cell histogram is ≤ n_cells rows and
        # every corpus vector lives in exactly one cell, so Σ sizes ==
        # n_corpus — the candidate sum, query count and corpus count all
        # derive from the collected histogram + the driver-assigned
        # query cells (3 jobs → 1, r16 opt, guide §5)
        _schema, qrows, qcells = got
        size_of = {int(r["_cell"]): r["_sz"] for r in sizes.collect()}
        n_corpus = sum(size_of.values())
        n_queries = len(qrows)
        if n_corpus == 0 or n_queries == 0:
            return 0.0
        total = sum(
            size_of.get(int(cell), 0) for crow in qcells for cell in crow
        )
        return float(total) / (n_corpus * n_queries)
    ap = _cell_assignment_udf(centroids, n_probe)
    probed = queries.select(
        F.col(query_id_col).alias("_qid"), _as_double(F.col(vec_col)).alias("_qv")
    ).select("_qid", F.explode(ap(F.col("_qv"))).alias("_cell"))
    total = (
        probed.join(sizes, "_cell")
        .agg(F.sum("_sz").alias("cand"))
        .collect()[0]["cand"]
    ) or 0
    n_corpus = corpus.count()
    n_queries = queries.count()
    if n_corpus == 0 or n_queries == 0:
        return 0.0
    return float(total) / (n_corpus * n_queries)


def _vec_matrix(vecs) -> np.ndarray:
    """Arrow hands an array<float> column to a pandas UDF as a Series of
    numpy arrays; ``np.array(s.tolist())`` re-boxes every element
    through Python (~seconds per million 64-dim rows) where
    ``np.vstack`` over the raw values is one C-speed copy — the
    difference between the assignment pass being free and being the
    pipeline bottleneck at corpus scale."""
    vals = vecs.to_numpy()
    if len(vals) == 0:
        return np.empty((0, 0), dtype=np.float64)
    try:
        return np.vstack(vals).astype(np.float64, copy=False)
    except ValueError:  # ragged / object fallbacks
        return np.array(vecs.tolist(), dtype=np.float64)


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., TPAMI 2011, public): split the
# vector into m subspaces, k-means each subspace independently, store
# only the m one-byte-ish codes per vector; queries score candidates
# with an asymmetric-distance (ADC) table of m x k precomputed
# distances.  Memory per vector drops dim x 4 bytes -> m codes — the
# standard way an embedding index fits 100 TB of vectors in RAM.
# Built on the deterministic fixed-point kmeans (embeddings.py), so
# training + encoding are engine-portable and ORACLE-CHECKABLE.


def pq_train_encode(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks and encode every vector in the same
    pass: vectors split into ``m`` equal slices, each slice assigned by
    the deterministic fixed-point Lloyd kmeans (lowest-id init, exact
    int64 distances, ties to the lowest code).

    Output: ``(id, subspace, code, dist2)`` — ``m`` rows per vector,
    ``dist2`` the exact fixed-point squared L2 to the assigned
    centroid (the per-vector quantization error, summed over
    subspaces, is the PQ reconstruction error to watch).

    100 TB shape: per subspace the kmeans assignment is a broadcast of
    k centroids + one fused argmin expression per row — no shuffle on
    the corpus; the only exchanges are the k x (dim/m)-row centroid
    updates.  Dimension must divide evenly by ``m`` (raise otherwise —
    silent padding would corrupt the codebook)."""
    from rhq_metrics_spark.pipelines.embeddings import kmeans_assign

    dim_row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_row:
        raise ValueError("empty input")
    dim = dim_row[0]["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    parts = []
    for j in range(m):
        sub = df.select(
            F.col(id_col).alias("_pqid"),
            F.slice(F.col(vec_col), j * d + 1, d).alias("embedding"),
        )
        parts.append(
            kmeans_assign(sub, k=k, iters=iters, id_col="_pqid").select(
                F.col("_pqid").alias(id_col),
                F.lit(j).alias("subspace"),
                F.col("cluster").cast("int").alias("code"),
                "dist2",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_codebook(
    df: DataFrame,
    codes: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codebook consistent with :func:`pq_train_encode`'s assignment:
    the element-wise integer mean (fixed-point, non-negative operands
    -> ``div`` floor division everywhere) of each code's members per
    subspace.  Output: ``(subspace, code, cv array<bigint>)`` —
    m x k rows, broadcast-sized."""
    from rhq_metrics_spark.pipelines.embeddings import EMB_SCALE

    probe = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not probe:
        raise ValueError("empty input")
    d = probe[0]["d"] // m
    q = df.select(
        F.col(id_col).alias("_pqid"),
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(floor(x * cast({EMB_SCALE} as double)) as bigint)"
            f" + {EMB_SCALE}L)"
        ).alias("_v"),
    )
    joined = codes.join(
        q, codes[id_col] == q["_pqid"]
    ).select(
        "subspace",
        "code",
        F.expr(f"slice(_v, subspace * {d} + 1, {d})").alias("_sv"),
    )
    upd = (
        joined.select(
            "subspace", "code", F.posexplode("_sv").alias("pos", "val")
        )
        .groupBy("subspace", "code", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return upd.groupBy("subspace", "code").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, s div n as c))),"
            " p -> p.c)"
        ).alias("cv")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k_top: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: each query precomputes its m x k
    distance table against the codebook (fixed-point exact ints), then
    every corpus vector's approximate distance is the SUM of m table
    lookups on its codes — the vectors themselves are never touched.

    Coarse codes blur near-neighbors that share cells, so the
    production shape (Jégou §V) is ADC SHORTLIST → exact re-rank: pass
    the vector table as ``rerank_with`` and the ADC keeps a
    ``shortlist`` (default ``8 × k_top``) per query, re-scored with
    exact fixed-point L2 on shortlist × Q rows only — the corpus is
    still never scanned.

    Output: ``(query_id, id, adist2, rank)`` — ``rank`` 1..k_top per
    query by (adist2, id); with re-rank, ``adist2`` is the EXACT
    fixed-point distance of the surviving rows.

    100 TB shape: the table join broadcasts Q x m x k rows onto the
    codes (one lookup join, no corpus shuffle beyond the (query, id)
    partial-sum agg); the re-rank touches shortlist × Q vectors via a
    semi-join on the id.  Compose with the IVF cells for candidate
    pruning when Q is large."""
    from rhq_metrics_spark.pipelines.embeddings import EMB_SCALE

    probe = queries.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not probe:
        raise ValueError("empty input")
    d = probe[0]["d"] // m
    qv = queries.select(
        F.col(query_id_col),
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(floor(x * cast({EMB_SCALE} as double)) as bigint)"
            f" + {EMB_SCALE}L)"
        ).alias("_qv"),
    )
    table = qv.crossJoin(F.broadcast(codebook)).select(
        query_id_col,
        "subspace",
        "code",
        F.expr(
            f"aggregate(zip_with(slice(_qv, subspace * {d} + 1, {d}), cv,"
            " (a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)"
        ).alias("_d2"),
    )
    scored = (
        codes.join(F.broadcast(table), ["subspace", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_d2").alias("adist2"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adist2").asc(), F.col(id_col).asc()
    )
    if rerank_with is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_top)
        )
    r = shortlist or 8 * k_top
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= r)
        .select(query_id_col, id_col)
    )
    vecs = rerank_with.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(floor(x * cast({EMB_SCALE} as double)) as bigint)"
            f" + {EMB_SCALE}L)"
        ).alias("_cv"),
    )
    # broadcast the bounded shortlist onto the vector table (not the
    # reverse): an unhinted join could shuffle the corpus-sized vector
    # side by id to meet Q × shortlist rows (r16 opt)
    exact = (
        vecs.join(F.broadcast(short), id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.expr(
                "aggregate(zip_with(_qv, _cv, (a, b) -> (a - b) * (a - b)),"
                " 0L, (s, x) -> s + x)"
            ).alias("adist2"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
    )


# ---------------------------------------------------------------------------
# IVF+PQ: the composed 100 TB index layout (FAISS-style, public).  IVF
# prunes WHICH cells are read (partition pruning); PQ shrinks WHAT a
# cell stores (m code ints instead of dim floats, ~x32 here); the ADC
# shortlist re-ranks against the source corpus by id.  Both pieces are
# the deterministic operators above, so the composed index inherits
# their reproducibility.


def ivfpq_build_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist an IVF+PQ index: IVF centroids + per-cell parquet of
    (vec_id, codes) + the PQ codebook.  Codes are PQ over the RAW
    vectors (not cell residuals — residuals go negative and would
    break the fixed-point kmeans' non-negative `div` contract that
    keeps training engine-portable; the exact re-rank recovers the
    accuracy a residual codebook would buy).

    Build cost: the IVF assignment pass + the PQ training/encode pass
    — each one broadcast-argmin over the corpus, no corpus shuffle
    beyond the partitioned write."""
    spark = corpus.sparkSession
    centroids = ivf_train_centroids(corpus, n_cells, vec_col, seed)
    assign1 = _cell_assignment_udf(centroids, 1)
    cells = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("vec")
    ).select("vec_id", "vec", F.explode(assign1(F.col("vec"))).alias("cell"))

    codes = pq_train_encode(
        corpus, m=m, k=k_codes, iters=iters, id_col=id_col, vec_col=vec_col
    )
    packed = codes.groupBy(F.col(id_col).alias("vec_id")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(subspace, code))),"
            " p -> p.code)"
        ).alias("codes")
    )
    (
        cells.select("vec_id", "cell")
        .join(packed, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/cells")
    )
    local_df(spark,
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    # the codebook's (id, subspace, code) rows come from the WRITTEN
    # cells component, not from re-executing the `codes` training
    # chain (r16 opt): the cells write above already ran the m kmeans
    # chains once, and the packed arrays are sorted by subspace so
    # posexplode's position IS the subspace id — identical rows,
    # corpus-scale work paid once instead of twice
    spark.catalog.refreshByPath(f"{path}/cells")
    written = spark.read.parquet(f"{path}/cells").select(
        F.col("vec_id").alias(id_col),
        F.posexplode("codes").alias("subspace", "code"),
    )
    cb = pq_codebook(corpus, written, m=m, id_col=id_col, vec_col=vec_col)
    cb.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")


def ivfpq_query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    n_probe: int = 4,
    shortlist: int | None = None,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k over a persisted IVF+PQ index: probe ``n_probe`` cells
    (literal IN-list — partition pruning, the unprobed bytes are never
    read), ADC-score the probed CODES against each query's m × k
    distance table, keep a ``shortlist`` (default ``8 × k``), and
    re-rank it with exact cosine against the SOURCE corpus by id (a
    shortlist × Q join — the raw vectors are read for those rows only).

    Output matches ``ivf_query_index``: (query_id, neighbor_id,
    cosine, rank).  For unit-normalized vectors the ADC's fixed-point
    L2 is monotone with cosine, so the shortlist ordering is
    metric-consistent."""
    from rhq_metrics_spark.pipelines.embeddings import EMB_SCALE

    centroids = ivf_load_centroids(spark, path)
    dim = len(centroids[0])
    d = dim // m
    # query side: probed cells AND the per-query ADC distance tables
    # resolve DRIVER-side for bounded serving batches (r16/r17 opt,
    # guide §4/§5): the same numpy arithmetic as the Arrow UDF for the
    # cells (bit-identical by construction), and the m × k distance
    # table is exact int64 — sum over d of (a−b)² on the SAME
    # fixed-point values the SQL expression computed, so adist2 is the
    # same integers in a different (commutative) order.  Every bounded
    # frame re-materializes as a true LocalRelation (localrel.local_df),
    # so the scoring job's broadcasts need no jobs at all; the only
    # distributed work per serve call is the probed-cell scan + one
    # window exchange over already-scored scalar rows, then the
    # broadcast re-rank against the source corpus.  Unbounded query
    # frames keep the distributed Arrow path below (the 100 TB
    # fallback).
    got = _driver_query_cells(queries, query_id_col, vec_col, centroids, n_probe)
    if got is not None:
        schema, rows, cells = got
        # one ranking per query_id (ADVICE r16): a query frame carrying
        # duplicate query_id rows would double ADC sums and emit
        # duplicate (query_id, neighbor) rows at distinct ranks — keep
        # the first collected row per id (unique ids with one vector
        # per id is the input contract; this makes duplicates benign)
        uniq_rows, uniq_cells, _seen = [], [], set()
        for r0, crow in zip(rows, cells):
            if r0["query_id"] in _seen:
                continue
            _seen.add(r0["query_id"])
            uniq_rows.append(r0)
            uniq_cells.append(crow)
        qraw = local_df(
            spark,
            [(r0["query_id"], r0["_qv"]) for r0 in uniq_rows],
            _T.StructType(
                [schema.fields[0], _T.StructField("_qraw", schema.fields[1].dataType)]
            ),
        )
        probed = sorted({int(c) for crow in uniq_cells for c in crow})
        # codebook is m × k rows of serving metadata — driver-side
        # pyarrow read with a Spark-collect fallback (mid-swap /
        # non-posix), the ivf_load_centroids discipline
        from rhq_metrics_spark.pipelines.retrieval import _local_component_rows

        cb_rows = _local_component_rows(
            [f"{path}/codebook"], ["subspace", "code", "cv"]
        )
        if not cb_rows:
            cb_rows = _read_index_component(spark, path, "codebook").collect()
        # default=0 keeps the empty-corpus index (zero codebook rows ⇒
        # zero cells rows) from throwing; the scan below is then empty
        max_code = max((int(r0["code"]) for r0 in cb_rows), default=0)
        cb = np.zeros((m, max_code + 1, d), dtype=np.int64)
        for r0 in cb_rows:
            cb[int(r0["subspace"]), int(r0["code"])] = r0["cv"]
        qmat = np.array([r0["_qv"] for r0 in uniq_rows], dtype=np.float64)
        # the SQL fixed-point map, element-exact in numpy:
        # cast(floor(x * double(EMB_SCALE)) as bigint) + EMB_SCALE
        qfx = np.floor(qmat * float(EMB_SCALE)).astype(np.int64) + EMB_SCALE
        # candidates are restricted to EACH query's own probed cells
        # (the IVF contract); the per-subspace distance rows ride the
        # (query, cell) pair so scoring is ONE broadcast join + a
        # zip_with lookup per candidate — no posexplode row blowup, no
        # (subspace, code) join, no per-pair aggregation exchange
        pair_data = []
        for qi, (r0, crow) in enumerate(zip(uniq_rows, uniq_cells)):
            dtab = [
                [
                    int(x)
                    for x in (
                        (qfx[qi, j * d : (j + 1) * d][None, :] - cb[j]) ** 2
                    ).sum(axis=1)
                ]
                for j in range(m)
            ]
            for cell in crow:
                pair_data.append((r0["query_id"], int(cell), dtab))
        q_cells = local_df(
            spark,
            pair_data,
            _T.StructType(
                [
                    qraw.schema.fields[0],
                    _T.StructField("cell", _T.IntegerType(), False),
                    _T.StructField(
                        "_dtab",
                        _T.ArrayType(_T.ArrayType(_T.LongType())),
                        False,
                    ),
                ]
            ),
        )
        scored = (
            _read_index_component(spark, path, "cells")
            .filter(F.col("cell").isin(probed))
            .join(F.broadcast(q_cells), "cell")
            .select(
                "query_id",
                "vec_id",
                F.expr(
                    "aggregate(zip_with(codes, _dtab,"
                    " (c, t) -> element_at(t, c + 1)), 0L, (s, x) -> s + x)"
                ).alias("adist2"),
            )
        )
    else:
        # distributed fallback for unbounded query frames: the Arrow
        # assignment UDF, a DISTRIBUTED (query_id, cell) frame (only
        # the ≤ n_cells distinct probed cells collect for the IN-list —
        # a Q × n_probe pair collect would not degrade gracefully,
        # ADVICE r16), and the distributed ADC-table formulation
        assignp = _cell_assignment_udf(centroids, n_probe)
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("_qraw"),
        ).select(
            "query_id",
            "_qraw",
            F.posexplode(assignp(F.col("_qraw"))).alias("_pos", "cell"),
        ).localCheckpoint(eager=True)
        # one ranking per query_id here too (ADVICE r16)
        qraw = (
            q.filter(F.col("_pos") == 0)
            .select("query_id", "_qraw")
            .dropDuplicates(["query_id"])
        )
        q_cells = q.select("query_id", "cell").dropDuplicates()
        probed = sorted(
            r0["cell"] for r0 in q.select("cell").distinct().collect()
        )
        codes_long = (
            _read_index_component(spark, path, "cells")
            .filter(F.col("cell").isin(probed))
            .select(
                "vec_id", "cell", F.posexplode("codes").alias("subspace", "code")
            )
            .join(F.broadcast(q_cells), "cell")
            .drop("cell")
        )
        codebook = _read_index_component(spark, path, "codebook")
        qv = qraw.select(
            "query_id",
            F.expr(
                f"transform(_qraw,"
                f" x -> cast(floor(x * cast({EMB_SCALE} as double)) as bigint)"
                f" + {EMB_SCALE}L)"
            ).alias("_qv"),
        )
        table = qv.crossJoin(F.broadcast(codebook)).select(
            "query_id",
            "subspace",
            "code",
            F.expr(
                f"aggregate(zip_with(slice(_qv, subspace * {d} + 1, {d}), cv,"
                " (a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)"
            ).alias("_d2"),
        )
        scored = (
            codes_long.join(F.broadcast(table), ["query_id", "subspace", "code"])
            .groupBy("query_id", "vec_id")
            .agg(F.sum("_d2").alias("adist2"))
        )
    if exclude_self:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    r = shortlist or 8 * k
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adist2").asc(), F.col("vec_id").asc()
    )
    short = (
        scored.withColumn("_r", F.row_number().over(w_short))
        .filter(F.col("_r") <= r)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    )
    # broadcast the SHORTLIST onto the corpus, never the reverse: the
    # short side is bounded (Q × shortlist ids) while the corpus is
    # the 100 TB table — an unhinted join here could shuffle the whole
    # corpus by id to meet a few hundred shortlist rows (r16 opt)
    exact = (
        vecs.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qraw), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("_cv"), F.col("_qraw"))
                / (_l2norm(F.col("_cv")) * _l2norm(F.col("_qraw")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    out = (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
    return out
