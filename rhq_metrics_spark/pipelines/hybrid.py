"""Hybrid retrieval: fuse per-mode rankings with Reciprocal Rank Fusion.

Modern corpus search runs a lexical ranker (BM25, pipelines/text.py)
and a vector ranker (cosine/ANN, pipelines/similarity.py) side by side
and merges them; RRF (Cormack et al., SIGIR'09) is the standard
training-free merge: ``score(d) = Σ_modes 1/(k + rank_mode(d))``.

Determinism contract: the fused score is built by a full-outer join of
the mode rank columns and a FIXED-ORDER sum (sorted mode name), each
term ``1.0/(k + rank)`` a single correctly-rounded IEEE op over exact
integers — bit-identical across engines, no unordered float SUM.

Scale shape: each mode contributes its own top-N candidates, so the
fusion input is bounded by Σ mode-N per query — a broadcast-size frame
regardless of corpus size; the final per-query rank window orders that
bounded candidate set, never the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["rrf_fuse"]


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    query_cols: Sequence[str] = (),
    rrf_k: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Fuse per-mode rankings into one RRF-ordered list.

    ``rankings`` maps a mode name to a frame with ``query_cols...,
    id_col, rank_col`` (1-based rank within that mode, already truncated
    to the mode's candidate depth).  Output: ``(query_cols..., id_col,
    <mode>_rank...  , rrf_score, rank)``; a document absent from a mode
    contributes 0 to the score and carries a null ``<mode>_rank``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one mode")
    modes = sorted(rankings)
    keys = [*query_cols, id_col]
    fused: DataFrame | None = None
    for m in modes:
        r = rankings[m].select(*keys, F.col(rank_col).alias(f"{m}_rank"))
        fused = r if fused is None else fused.join(r, keys, "full_outer")
    score = None
    for m in modes:
        term = F.coalesce(
            1.0 / (F.lit(rrf_k) + F.col(f"{m}_rank")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy(*query_cols).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    out = fused.withColumn("rrf_score", score).withColumn(
        "rank", F.row_number().over(w)
    )
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out
