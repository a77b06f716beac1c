"""Sequence packing for LLM training-data preparation.

"Concat-and-chunk" packing: documents are concatenated in a
deterministic pseudo-random order and the token stream is cut every
``budget`` tokens into fixed-length training sequences.  This is the
standard pretraining packing scheme (documents may straddle a chunk
boundary); the operator reports, for every document, which training
sequence(s) its tokens land in.

Scale design: a single global running sum would serialize onto one
partition, so packing is SHARDED — each document is hash-assigned to
one of ``n_shards`` independent token streams, and the running sum
(a window) parallelizes across shards.  On a 1000-executor cluster
``n_shards`` is set to a small multiple of the executor count; each
shard's stream is packed independently and shards are written as
separate output groups.  Within a shard the order is ``md5(salt:id)``
— a deterministic global shuffle, so re-running the pipeline (or
re-packing after an append) keeps every existing document's position
reproducible.

Everything is exact integer arithmetic over JVM column expressions
(no UDFs): token counts via ``regexp_count``, offsets via a windowed
sum, chunk ids via integer floor division — all of it reproducible
bit-for-bit in ANSI SQL for the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .text import BPE_ISH_PATTERN

#: 60 bits of md5 — fits a signed long, same convention as sampling.py
_HASH_HEX = 15


def _shuffle_key(id_col, salt: str):
    return F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string")))


def pack_chunks(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Output per document: ``shard`` (which independent stream), ``offset``
    (token position where the document starts within its shard's
    stream), ``n_tokens``, ``first_seq``/``last_seq`` (the budget-sized
    training sequences the document's tokens fall into) and ``n_seqs``
    (how many sequences it straddles).
    """
    key = _shuffle_key(F.col(id_col), salt)
    shard = (
        F.conv(F.substring(key, 1, _HASH_HEX), 16, 10).cast("long") % n_shards
    ).alias("shard")
    n_tok = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("long")
    staged = df.select(
        F.col(id_col),
        shard,
        n_tok.alias("n_tokens"),
        _shuffle_key(F.col(id_col), salt + ":ord").alias("_ord"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        staged.withColumn("offset", offset)
        .withColumn("first_seq", F.expr(f"offset div {budget}"))
        .withColumn(
            "last_seq",
            F.expr(f"(offset + greatest(n_tokens - 1, 0L)) div {budget}"),
        )
        .withColumn("n_seqs", F.col("last_seq") - F.col("first_seq") + 1)
        .drop("_ord")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    windows of ``chunk_tokens`` whitespace tokens, stepping ``stride``
    tokens (default = no overlap).  The context-window preparation step
    that precedes embedding/packing in an LLM data pipeline.

    Output: one row per ``(doc, chunk_id)`` with ``chunk_text`` and its
    ``n_tokens``.  Purely per-row array work (split → slice per start
    offset → posexplode) — fuses with the scan, no shuffle, trivially
    parallel at any corpus size.  Chunk count per doc is
    ``1 + ceil((n - chunk)/stride)`` so the tail tokens always land in a
    final (possibly short) chunk.
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    )
    n = F.size("_toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride) + 1
    ).cast("int")
    chunks = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(F.col("_toks"), i * stride + 1, chunk_tokens),
            )
        ).alias("chunk_id", "_chunk"),
    )
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )
