#!/usr/bin/env python3
"""×100 scale checkpoint (VERDICT r10 item 5): run the most expensive
operator families one decade HIGHER than the bench's sf0.1, and report
the ×100 wall-clock ratio vs their sf0.01 reading on fixed local[32]
cores.

No sf1 testdata exists and the DuckDB tpch generator needs network, so
the decade-up inputs are built here by CONTENT-PRESERVING replication
of sf0.1 (written once to /tmp/sfx1, reused across runs):

- documents ×10 — replica k prefixes every token with ``r<k>`` (word
  relabeling: Jaccard/SimHash/window-fingerprint structure WITHIN a
  replica is bit-identical to the original; ACROSS replicas nothing
  matches, because every token differs).  Total dup mass scales ×10
  with zero artificial cross-replica clusters — the same dup-rate per
  doc the generator itself would produce.
- events ×10 — replica k offsets event_id/user_id and suffixes
  event_type with ``_r<k>``: ×10 points across ×10 series at the same
  per-series density (the dimension that actually grows in a fleet).
- lineitem/orders ×10 — replica k offsets the orderkey past the sf0.1
  max; dims (part/supplier/customer/nation/region) stay fixed, so the
  fact:dim ratio grows exactly as TPC-H's own SF dial grows it for the
  join-heavy q9/q21 shapes.
- FFD pack_bins — synthetic (id, n_tokens) at 10M docs, the r10 smoke
  one decade up (pipelines/packing.py shards by md5, so doc count is
  the only dial that matters).

Usage: python tools/r11_scale_x100.py [--rebuild]   (run QUIET)
Prints one JSON line:
  {query: {"sf0.01": s, "sf0.1": s, "sfx1": s, "x10": r, "x100": r}}
where x100 = sfx1 / sf0.01 — the two-decade wall-clock growth on
fixed cores (100 = linear; well under 100 = headroom).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

SFX_DIR = "/tmp/sfx1"
FACTOR = 10
QUERIES = [
    "dedup_simhash",
    "dedup_minhash_lsh",
    "text_substr_self_dedup",
    "b11_rollup_serving",
    "tpch_q9",
    "tpch_q21",
]
PACK_DOCS = 10_000_000


def build_sfx(spark) -> None:
    """Materialize the decade-up tables into SFX_DIR (idempotent)."""
    src = "/root/testdata/sf0.1"
    dst = Path(SFX_DIR)
    if (dst / "_built").exists():
        return
    shutil.rmtree(dst, ignore_errors=True)
    dst.mkdir(parents=True)

    reps = spark.range(FACTOR).select(F.col("id").cast("int").alias("rep"))

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.count()
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * n_docs).alias("doc_id"),
            # replica 0 keeps the original text; k>0 prefixes every
            # token with r<k> — word relabeling, structure-preserving
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"), r"(\S+)",
                    F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("$1")),
                )
            )
            .alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SFX_DIR}/documents.parquet")
    )

    ev = spark.read.parquet(f"{src}/events.parquet")
    n_ev = ev.count()
    n_users = 1 + (ev.agg(F.max("user_id")).collect()[0][0] or 0)
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("rep").cast("long") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep").cast("long") * n_users).alias("user_id"),
            F.concat(
                F.col("event_type"), F.lit("_r"), F.col("rep").cast("string")
            ).alias("event_type"),
            "value", "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SFX_DIR}/events.parquet")
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    okey_span = 1 + (li.agg(F.max("l_orderkey")).collect()[0][0] or 0)
    (
        li.crossJoin(F.broadcast(reps))
        .select(
            (F.col("l_orderkey") + F.col("rep").cast("long") * okey_span).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SFX_DIR}/lineitem.parquet")
    )
    od = spark.read.parquet(f"{src}/orders.parquet")
    (
        od.crossJoin(F.broadcast(reps))
        .select(
            (F.col("o_orderkey") + F.col("rep").cast("long") * okey_span).alias("o_orderkey"),
            *[c for c in od.columns if c != "o_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SFX_DIR}/orders.parquet")
    )

    # dims copied verbatim — fact:dim ratio grows, like TPC-H's SF dial
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SFX_DIR}/{t}.parquet"
        )
    (dst / "_built").touch()


def time_query(qs, spark, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(2):  # best-of-2 damps JIT/GC noise
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    return best


def pack_bins_smoke(spark) -> float:
    """FFD whole-doc packing at 10M docs — r10's 1M smoke, ×10."""
    from rhq_metrics_spark.pipelines.packing import pack_bins

    docs = spark.range(PACK_DOCS, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        # mixed lengths 50..1949 tokens; 1-char words keep the string
        # pass cheap while the token COUNT distribution matches r10's
        # 1M smoke one decade up
        F.repeat(
            F.lit("w "),
            (F.abs(F.hash(F.col("id").cast("string"))) % 1900 + 50).cast("int"),
        ).alias("text"),
    )
    t0 = time.time()
    packed = pack_bins(docs, capacity=2048, id_col="doc_id")
    agg = packed.agg(
        F.countDistinct("bin_id").alias("bins"),
        F.sum("n_tokens").alias("toks"),
    ).collect()[0]
    dt = time.time() - t0
    eff = agg["toks"] / (agg["bins"] * 2048)
    print(f"# pack_bins {PACK_DOCS} docs -> {agg['bins']} bins in "
          f"{dt:.1f}s, efficiency {eff:.3f}", file=sys.stderr)
    return dt


def main() -> None:
    if "--rebuild" in sys.argv:
        shutil.rmtree(SFX_DIR, ignore_errors=True)
    spark = get_spark(app_name="r11-scale-x100")
    t0 = time.time()
    build_sfx(spark)
    print(f"# sfx1 build: {time.time() - t0:.1f}s", file=sys.stderr)

    qs = entry.queries()
    out: dict[str, dict] = {}
    for sf_dir, tag in (
        ("/root/testdata/sf0.01", "sf0.01"),
        ("/root/testdata/sf0.1", "sf0.1"),
        (SFX_DIR, "sfx1"),
    ):
        for name in QUERIES:
            dt = time_query(qs, spark, name, sf_dir)
            out.setdefault(name, {})[tag] = round(dt, 3)
            print(f"# {tag} {name}: {dt:.2f}s", file=sys.stderr)
    for name, row in out.items():
        row["x10"] = round(row["sf0.1"] / max(row["sf0.01"], 1e-9), 2)
        row["x100"] = round(row["sfx1"] / max(row["sf0.01"], 1e-9), 2)

    out["pack_bins_10m"] = {"sec": round(pack_bins_smoke(spark), 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
