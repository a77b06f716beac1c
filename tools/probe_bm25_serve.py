#!/usr/bin/env python3
"""Phase-level latency attribution for bm25_against_index (r16 opt):
build the sf index once out-of-band, then time each serve phase —
manifest/stats resolution, term-bucket collect, the df agg collect,
and the final scoring job — so the serve KPI's cost is attributable
to specific jobs instead of one opaque number.

Usage: python tools/probe_bm25_serve.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="probe-bm25-serve")
    import pyspark.sql.functions as F  # noqa: F401

    from rhq_metrics_spark.pipelines import retrieval as R

    bdir = tempfile.mkdtemp(prefix="probe_bm25idx_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    R.bm25_index(docs, bdir)
    bq = spark.createDataFrame(entry.BM25_QUERIES, "query_id long, query string")

    def serve_phased() -> dict:
        t = {}
        t0 = time.time()
        sources = R._resolve_sources(spark, bdir)
        paths = R._source_paths(bdir, sources)
        t["resolve"] = time.time() - t0
        t0 = time.time()
        n_eff, s_eff, n_buckets, tomb = R._store_counts(spark, bdir, paths)
        t["store_counts"] = time.time() - t0
        t0 = time.time()
        qterms_plan = bq.select(
            F.col("query_id"), F.explode(R._toks(F.col("query"))).alias("term")
        )
        lookup = R._term_buckets(qterms_plan, n_buckets).collect()
        pairs = sorted({(r["query_id"], r["term"]) for r in lookup})
        terms = sorted({t2 for _, t2 in pairs})
        buckets = sorted({r["tbucket"] for r in lookup})
        qterms = spark.createDataFrame(pairs, qterms_plan.schema)
        t["term_buckets"] = time.time() - t0
        t0 = time.time()
        hit = R._union_all(
            [
                spark.read.parquet(f"{p}/postings")
                .filter(F.col("tbucket").isin(buckets))
                .filter(F.col("term").isin(terms))
                .select("term", "doc_id", "tf", F.col("dl").alias("_dl"))
                for p in paths
            ]
        )
        hit = R._drop_tombstoned(spark, hit, tomb)
        t["hit_plan"] = time.time() - t0
        t0 = time.time()
        dfreq_rows = (
            R._union_all(
                [
                    spark.read.parquet(f"{p}/dfreq")
                    .filter(F.col("tbucket").isin(buckets))
                    .filter(F.col("term").isin(terms))
                    .select("term", "df")
                    for p in paths
                ]
            )
            .groupBy("term")
            .agg(F.sum("df").alias("_df"))
            .collect()
        )
        t["df_agg_collect"] = time.time() - t0
        t0 = time.time()
        idf = spark.createDataFrame(
            [
                (
                    r["term"],
                    R.log2_fxp_int(2 * n_eff - 2 * int(r["_df"]) + 1)
                    - R.log2_fxp_int(2 * int(r["_df"]) + 1),
                )
                for r in dfreq_rows
            ],
            "term string, _idf_fx long",
        )
        c_sat = 1_200_000 * (R.PPM - 750_000) // R.PPM
        c_len = 1_200_000 * 750_000 // R.PPM
        c_num = R.PPM + 1_200_000
        avg_ppm = (s_eff * R.PPM // n_eff) if n_eff > 0 else 1
        from pyspark.sql import Window

        scored = (
            hit.join(F.broadcast(qterms), "term")
            .join(F.broadcast(idf), "term")
            .withColumn(
                "_dlr_ppm", F.expr(f"_dl * 1000000 * 1000000 div {avg_ppm}L")
            )
            .withColumn(
                "_den_ppm",
                F.expr(
                    f"tf * 1000000 + {c_sat} + ({c_len} * _dlr_ppm) div 1000000"
                ),
            )
            .withColumn(
                "_tfterm_ppm", F.expr(f"tf * {c_num} * 1000000 div _den_ppm")
            )
            .repartition("query_id")
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.expr("_idf_fx * _tfterm_ppm")).alias("score_fx"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score_fx").desc(), F.col("doc_id").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "doc_id", "score_fx", "rank")
        )
        t["score_plan"] = time.time() - t0
        t0 = time.time()
        out.collect()
        t["score_exec"] = time.time() - t0
        t["total"] = sum(t.values())
        return t

    import pyspark.sql.functions as F

    # warm (listings, plans, JIT)
    t0 = time.time()
    R.bm25_against_index(spark, bdir, bq, k=10).collect()
    print(f"cold end-to-end: {time.time()-t0:.3f}s")
    for i in range(3):
        t0 = time.time()
        R.bm25_against_index(spark, bdir, bq, k=10).collect()
        print(f"warm end-to-end {i}: {time.time()-t0:.3f}s")
    for i in range(3):
        t = serve_phased()
        print(
            "phases:",
            {k: round(v, 3) for k, v in t.items()},
        )
    spark.stop()


if __name__ == "__main__":
    main()
