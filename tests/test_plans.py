"""Physical-plan regression guards: the properties PLANS.md documents
must stay true — broadcast joins for small dims, no cartesian products
anywhere, filters pushed into the parquet scan.  A refactor that
silently degrades one of these passes the correctness gate but dies at
100 TB; these tests fail it at sf0.001."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


#: no query in the driver surface may plan a cartesian/nested-loop join
NO_CROSS = [
    "tpch_q2",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embed_near_dup",
    "embed_lsh_topk",
    "embed_ivf_topk",
    "j6_interval_join",
    "text_classify",
    "dedup_fuzzy_blocked",
]


@pytest.mark.parametrize("name", NO_CROSS)
def test_no_cartesian_products(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    # cosine_topk legitimately broadcasts a tiny query set as a nested
    # loop; everything listed here must not
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_tpch_q5_broadcasts_all_dims(spark):
    """Five-table star join: every dimension should broadcast — a
    sort-merge join here means a dimension outgrew the threshold or a
    filter stopped pushing."""
    plan = _plan(spark, "tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_tpch_q21_single_lineitem_pass(spark):
    """Both correlated EXISTS conditions are answered by collect_set
    windows sharing ONE exchange — lineitem must be scanned once, not
    three times, and no self-join shapes remain."""
    plan = _plan(spark, "tpch_q21")
    assert plan.count("lineitem.parquet") <= 1 or plan.count("l_shipdate") >= 1
    import re
    scans = len(re.findall(r"Scan parquet[^\n]*lineitem", plan))
    assert scans == 1, f"lineitem scanned {scans}x"
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q2_correlated_min_stays_copartitioned(spark):
    """q2's offer->min-per-part rejoin must not plan a cartesian and must
    keep the aggregate pair on the partkey axis (no extra repartition of
    the offer side beyond the two grouping exchanges)."""
    plan = _plan(spark, "tpch_q2")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # dims all broadcast at this SF


def test_sample_mixture_is_scan_fused(spark):
    """Mixture weighting must stay a pure filter fused with the scan —
    zero exchanges, zero joins; at 100 TB this is the difference between
    a pass-through and a shuffle of the whole corpus."""
    plan = _plan(spark, "sample_mixture")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pack_chunks_single_shuffle(spark):
    """Sequence packing = one shard-hash exchange feeding one window;
    a second exchange means the running sum stopped reusing the shard
    partitioning."""
    plan = _plan(spark, "pack_chunks")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_bm25_topk_is_take_ordered(spark):
    """BM25 top-k must plan as TakeOrderedAndProject (per-partition
    heap + merge), never a global sort.  Exactly ONE BroadcastHashJoin
    (the df rejoin): doc length rides the tf aggregation as a group key
    since r16, so the corpus-sized lens join the old plan re-attached
    dl with (the second broadcast join here, a full shuffle at corpus
    scale) must stay gone."""
    plan = _plan(spark, "text_bm25")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_tfidf_no_smj_no_cartesian(spark):
    """tf-idf's term-keyed df rejoin shares the term axis; the global
    doc count rides a 1-row broadcast (BNLJ allowed for that one)."""
    plan = _plan(spark, "text_tfidf")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_a1_pushes_filters_and_prunes_columns(spark):
    """The bucket-stats scan must push the metric/time predicates into
    parquet and read only the needed columns."""
    plan = _plan(spark, "a1_bucket_stats")
    assert "PushedFilters: [" in plan
    assert "event_type" in plan.split("PushedFilters")[1][:200]
    # column pruning: the wide payload/text columns never appear
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "value" in read_schema and "payload" not in read_schema


def test_lsh_queries_have_no_python_row_udf(spark):
    """Signatures must ride Arrow (pandas UDF / ArrowEvalPython), never
    row-at-a-time BatchEvalPython."""
    for name in ("embed_lsh_topk", "embed_near_dup"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name


def test_store_scan_prunes_partitions(spark, tmp_path):
    """find_data_points must reach the scan with date_slice/tenant_bucket
    PartitionFilters (partition pruning, not post-scan filtering)."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.sources.store import MetricsStore

    store = MetricsStore(spark, str(tmp_path / "store"))
    rows = [("t1", "m", 1_700_000_000_000 + i * 3_600_000, float(i), None) for i in range(8)]
    store.add_data_points(
        "gauge",
        spark.createDataFrame(
            rows, "tenant_id string, metric string, ts long, value double, tags map<string,string>"
        ),
    )
    df = store.find_data_points(
        "gauge", "t1", "m", 1_700_000_000_000, 1_700_000_000_000 + 2 * 3_600_000
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "date_slice" in pf and "tenant_bucket" in pf


def test_o4_topk_uses_window_group_limit(spark):
    """The rank-filter must trigger Spark's WindowGroupLimit rewrite:
    each task keeps k rows per group BEFORE the shuffle, so the
    exchange carries O(groups * k) rows, not the whole table."""
    plan = _plan(spark, "o4_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_j6_interval_join_is_hash_join_on_buckets(spark):
    """The range join must plan as an equi-join on (key, bucket) — a
    key-only join with a range filter re-materializes each key's full
    cross product."""
    plan = _plan(spark, "j6_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_a9_rollup_is_one_expand_one_scan(spark):
    plan = _plan(spark, "a9_time_rollup")
    assert plan.count("Expand") == 1
    assert "Union" not in plan


def test_b16_production_route_reads_rollup_and_prunes_tail(spark):
    """The b16 driver query serves through MetricsService.gauge_stats:
    its plan must read the rollup parquet for the finalized prefix and
    raw-scan ONLY the open-slice tail (date_slice lower-bounded at the
    watermark's slice floor — never the grid start)."""
    import re

    import pyspark.sql.functions as F

    from rhq_metrics_spark.sources.store import TWO_HOURS_MS

    df = entry.queries()["b16_hybrid_production"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    store_path, rollup_path, b0, _n = entry._B16_STATE[SF]
    files = df.inputFiles()
    assert any(rollup_path in f for f in files), files
    assert any(store_path in f for f in files), files
    hi = (
        spark.read.parquet(rollup_path)
        .agg(F.max(F.unix_millis("window_end")))
        .first()[0]
    )
    first_open = hi // TWO_HOURS_MS * TWO_HOURS_MS
    assert first_open > b0  # the prefix is non-trivial at sf0.001
    bounds = [int(m) for m in re.findall(r"date_slice#\d+L? >= (\d+)", plan)]
    assert bounds, plan
    assert all(x == first_open for x in bounds), (first_open, bounds)


def test_sample_priority_is_partial_topk(spark):
    """Priority sampling must select via TakeOrderedAndProject
    (per-partition partial top-k, no global sort shuffle); the only
    nested-loop join allowed is the broadcast of the 1-row tau frame."""
    df = entry.queries()["sample_priority"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_w19_paths_single_window_and_partial_topk(spark):
    """frequent_paths: all L-1 leads must share ONE window exchange on
    the user key, and top-k must be TakeOrderedAndProject, never a
    global sort of the path table."""
    plan = _plan(spark, "w19_frequent_paths")
    assert "TakeOrderedAndProject" in plan
    # one window over the user key: exactly one 'Window' operator node
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Window\n") + final.count("Window [") <= 2  # leads + rank
    assert "CartesianProduct" not in plan


def test_w18_active_users_no_data_sized_join(spark):
    """active_users: deltas aggregate before the spine join; no
    cartesian, and the cumulative sum runs over the spine partition."""
    plan = _plan(spark, "w18_active_users")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_w20_attribution_no_event_self_join(spark):
    """attribution must not self-join events with events: one window +
    one agg; the only joins allowed are broadcast-sized."""
    plan = _plan(spark, "w20_attribution")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_collocations_broadcasts_word_counts(spark):
    """collocations joins unigram counts onto the pair table via
    broadcast; top-k is TakeOrderedAndProject."""
    plan = _plan(spark, "text_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_w15_step_latency_anchor_joins_stay_hash(spark):
    """funnel_step_latency: the per-stage anchor joins key on the user
    column — no cartesian/nested-loop anywhere."""
    plan = _plan(spark, "w15_step_latency")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hard_negatives_ann_no_cross_product(spark):
    """hard_negatives_ann (r14): the shortlist comes from the IVF
    cell equi-join — unlike the exact leg there must be NO cartesian
    and no nested-loop join anywhere in the composition; the ceiling
    post-pass adds only a filter + one rank window."""
    plan = _plan(spark, "embed_hard_negatives_ann")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_er_em_weights_pattern_agg_stays_pair_linear(spark):
    """fs_em_weights (r14): the only distributed work is the double id
    join + ONE pattern hash-agg; EM is driver-side over <= 2^F rows.
    The output frame itself is driver-created, so guard the pattern
    aggregation plan directly."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs

    docs = entry._table(spark, SF, "documents")
    pairs = fuzzy_blocked_pairs(
        docs.select("doc_id", "lang", "text"), min_sim=0.4
    ).select("id_a", "id_b")
    sides = docs.select(
        "doc_id", "source",
        F.length(F.bin(F.greatest(F.col("n_chars").cast("long"), F.lit(1))))
        .cast("int").alias("len_bucket"),
    )
    a = sides.select(
        F.col("doc_id").alias("id_a"),
        F.col("len_bucket").alias("_a_lb"), F.col("source").alias("_a_s"),
    )
    b = sides.select(
        F.col("doc_id").alias("id_b"),
        F.col("len_bucket").alias("_b_lb"), F.col("source").alias("_b_s"),
    )
    flags = (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            F.col("_a_lb").eqNullSafe(F.col("_b_lb")).cast("int").alias("g1"),
            F.col("_a_s").eqNullSafe(F.col("_b_s")).cast("int").alias("g2"),
        )
        .groupBy("g1", "g2").agg(F.count(F.lit(1)).alias("c"))
    )
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_log2_postings_joins_broadcast(spark):
    """bm25_topk (r14): query terms, idf, and corpus stats broadcast —
    the posting scan-side join never sort-merges, and the only
    nested-loop joins are the 1-row stats broadcasts."""
    plan = _plan(spark, "text_bm25_log2")
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "SortMergeJoin" not in final


def test_embed_rrf_fusion_no_cross_product(spark):
    """Per-query RRF fusion: mode runs join full-outer on (query, doc)
    keys; fusion input is Σ mode-depths rows, no cartesian."""
    plan = _plan(spark, "embed_rrf_fusion")
    assert "CartesianProduct" not in plan


def test_er_score_pairs_broadcast_weights_and_hash_joins(spark):
    """fs_score_pairs (r14): pair-linear — the two doc-side joins key
    on id (hash/broadcast), the m/u rates arrive as ONE broadcast row
    (the only nested-loop allowed), and the score is a scan-fused
    expression: no SortMergeJoin, no cartesian."""
    plan = _plan(spark, "er_score_pairs")
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    # the 1-row m/u frame broadcast is the only nested-loop join
    assert final.count("BroadcastNestedLoopJoin") <= 1
