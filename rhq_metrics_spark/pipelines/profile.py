"""Dataset profile — the "data card" a training-data pipeline stamps
on every corpus snapshot: per-source (plus corpus-total) document /
token / char counts, language spread, and exact duplicate rates, in
one declarative plan.

Every output is integer or floor-divided fixed point (ppm / micro
units), so the whole card is hash-exact cross-engine — profiles of two
snapshots can be diffed byte-for-byte.

100 TB shape: one exchange on the text fingerprint (the same cost
class as exact dedup — it IS the dup-rate computation, with map-side
count partials absorbing hot boilerplate), the copies join reusing
that partitioning, then ROLLUP gives the per-group and total rows in
ONE aggregation pass (no second scan for the corpus row).  No Python,
no collect; output is #groups + 1 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.pipelines.text import _tokens

#: fixed-point denominators for the ratio columns
PPM = 1_000_000


def dataset_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-``group_col`` + total profile of a document corpus.

    Output (one row per group, plus a ``group = 'ALL'`` corpus row):

    - ``n_docs``, ``n_tokens`` (whitespace), ``n_chars``
    - ``n_langs`` — distinct ``lang_col`` values
    - ``uniq_texts`` — distinct exact text fingerprints
    - ``dup_docs`` — docs whose EXACT text occurs 2+ times CORPUS-wide
      (a group row counts its members of corpus-wide clusters, so
      cross-source copies are charged to every source holding one —
      the provenance question a per-group dedup would get wrong)
    - ``dup_ppm`` — ``dup_docs / n_docs`` in parts-per-million (floor)
    - ``mean_tokens_micro`` — ``n_tokens / n_docs`` in micro-tokens
      (floor) — exact integer arithmetic, no float mean
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(lang_col).alias("_lang"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("_ntok"),
        F.length(text_col).cast("long").alias("_nch"),
        F.md5(F.col(text_col)).alias("_fp"),
    )
    copies = base.groupBy("_fp").agg(F.count(F.lit(1)).alias("_copies"))
    flagged = base.join(copies, "_fp")
    prof = (
        flagged.rollup("grp")
        .agg(
            # grouping() only resolves inside the rollup agg itself
            F.grouping("grp").alias("_is_total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.sum("_nch").alias("n_chars"),
            F.countDistinct("_lang").alias("n_langs"),
            F.countDistinct("_fp").alias("uniq_texts"),
            F.sum((F.col("_copies") >= 2).cast("long")).alias("dup_docs"),
        )
        .select(
            # grouping(), not coalesce: a genuinely-NULL group value
            # must not collide with the total row
            F.when(F.col("_is_total") == 1, F.lit("ALL"))
            .otherwise(F.col("grp"))
            .alias(group_col),
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_langs",
            "uniq_texts",
            "dup_docs",
            F.expr(f"dup_docs * {PPM} div n_docs").alias("dup_ppm"),
            F.expr(f"n_tokens * {PPM} div n_docs").alias("mean_tokens_micro"),
        )
    )
    return prof


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions — what changed, per
    group: document adds / removes / in-place edits and the exact token
    delta, keyed by ``id_col`` with content compared by fingerprint.

    Output per group (removed docs report under their OLD group):
    ``(group, added, removed, changed, unchanged, tokens_old,
    tokens_new, token_delta)`` — all exact integers, so two runs of the
    diff are byte-comparable like the :func:`dataset_profile` card.

    100 TB shape: one full-outer join co-partitioned on the id (each
    side shuffles once on the same key), then a single group
    aggregation; per-doc rows never leave the join stage.  Fingerprint
    compare (md5) rather than text compare keeps the join row narrow.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.col(group_col).alias(f"_grp_{tag}"),
            F.md5(F.col(text_col)).alias(f"_fp_{tag}"),
            F.size(_tokens(F.col(text_col))).cast("long").alias(f"_ntok_{tag}"),
        )

    j = side(old, "old").join(side(new, "new"), "_id", "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(F.col("_grp_new"), F.col("_grp_old")).alias(group_col),
            status.alias("_st"),
            F.coalesce(F.col("_ntok_old"), F.lit(0)).alias("_ntok_old"),
            F.coalesce(F.col("_ntok_new"), F.lit(0)).alias("_ntok_new"),
        )
        .groupBy(group_col)
        .agg(
            F.sum((F.col("_st") == "added").cast("long")).alias("added"),
            F.sum((F.col("_st") == "removed").cast("long")).alias("removed"),
            F.sum((F.col("_st") == "changed").cast("long")).alias("changed"),
            F.sum((F.col("_st") == "unchanged").cast("long")).alias("unchanged"),
            F.sum("_ntok_old").alias("tokens_old"),
            F.sum("_ntok_new").alias("tokens_new"),
            (F.sum("_ntok_new") - F.sum("_ntok_old")).alias("token_delta"),
        )
    )


def ngram_diversity(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-n diversity per group — the corpus-repetitiveness data-
    card metric (distinct-1/2/3 of Li et al. 2016): for each group and
    each n, total n-gram occurrences, distinct n-grams, and

        diversity_ppm = distinct · 1e6 div total

    Low distinct-2/3 flags template-heavy or self-repetitive sources a
    mixture builder should down-weight before training.

    Plan shape at 100 TB: n-gram extraction is scan-fused (one JVM
    ``transform``/``explode`` per n over the SAME tokenized scan —
    Spark unions the three legs, no re-read); per (group, n) one
    hash-agg with ``count_distinct`` on the n-gram key (map-side
    partials absorb head-gram skew).  Integer output — hash-exact
    cross-engine.

    Output: ``(group, n, total_ngrams, distinct_ngrams, diversity_ppm)``
    ordered by (group, n).
    """
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ngram_diversity: ns must be positive ints: {ns}")
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.filter(_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )
    legs = []
    for n in ns:
        if n == 1:
            gram = F.explode("_toks").alias("gram")
            leg = toks.select("grp", gram)
        else:
            leg = toks.filter(F.size("_toks") >= n).select(
                "grp",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(_toks) - {n}),"
                        f" i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
                    )
                ).alias("gram"),
            )
        legs.append(leg.withColumn("n", F.lit(int(n))))
    grams = legs[0]
    for leg in legs[1:]:
        grams = grams.unionByName(leg)
    return (
        grams.groupBy("grp", "n")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count_distinct("gram").alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "total_ngrams",
            "distinct_ngrams",
            F.expr(f"distinct_ngrams * {PPM} div total_ngrams").alias(
                "diversity_ppm"
            ),
        )
        .orderBy(group_col, "n")
    )


def length_histogram(
    df: DataFrame,
    group_col: str = "source",
    length_col: str = "n_chars",
) -> DataFrame:
    """Data-card length histogram: per group, document counts and total
    characters in power-of-two length buckets — the standard
    length-distribution panel of a dataset card (a source whose mass
    sits in the 1–64-char buckets is boilerplate/fragments; one with a
    heavy 64k+ tail needs chunking before packing).

    Bucketing is the engine-portable log2 quantization: ``bucket =
    length(bin(max(len, 1)))`` — the bit length of the integer, exact
    in both Spark and DuckDB (no float ``log2`` whose last ulp could
    flip a floor), so bucket b spans ``[2^(b-1), 2^b)``.  ``share_ppm``
    is floor fixed point of the group's doc share.

    Plan shape at 100 TB: ONE hash-agg on (group, bucket) — the bucket
    expression is scan-fused; the per-group totals ride a window over
    the HISTOGRAM table (#groups × ~40 buckets), never the corpus.

    Output: ``(group, bucket_log2, lo, hi, n_docs, total_chars,
    share_ppm)`` ordered by (group, bucket_log2).
    """
    from pyspark.sql import Window

    n = F.greatest(F.col(length_col).cast("long"), F.lit(1))
    hist = (
        df.select(
            F.col(group_col).alias("grp"),
            F.length(F.bin(n)).cast("int").alias("bucket_log2"),
            F.col(length_col).cast("long").alias("_len"),
        )
        .groupBy("grp", "bucket_log2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").alias("total_chars"),
        )
    )
    gw = Window.partitionBy("grp")
    return (
        hist.withColumn("_tot", F.sum("n_docs").over(gw))
        .select(
            F.col("grp").alias(group_col),
            "bucket_log2",
            F.expr("shiftleft(1L, bucket_log2 - 1)").cast("long").alias("lo"),
            F.expr("shiftleft(1L, bucket_log2) - 1").cast("long").alias("hi"),
            "n_docs",
            "total_chars",
            F.expr(f"n_docs * {PPM} div _tot").alias("share_ppm"),
        )
        .orderBy(group_col, "bucket_log2")
    )


def lang_confusion(
    df: DataFrame,
    declared_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Language confusion matrix — declared metadata language vs the
    n-gram/stopword classifier's prediction (text.py language_id): the
    data-card mislabeling panel (a source whose declared 'en' rows
    predict 'de' at 30% has a metadata problem the mixture builder
    must know about before weighting by language).

    Output: one row per (declared, predicted) cell with the count and
    the floor-ppm share of the declared language's row — all integers.

    Plan shape at 100 TB: language_id is scan-fused column expressions;
    one (declared, predicted) hash-agg; row totals ride a window over
    the #langs² matrix, never documents.
    """
    from rhq_metrics_spark.pipelines.text import language_id

    from pyspark.sql import Window

    pred = language_id(df).select(
        F.col(id_col).alias("_id"), "lang_pred"
    )
    cells = (
        df.select(F.col(id_col).alias("_id"), F.col(declared_col).alias("lang"))
        .join(pred, "_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return (
        cells.withColumn("_tot", F.sum("n_docs").over(w))
        .select(
            "lang",
            "lang_pred",
            "n_docs",
            F.expr(f"n_docs * {PPM} div _tot").alias("share_ppm"),
        )
        .orderBy("lang", "lang_pred")
    )
