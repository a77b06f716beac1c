"""Text analysis operators for training-data pipelines.

All operators are pure JVM-side column expressions (no Python UDFs):
whole-stage-codegen keeps them pipeline-fused with the parquet scan at
100 TB.  Every formula is deliberately expressible in ANSI SQL so the
driver's DuckDB oracle can recompute it (see __spark_entry__.py).

Operators: token counting (whitespace + BPE-ish word-piece regex),
quality scoring (length / punctuation / stopword / word-length
features), language ID (stopword-lexicon n-gram heuristic), document
fingerprinting (polynomial rolling hash + winnowing-style min-shingle
fingerprint).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from rhq_metrics_spark.localrel import local_df

# Deliberately tiny, deterministic stopword lexicons (top function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es", "que", "por"],
}

#: BPE-ish word-piece pattern: runs of letters, runs of digits, or a
#: single non-space symbol — a cheap proxy for byte-pair token counts.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_MOD = 1_000_000_007
_ROLL_BASE = 31


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, BPE-ish token count, char count."""
    text = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens_ws": F.size(_tokens(text)),
            # regexp_count is JVM-side; counts BPE-ish word pieces
            "n_tokens_bpe": F.regexp_count(text, F.lit(BPE_ISH_PATTERN)),
            "n_chars_measured": F.length(text),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text", lang: str = "en") -> DataFrame:
    """Deterministic quality features + composite score in [0, 1].

    Features: length band, punctuation ratio, stopword ratio, mean
    word length band — the standard cheap quality heuristics for
    pretraining-corpus filtering.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))

    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tok > 0, (F.length(F.regexp_replace(text, r"\s+", "")) / n_tok)).otherwise(F.lit(0.0))

    length_ok = (n_tok >= 5) & (n_tok <= 100_000)
    word_len_ok = (mean_word_len >= 2.0) & (mean_word_len <= 12.0)
    score = (
        length_ok.cast("double") * 0.25
        + word_len_ok.cast("double") * 0.25
        + (punct_ratio <= 0.2).cast("double") * 0.25
        + (stop_ratio >= 0.05).cast("double") * 0.25
    )
    return df.withColumns(
        {
            "punct_ratio": punct_ratio.cast("double"),
            "stopword_ratio": stop_ratio.cast("double"),
            "mean_word_len": mean_word_len.cast("double"),
            "quality": score,
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-lexicon language ID: score = matched-stopword count per
    language; argmax with deterministic (alphabetical) tie-break;
    'und' (undetermined) when nothing matches."""
    toks = _tokens(F.col(text_col))

    def _score(ws: list[str]):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: _score(ws) for lang, ws in STOPWORDS.items()}
    # deterministic argmax: iterate langs alphabetically, strict '>' keeps first
    langs = sorted(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    out = df
    for lang in langs:
        out = out.withColumn(f"score_{lang}", scores[lang])
    return out.withColumn("lang_pred", best_lang)


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash over characters:
    ``h = (h*31 + ascii(c)) mod 1e9+7`` — identical arithmetic is
    expressible in the DuckDB oracle (list_reduce), so fingerprints
    hash-match across engines."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * _ROLL_BASE + F.coalesce(F.ascii(ch), F.lit(0))) % _MOD,
    )


def shingles(toks: Column, n: int) -> Column:
    """Word n-grams as strings from a token array (JVM-side transform).

    Guard: ``sequence(0, -1)`` would generate a *descending* [0, -1] —
    short docs must yield an empty array instead.
    """
    cnt = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(cnt > 0, grams).otherwise(F.array().cast("array<string>"))


def document_fingerprint(
    df: DataFrame, text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Document fingerprints:

    - ``fp_roll``: polynomial rolling hash of the whitespace-normalized
      lowercased text (exact-dup key, order-sensitive);
    - ``fp_min_shingle``: winnowing-style minimum md5 over word
      n-gram shingles (robust to local edits — the classic
      document-fingerprint selection step).
    """
    # bind norm/toks/grams through projection boundaries so the regex
    # normalization runs once per row, not once per downstream reference
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    bound = df.withColumn("_norm", norm).withColumn("_toks", F.split(F.col("_norm"), " "))
    bound = bound.withColumn("_grams", shingles(F.col("_toks"), shingle_n))
    return bound.withColumns(
        {
            "fp_roll": rolling_hash(F.col("_norm")),
            "fp_min_shingle": F.when(
                F.size("_grams") > 0,
                F.array_min(F.transform(F.col("_grams"), F.md5)),
            ).otherwise(F.md5(F.col("_norm"))),
        }
    ).drop("_norm", "_toks", "_grams")


def vocab_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: per-token term frequency and document
    frequency — the counting pass that seeds BPE/vocab training.

    explode → group-by is the canonical Spark shape: partial (map-side)
    aggregation collapses each partition's token multiset before the
    shuffle, so skewed head tokens ("the") move one partial row per
    partition, not one row per occurrence.  ``count(DISTINCT doc)`` is
    exact here (two-phase agg); at extreme scale swap for
    ``approx_count_distinct`` — same plan shape.
    Output: ``(token, term_freq, doc_freq)``.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.count_distinct(F.col("_id")).alias("doc_freq"),
        )
        .filter(F.col("term_freq") >= min_count)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf.

    Uses the engine-portable idf variant ``idf_bp = N * 10000 div df``
    (integer basis points of the inverse document frequency) instead of
    ``ln(N/df)``: it is the same monotone-in-1/df ordering for ranking,
    but stays in exact integer arithmetic, so the ranking and scores are
    bit-identical across engines — ``ln`` is not IEEE-correctly-rounded
    and can differ in the last ulp between runtimes.

    Plan shape at scale: explode → (doc, term) count (map-side partials
    absorb head-token skew) → term-keyed df aggregation joins back on
    the same key, then one window shuffle on the doc id for the top-k.
    The global doc count rides a broadcast.
    Output: ``(id, term, tf, df, idf_bp, score_bp, rank)``.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("idf_bp", F.expr("n_docs * 10000 div df"))
        .withColumn("score_bp", F.col("tf") * F.col("idf_bp"))
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score_bp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term", "tf", "df", "idf_bp", "score_bp", "rank",
        )
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 50,
) -> DataFrame:
    """BM25 retrieval score of every document against a fixed term set;
    returns the ``top_k`` by score (ties broken by id).

    Engine-portable by construction: idf is the integer variant
    ``N * 10000 div df``; every floating step (length normalization,
    saturation) is a single correctly-rounded IEEE operation over exact
    integers, applied in a fixed written order — per-term partial scores
    are materialized as columns and added left-to-right, never via an
    unordered SUM, so two engines produce bit-identical doubles.

    Plan shape at scale (r16 opt — the lens-join half of the r15
    bm25_topk plan fix applied here too): tokens are filtered to the
    query terms BEFORE the (doc, term) aggregation, so the shuffle
    carries only matching postings; ``dl`` rides through that
    aggregation as a group key (functionally dependent on the doc id),
    replacing the corpus-row-count-sized lens join the old plan
    shuffled by doc id; df and the one-row corpus stats ride
    broadcasts (the stats subtree is referenced by exactly ONE
    broadcast, so unlike the r15 bm25_topk case it computes once per
    action — keeping it lazy avoids an eager driver job per call);
    final top-k is a sort + limit (TakeOrdered), not a
    single-partition window.  All arithmetic operates on the same
    exact integers in the same written order, so scores are
    bit-identical to the pre-r16 plan (oracle-pinned).
    """
    text = F.col(text_col)
    dl = F.size(F.filter(_tokens(text), lambda t: t != "")).cast("long")
    toks = df.select(
        F.col(id_col).alias("_id"),
        dl.alias("dl"),
        F.explode(_tokens(text)).alias("term"),
    ).filter(F.col("term").isin(query_terms))
    tf = toks.groupBy("_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    glob = df.select(dl.alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # per-(doc, term) partial score; (dl*N)/sum_dl == dl/avgdl with the
    # division done once over exact integers
    part = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(glob))
        .withColumn("idf_bp", F.expr("n_docs * 10000 div df"))
        .withColumn(
            "pscore",
            F.col("idf_bp")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1
                * (
                    (1 - b)
                    + b
                    * (
                        (F.col("dl") * F.col("n_docs")).cast("double")
                        / F.col("sum_dl")
                    )
                )
            ),
        )
    )
    # fixed-order sum: one column per query term, added left-to-right
    per_term = part.groupBy("_id", "dl").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("pscore"))), F.lit(0.0)
            ).alias(f"_s{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        score = score + F.col(f"_s{i}")
    return (
        per_term.withColumn("score", score)
        .filter(F.col("score") > 0.0)
        .select(F.col("_id").alias(id_col), "dl", "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark-contamination detection: for every eval document, the
    fraction of its distinct word n-grams that appear anywhere in the
    training corpus (the standard n-gram-overlap decontamination test).

    Plan at scale: the train side reduces to a DISTINCT md5(shingle) set
    (one shuffle, fixed-width keys instead of raw n-gram strings); the
    eval side explodes its per-doc distinct shingles and shuffle-joins
    on the hash; the per-doc rollup then groups on already-co-located
    doc ids.  Eval docs too short to produce a shingle survive with
    ``n_grams = 0`` via the final left join.
    Output: ``(doc_id, n_grams, n_matched, contamination_rate)``.
    """
    def _grams(df: DataFrame) -> DataFrame:
        norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
        b = df.select(F.col(id_col).alias("_id"), norm.alias("_norm"))
        b = b.withColumn("_toks", F.split(F.col("_norm"), " "))
        return b.select(
            "_id", F.array_distinct(shingles(F.col("_toks"), shingle_n)).alias("_grams")
        )

    tr = (
        _grams(train)
        .select(F.explode("_grams").alias("_g"))
        .select(F.md5("_g").alias("_gh"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    ev = _grams(eval_df)
    ev_ex = ev.select("_id", F.explode("_grams").alias("_g")).select(
        "_id", F.md5("_g").alias("_gh")
    )
    per = (
        ev_ex.join(tr, "_gh", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_m").alias("n_matched"),
        )
    )
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0).cast("long"))
    n_matched = F.coalesce(F.col("n_matched"), F.lit(0).cast("long"))
    return (
        ev.select("_id")
        .join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            n_grams.alias("n_grams"),
            n_matched.alias("n_matched"),
            F.round(
                F.when(n_grams > 0, n_matched / n_grams.cast("double")).otherwise(0.0),
                6,
            ).alias("contamination_rate"),
        )
    )


# -- PII detection / redaction + URL analysis ---------------------------------

#: portable regexes — valid under both Java regex (Spark) and RE2
#: (DuckDB/ripgrep-class engines), no lookaround/backrefs
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(/[^ ]*)?"
IPV4_PATTERN = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pii_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII scan + redaction for training-data hygiene: per-doc counts of
    emails / URLs / IPv4 literals and a ``redacted`` text with
    placeholders substituted (URLs first so an address inside a URL
    isn't double-counted by the later passes).  Pure JVM regex — no UDFs;
    at 100 TB this is a narrow projection over the text column only.
    """
    text = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, URL_PATTERN, "<URL>"),
            EMAIL_PATTERN,
            "<EMAIL>",
        ),
        IPV4_PATTERN,
        "<IP>",
    )
    return df.select(
        id_col,
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).alias("n_emails"),
        F.regexp_count(text, F.lit(URL_PATTERN)).alias("n_urls"),
        F.regexp_count(text, F.lit(IPV4_PATTERN)).alias("n_ips"),
        (
            (F.regexp_count(text, F.lit(EMAIL_PATTERN)) > 0)
            | (F.regexp_count(text, F.lit(IPV4_PATTERN)) > 0)
        ).alias("has_pii"),
        redacted.alias("redacted"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals: fraction of duplicate words /
    2-grams / 3-grams per document (high values flag boilerplate and
    degenerate generations).  All JVM array expressions."""
    toks = _tokens(F.col(text_col))

    def dup_frac(col: Column) -> Column:
        n = F.size(col)
        return F.round(
            F.when(
                n > 0,
                1.0 - F.size(F.array_distinct(col)) / n.cast("double"),
            ).otherwise(0.0),
            6,
        )

    bound = df.select(F.col(id_col), toks.alias("_toks"))
    return bound.select(
        id_col,
        F.size(F.col("_toks")).alias("n_words"),
        dup_frac(F.col("_toks")).alias("dup_word_frac"),
        dup_frac(shingles(F.col("_toks"), 2)).alias("dup_2gram_frac"),
        dup_frac(shingles(F.col("_toks"), 3)).alias("dup_3gram_frac"),
    )


def lm_bigram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    p_scale: int = 1_000_000,
) -> DataFrame:
    """Corpus bigram-LM quality score — the cheap statistical-LM signal
    behind perplexity-based pretraining filters (CCNet-style: documents
    whose token transitions are improbable under a corpus LM are
    gibberish/boilerplate outliers), in engine-portable exact integer
    arithmetic.

    The LM is add-one-smoothed bigram maximum likelihood over the input
    corpus itself: ``P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` with
    ``V`` the corpus unigram vocabulary size.  Probabilities are kept as
    integer basis points ``p_bp = (c_bg + 1) * p_scale div (c_ctx + V)``
    — same monotone ordering, bit-identical across engines (the same
    reasoning as ``tfidf_top_terms``'s integer idf).  The per-document
    cross-entropy is served QUANTIZED to whole bits via the binary
    string length ``ilog2(p_bp) = length(bin(p_bp)) - 1`` (exact in both
    Spark and DuckDB — no ``ln``, which is not correctly-rounded and can
    differ in the last ulp between runtimes): ``surprisal_q = B -
    ilog2(p_bp)`` with ``B = log2(p_scale)`` rounded up, so ``p_bp =
    p_scale`` (probability ~1) scores ~1 bit and ``p_bp = 0`` saturates
    at ``B`` bits.

    Plan shape at 100 TB: tokenize/bigram extraction is scan-fused; one
    hash-agg on the bigram key (map-side partials absorb head-bigram
    skew); context totals come from a window over the COUNTS table
    (|distinct bigrams|, not |bigram occurrences|) partitioned by w1;
    the vocabulary scalar rides a broadcast; one shuffle join of doc
    bigrams against the probability table on the bigram key; one final
    hash-agg on the doc id.  Nothing is ever all-pairs and no count
    table is collected to the driver.

    Output: ``(id, n_bigrams, sum_p_bp, avg_p_bp, min_p_bp,
    xent_qbits)`` — one row per document with >= 1 bigram.
    """
    bits = max(1, (p_scale).bit_length())  # p_scale=1e6 -> 20
    toks_all = df.select(
        F.col(id_col).alias("_id"),
        F.filter(_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )
    bg = (
        toks_all.filter(F.size("_toks") >= 2)
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2),"
                    " i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("_b"),
        )
        .select(
            "_id",
            F.col("_b.w1").alias("w1"),
            F.concat_ws(" ", F.col("_b.w1"), F.col("_b.w2")).alias("bigram"),
        )
    )
    bgc = bg.groupBy("w1", "bigram").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bgc.withColumn(
        "c_ctx", F.sum("c_bg").over(Window.partitionBy("w1"))
    )
    vocab = toks_all.select(F.explode("_toks").alias("_tok")).agg(
        F.count_distinct("_tok").alias("v")
    )
    prob = (
        ctx.crossJoin(F.broadcast(vocab))
        .withColumn("p_bp", F.expr(f"(c_bg + 1) * {p_scale} div (c_ctx + v)"))
        .select("bigram", "p_bp")
    )
    scored = bg.join(prob, "bigram")
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_bp").alias("sum_p_bp"),
            F.min("p_bp").alias("min_p_bp"),
            F.sum(
                F.lit(bits + 1) - F.length(F.bin(F.col("p_bp")))
            ).alias("_surp_sum"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_bigrams",
            "sum_p_bp",
            (F.col("sum_p_bp").cast("double") / F.col("n_bigrams")).alias(
                "avg_p_bp"
            ),
            "min_p_bp",
            (F.col("_surp_sum").cast("double") / F.col("n_bigrams")).alias(
                "xent_qbits"
            ),
        )
    )


def url_domain_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain URL statistics — the corpus-curation view behind
    per-source caps and domain blocklists: ``(domain, n_urls, n_docs)``.
    One explode + one groupBy on the (short) domain key; head domains
    are absorbed by map-side partial aggregation."""
    urls = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)).alias(
            "_url"
        ),
    )
    return (
        urls.select(
            "_id",
            F.regexp_extract(F.col("_url"), r"https?://([A-Za-z0-9.-]+)", 1).alias(
                "domain"
            ),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("_id").alias("n_docs"),
        )
    )


def pii_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PII-bearing corpus synthesized from a clean text
    table (the shipped testdata contains no addresses/URLs): appends
    arithmetic-derived emails, URLs, and IPv4s to a subset of docs so the
    scan/redaction/domain operators have reproducible nonzero work that
    a SQL oracle can recompute."""
    did = F.col(id_col)
    sid = did.cast("string")
    extra = F.concat(
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"), sid, F.lit("@example"),
                (did % 7).cast("string"), F.lit(".com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" visit https://site"), (did % 13).cast("string"),
                F.lit(".example.org/p/"), sid,
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" from 10."), (did % 256).cast("string"),
                F.lit(".0."), (did % 254 + 1).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.withColumn(text_col, F.concat(F.col(text_col), extra))


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Exact cross-document substring duplication [Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    EXACTSUBSTR criterion]: every ``window``-token span is fingerprinted
    (md5 of the space-joined window) and a span is DUPLICATED when it
    appears in at least ``min_docs`` distinct documents.  Unlike the
    document-level near-dup family, this catches long verbatim passages
    (licenses, boilerplate, quoted text) embedded in otherwise-distinct
    documents — the pattern document-level Jaccard dilutes away.

    Output, one row per input document: ``(id, n_windows,
    n_dup_windows, dup_bp, max_share)`` — total spans, spans shared
    with >= min_docs-1 other docs, the duplicated fraction in integer
    basis points (``n_dup * 1e6 div n_windows``; exact cross-engine),
    and the widest sharing count of any span.  Docs shorter than
    ``window`` tokens have zero spans (all-zero row).

    100 TB shape: the reference implementation builds a suffix array;
    the Spark-native expression is the inverted-index form — window
    fingerprints are emitted scan-side (16-byte hashes, never the
    text), one hash-agg keyed on the fingerprint computes distinct-doc
    counts (map-side combine absorbs within-doc repeats), and one
    shuffle join brings span-sharing back to documents.  Self-repeats
    WITHIN a doc are deliberately excluded (``min_docs`` counts
    distinct docs) — that signal is :func:`repetition_stats`' job."""
    wins = _window_hashes(df, id_col, text_col, window)
    shared = (
        wins.groupBy("_h")
        .agg(F.count_distinct("_id").alias("_n_docs"))
        .filter(F.col("_n_docs") >= min_docs)
    )
    per_doc = (
        wins.join(shared, "_h", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count("_n_docs").alias("n_dup_windows"),
            F.max(F.coalesce("_n_docs", F.lit(1))).alias("max_share"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .selectExpr(
            f"_id AS {id_col}",
            "coalesce(n_windows, 0L) AS n_windows",
            "coalesce(n_dup_windows, 0L) AS n_dup_windows",
            "CASE WHEN coalesce(n_windows, 0L) > 0"
            " THEN n_dup_windows * 1000000L div n_windows"
            " ELSE 0L END AS dup_bp",
            "coalesce(max_share, 0L) AS max_share",
        )
    )


def decontaminate_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Span-level decontamination: REMOVE from every training document
    each ``window``-token span that appears verbatim in the eval set —
    the surgical form of benchmark decontamination (document-level
    filters discard whole docs over one quoted question; span removal
    keeps the rest of the document).  The industry-standard criterion
    is the same n-gram window as :func:`substring_dup_spans`
    (EXACTSUBSTR, Lee et al. 2022), applied cross-set.

    Output, one row per training doc: ``(id, n_tokens,
    n_removed_tokens, clean_text)`` — cleaned text preserves surviving
    token order; docs shorter than ``window`` pass through unchanged.
    ``clean_text`` is in NORMALIZED token space (lowercased, whitespace
    collapsed) — the representation the dedup/contamination family
    already keys on; callers that must preserve raw bytes keep the
    original column and use ``n_removed_tokens`` as the drop signal.

    100 TB shape: the eval side reduces to a DISTINCT window-hash set
    (eval benchmarks are tiny — broadcast); train windows are
    fingerprinted scan-side and the contaminated-position explode is
    bounded by MATCHED windows only, so an uncontaminated corpus costs
    one broadcast-hash-join probe per window and nothing more.  The
    token-index filter is a JVM higher-order lambda — no UDF."""
    def _toks_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.filter(_tokens(F.col(text_col)),
                     lambda x: x != "").alias("_toks"),
        )

    def _windows(toks: DataFrame) -> DataFrame:
        return toks.filter(F.size("_toks") >= window).select(
            "_id",
            F.posexplode(F.expr(
                f"transform(sequence(0, size(_toks) - {int(window)}),"
                f" i -> md5(concat_ws(' ', slice(_toks, i + 1, {int(window)}))))"
            )).alias("pos", "_h"),
        )

    ev = _windows(_toks_of(eval_df)).select("_h").distinct()
    bad = _windows(_toks_of(train)).join(F.broadcast(ev), "_h")
    covered = (
        bad.select(
            "_id",
            F.explode(
                F.expr(f"sequence(pos, pos + {int(window) - 1})")
            ).alias("_p"),
        )
        .groupBy("_id")
        .agg(F.collect_set("_p").alias("_cov"))
    )
    return (
        _toks_of(train)
        .join(covered, "_id", "left")
        .selectExpr(
            f"_id AS {id_col}",
            "cast(size(_toks) as bigint) AS n_tokens",
            "cast(coalesce(size(_cov), 0) as bigint) AS n_removed_tokens",
            "concat_ws(' ', filter(_toks,"
            " (x, i) -> _cov IS NULL OR NOT array_contains(_cov, i)))"
            " AS clean_text",
        )
    )


def _window_hashes(df: DataFrame, id_col: str, text_col: str,
                   window: int) -> DataFrame:
    """(id, window-hash) rows — the shared EXACTSUBSTR fingerprint
    emission (md5 of the space-joined ``window``-token slice)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.filter(_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )
    return toks.filter(F.size("_toks") >= window).select(
        "_id",
        F.explode(F.expr(
            f"transform(sequence(0, size(_toks) - {int(window)}),"
            f" i -> md5(concat_ws(' ', slice(_toks, i + 1, {int(window)}))))"
        )).alias("_h"),
    )


def substring_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Standing EXACTSUBSTR index: one row per distinct window
    fingerprint, ``(h, n_docs)`` — the incremental-pipeline artifact
    for :func:`substring_dups_against_index` (the window-hash twin of
    ``dedup.minhash_index``).  At 100 TB the index is ~40 B per
    DISTINCT window — boilerplate-heavy corpora collapse hard — and it
    lives partitioned by hash prefix so batch probes are
    partition-pruned joins."""
    return (
        _window_hashes(df, id_col, text_col, window)
        .groupBy(F.col("_h").alias("h"))
        .agg(F.count_distinct("_id").alias("n_docs"))
    )


def substring_dups_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Incremental EXACTSUBSTR: per NEW document, how many of its
    spans already exist in the standing corpus index — a span is
    duplicated when corpus occupancy plus this document reaches
    ``min_docs`` (default: any span already in ≥1 corpus doc).  Same
    output shape as :func:`substring_dup_spans` (``n_windows,
    n_dup_windows, dup_bp, max_share`` — ``max_share`` counts corpus
    docs + this one), so batch and incremental decisions are directly
    comparable.

    100 TB shape: the NEW batch's fingerprints are broadcast; the
    standing index is probed map-side (never shuffled) exactly like
    ``dedup.index_dedup_candidates`` — a daily batch costs one
    broadcast-hash probe per index partition, and the per-doc agg
    shuffles batch rows only."""
    nw = _window_hashes(new_docs, id_col, text_col, window)
    hits = index.join(
        F.broadcast(nw.select("_h").distinct()), F.col("h") == F.col("_h")
    ).select("h", "n_docs")
    per_doc = (
        nw.join(F.broadcast(hits), nw["_h"] == hits["h"], "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count(
                F.when(F.col("n_docs") + 1 >= min_docs, 1)
            ).alias("n_dup_windows"),
            F.max(F.coalesce(F.col("n_docs") + 1, F.lit(1))).alias(
                "max_share"
            ),
        )
    )
    return (
        new_docs.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .selectExpr(
            f"_id AS {id_col}",
            "coalesce(n_windows, 0L) AS n_windows",
            "coalesce(n_dup_windows, 0L) AS n_dup_windows",
            "CASE WHEN coalesce(n_windows, 0L) > 0"
            " THEN n_dup_windows * 1000000L div n_windows"
            " ELSE 0L END AS dup_bp",
            "coalesce(max_share, 0L) AS max_share",
        )
    )


def substring_index_append(
    index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Fold a batch into the standing EXACTSUBSTR index: per-hash doc
    counts merge additively (``n_docs`` from distinct docs, so a batch
    is indexed once then merged).  Expressed as union + re-aggregate
    here; on a partitioned index STORE this is a partition append with
    merge-on-read (sum per hash) — the counts are mergeable partials
    by construction, same contract as the histogram rollups."""
    batch_idx = substring_index(new_docs, id_col, text_col, window)
    return (
        index.unionByName(batch_idx)
        .groupBy("h")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Published filter rulesets: Gopher / MassiveText document rules and
# C4 line-level cleaning.  Both are pure JVM array/column expressions —
# scan-fused, zero exchanges — and every formula is DuckDB-expressible
# so the driver oracle recomputes them exactly.
# ---------------------------------------------------------------------------

#: The MassiveText "required stop words" list (Gopher, Rae et al. 2021,
#: table A1): a document must contain at least two of these.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: C4 terminal punctuation (Raffel et al. 2020 §2.2): a line is kept
#: only if it ends in one of these.
C4_TERMINAL_PUNCT = [".", "!", "?", '"']


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher / MassiveText document-level quality rules (Rae et al.
    2021, appendix A1 — public heuristics; defaults are the published
    thresholds).  Emits every rule's feature plus the final ``kept``
    verdict so downstream mixtures can re-threshold without a re-scan.

    Complements :func:`quality_score` (generic cheap features) and
    :func:`repetition_stats` (Gopher's duplicate-fraction signals):
    this is the named go/no-go ruleset a pretraining pipeline runs
    first.

    Rules: word count in [min_words, max_words]; mean word length in
    [min, max]; symbol-to-word ratio (``#`` chars + non-overlapping
    ``...`` runs, per word) ≤ max; ≤ max fraction of lines starting
    with a bullet (``-``/``*``/``•``); ≤ max fraction of lines ending
    in ``...``; ≥ min fraction of words containing an alphabetic
    character; ≥ min_stopword_hits of :data:`GOPHER_STOPWORDS` present.

    Exactness: every ratio is one IEEE division of two exact integers;
    100 TB shape: per-row expressions only, whole-stage-codegen fused
    with the parquet scan — the filter never causes an exchange.
    """
    text = F.col(text_col)
    toks = F.filter(_tokens(text), lambda x: x != "")
    n_words = F.size(toks)
    # one fused traversal for total word length + alpha-word count (two
    # separate passes cost a second array walk per doc at 100 TB)
    word_acc = F.aggregate(
        toks,
        F.struct(
            F.lit(0).cast("long").alias("len"),
            F.lit(0).cast("long").alias("alpha"),
        ),
        lambda acc, x: F.struct(
            (acc.len + F.length(x)).alias("len"),
            (acc.alpha + x.rlike("[a-z]").cast("long")).alias("alpha"),
        ),
    )
    sum_word_len = word_acc.len
    mean_word_len = F.when(
        n_words > 0, sum_word_len.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = F.regexp_count(text, F.lit(r"\.\.\."))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.split(text, "\n"), lambda line: F.trim(line) != ""
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda line: F.trim(line).startswith("-")
            | F.trim(line).startswith("*")
            | F.trim(line).startswith("•"),
        )
    )
    n_ell_lines = F.size(
        F.filter(lines, lambda line: F.trim(line).endswith("..."))
    )
    bullet_frac = F.when(
        n_lines > 0, n_bullet.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0, n_ell_lines.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    n_alpha = word_acc.alpha
    alpha_word_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    # distinct required stopwords present: array_intersect hashes one
    # side, so this is ONE token walk instead of 8 array_contains scans
    n_stop_present = F.size(F.array_intersect(stop_arr, toks))
    kept = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_word_frac >= min_alpha_word_frac)
        & (n_stop_present >= min_stopword_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_word_frac, 6).alias("alpha_word_frac"),
        n_stop_present.alias("n_stop_present"),
        kept.alias("kept"),
    )


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    require_terminal_punct: bool = True,
    line_drop_substring: str = "javascript",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 — public
    heuristics).  Line rules: keep a line only if it has ≥
    ``min_words_per_line`` words, (optionally) ends in terminal
    punctuation (:data:`C4_TERMINAL_PUNCT`), and does not mention
    ``line_drop_substring``.  Page rules: drop the whole document if it
    contains ``lorem ipsum`` or a curly brace ``{``, or if fewer than
    ``min_kept_lines`` lines survive.

    Emits ``n_lines`` (non-empty), ``n_kept_lines``, the page verdict
    ``kept``, and ``clean_text`` — surviving lines re-joined with
    newlines (NULL for dropped pages), i.e. the operator both filters
    and REWRITES, like C4 itself.

    100 TB shape: per-row array expressions only (split → filter →
    array_join), scan-fused, zero exchanges.
    """
    text = F.col(text_col)

    def _line_ok(line: Column) -> Column:
        t = F.trim(line)
        ok = (t != "") & (
            F.size(F.split(t, r"\s+")) >= min_words_per_line
        ) & ~F.contains(F.lower(t), F.lit(line_drop_substring))
        if require_terminal_punct:
            term = F.array(*[F.lit(p) for p in C4_TERMINAL_PUNCT])
            ok = ok & F.array_contains(term, F.right(t, F.lit(1)))
        return ok

    lines = F.filter(F.split(text, "\n"), lambda line: F.trim(line) != "")
    kept_lines = F.filter(lines, _line_ok)
    n_kept = F.size(kept_lines)
    page_ok = (
        ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
        & (n_kept >= min_kept_lines)
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        page_ok.alias("kept"),
        F.when(page_ok, F.array_join(kept_lines, "\n")).alias("clean_text"),
    )


def bpe_pair_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Tokenizer-training prep: first-iteration BPE merge statistics —
    corpus frequency of every adjacent character pair, the quantity a
    byte-pair-encoding trainer (Sennrich et al. 2016, public algorithm)
    maximizes when choosing its next merge.  Returns the ``top_k``
    candidate pairs with a deterministic rank (count desc, pair asc).

    100 TB shape — the classic BPE counting trick, distributed: the
    corpus collapses to a WORD-FREQUENCY table first (one hash-agg,
    output bounded by vocabulary, not corpus size), pairs explode per
    DISTINCT word (bounded by word length) weighted by the word's
    frequency, then one more hash-agg on the pair key.  Nothing is
    ever per-token-occurrence; the final top-k window runs over an
    alphabet²-bounded table (single tiny partition by construction).
    """
    toks = df.select(
        F.explode(F.filter(_tokens(F.col(text_col)), lambda x: x != "")).alias("w")
    )
    wf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = (
        wf.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1),"
                       " i -> substring(w, i, 2))")
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col("rank").cast("int").alias("rank"), "pair", "n")
    )


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Iterative BPE merge TRAINING (Sennrich et al. 2016 §3, public
    algorithm): repeat ``n_merges`` times — count adjacent symbol pairs
    over the word-frequency table, pick the most frequent (ties broken
    lexicographically on (left, right) asc, deterministic), merge it
    into the symbolized vocabulary, recount.  Returns ``[(left, right,
    count_at_selection)]`` in merge order; feed ``[l + r for l, r, _ in
    result]`` to :func:`bpe_apply`.  Stops early (shorter list) when no
    adjacent pair remains.

    Closes the tokenizer-training loop :func:`bpe_pair_counts` (the
    first-iteration statistics) and :func:`bpe_apply` (consumes an
    already-learned list) bracketed.  Intrinsically iterative, so — like
    ``bpe_apply`` and LTTB — it has no single-SQL oracle; tests pin it
    against a pure-Python reference trainer.

    100 TB shape — the classic distributed form: the corpus collapses
    ONCE to the word-frequency table (one hash-agg, output bounded by
    vocabulary, never corpus size); every iteration's recount and
    merge-apply run over that table only.  The driver loop issues two
    tiny jobs per merge (a ONE-row argmax collect + an eager
    localCheckpoint that truncates the iteration's lineage so plan depth
    stays O(1) instead of nesting n_merges folds).  Python never touches
    per-word data: the greedy non-overlapping left-to-right merge is a
    JVM ``aggregate()`` fold — the accumulator's last symbol can only
    equal ``left`` via the original array (a just-merged ``left+right``
    is never equal to non-empty-suffixed ``left``), so a single fold
    pass is exactly Sennrich's one-pass replace.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    toks = df.select(
        F.explode(F.filter(_tokens(F.col(text_col)), lambda x: x != "")).alias("w")
    )
    wf = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            wf.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((a, b, n))
        a_lit, b_lit, ab = F.lit(a), F.lit(b), F.lit(a + b)
        folded = F.aggregate(
            F.col("syms"),
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                # try_element_at: null on the empty accumulator (ANSI-safe)
                (F.try_element_at(acc, F.lit(-1)) == a_lit) & (x == b_lit),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        wf = wf.select(folded.alias("syms"), "freq").localCheckpoint()
    return merges


def bpe_encode_word(word: str, ranks: dict[str, int]) -> list[str]:
    """Greedy BPE encode of one word (Sennrich et al. 2016, public
    algorithm): repeatedly merge every occurrence of the adjacent
    symbol pair with the LOWEST merge rank until no mergeable pair
    remains.  Pure-Python reference kernel, shared by the Arrow UDF in
    :func:`bpe_apply` and the tests."""
    syms = list(word)
    while len(syms) > 1:
        best_rank: int | None = None
        for i in range(len(syms) - 1):
            r = ranks.get(syms[i] + syms[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_rank is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply(
    df: DataFrame,
    merges: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a LEARNED BPE merge list (the apply leg
    of :func:`bpe_pair_counts`' train leg; rank = position in
    ``merges``).  Output: ``(id, n_words, n_subwords, subwords)`` with
    ``subwords`` the document's subword sequence in order.

    100 TB shape — encode the VOCABULARY, not the corpus: the greedy
    merge loop (intrinsically iterative, so Python) runs via an
    Arrow-batched ``mapInPandas`` over DISTINCT words only; documents
    then rejoin their words' encodings on the word key and re-assemble
    by position.  Corpus-size work is all JVM (explode, join,
    sort-reassemble agg); Python work is bounded by |vocab| x |word|²,
    independent of how many times each word occurs.  The merge table
    rides inside the UDF closure (~rank count strings, broadcast-sized
    by construction).
    """
    from collections.abc import Iterator as _Iter

    import pandas as _pd

    ranks = {p: i for i, p in enumerate(merges)}

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(_tokens(F.col(text_col)), lambda x: x != "")
        ).alias("pos", "w"),
    )
    vocab = toks.select("w").distinct()

    def _encode(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "w": pdf["w"],
                    "enc": [bpe_encode_word(w, ranks) for w in pdf["w"]],
                }
            )

    encoded = vocab.mapInPandas(_encode, "w string, enc array<string>")
    joined = toks.join(encoded, "w")
    return (
        joined.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "enc"))),
                    lambda x: x.enc,
                )
            ).alias("subwords"),
        )
        .withColumn("n_subwords", F.size("subwords"))
        .select(id_col, "n_words", "n_subwords", "subwords")
    )


def boilerplate_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """RefinedWeb/CCNet-style boilerplate line removal (public
    heuristics): a line occurring in ≥ ``min_docs`` DISTINCT documents
    is boilerplate (nav menus, cookie banners, footers) and is dropped
    from every document; the rest re-joins in original order.

    Complements :func:`c4_line_clean` (per-line rules, no cross-doc
    signal) and ``segment_dedup`` (keeps the FIRST occurrence —
    boilerplate removal keeps NONE).

    100 TB shape: one hash-agg builds the line-frequency table
    (map-side partials absorb the very skew that makes a line
    boilerplate), one equi-join stamps each line's doc-frequency, one
    doc-key agg reassembles — no window over raw lines, nothing
    all-pairs.  Output: ``(id, n_lines, n_kept_lines, clean_text)``
    with NULL ``clean_text`` when nothing survives.  Every input doc
    yields a row — a doc with no non-empty lines comes back with
    ``n_lines=0`` and null ``clean_text`` (consistent with
    :func:`c4_line_clean`'s one-row-per-doc contract): blank lines ride
    the explode/reassembly instead of being pre-filtered, so no doc key
    can vanish before the groupBy, and they left-join the frequency
    table (built from non-blank lines only) as never-kept.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_blank", F.trim(F.col("line")) == "")
    freq = (
        lines.filter(~F.col("_blank"))
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("_nd"))
    )
    flagged = lines.join(freq, "line", "left").withColumn(
        "_keep", ~F.col("_blank") & (F.col("_nd") < min_docs)
    )
    out = flagged.groupBy(id_col).agg(
        F.count(F.when(~F.col("_blank"), 1)).alias("n_lines"),
        F.count(F.when(F.col("_keep"), 1)).alias("n_kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct("pos", "line"),
                        )
                    )
                ),
                lambda x: x.line,
            ),
            "\n",
        ).alias("_joined"),
    )
    return out.select(
        id_col,
        "n_lines",
        "n_kept_lines",
        F.when(F.col("n_kept_lines") > 0, F.col("_joined")).alias(
            "clean_text"
        ),
    )


#: tracking query parameters stripped by URL canonicalization (the
#: public utm_* convention + the two big click identifiers)
TRACKING_PARAM_RE = r"(utm_[A-Za-z0-9_]*|gclid|fbclid)"


def canonical_url(url: Column) -> Column:
    """URL canonicalization for crawl-level dedup (the public
    SURT-adjacent ruleset): strip the fragment, lowercase the
    scheme://host[:port] prefix (the path stays case-sensitive), drop
    the scheme's default port, drop a leading ``www.``, remove
    tracking query params (``utm_*``/``gclid``/``fbclid``), and trim a
    single trailing slash.  Pure JVM regex with NO backreferences or
    lookaround, so the identical chain runs under both Java regex and
    RE2 — the oracle recomputes it verbatim.
    """
    u0 = F.regexp_replace(url, r"#.*$", "")
    # (?i): the scheme/host may arrive in any case ("HTTP://WWW.…");
    # inline case-folding is portable across Java regex and RE2
    prefix = F.regexp_extract(u0, r"(?i)^(https?://[^/?#]+)", 1)
    rest = F.substr(u0, F.length(prefix) + 1)
    p = F.lower(prefix)
    # default ports, per scheme — suffix-test + trim rather than a
    # backreference replace (Java writes $1 where RE2 writes \1; the
    # whole chain must be portable verbatim)
    p = F.when(
        p.startswith("http://") & p.endswith(":80"),
        F.substr(p, F.lit(1), F.length(p) - 3),
    ).when(
        p.startswith("https://") & p.endswith(":443"),
        F.substr(p, F.lit(1), F.length(p) - 4),
    ).otherwise(p)
    p = F.regexp_replace(p, r"^http://www\.", "http://")
    p = F.regexp_replace(p, r"^https://www\.", "https://")
    r = F.regexp_replace(rest, rf"&{TRACKING_PARAM_RE}=[^&]*", "")
    r = F.regexp_replace(r, rf"\?{TRACKING_PARAM_RE}=[^&]*&", "?")
    r = F.regexp_replace(r, rf"\?{TRACKING_PARAM_RE}=[^&]*$", "")
    r = F.regexp_replace(r, r"/$", "")
    return F.concat(p, r)


def url_canonical_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """URL-level dedup view: group raw URLs by :func:`canonical_url` —
    the crawl-frontier dedup that collapses tracking-param/www/port/
    slash variants of one page before any content is fetched or
    compared.  Output: ``(canon_url, n_urls, n_docs, sample_url)``
    with ``sample_url`` the lexicographically-first raw form (a
    deterministic representative).

    100 TB shape: one hash-agg on the canonical key (head pages are
    absorbed map-side); canonicalization is scan-fused JVM regex."""
    urls = df.select(
        F.col(id_col).alias("_id"),
        F.col(url_col).alias("_url"),
        canonical_url(F.col(url_col)).alias("canon_url"),
    )
    return urls.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("_id").alias("n_docs"),
        F.min("_url").alias("sample_url"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility audit per group (typically language): how
    many subword-ish tokens the BPE-ish regex spends per whitespace
    word, and how many UTF-8 bytes per token — the standard fairness /
    cost audit behind tokenizer choice (a tokenizer that is 3× more
    fertile on one language triples that language's sequence lengths
    and cost).

    Exact integers end to end: per-group sums of word/token/byte
    counts, ratios as ppm integer divisions — bit-identical
    cross-engine.  One hash-agg on the (tiny) group key; the counts are
    scan-fused column expressions.

    Output: ``(group, n_docs, n_words, n_tokens, n_bytes,
    tokens_per_word_ppm, bytes_per_token_ppm)``.
    """
    text = F.col(text_col)
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        F.size(
            F.filter(
                F.split(F.trim(F.lower(text)), r"\s+"), lambda x: x != ""
            )
        ).cast("long").alias("_w"),
        F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long").alias("_t"),
        F.octet_length(text).cast("long").alias("_b"),
    )
    agg = per_doc.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_w").alias("n_words"),
        F.sum("_t").alias("n_tokens"),
        F.sum("_b").alias("n_bytes"),
    )
    return agg.selectExpr(
        group_col, "n_docs", "n_words", "n_tokens", "n_bytes",
        "CASE WHEN n_words > 0 THEN n_tokens * 1000000L div n_words"
        " ELSE 0L END AS tokens_per_word_ppm",
        "CASE WHEN n_tokens > 0 THEN n_bytes * 1000000L div n_tokens"
        " ELSE 0L END AS bytes_per_token_ppm",
    )


#: (doc, pos) packing base for the first-occurrence total order; spans
#: of docs with >= 2^20 tokens would fold — far beyond any real doc.
_SELF_DEDUP_PACK = 1 << 20


def substring_self_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """EXACTSUBSTR REMOVAL leg (Lee et al. 2022's "keep one copy"):
    for every ``window``-token span occurring at 2+ (doc, pos) sites
    across the corpus — including repeats WITHIN one document — the
    globally FIRST site (lexicographic (doc_id, pos), realized as the
    packed int64 ``doc_id·2^20 + pos`` so both engines order
    identically) keeps its tokens; every other site's positions are
    removed and the document is rewritten.  Completes the family:
    ``substring_dup_spans`` detects, ``decontaminate_spans`` removes
    against an eval set, this removes within the corpus itself.

    Output per input doc: ``(id, n_tokens, n_removed_tokens,
    clean_text)`` — same contract as :func:`decontaminate_spans`
    (normalized token space; docs shorter than ``window`` pass through
    unchanged).

    100 TB shape: one hash-agg on the window hash builds the
    first-occurrence table for DUPLICATED hashes only (the min/count
    partials absorb exactly the boilerplate skew that makes a span
    duplicated), one shuffle join stamps each site, the removed-
    position explode is bounded by duplicated sites, and the rewrite
    is a JVM higher-order filter — no UDF, nothing all-pairs, never
    the suffix array's global sort.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.filter(_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )
    wins = toks.filter(F.size("_toks") >= window).select(
        "_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, size(_toks) - {int(window)}),"
            f" i -> md5(concat_ws(' ', slice(_toks, i + 1, {int(window)}))))"
        )).alias("pos", "_h"),
    )
    pk = F.col("_id") * _SELF_DEDUP_PACK + F.col("pos")
    firsts = (
        wins.groupBy("_h")
        .agg(F.min(pk).alias("_first"), F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
    )
    bad = wins.join(firsts, "_h").filter(pk != F.col("_first"))
    covered = (
        bad.select(
            "_id",
            F.explode(
                F.expr(f"sequence(pos, pos + {int(window) - 1})")
            ).alias("_p"),
        )
        .groupBy("_id")
        .agg(F.collect_set("_p").alias("_cov"))
    )
    return (
        toks.join(covered, "_id", "left")
        .selectExpr(
            f"_id AS {id_col}",
            "cast(size(_toks) as bigint) AS n_tokens",
            "cast(coalesce(size(_cov), 0) as bigint) AS n_removed_tokens",
            "concat_ws(' ', filter(_toks,"
            " (x, i) -> _cov IS NULL OR NOT array_contains(_cov, i)))"
            " AS clean_text",
        )
    )


# -- unigram-LM (SentencePiece-style) tokenizer training ----------------------
# Kudo 2018 ("Subword Regularization", arXiv:1804.10959) + the
# SentencePiece trainer (Kudo & Richardson 2018) — public algorithms.
# This is the Viterbi-EM variant: hard best-segmentation counts in the
# E-step (exact integers, so the distributed counts are bit-identical
# to a sequential reference), maximum-likelihood piece probabilities in
# the M-step, and periodic pruning of the lowest-count multi-char
# pieces until the vocabulary reaches the target size.  Single
# characters are never pruned (coverage guarantee, as in SentencePiece).

#: log-probability charged for a character absent from the piece table
#: (keeps Viterbi total even on unseen input; single chars in-vocab
#: make this unreachable during training).
UNIGRAM_UNK_LOGPROB = -100.0


def unigram_seed_pieces(
    df: DataFrame,
    seed_size: int = 1000,
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Seed candidate table for :func:`unigram_lm_train`: every
    substring (all occurrences) of length ``1..max_piece_len`` of the
    corpus's words, frequency-weighted by the word-frequency table —
    ALL single characters kept unconditionally, plus the ``seed_size``
    most frequent multi-char candidates (ties broken lexicographically
    asc — deterministic, so the trainer and its pure-Python reference
    seed identically).

    100 TB shape: the corpus collapses once to the word-frequency
    table (one hash-agg, vocabulary-bounded); the substring explode
    and top-k run over that table only.  Exact integer frequencies —
    SQL-expressible, oracle-checked by the driver.

    Output: ``(piece, freq, is_char)``.
    """
    if seed_size < 1:
        raise ValueError("seed_size must be >= 1")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    toks = df.select(
        F.explode(F.filter(_tokens(F.col(text_col)), lambda x: x != "")).alias("w")
    )
    wf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pieces = (
        wf.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)),"
                    f" i -> transform(sequence(1, least({int(max_piece_len)},"
                    " length(w) - i + 1)),"
                    " l -> substring(w, i, l))))"
                )
            ).alias("piece"),
            "freq",
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("freq"))
    )
    chars = pieces.filter(F.length("piece") == 1)
    w = Window.orderBy(F.col("freq").desc(), F.col("piece").asc())
    multi = (
        pieces.filter(F.length("piece") >= 2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= seed_size)
        .drop("rk")
    )
    return chars.withColumn("is_char", F.lit(True)).unionByName(
        multi.withColumn("is_char", F.lit(False))
    )


def unigram_encode_word(
    word: str,
    logprobs: dict[str, float],
    max_piece_len: int = 8,
    unk_logprob: float = UNIGRAM_UNK_LOGPROB,
) -> tuple[list[str], float]:
    """Viterbi best segmentation of one word under a unigram piece LM
    (Kudo 2018 §3.2, public algorithm): maximize the sum of piece
    log-probabilities; ties prefer the SHORTER last piece
    (deterministic).  Out-of-vocab single characters cost
    ``unk_logprob`` so a segmentation always exists.  Pure-Python
    reference kernel, shared by the Arrow UDFs in
    :func:`unigram_lm_train` / :func:`unigram_apply` and the tests —
    identical floats on both sides by construction."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for plen in range(1, min(max_piece_len, i) + 1):
            j = i - plen
            if best[j] == neg:
                continue
            lp = logprobs.get(word[j:i])
            if lp is None:
                if plen > 1:
                    continue
                lp = unk_logprob
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out, best[n]


def unigram_mstep(counts: dict[str, int]) -> dict[str, float]:
    """M-step shared by the trainer and the pure-Python reference:
    maximum-likelihood piece log-probs from Viterbi counts.  Single
    characters get +1 Laplace smoothing (a char whose every occurrence
    is covered by longer pieces must stay reachable — the coverage
    guarantee); multi-char pieces with zero count drop out (unreachable
    under the current model — SentencePiece prunes them the same
    way)."""
    sm = {
        p: c + 1 if len(p) == 1 else c
        for p, c in counts.items()
        if len(p) == 1 or c > 0
    }
    total = sum(sm.values())
    return {p: math.log(c) - math.log(total) for p, c in sm.items()}


def unigram_prune(
    counts: dict[str, int], vocab_size: int, prune_frac: float = 0.25
) -> dict[str, int]:
    """Prune step shared by the trainer and the reference: drop the
    lowest-count multi-char pieces — at most ``prune_frac`` of them per
    round, never below ``vocab_size`` total pieces, never a single
    char.  Ties broken lexicographically asc (dropped first) —
    deterministic."""
    multi = sorted(
        ((c, p) for p, c in counts.items() if len(p) > 1),
    )
    n_over = len(counts) - vocab_size
    if n_over <= 0 or not multi:
        return counts
    n_drop = min(max(1, math.ceil(prune_frac * len(multi))), n_over, len(multi))
    dropped = {p for _, p in multi[:n_drop]}
    return {p: c for p, c in counts.items() if p not in dropped}


def unigram_lm_train(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    max_rounds: int = 50,
) -> dict:
    """TRAIN a unigram-LM (SentencePiece-style) tokenizer in-engine —
    the OTHER tokenizer a data-pipeline team actually trains, next to
    :func:`bpe_learn_merges`: seed a candidate vocabulary from frequent
    substrings of the word table, run Viterbi-EM rounds (E-step =
    best-segmentation counts over DISTINCT words, M-step = ML piece
    probabilities), and prune the lowest-count multi-char pieces until
    the vocabulary reaches ``vocab_size``.

    100 TB shape — the same discipline as ``bpe_learn_merges``: the
    corpus collapses ONCE to the word-frequency table (one hash-agg,
    vocabulary-bounded, localCheckpoint'd); every E-step is an
    Arrow-batched ``mapInPandas`` over that table with the piece
    log-probs riding the closure (vocab-bounded broadcast), partially
    aggregated inside each batch and finished by one JVM hash-agg whose
    output — the per-piece count table — is the only thing collected
    (≤ |pieces| rows of exact integers).  Python work is bounded by
    |distinct words| × |word|² per round, independent of corpus size;
    driver state is the piece dict.

    Exact-integer counts make the distributed E-step bit-identical to a
    sequential pass, so tests pin the whole trainer against a
    pure-Python reference (same shared kernels) — piece set AND
    log-probs equal.  Intrinsically iterative, so — like
    ``bpe_learn_merges`` — no single-SQL oracle; the SEED stage
    (:func:`unigram_seed_pieces`) is the driver-oracled leg.

    Returns ``{"logprobs": {piece: logprob}, "pieces": DataFrame(piece,
    logprob), "rounds": n, "seed_n": m}``; feed ``logprobs`` to
    :func:`unigram_apply`.
    """
    from collections.abc import Iterator as _Iter

    import pandas as _pd

    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if em_iters < 1:
        raise ValueError("em_iters must be >= 1")
    spark = df.sparkSession
    if seed_size is None:
        seed_size = max(4 * vocab_size, 64)
    toks = df.select(
        F.explode(F.filter(_tokens(F.col(text_col)), lambda x: x != "")).alias("w")
    )
    wf = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )
    seed = unigram_seed_pieces(df, seed_size, text_col, max_piece_len)
    counts = {r["piece"]: int(r["freq"]) for r in seed.collect()}
    seed_n = len(counts)
    logprobs = unigram_mstep(counts)

    def _estep_counts(lp: dict[str, float]) -> dict[str, int]:
        def _run(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
            for pdf in batches:
                local: dict[str, int] = {}
                for word, freq in zip(pdf["w"], pdf["freq"]):
                    pieces, _ = unigram_encode_word(word, lp, max_piece_len)
                    for p in pieces:
                        local[p] = local.get(p, 0) + int(freq)
                yield _pd.DataFrame(
                    {"piece": list(local), "n": list(local.values())}
                )

        agg = (
            wf.mapInPandas(_run, "piece string, n long")
            .groupBy("piece")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        return {r["piece"]: int(r["n"]) for r in agg}

    rounds = 0
    while True:
        rounds += 1
        for _ in range(em_iters):
            raw = _estep_counts(logprobs)
            # pieces absent from every Viterbi path count 0 (multi-char
            # ones then drop in the M-step; chars are smoothed)
            counts = {p: raw.get(p, 0) for p in logprobs}
            logprobs = unigram_mstep(counts)
        counts = {p: c for p, c in counts.items() if p in logprobs}
        if len(logprobs) <= vocab_size or rounds >= max_rounds:
            break
        pruned = unigram_prune(counts, vocab_size, prune_frac)
        if len(pruned) == len(counts):
            break  # only chars left above target — can't shrink further
        counts = pruned
        logprobs = unigram_mstep(counts)
    pieces = local_df(
        spark, sorted(logprobs.items()), "piece string, logprob double"
    )
    return {
        "logprobs": logprobs,
        "pieces": pieces,
        "rounds": rounds,
        "seed_n": seed_n,
    }


def unigram_apply(
    df: DataFrame,
    logprobs: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize documents with a TRAINED unigram LM (the apply leg of
    :func:`unigram_lm_train`, mirror of :func:`bpe_apply`): Viterbi
    best segmentation per word.  Output: ``(id, n_words, n_subwords,
    subwords)``.

    100 TB shape — encode the VOCABULARY, not the corpus: the Viterbi
    DP runs via Arrow-batched ``mapInPandas`` over DISTINCT words only;
    documents rejoin their words' encodings on the word key and
    re-assemble by position (all corpus-size work JVM).  The piece
    table rides the UDF closure — vocab-bounded by construction."""
    from collections.abc import Iterator as _Iter

    import pandas as _pd

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(_tokens(F.col(text_col)), lambda x: x != "")
        ).alias("pos", "w"),
    )
    vocab = toks.select("w").distinct()

    def _encode(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "w": pdf["w"],
                    "enc": [
                        unigram_encode_word(w, logprobs, max_piece_len)[0]
                        for w in pdf["w"]
                    ],
                }
            )

    encoded = vocab.mapInPandas(_encode, "w string, enc array<string>")
    joined = toks.join(encoded, "w")
    return (
        joined.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "enc"))),
                    lambda x: x.enc,
                )
            ).alias("subwords"),
        )
        .withColumn("n_subwords", F.size("subwords"))
        .select(id_col, "n_words", "n_subwords", "subwords")
    )


def kneser_ney_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    p_scale: int = 1_000_000,
    min_count: int = 1,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM score (Kneser & Ney 1995;
    Chen & Goodman 1998 eq. 4.25) — the stronger sibling of
    :func:`lm_bigram_score`'s add-one model, and the smoothing every
    serious n-gram perplexity filter actually uses.  With absolute
    discount D = 0.75 over the corpus's own counts:

        P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1·)
                 + (D · N1+(w1 ·) / c(w1·)) · N1+(· w2) / N1+(· ·)

    where N1+(w1 ·) / N1+(· w2) are the distinct-continuation counts
    and N1+(· ·) the total distinct bigram types — the "how many
    contexts has this word followed" backoff that makes KN rank
    versatile words above merely frequent ones.

    Engine determinism: all inputs are exact int64 counts; with
    D = 3/4 the discounted numerator is the integer ``4·c − 3``; each
    division/product is ONE correctly-rounded IEEE double op in a
    FIXED expression tree (written identically in the DuckDB oracle —
    +,−,×,÷ are exactly specified, unlike ``ln``), and the per-bigram
    probability is floored to ``p_bp = floor(p · p_scale)`` BEFORE any
    doc aggregate, so sums are integer and order-independent.
    Cross-entropy is served quantized to whole bits via
    ``length(bin(p_bp))`` exactly like :func:`lm_bigram_score`.

    Plan shape at 100 TB: one hash-agg on the bigram key; the three
    KN count tables are two windows over the TYPES table (|distinct
    bigrams| rows, partitioned by w1 and by w2) plus one broadcast
    scalar; one join of doc bigrams against the probability table;
    one final doc-id hash-agg.  Nothing all-pairs, nothing collected.

    Output: ``(id, n_bigrams, sum_p_bp, min_p_bp, kn_xent_qbits)``,
    one row per document with ≥ 1 bigram.

    ``min_count`` (default 1 = exact) prunes the bigram TYPES table to
    types seen at least that often BEFORE the count windows — the
    standard n-gram-LM count cutoff (Chen & Goodman 1998 §5).  The
    adversarial corpus where |types| ≈ |tokens| (uniform-random text:
    143M types at 10M docs, ×100 = 33.8 in SCALE.md) collapses to the
    repeated-type core, while Zipfian real corpora lose only the
    singleton tail.  Pruned bigrams simply don't score: ``n_bigrams``
    counts only surviving bigrams, and a document whose every bigram
    was pruned drops from the output — the same contract as the
    "≥ 1 bigram" floor.  At ``min_count=1`` output is bit-identical to
    the unpruned exact computation.
    """
    if min_count < 1:
        raise ValueError(f"kneser_ney_score: min_count must be >= 1: {min_count}")
    bits = max(1, (p_scale).bit_length())
    toks_all = df.select(
        F.col(id_col).alias("_id"),
        F.filter(_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )
    bg = (
        toks_all.filter(F.size("_toks") >= 2)
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2),"
                    " i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("_b"),
        )
        .select("_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    if min_count > 1:
        bgc = bgc.filter(F.col("c_bg") >= min_count)
    # window over the TYPES table: c(w1 .) and N1+(w1 .) share one
    # exchange on w1; N1+(. w2) is the second exchange on w2.
    w1win = Window.partitionBy("w1")
    w2win = Window.partitionBy("w2")
    counts = (
        bgc.withColumn("c_ctx", F.sum("c_bg").over(w1win))
        .withColumn("n1p_fwd", F.count(F.lit(1)).over(w1win))
        .withColumn("n1p_bwd", F.count(F.lit(1)).over(w2win))
    )
    n_types = bgc.agg(F.count(F.lit(1)).alias("n_types"))
    # fixed IEEE expression tree — identical text in the DuckDB oracle
    prob = counts.crossJoin(F.broadcast(n_types)).withColumn(
        "p_bp",
        F.expr(
            f"""CAST(floor((
                  CAST(4 * c_bg - 3 AS DOUBLE) / CAST(4 * c_ctx AS DOUBLE)
                  + (CAST(3 * n1p_fwd AS DOUBLE) / CAST(4 * c_ctx AS DOUBLE))
                    * (CAST(n1p_bwd AS DOUBLE) / CAST(n_types AS DOUBLE))
                ) * {p_scale}) AS BIGINT)"""
        ),
    ).select("w1", "w2", "p_bp")
    scored = bg.join(prob, ["w1", "w2"])
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_bp").alias("sum_p_bp"),
            F.min("p_bp").alias("min_p_bp"),
            F.sum(
                F.lit(bits + 1) - F.length(F.bin(F.col("p_bp")))
            ).alias("kn_xent_qbits"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_bigrams",
            "sum_p_bp",
            "min_p_bp",
            "kn_xent_qbits",
        )
    )


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch Reading Ease + Flesch–Kincaid grade level (Kincaid et al.
    1975 — the standard document-difficulty signals a quality-filter
    stack reports next to Gopher/C4 verdicts), from three exact integer
    counts per document:

    - words: whitespace tokens (the shared ``_tokens`` splitter)
    - sentences: ``[.!?]+`` runs, floored at 1 (fragments are one
      sentence — matches every practical implementation)
    - syllables: ``[aeiouy]+`` vowel-group runs (the classic cheap
      heuristic; no dictionary, engine-portable)

        FRE   = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    Determinism: the three counts are exact int64; each formula is a
    FIXED IEEE expression tree (literals parse to the same doubles in
    any engine, ×/−/÷ correctly rounded), rounded to 4 dp for output.
    Everything is scan-fused column expressions — zero exchanges, zero
    joins, the same shape as ``gopher_quality_filter``.

    Output: ``(id, n_words, n_sentences, n_syllables, fre_r,
    fk_grade_r)`` for documents with ≥ 1 word.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    words = F.size(toks).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0))
        ).cast("long"),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("long")
    base = df.select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    ).filter(F.col("n_words") >= 1)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
        ).alias("fre_r"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
        ).alias("fk_grade_r"),
    )


def collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise lift — adjacent word pairs whose
    observed frequency most exceeds the independence expectation
    (Church & Hanks 1990's association-ratio / PMI family, served as a
    ratio instead of its log so no ``ln`` enters the cross-engine
    contract):

        lift = P(w1 w2) / (P(w1) · P(w2))
             = (c_bg / N_bg) / ((c1 / N_tok) · (c2 / N_tok))

    High-lift pairs are the corpus's multiword expressions ("new york",
    "machine learning") — the vocabulary-analysis signal a tokenizer /
    data-card builder reports next to distinct-n diversity.
    ``min_count`` (on both the pair and each word) applies the standard
    sparse-count floor, without which singleton pairs dominate.

    Determinism: all counts are exact int64; lift is the FIXED IEEE
    expression tree above (two divisions, one multiply, one divide —
    each correctly rounded, so the double is bit-identical in any
    engine and the (lift desc, pair asc) ranking cannot diverge);
    output rounds to 6 dp for display AFTER ranking.

    Plan shape at 100 TB: one bigram hash-agg + one unigram hash-agg
    over the same tokenized scan; unigram counts re-join the bigram
    TYPE table (|distinct pairs| rows, twice, by word key); top-k is
    TakeOrderedAndProject.  Nothing all-pairs — only ADJACENT pairs
    are candidates.

    Output: ``(w1, w2, pair_count, c1, c2, lift_r, rank)``.
    """
    if k < 1:
        raise ValueError(f"collocations: k must be >= 1: {k}")
    if min_count < 1:
        raise ValueError(f"collocations: min_count must be >= 1: {min_count}")
    # eager localCheckpoint, not persist: the cache registry matches by
    # analyzed plan, so a persisted frame derived from a source PATH
    # would serve stale tokens on a later call after new files land
    # (the serving-loop trap documented at operators/funnel.py
    # active_users); a checkpoint is a materialized snapshot with no
    # registry entry to leak or go stale.
    toks = df.select(
        F.filter(_tokens(F.col(text_col)), lambda x: x != "").alias("_toks")
    ).localCheckpoint(eager=True)
    uni = (
        toks.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = uni.agg(
        F.sum("c").alias("n_tok"), F.lit(1).alias("_one")
    )
    bg = (
        toks.filter(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2),"
                    " i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("_b")
        )
        .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    n_bg = bgc.agg(
        F.sum("pair_count").alias("n_bg"), F.lit(1).alias("_one")
    )
    kept = bgc.filter(F.col("pair_count") >= min_count)
    joined = (
        kept.join(
            F.broadcast(
                uni.filter(F.col("c") >= min_count).select(
                    F.col("w").alias("w1"), F.col("c").alias("c1")
                )
            ),
            "w1",
        )
        .join(
            F.broadcast(
                uni.filter(F.col("c") >= min_count).select(
                    F.col("w").alias("w2"), F.col("c").alias("c2")
                )
            ),
            "w2",
        )
        .crossJoin(F.broadcast(totals.select("n_tok")))
        .crossJoin(F.broadcast(n_bg.select("n_bg")))
    )
    lift = F.expr(
        "(CAST(pair_count AS DOUBLE) / CAST(n_bg AS DOUBLE))"
        " / ((CAST(c1 AS DOUBLE) / CAST(n_tok AS DOUBLE))"
        "    * (CAST(c2 AS DOUBLE) / CAST(n_tok AS DOUBLE)))"
    )
    ranked = (
        joined.withColumn("_lift", lift)
        .orderBy(
            F.col("_lift").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(k)
    )
    rw = Window.orderBy(
        F.col("_lift").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return ranked.withColumn("rank", F.row_number().over(rw)).select(
        "w1", "w2", "pair_count", "c1", "c2",
        F.round("_lift", 6).alias("lift_r"), "rank",
    )
