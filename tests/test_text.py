"""Text-analysis operators on the real documents table."""

import pytest

from rhq_metrics_spark.pipelines.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42 times")], "id int, text string")
    row = token_stats(df).collect()[0]
    assert row["n_tokens_ws"] == 4
    # BPE-ish: Hello , world ! 42 times = 6
    assert row["n_tokens_bpe"] == 6
    assert row["n_chars_measured"] == len("Hello, world! 42 times")


def test_token_stats_on_real_docs(docs):
    out = token_stats(docs)
    rows = out.collect()
    assert all(r["n_tokens_ws"] > 0 for r in rows)
    assert all(r["n_chars_measured"] == r["n_chars"] for r in rows)


def test_quality_score_components(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away to the hills"
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], "id int, text string")
    out = {r["id"]: r for r in quality_score(df).collect()}
    assert out[1]["quality"] == 1.0
    # garbage passes only the two band checks (length, word length)
    assert out[2]["quality"] == 0.5
    assert out[2]["punct_ratio"] > 0.5
    # 'the'×3 + 'and' + 'to' = 5 stopwords of 16 tokens
    assert out[1]["stopword_ratio"] == pytest.approx(5 / 16)


def test_language_id(spark):
    rows = [
        (1, "the cat and the dog in a house is that it for"),
        (2, "der hund und die katze ist von dem haus nicht"),
        (3, "le chat et la maison est que pour les chiens"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr"
    assert out[4] == "und"


def test_fingerprint_deterministic_and_normalizing(spark):
    rows = [
        (1, "Hello   World foo bar baz"),
        (2, "hello world foo bar baz"),      # same after normalization
        (3, "entirely different text here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r for r in document_fingerprint(df).collect()}
    assert out[1]["fp_roll"] == out[2]["fp_roll"]
    assert out[1]["fp_min_shingle"] == out[2]["fp_min_shingle"]
    assert out[1]["fp_roll"] != out[3]["fp_roll"]


def test_fingerprint_python_oracle(spark):
    text = "abc def"
    df = spark.createDataFrame([(1, text)], "id int, text string")
    got = document_fingerprint(df).collect()[0]["fp_roll"]
    h = 0
    for ch in text:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    assert got == h


def test_vocab_stats_counts(spark):
    from rhq_metrics_spark.pipelines.text import vocab_stats

    df = spark.createDataFrame(
        [(1, "the cat  sat"), (2, "THE dog"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in vocab_stats(df).collect()}
    assert out["the"]["term_freq"] == 2 and out["the"]["doc_freq"] == 2
    assert out["cat"]["term_freq"] == 1
    assert "" not in out  # empty doc contributes nothing
    assert vocab_stats(df, min_count=2).count() == 1  # only "the"


def test_contamination_check_rates(spark):
    from rhq_metrics_spark.pipelines.text import contamination_check

    train = spark.createDataFrame(
        [(10, "a b c d e")], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [
            (1, "a b c x y"),   # shingles: {a b c, b c x, c x y} -> 1/3 match
            (2, "a b c d"),     # {a b c, b c d} -> 2/2
            (3, "zz qq"),       # too short for 3-grams -> 0 grams
            (4, "p q r s"),     # {p q r, q r s} -> 0/2
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_check(train, eval_df).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_matched"] == 1
    assert out[1]["contamination_rate"] == round(1 / 3, 6)
    assert out[2]["contamination_rate"] == 1.0
    assert (out[3]["n_grams"], out[3]["contamination_rate"]) == (0, 0.0)
    assert out[4]["n_matched"] == 0


def test_pii_scan_counts_and_redaction(spark):
    from rhq_metrics_spark.pipelines.text import pii_scan

    rows = [
        (1, "mail me at jo.doe@corp.io or visit https://a.example.com/x now"),
        (2, "server at 10.0.0.7 fell over"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_urls"], out[1]["n_ips"]) == (1, 1, 0)
    assert out[1]["redacted"] == "mail me at <EMAIL> or visit <URL> now"
    assert out[2]["n_ips"] == 1 and out[2]["has_pii"]
    assert out[2]["redacted"] == "server at <IP> fell over"
    assert not out[3]["has_pii"] and out[3]["redacted"] == rows[2][1]


def test_repetition_stats(spark):
    from rhq_metrics_spark.pipelines.text import repetition_stats

    rows = [
        (1, "a a a a"),                 # 1 distinct word of 4; 1 distinct 2-gram of 3
        (2, "w x y z"),                 # no repetition at all
        (3, "ab"),                      # too short for 2/3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_words"] == 4 and out[1]["dup_word_frac"] == 0.75
    assert out[1]["dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0
    assert out[3]["dup_2gram_frac"] == 0.0  # empty gram array, no crash


def test_url_domain_stats(spark):
    from rhq_metrics_spark.pipelines.text import url_domain_stats

    rows = [
        (1, "see https://a.io/x and https://a.io/y and https://b.net/z"),
        (2, "more from https://a.io/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in url_domain_stats(df).collect()}
    assert out == {"a.io": (3, 2), "b.net": (1, 1)}


def test_tfidf_top_terms(spark):
    from rhq_metrics_spark.pipelines.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "apple apple apple common common"),
            (1, "banana banana common common"),
            (2, "cherry common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # the doc-unique term always outranks the corpus-wide one
    assert top == {0: "apple", 1: "banana", 2: "cherry"}
    r0 = next(r for r in out if r["doc_id"] == 0)
    assert r0["df"] == 1 and r0["idf_bp"] == 30000 and r0["score_bp"] == 90000


def test_bm25_score_ranks_matching_docs(spark):
    from rhq_metrics_spark.pipelines.text import bm25_score

    docs = spark.createDataFrame(
        [
            (0, "spark spark spark runs fast"),
            (1, "spark appears once here with many extra padding words now"),
            (2, "no relevant terms at all"),
        ],
        "doc_id long, text string",
    )
    out = bm25_score(docs, ["spark"], top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 0            # higher tf, shorter doc wins
    assert 2 not in ids           # non-matching doc filtered
    assert all(r["score"] > 0 for r in out)


def test_lm_bigram_score_hand_computed(spark):
    from rhq_metrics_spark.pipelines.text import lm_bigram_score

    docs = spark.createDataFrame(
        [
            (0, "a b a b"),   # bigrams: "a b"×2, "b a"×1
            (1, "a b"),       # bigram: "a b"
            (2, "c"),         # no bigram — contributes 'c' to vocab only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_bigram_score(docs).collect()}
    # vocab = {a, b, c} -> V=3; c("a b")=3, c(a .)=3; c("b a")=1, c(b .)=1
    # p_bp("a b") = 4_000_000 // 6 = 666666 -> 20 bits -> 1 qbit surprisal
    # p_bp("b a") = 2_000_000 // 4 = 500000 -> 19 bits -> 2 qbits
    assert set(out) == {0, 1}  # doc 2 has no bigram
    assert out[0]["n_bigrams"] == 3
    assert out[0]["sum_p_bp"] == 2 * 666666 + 500000
    assert out[0]["min_p_bp"] == 500000
    assert out[0]["xent_qbits"] == pytest.approx(4 / 3)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["min_p_bp"] == 666666
    assert out[1]["xent_qbits"] == 1.0


def test_lm_bigram_score_orders_gibberish_above_repetition(spark):
    from rhq_metrics_spark.pipelines.text import lm_bigram_score

    repetitive = " ".join(["the cat sat"] * 20)
    gibberish = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, repetitive), (1, gibberish)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_bigram_score(docs).collect()}
    # every gibberish bigram is a hapax: improbable under the corpus LM
    assert out[1]["xent_qbits"] > out[0]["xent_qbits"]
    assert out[0]["min_p_bp"] > out[1]["min_p_bp"]


def test_lm_bigram_score_on_real_docs(docs):
    from rhq_metrics_spark.pipelines.text import lm_bigram_score

    rows = lm_bigram_score(docs).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert 1 <= r["xent_qbits"] <= 21
        assert 0 <= r["min_p_bp"] <= 1_000_000
        assert r["avg_p_bp"] >= r["min_p_bp"]


def test_substring_dup_spans_planted_passage(spark):
    """EXACTSUBSTR: a verbatim 12-token passage embedded in two
    otherwise-unrelated docs is caught span-for-span; a doc shorter
    than the window gets an all-zero row; self-repetition within one
    doc does NOT count as duplication."""
    from rhq_metrics_spark.pipelines.text import substring_dup_spans

    passage = " ".join(f"p{i}" for i in range(12))
    rows = [
        (1, "alpha beta gamma " + passage + " delta epsilon zeta"),
        (2, "one two three four five " + passage + " six seven"),
        (3, "totally unrelated words " + " ".join(f"u{i}" for i in range(20))),
        (4, "short doc"),
        # doc 5 repeats ITS OWN phrase twice — not a cross-doc dup
        (5, " ".join(f"s{i}" for i in range(12)) + " " +
            " ".join(f"s{i}" for i in range(12))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dup_spans(df, window=12, min_docs=2).collect()}
    assert len(out) == 5
    # doc 1: 18 tokens -> 7 windows; exactly ONE window is the pure
    # passage (the others mix in unique context tokens)
    assert out[1]["n_windows"] == 7 and out[1]["n_dup_windows"] == 1
    assert out[1]["max_share"] == 2
    assert out[2]["n_dup_windows"] == 1 and out[2]["max_share"] == 2
    assert out[1]["dup_bp"] == 1_000_000 // 7
    assert out[3]["n_dup_windows"] == 0 and out[3]["max_share"] == 1
    assert out[4]["n_windows"] == 0 and out[4]["dup_bp"] == 0
    assert out[5]["n_dup_windows"] == 0  # self-repeat excluded


def test_decontaminate_spans_removes_eval_passages(spark):
    """Span decontamination: the contaminated 10-token passage is cut
    out of the training doc (surviving tokens keep order), clean docs
    pass through untouched, short docs pass through whole."""
    from rhq_metrics_spark.pipelines.text import decontaminate_spans

    passage = " ".join(f"q{i}" for i in range(10))
    train = spark.createDataFrame(
        [(1, "intro words here " + passage + " outro tail words"),
         (2, "totally clean document " + " ".join(f"c{i}" for i in range(12))),
         (3, "tiny doc")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "benchmark question: " + passage + " answer choices follow")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           decontaminate_spans(train, eval_df, window=10).collect()}
    assert len(out) == 3
    # doc 1: 16 tokens; exactly the 10 passage positions are covered
    # (the mixed-context windows around it don't appear in eval)
    assert out[1]["n_tokens"] == 16
    assert out[1]["n_removed_tokens"] == 10
    assert out[1]["clean_text"] == "intro words here outro tail words"
    assert out[2]["n_removed_tokens"] == 0
    assert out[2]["clean_text"].startswith("totally clean document")
    assert out[3]["n_tokens"] == 2 and out[3]["n_removed_tokens"] == 0
    assert out[3]["clean_text"] == "tiny doc"


def test_substring_index_incremental_roundtrip(spark):
    """Incremental EXACTSUBSTR: batch spans found against the standing
    index (corpus-shared YES, batch-internal NO — documented contract),
    and after substring_index_append a re-probe of the same batch finds
    its own spans."""
    from rhq_metrics_spark.pipelines.text import (
        substring_dups_against_index,
        substring_index,
        substring_index_append,
    )

    passage = " ".join(f"w{i}" for i in range(10))
    corpus = spark.createDataFrame(
        [(1, "corpus doc one holds " + passage + " right here"),
         (2, "corpus doc two " + " ".join(f"c{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    batch_shared = " ".join(f"b{i}" for i in range(10))
    batch = spark.createDataFrame(
        [(10, "lead in " + passage + " and out"),    # shares with corpus 1
         (11, "alpha " + batch_shared + " beta"),    # shares with 12 only
         (12, "gamma " + batch_shared + " delta"),
         (13, "wholly novel " + " ".join(f"n{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    idx = substring_index(corpus, window=10)
    dec = {r["doc_id"]: r for r in substring_dups_against_index(
        batch, idx, window=10
    ).collect()}
    assert dec[10]["n_dup_windows"] == 1 and dec[10]["max_share"] == 2
    # batch-internal sharing is NOT the incremental operator's job
    assert dec[11]["n_dup_windows"] == 0 and dec[12]["n_dup_windows"] == 0
    assert dec[13]["n_dup_windows"] == 0

    idx2 = substring_index_append(idx, batch, window=10)
    # merged counts: the corpus passage window now counts 2 docs
    # (corpus doc 1 + batch doc 10)
    rerun = {r["doc_id"]: r for r in substring_dups_against_index(
        batch, idx2, window=10
    ).collect()}
    assert rerun[10]["max_share"] == 3  # 2 in index + this doc
    # re-probing a batch already folded into the index self-matches
    # every window (count >= 1 each) — same contract as re-running a
    # batch against index_append'ed minhash signatures; the sharing
    # DEPTH still distinguishes the genuinely-shared middle window
    assert rerun[11]["n_dup_windows"] == rerun[11]["n_windows"] == 3
    assert rerun[11]["max_share"] == 3  # 11+12 in index + this probe
    assert rerun[13]["n_dup_windows"] == rerun[13]["n_windows"]
    assert rerun[13]["max_share"] == 2  # only its own indexed spans


def _kn_reference(texts: dict[int, str], p_scale: int = 1_000_000):
    """Pure-Python interpolated KN (D=3/4) mirroring kneser_ney_score."""
    import math
    from collections import Counter, defaultdict

    toks = {i: [t for t in s.strip().lower().split() if t] for i, s in texts.items()}
    bg_occ = defaultdict(list)
    bgc = Counter()
    for i, ts in toks.items():
        for a, b in zip(ts, ts[1:]):
            bg_occ[i].append((a, b))
            bgc[(a, b)] += 1
    c_ctx = Counter(); n1p_fwd = Counter(); n1p_bwd = Counter()
    for (a, b), c in bgc.items():
        c_ctx[a] += c
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    n_types = len(bgc)
    p_bp = {}
    for (a, b), c in bgc.items():
        p = (4 * c - 3) / (4 * c_ctx[a]) + (3 * n1p_fwd[a]) / (4 * c_ctx[a]) * (
            n1p_bwd[b] / n_types
        )
        p_bp[(a, b)] = int(math.floor(p * p_scale))
    out = {}
    for i, occ in bg_occ.items():
        if not occ:
            continue
        ps = [p_bp[x] for x in occ]
        out[i] = (
            len(ps),
            sum(ps),
            min(ps),
            sum(21 - max(1, v.bit_length()) for v in ps),
        )
    return out


def test_kneser_ney_score_matches_pure_python_reference(spark):
    from rhq_metrics_spark.pipelines.text import kneser_ney_score

    texts = {
        0: "a b a b c a",
        1: "a b",
        2: "b c b a c c",
        3: "x",          # no bigram
        4: "c a c a b b a",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    want = _kn_reference(texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p_bp"], r["min_p_bp"], r["kn_xent_qbits"])
        for r in kneser_ney_score(docs).collect()
    }
    assert got == want


def test_kneser_ney_min_count_prune(spark):
    """min_count=1 is bit-identical to the default exact computation;
    min_count=2 recomputes the KN count tables over the pruned TYPES
    table (the Chen & Goodman count cutoff) — matching the pure-Python
    reference run on only the surviving types."""
    import math
    from collections import Counter, defaultdict

    import pytest

    from rhq_metrics_spark.pipelines.text import kneser_ney_score

    texts = {
        0: "a b a b c a",
        1: "a b",
        2: "b c b a c c",
        3: "q z",        # singleton bigram: pruned at min_count=2
        4: "c a c a b b a",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    exact = sorted(map(tuple, kneser_ney_score(docs).collect()))
    mc1 = sorted(map(tuple, kneser_ney_score(docs, min_count=1).collect()))
    assert mc1 == exact

    # pure-Python reference restricted to types with count >= 2
    toks = {i: [t for t in s.split() if t] for i, s in texts.items()}
    bgc = Counter()
    occ = defaultdict(list)
    for i, ts in toks.items():
        for p in zip(ts, ts[1:]):
            bgc[p] += 1
            occ[i].append(p)
    kept = {p: c for p, c in bgc.items() if c >= 2}
    c_ctx = Counter(); n1p_fwd = Counter(); n1p_bwd = Counter()
    for (a, b), c in kept.items():
        c_ctx[a] += c; n1p_fwd[a] += 1; n1p_bwd[b] += 1
    n_types = len(kept)
    p_bp = {
        p: int(math.floor(((4 * c - 3) / (4 * c_ctx[p[0]])
             + (3 * n1p_fwd[p[0]]) / (4 * c_ctx[p[0]]) * (n1p_bwd[p[1]] / n_types))
             * 1_000_000))
        for p, c in kept.items()
    }
    want = {}
    for i, pairs in occ.items():
        ps = [p_bp[p] for p in pairs if p in kept]
        if ps:
            want[i] = (len(ps), sum(ps), min(ps),
                       sum(21 - max(1, v.bit_length()) for v in ps))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p_bp"], r["min_p_bp"], r["kn_xent_qbits"])
        for r in kneser_ney_score(docs, min_count=2).collect()
    }
    assert got == want
    assert 3 not in got and 1 in got  # all-singleton doc 3 ('q z') dropped

    with pytest.raises(ValueError, match="min_count"):
        kneser_ney_score(docs, min_count=0)


def test_kneser_ney_prefers_versatile_continuations(spark):
    """The KN signature: a word seen after MANY distinct contexts gets
    more backoff mass than one frequent in a single context."""
    from rhq_metrics_spark.pipelines.text import kneser_ney_score

    # 'glue' follows 6 distinct words once each; 'spam' follows only
    # 'fixed' but 6 times.  Both bigrams under 'probe' are unseen-ish:
    # compare the two probe bigrams' floor probabilities via min_p_bp
    # of the one-bigram probe docs.
    corpus = [(i, f"w{i} glue") for i in range(6)] + [
        (10 + j, "fixed spam") for j in range(6)
    ]
    probes = [(100, "glue spam"), (101, "spam glue")]
    docs = spark.createDataFrame(corpus + probes, "doc_id long, text string")
    out = {r["doc_id"]: r for r in kneser_ney_score(docs).collect()}
    # P(glue | spam) backoff: n1p_bwd(glue)=6 contexts beats
    # P(spam | glue): n1p_bwd(spam)=1 context (equal c_bg=1 each)
    assert out[101]["min_p_bp"] > out[100]["min_p_bp"]


def test_readability_scores_hand_computed(spark):
    from rhq_metrics_spark.pipelines.text import readability_scores

    docs = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran!"),   # 6 words, 2 sentences
            (1, "simple"),                      # fragment -> 1 sentence
            (2, "   "),                         # no words -> dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    assert set(out) == {0, 1}
    r0 = out[0]
    assert (r0["n_words"], r0["n_sentences"]) == (6, 2)
    # vowel groups: e-a-a-e-o-a -> "the cat sat. the dog ran!" = 6
    assert r0["n_syllables"] == 6
    wps, spw = 6 / 2, 6 / 6
    assert r0["fre_r"] == round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    assert r0["fk_grade_r"] == round(0.39 * wps + 11.8 * spw - 15.59, 4)
    assert out[1]["n_sentences"] == 1


def test_readability_orders_simple_above_polysyllabic(spark):
    from rhq_metrics_spark.pipelines.text import readability_scores

    docs = spark.createDataFrame(
        [
            (0, "The cat sat on the mat. It was fun."),
            (1, "Incomprehensibility characterizes multisyllabic terminological "
                "administrative documentation extraordinarily."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    assert out[0]["fre_r"] > out[1]["fre_r"]
    assert out[0]["fk_grade_r"] < out[1]["fk_grade_r"]


def test_collocations_hand_computed(spark):
    """Lift ranks the bound pair above the frequent-but-independent
    pair; min_count floors apply to pairs and words."""
    from rhq_metrics_spark.pipelines.text import collocations

    # 'new york' always adjacent (bound); 'the cat' frequent but 'the'
    # is everywhere (independent); 'rare gem' appears once (floored)
    docs = [
        *["new york " + "the cat " * 2] * 3,
        "the dog the bird the fish",
        "rare gem",
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "doc_id long, text string")
    out = [
        (r["w1"], r["w2"], r["pair_count"], r["rank"])
        for r in collocations(df, k=5, min_count=3).collect()
    ]
    assert out[0][:2] == ("new", "york")
    assert ("rare", "gem") not in {(a, b) for a, b, _, _ in out}
    # pure-Python lift pin for the top pair
    import re
    toks = [t for d in docs for t in d.split()]
    n_tok = len(toks)
    pairs = []
    for d in docs:
        ws = d.split()
        pairs += list(zip(ws, ws[1:]))
    n_bg = len(pairs)
    c_ny = pairs.count(("new", "york"))
    c1 = toks.count("new"); c2 = toks.count("york")
    want = (c_ny / n_bg) / ((c1 / n_tok) * (c2 / n_tok))
    got_lift = [
        r["lift_r"] for r in collocations(df, k=5, min_count=3).collect()
    ][0]
    assert abs(got_lift - round(want, 6)) < 1e-9


def test_collocations_validation(spark):
    import pytest

    from rhq_metrics_spark.pipelines.text import collocations

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k"):
        collocations(df, k=0)
    with pytest.raises(ValueError, match="min_count"):
        collocations(df, min_count=0)
