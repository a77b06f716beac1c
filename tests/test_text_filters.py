"""Gopher/MassiveText document filter, C4 line-level cleaning, and the
W10 EWMA smoother — rule-by-rule against hand-computed oracles.

The driver corpus is single-line and punctuation-free, so the line-level
rules (terminal punctuation, bullets, ellipses, page tokens) are
exercised here on multi-line fixtures; the driver query covers the
word-count rules end-to-end against the DuckDB oracle.
"""

from __future__ import annotations

from fractions import Fraction

from rhq_metrics_spark.operators.anomaly import ewma_smooth, ewma_weights
from rhq_metrics_spark.pipelines.text import (
    c4_line_clean,
    gopher_quality_filter,
)

# 64 words, mean word length exactly 3.0 (the inclusive lower bound),
# all 8 required stopwords present
GOOD_WORDS = " ".join(
    ["the", "be", "to", "of", "and", "that", "have", "with"] * 8
)


def _gopher(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_filter(df, **kw).collect()[0]


def test_gopher_keeps_plain_prose(spark):
    r = _gopher(spark, GOOD_WORDS)
    assert r["kept"]
    assert r["n_words"] == 64
    assert r["n_stop_present"] == 8
    assert r["alpha_word_frac"] == 1.0
    assert r["mean_word_len"] == 3.0


def test_gopher_word_count_band(spark):
    assert not _gopher(spark, "the be to of and that have with")["kept"]
    r = _gopher(spark, GOOD_WORDS, min_words=65)
    assert not r["kept"]


def test_gopher_mean_word_length_band(spark):
    # 60 x 1-char words -> mean 1.0 < 3.0
    assert not _gopher(spark, " ".join(["a"] * 60))["kept"]
    long_words = " ".join(["the", "be"] + ["antidisestablishment"] * 58)
    assert not _gopher(spark, long_words)["kept"]


def test_gopher_symbol_ratio(spark):
    # 12 '#' chars and 3 '...' runs over 68 words -> 15/68 > 0.1
    r = _gopher(spark, GOOD_WORDS + " " + "#" * 12 + " ... ... ...")
    assert r["symbol_ratio"] > 0.1 and not r["kept"]
    # '......' counts as TWO non-overlapping ellipsis runs
    r2 = _gopher(spark, "x ......")
    assert r2["symbol_ratio"] == 1.0  # 2 runs / 2 words


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- " + GOOD_WORDS] * 10)
    r = _gopher(spark, bullets)
    assert r["bullet_frac"] == 1.0 and not r["kept"]
    ell = "\n".join([GOOD_WORDS + " ..."] * 4 + [GOOD_WORDS] * 6)
    r2 = _gopher(spark, ell)
    assert abs(r2["ellipsis_frac"] - 0.4) < 1e-9 and not r2["kept"]
    # 30% exactly is allowed (<=)
    ok = "\n".join([GOOD_WORDS + " ..."] * 3 + [GOOD_WORDS] * 7)
    assert _gopher(spark, ok)["kept"]


def test_gopher_alpha_word_fraction(spark):
    # 64 good words + 32 pure-digit words -> 64/96 = 0.667 < 0.8
    r = _gopher(spark, GOOD_WORDS + " " + " ".join(["123"] * 32))
    assert not r["kept"]
    assert abs(r["alpha_word_frac"] - 64 / 96) < 1e-6


def test_gopher_required_stopwords(spark):
    no_stop = " ".join(["quick", "brown", "fox", "jumps"] * 15)
    r = _gopher(spark, no_stop)
    assert r["n_stop_present"] == 0 and not r["kept"]
    one_stop = "the " + no_stop
    assert _gopher(spark, one_stop)["n_stop_present"] == 1
    assert not _gopher(spark, one_stop)["kept"]


LINE_OK = "This line has plenty of words to satisfy the rule."


def _c4(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_line_clean(df, **kw).collect()[0]


def test_c4_keeps_terminal_punct_lines_only(spark):
    text = "\n".join(
        [
            LINE_OK,                      # ends '.' -> kept
            "short line.",                # < 5 words -> dropped
            "no terminal punctuation here at all",   # dropped
            "Does this line of words end in a question mark?",  # kept
            'He said "keep lines ending in a quote character."',  # kept
        ]
    )
    r = _c4(spark, text)
    assert r["n_lines"] == 5
    assert r["n_kept_lines"] == 3
    assert r["kept"]
    assert r["clean_text"].count("\n") == 2
    assert "short line." not in r["clean_text"]


def test_c4_page_rules(spark):
    three_good = "\n".join([LINE_OK] * 3)
    assert _c4(spark, three_good)["kept"]
    # fewer than min_kept_lines surviving -> page dropped, text nulled
    r = _c4(spark, "\n".join([LINE_OK] * 2))
    assert not r["kept"] and r["clean_text"] is None
    # lorem ipsum / curly brace anywhere kills the page
    assert not _c4(spark, three_good + "\nLorem Ipsum dolor sit amet.")["kept"]
    assert not _c4(spark, three_good.replace("words", "w{rds"))["kept"]


def test_c4_javascript_line_rule_and_blank_lines(spark):
    text = "\n".join(
        [LINE_OK, "", "  ", "Please enable JavaScript to view the comments."]
        + [LINE_OK] * 2
    )
    r = _c4(spark, text)
    assert r["n_lines"] == 4  # blanks excluded
    assert r["n_kept_lines"] == 3  # javascript line dropped
    assert "JavaScript" not in r["clean_text"]


def test_c4_terminal_punct_toggle(spark):
    text = "\n".join(["five words but no punct ever"] * 3)
    assert not _c4(spark, text)["kept"]
    assert _c4(spark, text, require_terminal_punct=False)["kept"]


def test_ewma_weights_are_exact_geometric():
    ws = ewma_weights(8, 1, 4)
    assert ws[0] == 4**7 and ws[-1] == 3**7
    for j in range(1, 8):
        assert Fraction(ws[j], ws[j - 1]) == Fraction(3, 4)


def test_ewma_matches_python_oracle_and_warmup(spark):
    vals = [0, 100, 200, 300, 400, 0, 100, 200, 300, 400, 0, 100]
    rows = [("m", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts long, v long")
    out = ewma_smooth(
        df, on=["key"], order=["ts"], value_col="v",
        window_n=8, alpha_num=1, alpha_den=4,
    )
    got = {r["ts"]: r["ewma"] for r in out.collect()}
    ws = ewma_weights(8, 1, 4)
    for i in range(len(vals)):
        lags = [vals[i - j] for j in range(min(i + 1, 8))]
        num = sum(w * v for w, v in zip(ws, lags))
        den = sum(ws[: len(lags)])
        assert got[i] == num / den  # exact: int/int, one IEEE division
    # row 1 of a series is itself (full warmup renormalization)
    assert got[0] == 0.0


def test_ewma_is_per_series(spark):
    rows = [("a", 0, 10), ("a", 1, 20), ("b", 0, 1000)]
    df = spark.createDataFrame(rows, "key string, ts long, v long")
    out = {
        (r["key"], r["ts"]): r["ewma"]
        for r in ewma_smooth(
            df, on=["key"], order=["ts"], value_col="v", window_n=4
        ).collect()
    }
    assert out[("b", 0)] == 1000.0  # series b never sees series a
    ws = ewma_weights(4, 1, 4)
    assert out[("a", 1)] == (ws[0] * 20 + ws[1] * 10) / (ws[0] + ws[1])


def test_bpe_pair_counts_hand_corpus(spark):
    from rhq_metrics_spark.pipelines.text import bpe_pair_counts

    # 'abab' x3 + 'ab' x2: pairs ab=2*3+1*2=8, ba=1*3=3; 'x' contributes none
    df = spark.createDataFrame(
        [(1, "abab abab x"), (2, "abab ab"), (3, "ab")],
        "doc_id long, text string",
    )
    rows = bpe_pair_counts(df).collect()
    got = {r["pair"]: (r["rank"], r["n"]) for r in rows}
    assert got["ab"] == (1, 8)
    assert got["ba"] == (2, 3)
    assert "x" not in got and len(rows) == 2


def test_bpe_pair_counts_rank_tie_break_and_topk(spark):
    from rhq_metrics_spark.pipelines.text import bpe_pair_counts

    # 'cd' and 'ef' tie at 1 -> alphabetical; top_k truncates
    df = spark.createDataFrame([(1, "cd ef")], "doc_id long, text string")
    rows = bpe_pair_counts(df, top_k=1).collect()
    assert [(r["rank"], r["pair"]) for r in rows] == [(1, "cd")]


def test_bpe_encode_word_kernel():
    from rhq_metrics_spark.pipelines.text import bpe_encode_word

    ranks = {"ab": 0, "abc": 1, "cd": 2}
    # 'ab' merges first (rank 0), then 'ab'+'c' -> 'abc' (rank 1)
    assert bpe_encode_word("abcd", ranks) == ["abc", "d"]
    # all occurrences of the chosen pair merge in one pass
    assert bpe_encode_word("abab", ranks) == ["ab", "ab"]
    # no applicable merge -> characters
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_encode_word("a", ranks) == ["a"]


def test_bpe_apply_roundtrip_and_order(spark):
    from rhq_metrics_spark.pipelines.text import bpe_apply, bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "banana band ban"), (2, "ana banana")],
        "doc_id long, text string",
    )
    # learn merges from the corpus itself (train leg), apply them
    merges = [r["pair"] for r in bpe_pair_counts(df, top_k=3).collect()]
    out = {r["doc_id"]: r for r in bpe_apply(df, merges).collect()}
    # invariant: concatenating a doc's subwords reproduces its words
    # in order, with no characters lost
    assert "".join(out[1]["subwords"]) == "bananabandban"
    assert "".join(out[2]["subwords"]) == "anabanana"
    assert out[1]["n_words"] == 3 and out[2]["n_words"] == 2
    # merges compress: fewer subwords than characters
    assert out[1]["n_subwords"] < len("bananabandban")
    # the subword stream matches the per-word kernel
    from rhq_metrics_spark.pipelines.text import bpe_encode_word

    ranks = {p: i for i, p in enumerate(merges)}
    expected = []
    for w in "banana band ban".split():
        expected += bpe_encode_word(w, ranks)
    assert list(out[1]["subwords"]) == expected


def test_boilerplate_line_filter(spark):
    from rhq_metrics_spark.pipelines.text import boilerplate_line_filter

    footer = "cookie notice applies"
    docs = [
        (1, "unique alpha content\n" + footer + "\nmore alpha"),
        (2, "unique beta content\n" + footer),
        (3, footer),  # nothing survives
        (4, "only unique gamma line"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_line_filter(df).collect()}
    assert out[1]["clean_text"] == "unique alpha content\nmore alpha"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept_lines"] == 2
    assert out[2]["clean_text"] == "unique beta content"
    assert out[3]["clean_text"] is None and out[3]["n_kept_lines"] == 0
    assert out[4]["clean_text"] == "only unique gamma line"
    # threshold respected: min_docs=4 keeps the 3-doc footer
    relaxed = {
        r["doc_id"]: r
        for r in boilerplate_line_filter(df, min_docs=4).collect()
    }
    assert footer in relaxed[1]["clean_text"]


def test_boilerplate_preserves_order_and_blank_lines_excluded(spark):
    from rhq_metrics_spark.pipelines.text import boilerplate_line_filter

    df = spark.createDataFrame(
        [(1, "z last?\n\n  \na first\nshared\nm middle"),
         (2, "shared")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in boilerplate_line_filter(df).collect()}[1]
    # original order kept (not sorted alphabetically); blanks not counted
    assert r["clean_text"] == "z last?\na first\nm middle"
    assert r["n_lines"] == 4


def test_boilerplate_all_blank_doc_still_emits_row(spark):
    """One row per input doc even when the doc has no non-empty lines
    (ADVICE r9): consistent with c4_line_clean's per-doc contract."""
    from rhq_metrics_spark.pipelines.text import boilerplate_line_filter

    df = spark.createDataFrame(
        [(1, "real line\nshared"), (2, "shared"), (3, "\n   \n")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_line_filter(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == "real line"
    assert out[2]["n_lines"] == 1 and out[2]["clean_text"] is None
    r3 = out[3]
    assert r3["n_lines"] == 0 and r3["n_kept_lines"] == 0
    assert r3["clean_text"] is None


# -- BPE merge TRAINING (the iterative loop) ---------------------------------

_BPE_TOK = None


def _ref_bpe_learn(texts, n_merges):
    """Pure-Python Sennrich 2016 trainer: the oracle for bpe_learn_merges
    (same tokenization regex, same (count desc, pair asc) tiebreak)."""
    import re
    from collections import Counter

    from rhq_metrics_spark.pipelines.text import BPE_ISH_PATTERN

    tok = re.compile(BPE_ISH_PATTERN)
    wf = Counter(w for t in texts for w in tok.findall(t))
    vocab = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_learn_merges_matches_python_reference(spark):
    """The distributed trainer (recount over the word-frequency table)
    equals the classic in-memory trainer merge for merge, including
    merges OF merged symbols and count ties."""
    from rhq_metrics_spark.pipelines.text import bpe_learn_merges

    texts = [
        "banana banana banana bandana",
        "band band ban an ana",
        "cd cd ef ef",  # tie at the tail: 'cd' before 'ef'
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe_learn_merges(df, 8)
    want, _ = _ref_bpe_learn(texts, 8)
    assert got == want
    # the loop learned a multi-char merge (a merge of a merged symbol)
    assert any(len(a) > 1 or len(b) > 1 for a, b, _ in got)


def test_bpe_learn_apply_roundtrip(spark):
    """Encoding with the learned ranks reproduces the trainer's final
    vocabulary segmentation (the classic BPE train->apply consistency),
    end to end through bpe_apply."""
    from rhq_metrics_spark.pipelines.text import (
        bpe_apply,
        bpe_encode_word,
        bpe_learn_merges,
    )

    texts = ["low lower lowest newest widest", "new news newest low low"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    learned = bpe_learn_merges(df, 10)
    want_merges, final_vocab = _ref_bpe_learn(texts, 10)
    assert learned == want_merges
    merges = [a + b for a, b, _ in learned]
    ranks = {p: i for i, p in enumerate(merges)}
    for w, segs in final_vocab.items():
        assert bpe_encode_word(w, ranks) == segs, w
    out = {r["doc_id"]: r for r in bpe_apply(df, merges).collect()}
    assert list(out[0]["subwords"]) == [
        s for w in texts[0].split() for s in final_vocab[w]
    ]


def test_bpe_learn_merges_early_stop_and_validation(spark):
    from rhq_metrics_spark.pipelines.text import bpe_learn_merges

    df = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    # single-char words: nothing to merge, empty list (early stop)
    assert bpe_learn_merges(df, 5) == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_merges"):
        bpe_learn_merges(df, 0)


# -- URL canonicalization ------------------------------------------------------


def test_canonical_url_rules(spark):
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.text import canonical_url

    cases = [
        # fragment stripped
        ("https://site.com/a#frag", "https://site.com/a"),
        # scheme+host lowercased, path case preserved
        ("HTTPS://Site.COM/CaseSensitive", None),  # checked below
        # default ports dropped, non-default kept
        ("http://site.com:80/a", "http://site.com/a"),
        ("https://site.com:443/a", "https://site.com/a"),
        ("http://site.com:8080/a", "http://site.com:8080/a"),
        # www stripped
        ("https://www.site.com/a", "https://site.com/a"),
        # tracking params stripped in every position
        ("https://s.com/a?utm_source=x", "https://s.com/a"),
        ("https://s.com/a?utm_source=x&id=7", "https://s.com/a?id=7"),
        ("https://s.com/a?id=7&utm_medium=y", "https://s.com/a?id=7"),
        ("https://s.com/a?id=7&gclid=g&fbclid=f", "https://s.com/a?id=7"),
        ("https://s.com/a?utm_a=1&utm_b=2", "https://s.com/a"),
        # trailing slash trimmed
        ("https://s.com/path/", "https://s.com/path"),
        # everything at once
        ("HTTP://WWW.Site.com:80/P age".replace(" ", "") + "/?utm_x=1#f",
         "http://site.com/Page"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        if want is not None:
            assert got[i] == want, (u, got[i], want)
    assert got[1] == "https://site.com/CaseSensitive"


def test_url_canonical_dedup_groups_variants(spark):
    from rhq_metrics_spark.pipelines.text import url_canonical_dedup

    rows = [
        (1, "https://www.shop.com/item?utm_source=mail"),
        (2, "https://shop.com/item"),
        (3, "HTTPS://SHOP.COM:443/item#reviews"),
        (4, "https://shop.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canon_url"]: r for r in url_canonical_dedup(df).collect()}
    item = out["https://shop.com/item"]
    assert item["n_urls"] == 3 and item["n_docs"] == 3
    assert item["sample_url"] == "HTTPS://SHOP.COM:443/item#reviews"
    assert out["https://shop.com/other"]["n_urls"] == 1


def test_tokenizer_fertility_exact(spark):
    from rhq_metrics_spark.pipelines.text import tokenizer_fertility

    rows = [
        (1, "en", "hello world"),          # 2 words, 2 bpe tokens
        (2, "en", "don't stop"),           # 2 words, 4 bpe (don ' t stop)
        (3, "zh", "abc123 x"),             # 2 words, 3 bpe (abc 123 x)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en = out["en"]
    assert en["n_docs"] == 2 and en["n_words"] == 4 and en["n_tokens"] == 6
    assert en["n_bytes"] == len("hello world") + len("don't stop")
    assert en["tokens_per_word_ppm"] == 6 * 1_000_000 // 4
    assert en["bytes_per_token_ppm"] == en["n_bytes"] * 1_000_000 // 6
    zh = out["zh"]
    assert zh["n_words"] == 2 and zh["n_tokens"] == 3


def test_substring_self_dedup_keeps_one_copy(spark):
    """EXACTSUBSTR removal: the global first occurrence of a duplicated
    span survives, later copies are stripped (cross-doc AND within-doc);
    short docs and unique content pass through unchanged."""
    from rhq_metrics_spark.pipelines.text import substring_self_dedup

    passage = "alpha beta gamma delta"
    docs = [
        (1, f"intro words here {passage} tail one"),
        (2, f"other opener {passage} tail two"),            # later copy
        (3, "totally unique content of document three ok"),
        (4, "pp qq rr ss zz pp qq rr ss"),                   # internal repeat
        (5, "tiny doc"),                                     # < window
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_self_dedup(df, window=4).collect()}
    assert len(out) == 5
    # doc 1 holds the first occurrence of every shared window: intact
    assert out[1]["n_removed_tokens"] == 0
    assert out[1]["clean_text"] == docs[0][1]
    # doc 2's copy is stripped ("tail" goes too: "beta gamma delta
    # tail" is itself a shared window); unique head and final token stay
    assert out[2]["n_removed_tokens"] >= 5
    assert passage not in out[2]["clean_text"]
    assert out[2]["clean_text"].startswith("other opener")
    assert out[2]["clean_text"].endswith("two")
    # unique doc untouched
    assert out[3]["n_removed_tokens"] == 0
    # within-doc repeat: the second copy goes (doc 4's own passage at
    # pos 5.. loses to pos 0..)
    assert out[4]["n_removed_tokens"] == 4
    assert out[4]["clean_text"] == "pp qq rr ss zz"
    # short doc passes through
    assert out[5]["clean_text"] == "tiny doc"
    assert out[5]["n_removed_tokens"] == 0


# -- unigram-LM (SentencePiece-style) tokenizer training ----------------------


def _ref_unigram_train(texts, vocab_size, max_piece_len=4, seed_size=40,
                       em_iters=2, prune_frac=0.25, max_rounds=50):
    """Pure-Python Kudo 2018 Viterbi-EM trainer: the oracle for
    unigram_lm_train (same seeding, same shared mstep/prune/encode
    kernels, same loop structure — exact-integer counts make the two
    bit-identical)."""
    from collections import Counter

    from rhq_metrics_spark.pipelines.text import (
        unigram_encode_word,
        unigram_mstep,
        unigram_prune,
    )

    wf = Counter(w for t in texts for w in t.lower().split() if w)
    pc: Counter = Counter()
    for w, f in wf.items():
        n = len(w)
        for i in range(n):
            for plen in range(1, min(max_piece_len, n - i) + 1):
                pc[w[i:i + plen]] += f
    counts = {p: c for p, c in pc.items() if len(p) == 1}
    for p, c in sorted(
        ((p, c) for p, c in pc.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]:
        counts[p] = c
    seed_n = len(counts)
    logprobs = unigram_mstep(counts)
    rounds = 0
    while True:
        rounds += 1
        for _ in range(em_iters):
            raw: Counter = Counter()
            for w, f in wf.items():
                pieces, _ = unigram_encode_word(w, logprobs, max_piece_len)
                for p in pieces:
                    raw[p] += f
            counts = {p: raw.get(p, 0) for p in logprobs}
            logprobs = unigram_mstep(counts)
        counts = {p: c for p, c in counts.items() if p in logprobs}
        if len(logprobs) <= vocab_size or rounds >= max_rounds:
            break
        pruned = unigram_prune(counts, vocab_size, prune_frac)
        if len(pruned) == len(counts):
            break
        counts = pruned
        logprobs = unigram_mstep(counts)
    return logprobs, rounds, seed_n


_UNI_TEXTS = [
    "internationalization international internal nation nationalize",
    "the nation the national anthem the internal affairs",
    "internally national nation nation inter inter alia",
    "ization ization ize ize izer the the the",
]


def test_unigram_lm_train_matches_python_reference(spark):
    """The distributed Viterbi-EM trainer (mapInPandas over the
    word-frequency table, exact-integer counts) equals the classic
    in-memory trainer — piece set AND log-probs bit-identical,
    including the prune rounds."""
    from rhq_metrics_spark.pipelines.text import unigram_lm_train

    df = spark.createDataFrame(
        list(enumerate(_UNI_TEXTS)), "doc_id long, text string"
    )
    got = unigram_lm_train(
        df, vocab_size=24, max_piece_len=4, seed_size=40, em_iters=2
    )
    want, rounds, seed_n = _ref_unigram_train(_UNI_TEXTS, 24)
    assert got["seed_n"] == seed_n
    assert got["rounds"] == rounds
    assert got["logprobs"] == want  # exact float equality: shared kernels
    assert len(got["logprobs"]) <= 24 + 0  # hit the target (chars can exceed)
    # multi-char pieces were learned, chars all survive
    pieces = set(got["logprobs"])
    assert any(len(p) > 1 for p in pieces)
    chars = {c for t in _UNI_TEXTS for c in t.lower() if not c.isspace()}
    assert chars <= pieces
    # the pieces DataFrame mirrors the dict
    tbl = {r["piece"]: r["logprob"] for r in got["pieces"].collect()}
    assert tbl == want


def test_unigram_apply_roundtrip_and_fertility(spark):
    """unigram_apply segments every word exactly as the shared Viterbi
    kernel; the trained tokenizer is less fertile (fewer pieces per
    word) than character splitting — the fertility comparison row."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.text import (
        unigram_apply,
        unigram_encode_word,
        unigram_lm_train,
    )

    df = spark.createDataFrame(
        list(enumerate(_UNI_TEXTS)), "doc_id long, text string"
    )
    model = unigram_lm_train(
        df, vocab_size=24, max_piece_len=4, seed_size=40, em_iters=2
    )
    lp = model["logprobs"]
    out = {r["doc_id"]: r for r in unigram_apply(df, lp, max_piece_len=4).collect()}
    for i, t in enumerate(_UNI_TEXTS):
        words = t.lower().split()
        want = [p for w in words for p in unigram_encode_word(w, lp, 4)[0]]
        assert list(out[i]["subwords"]) == want, i
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_subwords"] == len(want)
    n_words = sum(r["n_words"] for r in out.values())
    n_sub = sum(r["n_subwords"] for r in out.values())
    n_chars = sum(len(w) for t in _UNI_TEXTS for w in t.lower().split())
    assert n_words <= n_sub < n_chars  # trained fertility beats char-split
    # re-encoding the corpus under the final model reproduces the
    # trainer's own final counts (train->apply consistency)
    counted = (
        unigram_apply(df, lp, max_piece_len=4)
        .select(F.explode("subwords").alias("p"))
        .groupBy("p").count().collect()
    )
    assert {r["p"] for r in counted} <= set(lp)


def test_unigram_validation_and_charset_floor(spark):
    from rhq_metrics_spark.pipelines.text import (
        unigram_lm_train,
        unigram_seed_pieces,
    )

    df = spark.createDataFrame([(1, "ab ab ba")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vocab_size"):
        unigram_lm_train(df, 0)
    with _pytest.raises(ValueError, match="seed_size"):
        unigram_seed_pieces(df, 0)
    # vocab_size below the charset: prune stops at the char floor
    got = unigram_lm_train(df, vocab_size=1, max_piece_len=2, seed_size=4)
    assert {p for p in got["logprobs"] if len(p) == 1} == {"a", "b"}
