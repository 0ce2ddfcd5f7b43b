"""Unit tests for text-analysis operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    rolling_hashes,
    text_profile,
    token_count,
)


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("single",)], "text string"
    )
    out = [r.n for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert out == [3, 0, 0, 1]


def test_bpe_ish_counts_punct_and_digits(spark):
    df = spark.createDataFrame([("hello, world 42",)], "text string")
    # hello | , | world | 4 | 2
    assert df.select(bpe_ish_token_count(F.col("text")).alias("n")).first().n == 5


def test_lang_id_markers(spark):
    rows = [
        ("the cat and the dog is here",),
        ("der Hund und die Katze ist das",),
        ("le chat et la mer est les",),
        ("xyzzy qwerty",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [r.lang for r in df.select(lang_id(F.col("text")).alias("lang")).collect()]
    assert out == ["en", "de", "fr", None]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("other",)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [("A clean readable sentence about banks and data pipelines.",), ("!!!???...;;;",), ("",)],
        "text string",
    )
    out = [r.q for r in df.select(quality_score(F.col("text")).alias("q")).collect()]
    assert 0 < out[0] <= 1
    assert out[1] == 0.0  # all punctuation
    assert out[2] == 0.0  # empty


def test_rolling_hashes_shingle_count(spark):
    df = spark.createDataFrame([(" ".join(f"w{i}" for i in range(10)),)], "text string")
    row = df.select(rolling_hashes(F.col("text"), window=8).alias("h")).first()
    assert len(row.h) == 3  # 10 - 8 + 1


def test_text_profile_runs_on_testdata(spark, sf_dir):
    from bankcreditunion_datapipeline_spark.sources.files import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    prof = text_profile(docs)
    row = prof.first()
    assert row.n_chars_computed == len(row.text)
    assert row.n_tokens > 0


def test_clean_text_masks_and_normalizes(spark):
    from bankcreditunion_datapipeline_spark.operators.text import clean_text

    rows = [
        ("<b>Hi</b>  contact me: a.b+x@ex-ample.co.uk or https://x.io/p?q=1 \x07 now",),
        ("plain   text",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [r.c for r in df.select(clean_text(df.text).alias("c")).collect()]
    assert out[0] == "Hi contact me: <EMAIL> or <URL> now"
    assert out[1] == "plain text"


def test_mask_pii_all_kinds(spark):
    from bankcreditunion_datapipeline_spark.operators.text import mask_pii

    rows = [
        ("card 4111-1111-1111-1111 ssn 123-45-6789 call 555-867-5309 ip 10.0.0.1",),
        ("mail me at who@example.org from 192.168.1.100",),
        ("no pii here",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [r.m for r in df.select(mask_pii(df.text).alias("m")).collect()]
    assert out[0] == "card <CARD> ssn <SSN> call <PHONE> ip <IP>"
    assert out[1] == "mail me at <EMAIL> from <IP>"
    assert out[2] == "no pii here"
    # idempotent: masking already-masked text is a no-op
    out2 = [r.m for r in df.select(mask_pii(mask_pii(df.text)).alias("m")).collect()]
    assert out2 == out


def test_repetition_signals(spark):
    from bankcreditunion_datapipeline_spark.operators.text import repetition_signals

    rows = [
        (1, "same line\nsame line\nsame line\nother"),
        (2, "- one\n- two\nplain"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].n_lines == 4
    assert out[1].dup_line_frac == 0.5  # 4 lines, 2 distinct
    # ratios TRUNCATE at 1e-6 (floor, the engine's tie-free cross-engine
    # discipline), so 2/3 -> 0.666666, not round()'s 0.666667
    assert out[2].bullet_line_frac == 0.666666
    assert out[3].dup_line_frac == 0.0 and out[3].mean_word_len == 0.0


def test_unigram_lm_doc_scores(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        unigram_lm_doc_scores,
    )

    # corpus: a a b | b c  ->  counts a=2 b=2 c=1, T=5, t_sq=9
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_lm_doc_scores(df).collect()}
    import math

    assert rows[1].n_words == 3 and rows[2].n_words == 2
    assert rows[1].sum_c == 6 and rows[2].sum_c == 3
    assert rows[1].t_total == 5 and rows[1].t_sq == 9
    assert abs(rows[1].avg_ll - math.log2(2 / 5)) < 1e-12
    expected2 = (math.log2(2 / 5) + math.log2(1 / 5)) / 2
    assert abs(rows[2].avg_ll - expected2) < 1e-12
    # integer rarity predicate: doc2 uses rarer-than-average words
    assert rows[1].sum_c * rows[1].t_total >= rows[1].n_words * rows[1].t_sq
    assert rows[2].sum_c * rows[2].t_total < rows[2].n_words * rows[2].t_sq


def test_luhn_valid_known_vectors(spark):
    from bankcreditunion_datapipeline_spark.operators.text import luhn_valid

    rows = [
        ("4111111111111111", True),    # canonical valid test PAN
        ("4111-1111-1111-1111", True),  # separators stripped first
        ("4532 0151 1283 0366", True),
        ("4111111111111112", False),   # checksum off by one
        ("1234567812345678", False),
        ("", False),                   # no digits -> false, not NULL
        ("no digits here", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string")
    got = [r.v for r in df.select(luhn_valid(F.col("s")).alias("v")).collect()]
    assert got == [want for _, want in rows]


def test_mask_card_numbers_validated_spares_non_cards(spark):
    """The Luhn gate: shape-matching but checksum-failing numbers (order
    ids, timestamps) must survive; real PANs must not."""
    from bankcreditunion_datapipeline_spark.operators.text import (
        mask_card_numbers,
        mask_card_numbers_validated,
    )

    text = (
        "pay with 4111-1111-1111-1111 ref order 1234 5678 1234 5678 "
        "backup card 4532 0151 1283 0366 thanks"
    )
    df = spark.createDataFrame([(text,)], "t string")
    validated = df.select(
        mask_card_numbers_validated(F.col("t")).alias("v")
    ).collect()[0].v
    assert "4111-1111-1111-1111" not in validated
    assert "4532 0151 1283 0366" not in validated
    assert validated.count("<CARD>") == 2
    assert "1234 5678 1234 5678" in validated  # order id untouched
    # the unvalidated chain masks all three -- the false positive
    blunt = df.select(mask_card_numbers(F.col("t")).alias("v")).collect()[0].v
    assert blunt.count("<CARD>") == 3


def test_remove_boilerplate_segments(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        remove_boilerplate_segments,
    )

    bp = "cookie banner accept all"  # exactly one 4-token segment
    rows = [
        # srcA: boilerplate prefix shared by two docs
        (1, f"{bp} unique alpha words here", "srcA"),
        (2, f"{bp} other beta content now", "srcA"),
        # srcA: no boilerplate
        (3, "totally fresh gamma text here", "srcA"),
        # srcB: same segment but only ONE doc -> not boilerplate there
        (4, f"{bp} lonely delta words here", "srcB"),
        (5, "", "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_segments(
            df, seg_tokens=4, min_docs=2
        ).collect()
    }

    assert out[1]["clean_text"] == "unique alpha words here"
    assert out[1]["n_seg"] == 2 and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "other beta content now"
    # untouched docs come back verbatim (token-joined)
    assert out[3]["clean_text"] == "totally fresh gamma text here"
    assert out[3]["n_removed"] == 0
    # same segment, different source, df=1 -> kept
    assert out[4]["clean_text"].startswith(bp)
    assert out[4]["n_removed"] == 0
    # empty doc survives with empty text
    assert out[5]["clean_text"] == "" and out[5]["n_seg"] == 0


def test_remove_boilerplate_preserves_order(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        remove_boilerplate_segments,
    )

    # boilerplate segment sits in the MIDDLE (segment-aligned: positions
    # 4-7); survivors must rejoin in original order, not content order
    mid = "repeat this exact chunk"
    rows = [
        (1, f"a1 a2 a3 a4 {mid} z1 z2 z3 z4", "s"),
        (2, f"b1 b2 b3 b4 {mid} y1 y2 y3 y4", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_segments(df, seg_tokens=4, min_docs=2).collect()
    }
    assert out[1] == "a1 a2 a3 a4 z1 z2 z3 z4"
    assert out[2] == "b1 b2 b3 b4 y1 y2 y3 y4"


def test_bigram_lm_scores_hand_corpus(spark):
    """Hand-checkable Laplace bigram model: corpus 'a b a b' + 'a b c'
    (+ 'x', which adds no bigram but IS vocabulary); V = |{a,b,c,x}| = 4,
    contexts c1(a)=3 (a->b x3), c1(b)=2 (b->a, b->c).
    P(b|a)=(3+1)/(3+4)=4/7; P(a|b)=(1+1)/(2+4)=1/3; P(c|b)=1/3."""
    import math

    from bankcreditunion_datapipeline_spark.operators.text import (
        bigram_lm_doc_scores,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_ll"])
        for r in bigram_lm_doc_scores(df).collect()
    }
    # doc 3 (single token) and doc 4 (NULL) have no bigrams -> no row
    assert set(got) == {1, 2}
    lab, lxb = math.log2(4 / 7), math.log2(1 / 3)
    want1 = (lab + lxb + lab) / 3  # doc 1 bigrams: ab, ba, ab
    want2 = (lab + lxb) / 2        # doc 2 bigrams: ab, bc
    assert got[1][0] == 3 and abs(got[1][1] - want1) < 1e-12
    assert got[2][0] == 2 and abs(got[2][1] - want2) < 1e-12


def test_ngram_repetition_stats_hand_counts(spark):
    """'a b c a b c a b c' has 7 3-gram instances ('a b c' x3,
    'b c a' x2, 'c a b' x2), so top mass is 3 and every instance
    belongs to a duplicated gram (dup mass 7). A no-repeat doc has dup
    mass 0; a 2-token doc yields its whole text as the single gram;
    NULL text contributes no row."""
    from bankcreditunion_datapipeline_spark.operators.text import (
        ngram_repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),
            (2, "one two three four"),
            (3, "tiny doc"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["top_gram_n"], r["dup_gram_n"])
        for r in ngram_repetition_stats(df).collect()
    }
    assert out[1] == (7, 3, 7)
    assert out[2] == (2, 1, 0)
    assert out[3] == (1, 1, 0)
    assert 4 not in out  # NULL text contributes nothing


def test_chunk_documents_overlap_and_tail(spark):
    """10 tokens, chunk 4, overlap 1 (stride 3): starts 0/3/6/9 with
    lengths 4/4/4/1; consecutive full chunks share exactly `overlap`
    tokens; stitching chunk 0 + each later chunk minus its overlap
    reconstructs the whitespace-normalized document; NULL/empty docs
    emit no chunks."""
    from bankcreditunion_datapipeline_spark.operators.text import (
        chunk_documents,
    )

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, "  " + "  ".join(words) + " "), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    out = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["doc_id"] for r in out] == [1, 1, 1, 1]
    assert [r["start_tok"] for r in out] == [0, 3, 6, 9]
    assert [r["n_tok"] for r in out] == [4, 4, 4, 1]
    chunks = [r["chunk_text"].split(" ") for r in out]
    for a, b in zip(chunks, chunks[1:]):
        assert a[3:] == b[: len(a[3:])]  # shared overlap token
    stitched = chunks[0] + [t for c in chunks[1:] for t in c[1:]]
    assert stitched == words


# -- oov_stats ---------------------------------------------------------------


def test_oov_stats_counts_occurrences_not_distinct(spark):
    from bankcreditunion_datapipeline_spark.operators.text import oov_stats

    # vocab_size=2 -> vocab = {'aa','bb'} (freq desc, word asc ties);
    # doc 3 repeats the OOV word 'zz' twice: both occurrences count
    df = spark.createDataFrame(
        [
            (1, "aa bb aa"),
            (2, "aa bb"),
            (3, "zz zz aa"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tok, r.n_oov, r.oov_permille)
        for r in oov_stats(df, vocab_size=2).collect()
    }
    assert got == {1: (3, 0, 0), 2: (2, 0, 0), 3: (3, 2, 666)}


def test_oov_stats_vocab_tiebreak_deterministic(spark):
    from bankcreditunion_datapipeline_spark.operators.text import oov_stats

    # 'a' and 'b' both freq 1: vocab_size=1 keeps 'a' (word asc)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    got = {
        r.doc_id: r.n_oov for r in oov_stats(df, vocab_size=1).collect()
    }
    assert got == {1: 0, 2: 1}


# -- quality_threshold_sweep -------------------------------------------------


def test_quality_sweep_monotone_and_null_never_kept(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        quality_threshold_sweep,
    )

    df = spark.createDataFrame(
        [
            ("word " * 200,),   # long alpha text: high quality
            ("!!!???...",),     # pure punctuation: quality 0
            (None,),            # NULL: kept by NO threshold
        ],
        "text string",
    )
    rows = {
        r.thr_permille: (r.docs_kept, r.tokens_kept)
        for r in quality_threshold_sweep(df, [0, 500]).collect()
    }
    # thr 0 keeps both non-null docs (q >= 0); NULL text is filtered
    # up front (quality_score would score it 0 via least(), not NULL)
    assert rows[0][0] == 2
    # docs_kept monotone non-increasing in the threshold
    assert rows[500][0] <= rows[0][0]
    # the punct-only doc scores 0 -> only the long doc can survive 500
    assert rows[500][0] <= 1
    # tokens follow docs: thr 0 counts both docs' tokens
    assert rows[0][1] == 200 + 1


# -- collocation_lift --------------------------------------------------------


def test_collocation_lift_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        collocation_lift,
    )

    # corpus: "a b" x5 -> N=10, c_a=5, c_b=5, c_ab=5
    # lift_e6 = 5 * ((10*1e6) div 25) + ... = 5*400000 = 2000000 (lift 2)
    df = spark.createDataFrame([("a b",)] * 5, "text string")
    got = {
        (r.w1, r.w2): (r.cxy, r.lift_e6)
        for r in collocation_lift(df, min_count=5).collect()
    }
    assert got == {("a", "b"): (5, 2_000_000)}


def test_collocation_min_count_prunes(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        collocation_lift,
    )

    df = spark.createDataFrame([("x y",)] * 4, "text string")
    assert collocation_lift(df, min_count=5).count() == 0


def test_collocation_token_guard_fires(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        collocation_lift,
    )
    import pytest

    df = spark.createDataFrame([("a b a b a b",)] * 3, "text string")
    with pytest.raises(Exception, match="collocation_lift"):
        collocation_lift(df, min_count=1, max_total_tokens=5).collect()


# -- gini_simpson_diversity ----------------------------------------------------


def test_gini_simpson_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        gini_simpson_diversity,
    )

    df = spark.createDataFrame(
        [
            ("a", "x x x x"),          # all same token -> diversity 0
            ("b", "p q r s"),          # all distinct -> 1 - 4/16 = 0.75
            ("c", "u u v v"),          # 1 - 8/16 = 0.5
        ],
        "source string, text string",
    )
    rows = {
        r.source: r
        for r in gini_simpson_diversity(df, "text").collect()
    }
    assert (rows["a"].n_tokens, rows["a"].diversity_e6) == (4, 0)
    assert (rows["b"].n_distinct, rows["b"].diversity_e6) == (4, 750_000)
    assert rows["c"].diversity_e6 == 500_000


def test_gini_simpson_whitespace_and_empty(spark):
    from bankcreditunion_datapipeline_spark.operators.text import (
        gini_simpson_diversity,
    )

    df = spark.createDataFrame(
        [("a", "  x \t x\n y  "), ("b", "   "), ("b", None)],
        "source string, text string",
    )
    rows = gini_simpson_diversity(df, "text").collect()
    assert len(rows) == 1  # group b has zero tokens -> no row
    r = rows[0]
    # counts {x:2, y:1}, T=3: 1 - 5/9 = 4/9 -> 444444
    assert (r.source, r.n_tokens, r.diversity_e6) == ("a", 3, 444_444)


def test_gini_simpson_budget_fails_loud(spark):
    import pytest

    from bankcreditunion_datapipeline_spark.operators.text import (
        gini_simpson_diversity,
    )

    df = spark.createDataFrame([("a", "x y z")], "source string, text string")
    with pytest.raises(Exception, match="gini_simpson_diversity"):
        gini_simpson_diversity(df, "text", max_group_tokens=2).collect()


def test_dsir_importance_weights_hand_values(spark):
    """r14: dsir_importance_weights replicates the add-1-smoothed hashed
    bucket log-ratio exactly (hand-recomputed in Python over the same
    md5 buckets), skips sub-bigram docs, and ranks a target-looking doc
    above a raw-only doc."""
    import math

    from bankcreditunion_datapipeline_spark.operators.text import (
        dsir_importance_weights,
    )

    B = 64
    rows = [
        # target member: its bigrams are FREQUENT in the target slice
        # but diluted in the raw corpus (doc 3's mass), so its summed
        # log-ratio is positive despite add-1 smoothing
        (1, "a", "x y x y x y x y x y"),
        (2, "a", "x y z"),            # shares target bigram 'x y'
        (3, "b", " ".join(f"p{i}" for i in range(21))),  # raw-only mass
        (4, "b", "single"),           # no bigram -> no row
        (5, "b", ""),                 # no bigram -> no row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = docs.filter(F.col("doc_id") == 1)
    got = {
        r["doc_id"]: (r["n_grams"], r["importance"])
        for r in dsir_importance_weights(
            docs, target, buckets=B
        ).collect()
    }
    assert set(got) == {1, 2, 3}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    def grams(text):
        w = text.split(" ")
        return [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for doc_id, _, text in rows:
        for g in grams(text) if len(text.split(" ")) >= 2 else []:
            b = bucket(g)
            cr[b] = cr.get(b, 0) + 1
            if doc_id == 1:
                ct[b] = ct.get(b, 0) + 1
    T, R = sum(ct.values()), sum(cr.values())
    for doc_id, _, text in rows:
        gs = grams(text) if len(text.split(" ")) >= 2 else []
        if not gs:
            assert doc_id not in got
            continue
        want = sum(
            math.log2(
                ((ct.get(bucket(g), 0) + 1.0) * (R + B))
                / ((cr[bucket(g)] + 1.0) * (T + B))
            )
            for g in gs
        )
        n, imp = got[doc_id]
        assert n == len(gs)
        assert abs(imp - want) < 1e-9
    # the target member leans target, the disjoint doc leans raw
    assert got[1][1] > 0 > got[3][1]
