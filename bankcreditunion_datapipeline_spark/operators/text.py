"""Text-analysis operators for a training-data pipeline over the
`documents` table: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All hot-path expressions are JVM built-ins (split/regexp/length/md5) so they
stay inside whole-stage codegen at 100 TB -- no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Counting occurrences of high-frequency function words is the classic cheap
# language-ID signal; extend per language as needed.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " los ", " que ", " es "],
}


def token_count(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: word pieces + digits + punctuation as separate
    tokens (a regex approximation of subword tokenizer output size)."""
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    arr = F.regexp_extract_all(text, F.lit(pattern), 0)
    return F.size(arr)


def substring_count(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via length arithmetic (codegen-
    friendly, avoids regex escaping issues)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def stopword_hits(text: Column, lang: str) -> Column:
    """Total marker-stopword occurrences for one language (case-insensitive,
    space-delimited matching)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0)
    for marker in LANG_MARKERS[lang]:
        total = total + substring_count(padded, marker)
    return total


def lang_id(text: Column, langs: list[str] | None = None) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts; NULL when
    no marker matches (unknown language)."""
    langs = langs or list(LANG_MARKERS)
    pairs = F.array(
        *[F.struct(stopword_hits(text, lg).alias("hits"), F.lit(lg).alias("lang")) for lg in langs]
    )
    best = F.array_max(pairs)  # struct ordering: by hits, tie-break by lang desc
    return F.when(best["hits"] > 0, best["lang"])


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def trunc6(col: Column) -> Column:
    """Truncate to 6 decimals (floor). The engine's discipline for
    division-derived per-row metrics: int/int ratios land on exact
    decimal .5 ties where Spark (shortest-repr HALF_UP) and a SQL twin
    engine (binary-double rounding) disagree; floor has no tie to break
    and is pure IEEE, so identical inputs give identical outputs
    anywhere. See SCALE.md "Cross-engine float discipline"."""
    return F.floor(col * 1000000) / 1000000


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality score: length sweet-spot x alpha ratio x
    (1 - excess punctuation). Deterministic, JVM-only -- the shape of a
    fastText-style quality filter without the model dependency."""
    n = F.length(text)
    length_component = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    return trunc6(length_component * alpha_ratio(text) * punct_penalty)


def fingerprint(text: Column, normalize: bool = True) -> Column:
    """Content fingerprint: md5 of whitespace/case-normalized text.
    Normalization makes trivially-reformatted duplicates collide."""
    norm = text
    if normalize:
        norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(norm.cast("binary"))


def rolling_hashes(text: Column, window: int = 8) -> Column:
    """Karp-Rabin-style rolling fingerprints: xxhash64 of each `window`-token
    shingle. Basis for winnowing-style near-dup detection; JVM-side via
    transform over token index sequence."""
    tokens = F.split(F.trim(text), r"\s+")
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, window)))
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text profile (narrow, no shuffle)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_computed": F.length(c),
            "n_tokens": token_count(c),
            "n_bpe_tokens": bpe_ish_token_count(c),
            "alpha_ratio": trunc6(alpha_ratio(c)),
            "punct_ratio": trunc6(punct_ratio(c)),
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )


# ---------------------------------------------------------------------------
# Cleanup / redaction (training-data hygiene) -- all JVM regexp_replace,
# whole-stage codegen, no Python. Patterns kept RE2-compatible so the same
# regexes run in other engines (and in the DuckDB oracle).
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_HTML_TAG_RE = r"<[^>]+>"
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def strip_html(text: Column) -> Column:
    """Remove markup tags (tag-level strip; full HTML parsing is a decode-
    stage concern, not a column expression)."""
    return F.regexp_replace(text, _HTML_TAG_RE, " ")


def mask_emails(text: Column, token: str = "<EMAIL>") -> Column:
    return F.regexp_replace(text, _EMAIL_RE, token)


def mask_urls(text: Column, token: str = "<URL>") -> Column:
    return F.regexp_replace(text, _URL_RE, token)


def remove_control_chars(text: Column) -> Column:
    return F.regexp_replace(text, _CONTROL_RE, "")


def normalize_whitespace(text: Column) -> Column:
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def clean_text(text: Column) -> Column:
    """Standard hygiene chain: strip markup -> redact emails/urls -> drop
    control chars -> collapse whitespace. Composes as one codegen'd
    expression tree (no intermediate materialization)."""
    return normalize_whitespace(
        remove_control_chars(mask_urls(mask_emails(strip_html(text))))
    )


# ---------------------------------------------------------------------------
# PII masking beyond emails/URLs. Longest/most-specific patterns run first
# so a card number is not half-eaten by the phone pattern; apply in the
# SAME order in any twin engine.
# ---------------------------------------------------------------------------

_CARD_RE = r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"
_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
_PHONE_RE = r"(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def mask_card_numbers(text: Column, token: str = "<CARD>") -> Column:
    return F.regexp_replace(text, _CARD_RE, token)


def mask_ssns(text: Column, token: str = "<SSN>") -> Column:
    return F.regexp_replace(text, _SSN_RE, token)


def mask_phones(text: Column, token: str = "<PHONE>") -> Column:
    return F.regexp_replace(text, _PHONE_RE, token)


def mask_ipv4(text: Column, token: str = "<IP>") -> Column:
    return F.regexp_replace(text, _IPV4_RE, token)


def mask_pii(text: Column) -> Column:
    """Full PII redaction chain: emails -> cards -> SSNs -> phones -> IPs.
    One codegen'd expression; idempotent (mask tokens contain no digits)."""
    return mask_ipv4(mask_phones(mask_ssns(mask_card_numbers(mask_emails(text)))))


def luhn_valid(candidate: Column) -> Column:
    """True iff the digits of `candidate` pass the Luhn mod-10 checksum --
    the standard upgrade over the bare 16-digit card regex, which
    otherwise masks order ids, timestamps, and tracking numbers
    (_CARD_RE matches shape, Luhn validates substance; real PANs always
    pass, uniform random 16-digit strings pass ~10% of the time).

    Pure codegen'd expression (sequence + aggregate over substrings), no
    UDF: digit i from the RIGHT contributes d when i is odd, 2d - 9*(d>4)
    when even. NULL/empty/non-digit-bearing input yields false.
    """
    digits = F.regexp_replace(candidate, r"[^0-9]", "")
    n = F.length(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 1,
            F.substring(digits, (n - i + 1).cast("int"), 1).cast("int"),
        ).otherwise(
            F.substring(digits, (n - i + 1).cast("int"), 1).cast("int") * 2
            - F.when(
                F.substring(digits, (n - i + 1).cast("int"), 1).cast("int") > 4,
                F.lit(9),
            ).otherwise(F.lit(0))
        ),
    )
    return F.when(n > 0, total % 10 == 0).otherwise(F.lit(False))


def mask_card_numbers_validated(text: Column, token: str = "<CARD>") -> Column:
    """Card masking gated by the Luhn checksum: candidates matching the
    card SHAPE but failing mod-10 are left untouched (they are order ids
    or timestamps, and masking them destroys non-PII signal). Built from
    regexp_extract_all + filter + a fold of literal replaces -- still
    zero Python, one expression tree."""
    cands = F.array_distinct(
        F.regexp_extract_all(text, F.lit(_CARD_RE), F.lit(0))
    )
    valid = F.filter(cands, luhn_valid)
    # replace each validated candidate literally (candidates contain no
    # regex metacharacters: digits, spaces, dashes only)
    return F.aggregate(
        valid,
        text,
        lambda acc, c: F.replace(acc, c, F.lit(token)),
    )


# ---------------------------------------------------------------------------
# Repetition / layout quality signals (Gopher-style): duplicate-line
# fraction, bullet-line fraction, mean word length, symbol-to-word ratio.
# All JVM array/string built-ins; each is SQL-expressible for oracles.
# ---------------------------------------------------------------------------


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition and layout stats (narrow, one pass).

    - dup_line_frac: 1 - distinct/total physical lines; boilerplate and
      scraped templates score high.
    - bullet_line_frac: fraction of lines starting with a bullet marker.
    - mean_word_len: non-whitespace chars / whitespace tokens.
    - symbol_word_ratio: '#' and '...' occurrences per token (markup/
      truncation junk signal).
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    n_tok = token_count(c)
    n_nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    symbols = substring_count(c, "#") + substring_count(c, "...")
    return df.withColumns(
        {
            "n_lines": n_lines,
            "dup_line_frac": trunc6(
                F.when(n_lines > 0, 1.0 - n_distinct / n_lines).otherwise(0.0)
            ),
            "bullet_line_frac": trunc6(
                F.when(n_lines > 0, bullet / n_lines).otherwise(0.0)
            ),
            "mean_word_len": trunc6(
                F.when(n_tok > 0, n_nonspace / n_tok).otherwise(0.0)
            ),
            "symbol_word_ratio": trunc6(
                F.when(n_tok > 0, symbols / n_tok).otherwise(0.0)
            ),
        }
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring: a unigram language model TRAINED ON THE
# CORPUS ITSELF (one aggregation), then every document scored by its mean
# per-token log-likelihood -- the cheap end of the perplexity-filter family
# (KenLM-style filters are the same shape with a bigger model table).
# ---------------------------------------------------------------------------


def unigram_lm_doc_scores(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Train a corpus unigram LM and score each document by mean log2
    token likelihood.

    Three-stage plan, all shuffles bounded by vocabulary or document count:

    1. tokenize + count: ``explode(split(text))`` -> groupBy(word) -- the
       LM "training" pass; shuffle carries one row per distinct word.
    2. score: tokens equi-join the frequency table. The model is
       vocabulary-sized, so it is BROADCAST -- the big token stream never
       shuffles. (A 100 TB corpus has a ~1e7-row unigram table: still
       broadcastable; a bigram/KenLM table would bucket-join instead.)
    3. per-doc reduce: sum(log2 p) / n_tokens per document.

    Returns one row per document: id cols + ``n_words``, ``sum_c`` (sum of
    corpus counts of its tokens), ``avg_ll`` (mean log2 likelihood),
    ``t_total`` / ``t_sq`` (corpus token count and sum of squared counts,
    constant columns for downstream integer-exact rarity predicates like
    ``sum_c * t_total < n_words * t_sq`` -- "rarer than the corpus mean").
    """
    ids = [F.col(c) for c in id_cols]
    tokens = df.select(*ids, F.explode(F.split(F.col(text_col), " ")).alias("w"))
    freq = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = freq.agg(
        F.sum("c").cast("long").alias("t_total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("t_sq"),
    )
    scored = tokens.join(F.broadcast(freq), "w").crossJoin(F.broadcast(totals))
    return scored.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("c").cast("long").alias("sum_c"),
        (
            F.sum(F.log2(F.col("c").cast("double") / F.col("t_total")))
            / F.count(F.lit(1))
        ).alias("avg_ll"),
        F.first("t_total").alias("t_total"),
        F.first("t_sq").alias("t_sq"),
    )


def remove_boilerplate_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    seg_tokens: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style boilerplate removal, adapted to single-line documents:
    cut each document into consecutive ``seg_tokens``-token segments, find
    segments that repeat across >= ``min_docs`` DISTINCT documents of the
    same ``group_col`` (site/source boilerplate: headers, footers, cookie
    banners repeat across a crawl source; real content doesn't), strip
    those segments, and reassemble the survivors in order.

    Returns one row per input document: (id, clean_text, n_seg,
    n_removed). Documents whose every segment is boilerplate (or with no
    tokens at all) survive with clean_text = '' -- the caller decides
    whether to drop empties (the curation funnel does).

    Scale shape:
    - segmentation is a narrow per-row transform (split + slice);
    - the only wide op keyed by content is the (group, segment) frequency
      count -- segments hash-partition evenly (they're near-unique for
      real content, which is exactly why boilerplate stands out);
    - the boilerplate set is tiny relative to the corpus (segments above
      the document-frequency threshold), so the strip is a BROADCAST
      anti-join, not a shuffle of the corpus;
    - reassembly groups by document id -- the corpus's natural key, no
      skew.

    CCNet reference: Wenzek et al., "CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data" (2019) dedups at paragraph
    granularity across shards; fixed token segments replace paragraphs
    here because the synthetic corpus has no line structure.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    base = df.select(
        F.col(id_col), F.col(group_col), toks.alias("__a")
    ).withColumn(
        "n_seg",
        F.ceil(F.size("__a") / F.lit(float(seg_tokens))).cast("int"),
    )

    seg_expr = F.when(
        F.col("n_seg") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("n_seg") - 1),
            lambda g: F.array_join(
                F.slice("__a", g * seg_tokens + 1, seg_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    segs = base.select(
        id_col, group_col, "n_seg", F.posexplode(seg_expr).alias("g", "seg")
    )
    # segs feeds the boilerplate-frequency agg AND the anti-join strip;
    # per-consumer column pruning defeats ReuseExchange (SCALE.md r6),
    # so without a persist the tokenize+segment+explode runs twice.
    from pyspark.storagelevel import StorageLevel

    segs = segs.persist(StorageLevel.MEMORY_AND_DISK)

    bp = (
        segs.groupBy(group_col, "seg")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select(group_col, "seg")
    )
    kept = segs.join(F.broadcast(bp), [group_col, "seg"], "left_anti")
    re = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("g", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("__clean"),
        F.count(F.lit(1)).cast("int").alias("__n_kept"),
    )
    return (
        base.select(id_col, "n_seg")
        .join(re, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__clean"), F.lit("")).alias("clean_text"),
            "n_seg",
            (F.col("n_seg") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def bigram_lm_doc_scores(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Train a corpus bigram LM (Laplace-smoothed) and score each
    document by mean log2 conditional likelihood -- the context-aware
    upgrade of unigram_lm_doc_scores, the shape of a KenLM-style fluency
    filter without the model dependency.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V): all counts integer, so the
    probability is an integer-derived double (the engine's ln/log2
    discipline). Plan:

    1. positional bigrams via posexplode + one lead() per doc window --
       the per-doc shuffle any positional text op needs;
    2. bigram counts c2(w1,w2): groupBy sized by distinct bigrams. The
       model table is NOT broadcast -- unlike the unigram table, a real
       corpus's bigram table outgrows broadcast range, so scoring joins
       it with a plain shuffle equi-join on (w1, w2) (bucket both sides
       by (w1, w2) at 100 TB and it co-locates); the CONTEXT counts
       c1(w1) and the scalar vocab size do broadcast;
    3. per-doc reduce: sum(log2 p) / n_bigrams.

    Documents with fewer than 2 tokens have no bigrams and no row.
    Returns id cols + (n_bigrams, avg_ll).
    """
    from pyspark.sql.window import Window

    ids = [F.col(c) for c in id_cols]
    toks = df.select(
        *ids, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w1")
    )
    w = Window.partitionBy(*id_cols).orderBy("pos")
    big = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .select(*ids, "w1", "w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("w1").alias("vv"))
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(
                F.log2(
                    (F.col("c2") + F.lit(1.0))
                    / (F.col("c1") + F.col("vv"))
                )
            )
            / F.count(F.lit(1))
        ).alias("avg_ll"),
    )


def ngram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Within-document duplicate n-gram mass -- the Gopher repetition
    rules (Rae et al. 2021, "Scaling Language Models", table A1 rules
    for duplicate/top n-gram fractions) that q55's LINE-level signals
    don't cover: machine-generated and template text repeats short
    phrases verbatim, which line stats miss when the repeats share a
    line.

    Returns (id_col, n_grams, top_gram_n, dup_gram_n) per document with
    at least one token: total k-gram instances, the count of the most
    frequent k-gram, and the number of instances belonging to k-grams
    occurring >= 2 times. Callers derive the Gopher fractions as
    integer permille (1000 * x // n_grams) to stay engine-exact.

    Plan shape: relational flat shingles (posexplode + lead, the q148
    builder -- multiplicity preserved) -> per-(doc, gram) count -> one
    per-doc aggregate. Both aggregations partition by doc_id, so the
    second reuses the first's clustering; nothing is ever corpus-wide,
    making this embarrassingly scalable.
    """
    from .dedup import word_shingles_flat

    grams = word_shingles_flat(
        df.select(id_col, text_col).filter(F.col(id_col).isNotNull()),
        id_col,
        text_col,
        k=k,
    )
    per_gram = grams.groupBy(id_col, "__s").agg(F.count(F.lit(1)).alias("__c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_grams"),
        F.max("__c").cast("long").alias("top_gram_n"),
        F.sum(F.when(F.col("__c") >= 2, F.col("__c")).otherwise(0))
        .cast("long")
        .alias("dup_gram_n"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking for retrieval / embedding
    pipelines: one output row per (document, window) with
    ``(id, chunk_idx, start_tok, n_tok, chunk_text)``.

    Deterministic spec (SQL-replayable): tokens are the whitespace
    split of trim(text) with empties removed; chunk ``j`` starts at
    token ``j * stride`` (stride = chunk_tokens - overlap) for every
    ``j >= 0`` with ``j * stride < n`` and spans
    ``min(chunk_tokens, n - start)`` tokens, joined by single spaces.
    Trailing chunks may be short (>= 1 token); consecutive chunks
    share exactly ``overlap`` tokens (the boundary-context contract
    that keeps a span intact in at least one chunk when it is shorter
    than the overlap). Zero-token docs emit no chunks -- this is a
    chunk TABLE, not a per-doc projection.

    Scale shape: pure narrow plan -- tokenize, `sequence` over the
    chunk indices, `transform` + `slice` on the token array,
    `posexplode` -- ZERO shuffles, no window functions, no joins;
    chunking 100 TB is embarrassingly parallel and this plan keeps it
    that way.
    """
    assert chunk_tokens > 0 and 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    toks = (
        df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.array_remove(
                F.split(F.trim(F.col(text_col)), r"\s+"), ""
            ).alias("__tk"),
        )
        .withColumn("__n", F.size("__tk"))
        .filter(F.col("__n") > 0)
    )
    return toks.select(
        F.col(id_col),
        F.col("__n"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (__n - 1) div {stride}), "
                f"j -> slice(__tk, j * {stride} + 1, {chunk_tokens}))"
            )
        ).alias("chunk_idx", "__chunk"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
        F.size("__chunk").cast("long").alias("n_tok"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_tenths: int = 12,
    b_percent: int = 75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set,
    in an integer lane so per-document term sums are order-independent
    and oracle-verifiable (the ranked-retrieval upgrade of q132's
    TF-IDF: saturating tf and length normalization).

    Parameters are rationals (k1 = k1_tenths/10, b = b_percent/100) so
    the classic score clears denominators exactly: with integer
    idf_e6 = floor(1e6 * ln((2N + 2) / (2df + 1)))    [the Lucene/BM25+
    positive idf ln((N+1)/(df+0.5)) -- strictly > 0 even at df = N,
    where the raw Robertson idf goes negative; ln over an
    integer-derived double ratio, SCALE.md log discipline]
    the per-(doc, term) contribution is

      idf_e6 * tf * (10 + k1_tenths) * 100 * avgdl
        div (1000 * tf * avgdl
             + k1_tenths * ((100 - b_percent) * avgdl + b_percent * dl))

    with avgdl = total_tokens div N (floor, declared). Lane budget:
    idf_e6 (~2e7 at web scale) * tf * 2200 * avgdl must fit BIGINT --
    holds to avgdl ~ 1e4 and tf ~ 1e3; longer docs pre-chunk (q180).

    Output: one row per document with >= 1 matching term --
    (id_col, n_terms, bm25_u). NULL text never matches (no row).

    Scale: tokens explode map-side and immediately filter to the query
    terms (the stream that shuffles is matches-only); df and corpus
    stats are term-count / 1-row broadcasts; the per-doc dl table joins
    the tf table on id -- both are doc-sized aggregates co-partitioned
    on the same key.
    """
    terms = [str(w) for w in query_terms]
    d = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("__dl"),
        F.col(text_col).alias("__text"),
    ).filter(F.col("__text").isNotNull())
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.expr("sum(__dl) div count(1)").alias("__avgdl"),
    )
    tf = (
        d.select(
            id_col, F.explode(F.split(F.col("__text"), " ")).alias("__w")
        )
        .filter(F.col("__w").isin(terms))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dfreq = tf.groupBy("__w").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "__w",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    (2 * F.col("__n") + 2)
                    / (2 * F.col("__df") + 1).cast("double")
                )
            )
            .cast("long")
            .alias("__idf_e6"),
            "__avgdl",
        )
    )
    k1, b = int(k1_tenths), int(b_percent)
    contrib = F.expr(
        f"__idf_e6 * __tf * {(10 + k1) * 100} * __avgdl div "
        f"(1000 * __tf * __avgdl + {k1} * "
        f"(({100 - b}) * __avgdl + {b} * __dl))"
    )
    return (
        tf.join(d.select(id_col, "__dl"), id_col)
        .join(F.broadcast(idf), "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(contrib).cast("long").alias("bm25_u"),
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies -- the candidate
    scan of one BPE merge step (the tokenizer-training primitive:
    the highest-count pair becomes the next merge rule).

    Distributed shape is the point: the corpus collapses to the
    DISTINCT word vocabulary first (one map-side-combining groupBy;
    Zipf makes the vocab orders of magnitude smaller than the token
    stream), and the character-pair explode runs over vocab rows only,
    weighted by word frequency. Pair occurrences inside a word keep
    multiplicity ('aaa' contributes 'aa' twice). Pair extraction is
    substring(w, i, 2) over sequence(1, len-1) -- portable, no regex,
    single-length words guarded out BEFORE the sequence (Spark's
    sequence(1, 0) descends rather than emptying).

    Output: (pair, n_words, total) -- distinct words containing the
    pair and the frequency-weighted occurrence total.
    """
    words = (
        df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("__w")
        )
        .filter(F.length("__w") >= 2)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).cast("long").alias("__freq"))
    )
    pairs = words.select(
        "__w",
        "__freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__w") - 1),
                lambda i: F.substring(F.col("__w"), i, 2),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.countDistinct("__w").cast("long").alias("n_words"),
        F.sum("__freq").cast("long").alias("total"),
    )


def oov_stats(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-`vocab_size` word list -- the tokenizer-coverage screen run
    before committing a vocabulary (docs with high OOV are the ones a
    fixed vocab will shred into bytes).

    Vocabulary selection is orderBy(freq desc, word asc).limit(k):
    Spark plans TakeOrderedAndProject (map-side partial top-k, no
    global sort materialization), deterministic under ties. The vocab
    is then BROADCAST to flag tokens -- the probe side never shuffles.

    Output: (id, n_tok, n_oov, oov_permille) for docs with >= 1 token;
    occurrences count (not distinct words), so a doc repeating one rare
    word is as OOV as a doc of distinct rare words.
    """
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.split(F.col(text_col), " "), lambda x: x != ""
                )
            ).alias("__w"),
        )
    )
    vocab = (
        toks.groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .orderBy(F.desc("__freq"), F.asc("__w"))
        .limit(vocab_size)
        .select("__w", F.lit(1).alias("__in"))
    )
    flagged = toks.join(F.broadcast(vocab), "__w", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(F.col("__in").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn("oov_permille", F.expr("n_oov * 1000 div n_tok"))
    )


def quality_threshold_sweep(
    df: DataFrame,
    thresholds_permille: list[int],
    text_col: str = "text",
) -> DataFrame:
    """Curation tuning table: for each candidate quality cutoff, how
    many documents and how many tokens survive -- the docs-vs-tokens
    tradeoff curve read before picking a filter threshold.

    ONE conditional-aggregation pass (no threshold x corpus row
    multiplication): each threshold is two CASE aggregates, then a
    stack() unpivot of the single wide row. Quality is the engine's
    quality_score lane (trunc6 -- identical IEEE doubles replay in
    SQL); the keep test runs on floor(q * 1000) so the comparison is
    integer-vs-integer, never float-boundary.

    NULL text is excluded UP FRONT (filtered, visibly): quality_score's
    when/otherwise chain would score it 0 (least() ignores NULL), which
    would count contentless docs as "kept" at threshold 0 -- the
    quarantine discipline says they never pass a quality gate.
    """
    c = F.col(text_col)
    prof = df.filter(c.isNotNull()).select(
        F.floor(quality_score(c) * 1000).alias("__qp"),
        token_count(c).cast("long").alias("__nt"),
    )
    aggs = []
    for i, thr in enumerate(thresholds_permille):
        keep = F.col("__qp") >= F.lit(int(thr))
        aggs.append(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias(f"__d{i}")
        )
        aggs.append(
            F.sum(F.when(keep, F.col("__nt")).otherwise(0))
            .cast("long")
            .alias(f"__t{i}")
        )
    wide = prof.agg(*aggs)
    stack_expr = ", ".join(
        f"{int(thr)}L, __d{i}, __t{i}"
        for i, thr in enumerate(thresholds_permille)
    )
    return wide.selectExpr(
        f"stack({len(thresholds_permille)}, {stack_expr}) "
        "AS (thr_permille, docs_kept, tokens_kept)"
    )


def collocation_lift(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    max_total_tokens: int = 9_200_000_000_000,
) -> DataFrame:
    """Bigram collocation mining by exact integer LIFT: for each
    adjacent word pair, lift = P(w1 w2) / (P(w1) P(w2)) -- the
    association strength behind PMI, but ranked on the RAW RATIO so it
    never touches ln() (lift ordering == PMI ordering; ln is monotone,
    and libm last-bit differences across engines are exactly what the
    integer-lane discipline exists to exclude).

    lift_e6 = (c_xy * N * 1e6) div (c_x * c_y), computed with the
    divide-first split a*(span div n) + (a*(span mod n)) div n
    (span = N*1e6, n = c_x*c_y) so no intermediate forms c_xy*N*1e6.
    Bounds, both fail-loud: N > 9.2e12 tokens raises (span must fit
    BIGINT), and a per-pair guard raises if c_x*c_y or the remainder
    term c_xy*(span mod c_x*c_y) would exceed BIGINT -- inside the N
    budget two words with >~3e9 occurrences each can still push the
    products past 2^63, so the N guard alone is not sufficient.
    Beyond those bounds, coarsen the unit (the q199 gini discipline).

    Scale shape: one token explode -> two hash aggregates (unigrams,
    bigrams) + a broadcast-sized N -- no self-join, no pair explosion
    (bigrams are corpus-linear). min_count prunes the heavy tail
    before the two dictionary joins.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.filter(
            F.split(F.col(text_col), " "), lambda x: x != ""
        ).alias("__ws")
    )
    uni = toks.select(F.explode("__ws").alias("w"))
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    n = uni.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    guarded_n = n.where(
        F.assert_true(
            F.col("__n") <= F.lit(max_total_tokens),
            F.concat(
                F.lit("collocation_lift: corpus exceeds the e6 lane ["),
                F.col("__n").cast("string"),
                F.lit(f" tokens, budget {max_total_tokens}] -- coarsen "
                      "the unit"),
            ),
        ).isNull()
    )
    bi = (
        toks.filter(F.size("__ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws") - 1),
                    lambda i: F.struct(
                        F.element_at("__ws", i).alias("w1"),
                        F.element_at("__ws", i + 1).alias("w2"),
                    ),
                )
            ).alias("__p")
        )
        .select("__p.w1", "__p.w2")
    )
    cb = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cxy"))
        .filter(F.col("cxy") >= min_count)
    )
    j = (
        cb.join(cu.select(F.col("w").alias("w1"), F.col("__c").alias("__cx")), "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("__c").alias("__cy")), "w2")
        .crossJoin(F.broadcast(guarded_n))
    )
    # the N budget bounds the SPAN term, but not the per-pair products:
    # two words each with >~3e9 occurrences put cx*cy (and with it the
    # divide-first remainder term cxy*(span mod cx*cy)) past BIGINT
    # inside the declared budget.  Guard both products per pair, cheap
    # row-local integer compares: cx*cy must fit, and cxy must fit
    # against the remainder (checked only via the already-safe product).
    maxlong = (1 << 63) - 1
    j = j.where(
        F.assert_true(
            (F.expr(f"__cx <= {maxlong} div __cy"))
            & (
                F.expr(
                    f"cxy <= {maxlong} div "
                    "greatest((__n * 1000000) % (__cx * __cy), 1)"
                )
            ),
            F.concat(
                F.lit("collocation_lift: cx*cy product overflow risk [cx "),
                F.col("__cx").cast("string"),
                F.lit(", cy "),
                F.col("__cy").cast("string"),
                F.lit(", cxy "),
                F.col("cxy").cast("string"),
                F.lit("] -- coarsen the unit or raise min_count"),
            ),
        ).isNull()
    )
    return j.select(
        "w1",
        "w2",
        "cxy",
        F.expr(
            "CAST(cxy * ((__n * 1000000) div (__cx * __cy)) "
            "+ (cxy * ((__n * 1000000) % (__cx * __cy))) "
            "div (__cx * __cy) AS BIGINT)"
        ).alias("lift_e6"),
    )


def gini_simpson_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
    max_group_tokens: int = 90_000_000,
) -> DataFrame:
    """Gini-Simpson lexical diversity per group, exact integer e6:
    the probability two tokens drawn (with replacement) from the
    group differ, 1 - sum(c^2)/T^2 = (T^2 - sum(c^2)) / T^2 over
    per-token counts c and total T. The entropy-free diversity lane
    (no ln anywhere, SCALE.md): a template-heavy or collapsed-mode
    feed scores low, a balanced vocabulary scores high -- the mixture
    signal q240's novelty rate cannot see (novelty grades NEW mass,
    this grades CONCENTRATION).

    The e6 value rides the x1000 two-limb ladder
    floor(d*1e6/T^2) = a*1000 + (r*1000) div T^2 with
    a = (d*1000) div T^2, r = (d*1000) mod T^2 -- exact, every
    intermediate in BIGINT while T <= ~9.5e7 tokens per group, and
    the operator fail-louds past `max_group_tokens` (at 100 TB run
    per-shard then combine counts: sum(c^2) and T are both
    sum-monoids over (group, token) partials, so the cap is a
    single-pass convenience bound, not a semantic one).

    Scale: explode -> one (group, token) hash aggregate (map-side
    combine collapses the Zipf head) -> one O(distinct tokens)
    aggregate per group. Empty/whitespace-only texts contribute no
    tokens; a group with T == 0 yields no row (diversity undefined).
    """
    toks = df.select(
        *group_cols,
        F.explode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("__w"),
    )
    counts = toks.groupBy(*group_cols, "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    return diversity_from_counts(
        counts, group_cols=group_cols, max_group_tokens=max_group_tokens
    )


def diversity_from_counts(
    counts: DataFrame,
    group_cols: tuple[str, ...] = ("source",),
    max_group_tokens: int = 90_000_000,
) -> DataFrame:
    """Gini-Simpson diversity from a (group..., __w, __c) token-count
    summary -- the merge-side half of `gini_simpson_diversity`, split
    out because (T, sum c^2) is a sum-monoid over per-(group, token)
    partials: per-shard or per-batch counts SUM to the corpus counts,
    so a streaming monitor's extractor can be THIS function verbatim
    (the house extractor-is-the-batch-operator contract)."""
    agg = counts.groupBy(*group_cols).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__sq"),
    )
    guarded = agg.where(
        F.assert_true(
            F.col("n_tokens") <= F.lit(max_group_tokens),
            F.concat(
                F.lit("gini_simpson_diversity: group exceeds token budget ["),
                F.col("n_tokens").cast("string"),
                F.lit(
                    f" tokens, budget {max_group_tokens}] -- the exact e6 "
                    "ladder needs T^2 in BIGINT; shard the group and "
                    "combine the (token, count) partials"
                ),
            ),
        ).isNull()
    )
    return guarded.select(
        *group_cols,
        "n_tokens",
        "n_distinct",
        F.expr(
            "CAST(((n_tokens * n_tokens - __sq) * 1000) "
            "div (n_tokens * n_tokens) * 1000 "
            "+ (((n_tokens * n_tokens - __sq) * 1000) "
            "% (n_tokens * n_tokens) * 1000) "
            "div (n_tokens * n_tokens) AS BIGINT)"
        ).alias("diversity_e6"),
    )


def dsir_importance_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id", "source"),
    buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights over hashed bigram features: score
    every document by how much its hashed-n-gram distribution looks like
    the `target` corpus rather than the raw corpus (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" --
    the feature space is hashed n-gram counts, the weight is the
    log-ratio of two add-1-smoothed bucket multinomials).

    Per gram occurrence in bucket b:
        w(b) = log2( ((ct(b)+1) * (R+B)) / ((cr(b)+1) * (T+B)) )
    where ct/cr are target/raw bucket counts, T/R their totals and B the
    bucket count -- ONE log2 of a ratio of integer-derived doubles (the
    engine-portable ln discipline).  A document's weight is the sum over
    its gram occurrences; resampling keeps documents proportional to it.

    Plan shape, sized for the 100 TB corpus:
    - bigrams are built NARROWLY from the token array (transform over
      the split array -- no posexplode + lead window, so the token
      stream never shuffles for position);
    - the feature space is the FIXED hash range, so both model tables
      (raw + target bucket counts) are <= `buckets` rows -- broadcast,
      never a shuffle of the gram stream (this is the point of hashed
      features: a real vocabulary outgrows broadcast, B=4096 never
      does);
    - the only wide op is the per-document reduce, keyed by the
      corpus's natural id -- no skew.
    - the gram->bucket hash is md5-based (`sampling.hash_bucket`), so
      weights are reproducible outside Spark.

    Documents with < 2 tokens have no bigrams and no output row.
    Returns id cols + (n_grams, importance) per document, importance =
    the summed log-ratio (NOT averaged -- callers wanting a per-gram
    rate divide by n_grams).
    """
    from .sampling import hash_bucket

    def _bucketed(frame: DataFrame, with_ids: bool) -> DataFrame:
        grams = F.when(
            F.size(F.col("__t")) >= 2,
            F.expr(
                "transform(sequence(1, size(__t) - 1), "
                "i -> concat(element_at(__t, i), ' ', "
                "element_at(__t, i + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        cols = [F.col(c) for c in id_cols] if with_ids else []
        return (
            frame.withColumn("__t", F.split(F.col(text_col), " "))
            .select(*cols, F.explode(grams).alias("__g"))
            .withColumn("__b", hash_bucket(F.col("__g"), buckets))
            .drop("__g")
        )

    from ..caching import transient_persist

    raw = _bucketed(df, with_ids=True)
    # both model tables are PERSISTED (<= `buckets` rows each): cr/ct
    # feed the scoring join AND the totals -- unpersisted, each consumer
    # column-prunes its own copy of the aggregate and the corpus-sized
    # gram pipeline replays once per consumer (5 explode subtrees in
    # the plan); cached, the corpus is scanned twice (model + scoring)
    # and the target once -- the pass-count minimum, since the model
    # must be complete before scoring
    cr = transient_persist(
        raw.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    )
    ct = transient_persist(
        _bucketed(target, with_ids=False)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    totals = cr.agg(
        F.sum("__cr").cast("long").alias("__rt")
    ).crossJoin(
        ct.agg(F.coalesce(F.sum("__ct"), F.lit(0)).cast("long").alias("__tt"))
    )
    b = F.lit(buckets)
    w = F.log2(
        ((F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0)) * (F.col("__rt") + b))
        / ((F.col("__cr") + F.lit(1.0)) * (F.col("__tt") + b))
    )
    return (
        raw.join(F.broadcast(cr), "__b")
        .join(F.broadcast(ct), "__b", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(w).alias("importance"),
        )
    )
