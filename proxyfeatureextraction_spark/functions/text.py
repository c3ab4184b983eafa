"""Text-analysis column functions for training-data pipelines.

All JVM-side (built-in functions / higher-order array expressions) —
no Python in the hot path. Each returns Column(s) usable in any plan;
``__spark_entry__`` exposes oracle-checked query versions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in")
MARKERS = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "et", "de"),
    "de": ("der", "die", "und", "das"),
}
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
FINGERPRINT_MOD = 1_000_000_007


def tokens(text_col: str | Column = "text") -> Column:
    """Null-safe single-space word split (NULL text → zero tokens) —
    THE shared tokenizer for every space-split operator (retrieval,
    LM scoring, NB classifier, histograms); keep one form so gram
    families can't drift apart."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), " "), lambda w: F.length(w) > 0
    )


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Regex token count approximating subword pre-tokenization."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))


def avg_token_len(text_col: str = "text") -> Column:
    t = tokens(text_col)
    return F.aggregate(t, F.lit(0.0), lambda a, w: a + F.length(w)) / F.greatest(
        F.size(t).cast("double"), F.lit(1.0)
    )


def stopword_ratio(text_col: str = "text", stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    t = tokens(text_col)
    return F.size(F.filter(t, lambda w: w.isin(*stopwords))) / F.greatest(
        F.size(t).cast("double"), F.lit(1.0)
    )


def long_token_ratio(text_col: str = "text", min_len: int = 8) -> Column:
    t = tokens(text_col)
    return F.size(F.filter(t, lambda w: F.length(w) >= min_len)) / F.greatest(
        F.size(t).cast("double"), F.lit(1.0)
    )


def quality_score(text_col: str = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence − degenerate-token penalty."""
    n = F.length(text_col)
    len_ok = F.when((n >= 50) & (n <= 4000), 1.0).otherwise(0.3)
    sw = stopword_ratio(text_col)
    sw_ok = F.when((sw > 0.02) & (sw < 0.5), 1.0).otherwise(0.5)
    longtok = F.when(long_token_ratio(text_col) < 0.5, 1.0).otherwise(0.4)
    return F.round((len_ok + sw_ok + longtok) / 3.0, 6)


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    t = tokens(text_col)
    nt = F.greatest(F.size(t).cast("double"), F.lit(1.0))

    def _score(marks: tuple[str, ...]) -> Column:
        # NB: a one-parameter lambda is required — a second (default)
        # parameter makes F.filter pass the element index into it
        return F.size(F.filter(t, lambda w: w.isin(*marks))) / nt

    return {lang: _score(marks) for lang, marks in MARKERS.items()}


def lang_guess(text_col: str = "text") -> Column:
    scores = lang_scores(text_col)
    pairs = [F.struct(v.alias("s"), F.lit(k).alias("l")) for k, v in scores.items()]
    # greatest-by-score with deterministic key tiebreak (array_max on
    # struct compares fields in order: score, then lang)
    return F.array_max(F.array(*pairs))["l"]


def fingerprint(text_col: str = "text") -> Column:
    """Positional polynomial document fingerprint mod 1e9+7
    (order-sensitive, deterministic, engine/DuckDB-identical)."""
    t = tokens(text_col)
    terms = F.transform(
        t,
        lambda w, i: ((i + 1) * (F.length(w).cast("long") * 131 + F.ascii(w)))
        % F.lit(FINGERPRINT_MOD),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % F.lit(
        FINGERPRINT_MOD
    )


#: masking tokens for the normalize step (pre-dedup canonical form)
URL_RE = r"(https?://|www\.)[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def normalize_text(
    text_col: str = "text",
    lowercase: bool = True,
    mask_urls: bool = True,
    mask_emails: bool = True,
    mask_digits: bool = False,
) -> Column:
    """Canonical pre-dedup text form, pure JVM regex pipeline:
    control chars → space, URLs → ``<url>``, emails → ``<email>``
    (optionally digit runs → ``<num>``), lowercase, whitespace
    collapsed + trimmed. Near-dup recall improves materially when docs
    are normalized BEFORE word-set/shingle hashing (case and boilerplate
    URLs otherwise split word-sets); run dedup over this column and keep
    the raw text for training."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    c = F.regexp_replace(c, r"[\x00-\x1f\x7f]", " ")
    if mask_urls:
        c = F.regexp_replace(c, URL_RE, "<url>")
    if mask_emails:
        c = F.regexp_replace(c, EMAIL_RE, "<email>")
    if mask_digits:
        c = F.regexp_replace(c, r"[0-9]+", "<num>")
    if lowercase:
        c = F.lower(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


#: PII patterns, deliberately restricted to syntax shared by Java regex
#: (Spark) and RE2 (DuckDB) so the scrub has a bit-identical oracle
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(text_col: str = "text") -> dict[str, Column]:
    """PII scrub for training text: emails / IPv4s / phone numbers →
    typed mask tokens, plus per-pattern match counts.

    Counts are measured independently on the RAW text (so ``n_ips``
    reports IPs even when an earlier mask would have consumed them);
    the scrubbed text applies masks in order email → ip → phone.
    Pure JVM regexp pipeline — fuses into the scan, no shuffle.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    c = F.regexp_replace(raw, EMAIL_RE, "<email>")
    c = F.regexp_replace(c, IPV4_RE, "<ip>")
    c = F.regexp_replace(c, PHONE_RE, "<phone>")
    return {
        "n_emails": F.regexp_count(raw, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(raw, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(raw, F.lit(PHONE_RE)),
        "scrubbed": c,
    }


#: Gopher's required-stopword list (Rae et al. 2021, §A1.1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(text_col: str = "text") -> dict[str, Column]:
    """Gopher-style rule-based quality signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1.1 — the public
    filtering recipe most pretraining pipelines start from), all pure
    JVM higher-order expressions with bit-identical DuckDB twins:

    - ``n_words``: whitespace token count
    - ``mean_word_len``: mean characters per word (0 when empty)
    - ``symbol_word_ratio``: ('#' occurrences + '...' occurrences) /
      words — the hashtag/ellipsis spam signal
    - ``alpha_word_ratio``: fraction of words containing at least one
      ASCII letter
    - ``stop_hits``: how many of Gopher's 8 required stopwords appear
    - ``bullet_line_ratio`` / ``ellipsis_line_ratio``: fraction of
      lines starting with a bullet / ending with an ellipsis
    - ``passes_gopher``: the conjunction with Gopher's published
      thresholds (50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10, symbol ratio
      ≤ 0.1, ≥ 80% alphabetic words, ≥ 2 stopwords, ≤ 90% bullet
      lines, ≤ 30% ellipsis lines)

    Ratios are rounded to 6 digits (oracle portability); every signal
    is null-safe (null text behaves like empty text).  Words split on
    ``\\s+`` (not single spaces): this operator is line-aware by
    design, and a space-only split would glue the last word of each
    line to the first word of the next, undercounting words and
    stopword hits on exactly the multi-line prose it targets.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = F.filter(F.split(txt, r"\s+"), lambda w: F.length(w) > 0)
    nw = F.size(t)
    nw_d = F.greatest(nw.cast("double"), F.lit(1.0))
    mean_len = F.round(
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / nw_d,
        6,
    )
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.round((n_hash + n_ell) / nw_d, 6)
    alpha_ratio = F.round(
        F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]"))) / nw_d, 6
    )
    stop_hits = sum(
        [F.array_contains(t, s).cast("int") for s in GOPHER_STOPWORDS],
        F.lit(0),
    )
    lines = F.filter(F.split(txt, "\n"), lambda l: F.length(l) > 0)
    nl_d = F.greatest(F.size(lines).cast("double"), F.lit(1.0))
    bullet_ratio = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
            )
        )
        / nl_d,
        6,
    )
    ellipsis_ratio = F.round(
        F.size(F.filter(lines, lambda l: l.endswith("...") | l.endswith("…")))
        / nl_d,
        6,
    )
    passes = (
        (nw >= 50) & (nw <= 100_000)
        & (mean_len >= 3.0) & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
        & (bullet_ratio <= 0.9)
        & (ellipsis_ratio <= 0.3)
    )
    return {
        "n_words": nw.cast("long"),
        "mean_word_len": mean_len,
        "symbol_word_ratio": symbol_ratio,
        "alpha_word_ratio": alpha_ratio,
        "stop_hits": stop_hits.cast("long"),
        "bullet_line_ratio": bullet_ratio,
        "ellipsis_line_ratio": ellipsis_ratio,
        "passes_gopher": passes,
    }


def compression_ratio(text_col: str = "text", level: int = 6) -> Column:
    """zlib compressed-size / raw-size per document — the cheap entropy
    signal training pipelines use to kill boilerplate and generated
    spam (near-0 → highly repetitive; ~1 → high-entropy/random; natural
    prose sits in between). Runs as an Arrow-batched pandas UDF (zlib
    is stdlib; there is no JVM builtin), one compress per doc per
    batch; null/empty text → 0.0. Pytest-pinned against a direct zlib
    replay — no SQL oracle exists for zlib, so this is deliberately not
    a driver gate."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None or len(t) == 0:
                return 0.0
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    return _ratio(F.col(text_col))


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 50,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most frequent word ``n``-grams with occurrence and
    document frequencies — vocabulary building / boilerplate-phrase
    mining (the pass that finds the navbar junk to strip before
    training). Returns ``(gram, n_occ, n_docs)`` ordered by
    (count desc, gram asc) — a deterministic total order, so the
    result set is stable.

    Scale shape: explode → groupBy with map-side partial aggregation →
    ``orderBy().limit(k)``, which Spark executes as TakeOrderedAndProject
    (per-partition top-k, then a k-row merge on the driver) — no global
    sort materializes. Docs shorter than ``n`` words contribute their
    whole text as one gram (same convention as the dedup shingles).
    """
    from proxyfeatureextraction_spark.operators.dedup import _shingle_col

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingle_col(text_col, n)).alias("gram"),
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        counts.filter(F.col("n_occ") >= min_count)
        .orderBy(F.desc("n_occ"), F.asc("gram"))
        .limit(k)
    )


def collocations_pmi(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information
    (Church & Hanks 1990, "Word Association Norms, Mutual Information,
    and Lexicography"): word pairs that co-occur far more than their
    marginal frequencies predict — multi-word expressions, named
    entities, domain jargon.  The corpus-statistics complement to raw
    ``top_ngrams`` frequency (which surfaces stopword pairs first).

    Returns ``(w1, w2, c_xy, pmi)`` ordered by (pmi desc, w1, w2);
    ``pmi = ln(p(xy) / (p(x)·p(y)))`` with unigram probabilities over
    the token total and the bigram probability over the bigram total.
    ``min_count`` suppresses the unstable low-count tail (PMI's known
    bias toward hapax pairs).

    Scale shape: one explode each for unigrams and bigrams, both into
    map-side-partial count aggregates; the two scalar totals broadcast;
    the marginal-count joins are plain equi-joins on the word (vocab-
    sized, not corpus-sized); ``orderBy().limit(k)`` executes as
    ``TakeOrderedAndProject``.  Every ``ln`` argument is an
    engine-computed integer count, so the score is portable bit-for-bit
    to the SQL oracle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = tokens(text_col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bg = df.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, m),
                F.slice(toks, 2, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cx"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    tot = uni.groupBy().agg(F.sum("cx").alias("tt"))
    btot = bgc.groupBy().agg(F.sum("c_xy").alias("bb"))
    scored = (
        bgc.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("cx").alias("cx1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cx").alias("cx2")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "c_xy",
            # fixed left-to-right ln-term order — the oracle mirrors it
            # so the double arithmetic is reproduced exactly
            (
                F.log("c_xy")
                + F.log("tt")
                + F.log("tt")
                - F.log("bb")
                - F.log("cx1")
                - F.log("cx2")
            ).alias("pmi"),
        )
    )
    return (
        scored.withColumn("pmi", F.round("pmi", 6))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_bpe_tokens", bpe_ish_token_count(text_col))
        .withColumn("avg_token_len", F.round(avg_token_len(text_col), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(text_col), 6))
        .withColumn("quality_score", quality_score(text_col))
        .withColumn("lang_guess", lang_guess(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )
    return out


#: Gopher's repetition-filter thresholds (Rae et al. 2021, table A1):
#: a document passes when every measured fraction is <= its bound.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
GOPHER_DUP_LINE_FRAC_MAX = 0.30
GOPHER_DUP_LINE_CHAR_FRAC_MAX = 0.20


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1.1 /
    table A1 — the "repetitious text" half of the published filtering
    recipe; `gopher_quality` covers the rule half):

    - ``dup_line_frac`` / ``dup_line_char_frac``: fraction of non-empty
      lines (and of their characters) that are repeats of an earlier
      identical line in the same document
    - ``dup_para_frac`` / ``dup_para_char_frac``: same over
      blank-line-separated paragraphs
    - ``top_{n}gram_char_frac`` (n in ``top_ns``): characters covered
      by the single most frequent word n-gram / total characters
      (ties on count broken toward the larger coverage — deterministic)
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): characters covered
      by all occurrences of n-grams appearing more than once / total
      characters.  Occurrences overlap, so the raw sum can exceed the
      document length; we cap at 1.0 and document the deviation from
      Gopher's span-marking definition (exact span union is a
      sequential per-doc scan; the capped occurrence sum is the
      standard distributed surrogate and is monotone in the same
      signal).
    - ``passes_repetition``: conjunction of table A1's thresholds over
      whichever signals were requested.

    Line/paragraph signals are pure JVM higher-order expressions (no
    shuffle).  The n-gram signals build ALL requested n-gram sizes in
    one generator pass and one explode: the exchange carries
    ``(doc_id, n, xxhash64(gram), gram_len)`` — never gram text — so
    the shuffle key width is constant at any corpus size (the same
    digest-keying rule the exact-dedup family follows).  Aggregation is
    map-side partial first; the per-(doc,n) and per-doc reduces are
    tiny.  Short docs (fewer words than n) contribute no n-grams and
    come back as 0.0 via the left join + coalesce.

    All fractions are rounded to 6 digits (oracle portability); null
    text behaves like empty text.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(txt, r"\s+"), lambda w: F.length(w) > 0)

    def _dup_fracs(parts: Column, prefix: str) -> list[Column]:
        n = F.size(parts)
        n_d = F.greatest(n.cast("double"), F.lit(1.0))
        dparts = F.array_distinct(parts)
        chars = F.aggregate(
            parts, F.lit(0).cast("long"), lambda a, p: a + F.length(p)
        )
        dchars = F.aggregate(
            dparts, F.lit(0).cast("long"), lambda a, p: a + F.length(p)
        )
        chars_d = F.greatest(chars.cast("double"), F.lit(1.0))
        return [
            F.round((n - F.size(dparts)) / n_d, 6).alias(f"dup_{prefix}_frac"),
            F.round((chars - dchars) / chars_d, 6).alias(
                f"dup_{prefix}_char_frac"
            ),
        ]

    lines = F.filter(F.split(txt, "\n"), lambda l: F.length(l) > 0)
    paras = F.filter(F.split(txt, "\n\n"), lambda p: F.length(F.trim(p)) > 0)

    all_ns = sorted(set(top_ns) | set(dup_ns))

    def _grams(n: int) -> Column:
        w = F.col("_w")
        # two-level transform so each gram STRING is built once and the
        # inner lambda binds it (hash + length share the same build)
        gs = F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - n + 1),
                lambda i: F.array_join(F.slice(w, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(
            gs,
            lambda g: F.struct(
                F.lit(n).alias("n"),
                F.xxhash64(g).alias("h"),
                F.length(g).alias("glen"),
            ),
        )

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(txt).alias("n_chars"),
        F.size(words).alias("n_words"),
        *_dup_fracs(lines, "line"),
        *_dup_fracs(paras, "para"),
        words.alias("_w"),
    )

    ex = base.select(
        "doc_id",
        F.greatest(F.col("n_chars").cast("double"), F.lit(1.0)).alias("nc"),
        F.explode(F.flatten(F.array(*[_grams(n) for n in all_ns]))).alias("g"),
    )
    cnt = ex.groupBy("doc_id", "g.n", "g.h").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("g.glen").alias("glen"),
        F.first("nc").alias("nc"),
    )
    cov = F.col("c") * F.col("glen")
    per_n = cnt.groupBy("doc_id", "n").agg(
        F.round(
            F.least(
                F.lit(1.0),
                F.max(F.struct(F.col("c"), cov.alias("cov"))).getField("cov")
                / F.first("nc"),
            ),
            6,
        ).alias("top_frac"),
        F.round(
            F.least(
                F.lit(1.0),
                F.sum(F.when(F.col("c") >= 2, cov).otherwise(F.lit(0)))
                / F.first("nc"),
            ),
            6,
        ).alias("dup_frac"),
    )
    sig = per_n.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_frac"))).alias(
                f"top_{n}gram_char_frac"
            )
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("dup_frac"))).alias(
                f"dup_{n}gram_char_frac"
            )
            for n in dup_ns
        ],
    )

    out = base.drop("_w").join(sig, "doc_id", "left")
    frac_cols = [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]
    for c in frac_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    passes = (
        (F.col("dup_line_frac") <= GOPHER_DUP_LINE_FRAC_MAX)
        & (F.col("dup_line_char_frac") <= GOPHER_DUP_LINE_CHAR_FRAC_MAX)
        & (F.col("dup_para_frac") <= GOPHER_DUP_LINE_FRAC_MAX)
        & (F.col("dup_para_char_frac") <= GOPHER_DUP_LINE_CHAR_FRAC_MAX)
    )
    for n in top_ns:
        if n in GOPHER_TOP_NGRAM_MAX:
            passes = passes & (
                F.col(f"top_{n}gram_char_frac") <= GOPHER_TOP_NGRAM_MAX[n]
            )
    for n in dup_ns:
        if n in GOPHER_DUP_NGRAM_MAX:
            passes = passes & (
                F.col(f"dup_{n}gram_char_frac") <= GOPHER_DUP_NGRAM_MAX[n]
            )
    return out.withColumn("passes_repetition", passes)
