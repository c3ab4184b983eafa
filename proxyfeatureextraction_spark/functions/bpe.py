"""Real byte-pair-encoding token counts (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
byte-level pre-tokenized variant popularized by GPT-2, Radford et al.
2019). Counterpart to the cheap regex estimate
``text.bpe_ish_token_count`` — this one applies an actual ranked
merges table, so ``pack_sequences(tok_col=...)`` bins line up with a
real tokenizer's context budget instead of a whitespace proxy.

Three layers, all deterministic:

- a driver-side trainer (``train_bpe_merges``) that learns a merges
  table from an iterable of texts — fixture-scale; production loads a
  PUBLISHED merges.txt (e.g. the GPT-2 release) via
  ``load_merges_txt`` instead of training here;
- a pure-Python encoder (``encode_pretoken`` + ``count_text``) —
  the classic greedy lowest-rank-pair merge loop;
- the Spark surface (``bpe_token_count``): an Arrow-batched pandas
  UDF over the broadcast ranks dict.  The merge loop is a
  data-dependent fixpoint iteration per pre-token — there is no
  higher-order-function or window equivalent, so this is one of the
  documented legitimate pandas-UDF slots (like the zlib entropy
  signal).  Per-batch memoization means each DISTINCT pre-token is
  encoded once per Arrow batch; natural text repeats pre-tokens
  heavily, so throughput is dominated by the dict lookup, not the
  merge loop.

Scale shape: the ranks table is a broadcast read-only dict (a 50k-merge
vocabulary is ~1 MB — one copy per executor, not per task); the UDF is
a narrow per-row map with no shuffle, so it fuses into the scan and
parallelizes with the input splits.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2's pre-tokenization pattern, with the \p{L}/\p{N} classes
# expressed in stdlib-`re` form ([^\W\d_] = unicode letters, \d =
# unicode digits) — contractions, space-prefixed letter/digit/symbol
# runs, then residual whitespace.
PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE,
)


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode map: printable
    ASCII/latin bytes map to themselves, the rest shift into a clean
    private range — every byte string becomes a string of 'characters'
    the merge table can rank without whitespace/control ambiguity."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _byte_symbols(pretoken: str) -> tuple[str, ...]:
    b2u = bytes_to_unicode()
    return tuple(b2u[b] for b in pretoken.encode("utf-8"))


def _pairs(symbols: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(symbols, symbols[1:]))


def train_bpe_merges(
    texts: Iterable[str], n_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Learn a ranked merges table (driver-side, fixture scale).

    The standard greedy loop: count symbol-pair frequencies over the
    pre-token frequency dict, merge the most frequent pair, repeat.
    Ties break lexicographically on the pair, so the table is
    deterministic for a given corpus regardless of dict iteration
    order. Stops early when no pair reaches ``min_pair_count``.

    For a production vocabulary DON'T train here — load the published
    table your tokenizer ships (``load_merges_txt``); training is
    provided so tests and fixtures need no external file.
    """
    word_freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        if not t:
            continue
        for pt in PRETOKEN_RE.findall(t):
            w = _byte_symbols(pt)
            if len(w) > 1:
                word_freq[w] = word_freq.get(w, 0) + 1
    return _merge_loop(word_freq, n_merges, min_pair_count)


def _merge_loop(
    word_freq: dict[tuple[str, ...], int], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The greedy BPE merge loop over a symbol-word frequency dict —
    shared verbatim by the driver-side trainer and the distributed
    trainer (whose Spark stage ends at exactly this dict)."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in word_freq.items():
            for p in zip(w, w[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_freq: dict[tuple[str, ...], int] = {}
        for w, c in word_freq.items():
            if pair not in _pairs(w):
                new_freq[w] = new_freq.get(w, 0) + c
                continue
            out: list[str] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            new_freq[nw] = new_freq.get(nw, 0) + c
        word_freq = new_freq
    return merges


def save_merges_txt(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: pfx-bpe\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges_txt(path: str) -> list[tuple[str, str]]:
    """Parse the standard merges.txt format (one ``left right`` pair
    per line, ``#``-prefixed header lines skipped) — the file published
    with GPT-2-family tokenizers."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"malformed merges line: {line!r}")
            merges.append((parts[0], parts[1]))
    return merges


def encode_pretoken(
    symbols: tuple[str, ...], ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Greedy BPE: repeatedly merge the adjacent pair with the LOWEST
    rank until no adjacent pair is in the table."""
    while len(symbols) > 1:
        best_rank = None
        best_pair = None
        for p in zip(symbols, symbols[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and (symbols[i], symbols[i + 1]) == best_pair:
                out.append(merged)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = tuple(out)
    return symbols


def count_text(text: str | None, ranks: dict[tuple[str, str], int]) -> int:
    """BPE token count of a full text (0 for null/empty)."""
    if not text:
        return 0
    n = 0
    for pt in PRETOKEN_RE.findall(text):
        n += len(encode_pretoken(_byte_symbols(pt), ranks))
    return n


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe",
) -> DataFrame:
    """Append the real BPE token count of ``text_col`` as ``out_col``.

    Arrow-batched pandas UDF over the broadcast ranks dict (see module
    docstring for why this is a legitimate pandas-UDF slot and how it
    scales); per-batch memoization encodes each distinct pre-token
    once. Feed the result into ``pack_sequences(tok_col=out_col)`` so
    context bins respect the real tokenizer budget.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    @pandas_udf("long")
    def _count(s):
        import pandas as pd

        rk = bc.value
        cache: dict[str, int] = {}

        def one(t):
            if not t:
                return 0
            n = 0
            for pt in PRETOKEN_RE.findall(t):
                c = cache.get(pt)
                if c is None:
                    c = len(encode_pretoken(_byte_symbols(pt), rk))
                    cache[pt] = c
                n += c
            return n

        return pd.Series([one(t) for t in s], dtype="int64")

    return df.withColumn(out_col, _count(F.col(text_col)))


def bpe_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append the BPE token strings (array<string>, byte-unicode form)
    — the id-free face of the encoder (token ids additionally need the
    published vocab.json; counts and packing only need merges)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    @pandas_udf("array<string>")
    def _toks(s):
        import pandas as pd

        rk = bc.value
        cache: dict[str, list[str]] = {}

        def one(t):
            if not t:
                return []
            out: list[str] = []
            for pt in PRETOKEN_RE.findall(t):
                c = cache.get(pt)
                if c is None:
                    c = list(encode_pretoken(_byte_symbols(pt), rk))
                    cache[pt] = c
                out.extend(c)
            return out

        return pd.Series([one(t) for t in s])

    return df.withColumn(out_col, _toks(F.col(text_col)))


def corpus_word_freq(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
) -> DataFrame:
    """Corpus-scale pre-token frequency table ``(pretoken, freq)`` —
    the distributed (100 TB) half of BPE training.  Pre-tokenization
    runs the exact stdlib-``re`` GPT-2 pattern inside an Arrow-batched
    ``mapInPandas`` (the Python regex IS the spec — a Java-regex
    translation of ``[^\\W\\d_]`` would silently diverge on unicode
    classes, so this is a documented legitimate pandas-UDF slot like
    the zlib signal), with per-batch ``Counter`` pre-aggregation so
    the exchange carries one row per DISTINCT pre-token per batch —
    natural text repeats pre-tokens heavily, so the shuffle volume is
    near the vocabulary size, not the corpus size.  One
    ``groupBy(pretoken).sum`` (map-side partial) finishes the count.

    ``min_freq`` prunes the long tail BEFORE any driver collect; the
    fail-fast row bound lives at the one place a collect happens
    (``train_bpe_merges_distributed``'s guarded ``limit`` collect) —
    this helper itself returns an ordinary unbounded DataFrame.
    """
    import pandas as pd

    def _count(batches):
        from collections import Counter

        for pdf in batches:
            c: Counter = Counter()
            for t in pdf[text_col]:
                if t:
                    c.update(PRETOKEN_RE.findall(t))
            if c:
                yield pd.DataFrame(
                    {"pretoken": list(c.keys()), "freq": list(c.values())}
                )

    wf = (
        df.select(text_col)
        .mapInPandas(_count, "pretoken string, freq long")
        .groupBy("pretoken")
        .agg(F.sum("freq").alias("freq"))
    )
    if min_freq > 1:
        wf = wf.where(F.col("freq") >= min_freq)
    return wf


def train_bpe_merges_distributed(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    min_freq: int = 1,
    max_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn a ranked merges table FROM a Spark corpus — the scale
    path of ``train_bpe_merges`` (bit-identical output on the same
    corpus; pinned by the differential pytest).  Architecture follows
    how production tokenizer trainers actually scale (SentencePiece /
    HF tokenizers): the corpus-sized work is the pre-token frequency
    aggregation (``corpus_word_freq`` — one shuffle whose volume is
    the vocabulary, not the corpus), and the greedy merge loop then
    runs over that BOUNDED table on the driver — a web-scale corpus
    has ~10^7-10^8 distinct pre-tokens before ``min_freq`` pruning,
    orders of magnitude below the corpus itself, and each merge round
    touches only words containing the merged pair.  The collect is
    fail-fast guarded at ``max_words`` rows; raise ``min_freq`` (every
    real tokenizer does) rather than the cap.
    """
    wf = corpus_word_freq(df, text_col, min_freq=min_freq)
    # single-pass guarded collect: limit(max+1) bounds what can reach
    # the driver AND detects overflow without a second execution of the
    # corpus aggregation (a count() + collect() pair runs the job twice)
    rows = wf.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"word-frequency table exceeds max_words={max_words}; "
            f"raise min_freq (tail pruning) or max_words"
        )
    word_freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        w = _byte_symbols(r["pretoken"])
        if len(w) > 1:
            word_freq[w] = word_freq.get(w, 0) + int(r["freq"])
    return _merge_loop(word_freq, n_merges, min_pair_count)


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    min_freq: int = 1,
    max_words: int = 2_000_000,
) -> DataFrame:
    """DataFrame surface over ``train_bpe_merges_distributed``: one row
    per learned merge, ``(rank, left, right)``, rank 0 = first merge.
    Deterministic for a given corpus (greedy max-frequency with
    lexicographic tie-break). Feed the result straight to
    ``bpe_token_count(merges=...)`` / ``pack_sequences(tok_col=...)``
    to tokenize with the corpus's own vocabulary."""
    merges = train_bpe_merges_distributed(
        df,
        n_merges,
        text_col=text_col,
        min_pair_count=min_pair_count,
        min_freq=min_freq,
        max_words=max_words,
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
