"""Text retrieval over the corpus: BM25 search, tf-idf keywords,
inverted index.

The query-side leg of the engine's text stack: the curation operators
decide what stays in the corpus, these answer "which documents match
this query / what is this document about" — the primitives behind
corpus exploration, eval-set leakage triage, and topic-targeted
sampling at training-data scale.

- ``bm25_search``: Okapi BM25 (Robertson & Zaragoza 2009, "The
  Probabilistic Relevance Framework") top-k retrieval for a literal
  query string, with Lucene's non-negative idf variant
  ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
- ``tfidf_keywords``: top-m terms per document by tf·idf
  (Sparck Jones 1972), idf = ``ln((1+N)/(1+df)) + 1`` (the smooth
  sklearn form — never divides by zero, never negative).
- ``inverted_index``: term → sorted posting list, with a document-
  frequency cap that prunes stopword-class terms BEFORE the postings
  are collected (Lucene's common-terms idea) so no single term ever
  aggregates an unbounded list.

Scale shape: everything reduces to one token explode over the corpus
plus map-side-partial ``groupBy`` aggregates; the per-query term table
and the one-row corpus stats are broadcast.  Per-document windows
(tfidf top-m) partition on ``doc_id`` — bounded by document length,
never corpus-wide.  Zero Python UDFs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from proxyfeatureextraction_spark.functions.text import (
    tokens as _tokens,  # the shared null-safe space tokenizer
)


def _doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w, tf, dl): per-document term frequencies + doc length."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("w")
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id")


def bm25_search(
    df: DataFrame,
    query: str,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` documents for ``query`` under Okapi BM25.

    Returns ``(doc_id, n_hit, score)`` ordered by (score desc, doc_id)
    — ``n_hit`` is how many distinct query terms the document contains.
    Only documents containing at least one query term are scored, so
    the corpus never fully materializes past the semi-join.

    Every idf/length input is an engine-computed integer count; the
    per-doc sum runs over at most ``len(query terms)`` addends.  The
    plan is explode → query-term literal filter BEFORE the tf
    aggregate (the ``(doc_id, term)`` exchange carries only query-term
    rows, never the corpus vocabulary) → map-side-partial per-doc agg
    → ``TakeOrderedAndProject`` (no global sort).  The full token
    stream feeds exactly one aggregate — the per-doc length count —
    which partially aggregates map-side.
    """
    terms = sorted({w for w in query.split(" ") if w})
    if not terms:
        raise ValueError("query must contain at least one token")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("w")
    )
    # only query-term rows reach the (doc_id, w) exchange
    tf_q = (
        toks.filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dt = tf_q.join(dl, "doc_id")
    n_stats = dl.groupBy().agg(
        F.countDistinct("doc_id").alias("n"),
        (F.sum("dl") / F.countDistinct("doc_id")).alias("avgdl"),
    )
    dfreq = dt.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        dt.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(n_stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit"), F.sum("part").alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(top_k)
    )


def tfidf_keywords(
    df: DataFrame,
    top_m: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_m`` keywords per document by tf·idf.

    Returns ``(doc_id, rank, w, tf, score)``; ties broken by term text
    so the pick is deterministic.  idf uses the smooth
    ``ln((1+N)/(1+df)) + 1`` form.  The ranking window partitions on
    ``doc_id`` — its partition size is the document's distinct-term
    count, never a corpus-wide funnel.
    """
    if top_m < 1:
        raise ValueError(f"top_m must be >= 1, got {top_m}")
    dt = _doc_terms(df, id_col, text_col)
    dfreq = dt.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = dt.groupBy().agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        dt.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            "tf",
            (
                F.col("tf")
                * (
                    F.log((F.lit(1.0) + F.col("n")) / (F.lit(1.0) + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_m)
        .select("doc_id", "rank", "w", "tf", "score")
    )


def tfidf_allpairs(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
) -> DataFrame:
    """EXACT all-pairs cosine similarity join over tf-idf vectors
    (Bayardo, Ma & Srikant 2007, "Scaling Up All Pairs Similarity
    Search"): every document pair with tf-idf cosine >= ``threshold``,
    as ``(a, b, sim)`` with ``a < b``.

    The weighted-cosine complement to the MinHash/SimHash set-
    similarity family: near-dup detection that sees term FREQUENCY and
    rarity, not just set overlap — two docs sharing rare vocabulary
    score higher than two sharing boilerplate.

    Prefix filtering (lossless): each doc's terms are ordered rarest-
    first (global ``(df, w)`` order) and a term is INDEXED only while
    the unit-vector norm of the remaining tail is >= ``threshold``
    (``sqrt(1 - cumsum(u^2)) >= t``).  By Cauchy–Schwarz a pair whose
    shared terms are all unindexed in the lower-id doc has
    ``sim <= tail < t``, so joining only the indexed rows against full
    vectors generates every qualifying pair — and because the indexed
    prefix is each doc's RAREST vocabulary, the inverted join never
    fans out on stopword-class terms the way a naive term self-join
    does.  Candidates are then verified with the exact dot product, so
    the result is identical to the brute-force join.

    Scale shape: the term-frequency table and the unit-vector table
    are the algorithm's two reused relations — the tf table feeds the
    document-frequency aggregate and the weighting, the vector table
    feeds the prefix index, the candidate join and BOTH sides of the
    verification — so with ``materialize=True`` (default) each is
    persisted MEMORY_AND_DISK the way Bayardo's algorithm materializes
    its index: built once, scanned by every later stage, spilled to
    disk when it outgrows memory.  Without it Spark would re-execute
    the explode→aggregate lineage once per consumer.  (The cache lives
    until the session drops it — callers running many corpora through
    one session can ``spark.catalog.clearCache()`` between runs, or
    pass ``materialize=False`` to keep the plan fully lazy.)  The
    per-doc norm and prefix-ordering windows partition on ``doc_id``
    (bounded by document vocabulary, never corpus-wide); the candidate
    join keys on the indexed (rare) terms; verification joins the
    candidate pair list back to the vectors on ``doc_id``.  Zero
    Python UDFs, no driver collects.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("w")
    )
    dt = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    if materialize:
        dt = dt.persist(StorageLevel.MEMORY_AND_DISK)
    # dt is unique per (doc_id, w), so a plain count IS the document
    # frequency — no countDistinct expansion needed
    dfreq = dt.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = dt.groupBy().agg(F.countDistinct("doc_id").alias("n"))
    byd = Window.partitionBy("doc_id")
    wt = (
        dt.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            "df",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n")) / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                )
            ).alias("wgt"),
        )
    )
    vec = wt.withColumn(
        "nrm", F.sqrt(F.sum(F.col("wgt") * F.col("wgt")).over(byd))
    ).select("doc_id", "w", "df", (F.col("wgt") / F.col("nrm")).alias("u"))
    if materialize:
        vec = vec.persist(StorageLevel.MEMORY_AND_DISK)
    # rarest-first order within each doc; index while the tail norm of
    # the not-yet-seen suffix can still reach the threshold on its own
    order = Window.partitionBy("doc_id").orderBy("df", "w")
    head = order.rowsBetween(Window.unboundedPreceding, -1)
    idx = (
        vec.withColumn(
            "_pre", F.coalesce(F.sum(F.col("u") * F.col("u")).over(head), F.lit(0.0))
        )
        .filter(F.lit(1.0) - F.col("_pre") >= F.lit(threshold * threshold))
        .select(F.col("doc_id").alias("a"), "w")
    )
    full = vec.select(F.col("doc_id").alias("b"), "w")
    pairs = (
        idx.join(full, "w")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # the per-pair dot-product fold below is CPU-heavy on byte-cheap
    # rows: spread it over 4× the configured parallelism so (a) AQE's
    # byte-based coalescing can't collapse it onto few tasks and (b)
    # the stage tail stays short when individual cores stall — the
    # keyed repartition is deterministic and moves only id pairs
    pairs = pairs.repartition(
        4 * df.sparkSession.sparkContext.defaultParallelism, "a", "b"
    )
    # Exact verification over PER-DOCUMENT vector rows, not exploded
    # term rows: the old shape (pairs ⋈ va on a → pairs ⋈ vb on (b, w)
    # → groupBy(a, b)) fanned every candidate pair out to |vocab(a)|
    # term rows before the second join — at a near-dup-dense 5k-doc
    # corpus that is 12.4M pairs × ~23 terms ≈ 285M rows through two
    # exchanges (measured 29 s of a 35 s call). Collapsing each doc's
    # unit vector to ONE row (sorted entry array / hash map) makes the
    # verify one row per candidate pair: the dot product is a JVM
    # ``aggregate`` fold over a's entries with an ``element_at`` lookup
    # into b's map — no exchange ever carries more than |pairs| rows,
    # and the fold order is the sorted term order, deterministic.
    # Map lookups on Spark's array-backed maps are LINEAR scans, so the
    # per-pair fold costs |terms(a)| × |terms(b)| key compares — with
    # 8-byte xxhash64 keys those are long compares instead of UTF8
    # string compares (~4× cheaper measured). Hashed keys are exact
    # only if the hash is injective on this corpus's vocabulary, so
    # that is CHECKED (one aggregate over the persisted vec table —
    # vocabulary-bounded); on the astronomically rare collision the
    # verify falls back to the term strings themselves.
    hash_ok = (
        vec.agg(
            (
                F.countDistinct("w") == F.countDistinct(F.xxhash64("w"))
            ).alias("ok")
        ).first()["ok"]
    )
    if materialize:
        # vec (and everything the verify needs) is materialized by the
        # hash_ok probe; the tf table's cache is now redundant — release
        # it instead of holding it for the session's lifetime
        dt.unpersist()
    key = F.xxhash64("w") if hash_ok else F.col("w")
    emap = vec.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct(key.alias("k"), F.col("u")))).alias("e")
    )
    if materialize:
        emap = emap.persist(StorageLevel.MEMORY_AND_DISK)
    ea = emap.select(F.col("doc_id").alias("a"), F.col("e").alias("ea"))
    eb = emap.select(
        F.col("doc_id").alias("b"), F.map_from_entries("e").alias("mb")
    )
    sim = F.aggregate(
        F.col("ea"),
        F.lit(0.0),
        lambda acc, s: acc
        + F.coalesce(F.element_at(F.col("mb"), s["k"]), F.lit(0.0)) * s["u"],
    )
    return (
        pairs.join(ea, "a")
        .join(eb, "b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )


def inverted_index(
    df: DataFrame,
    max_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term → sorted posting list: ``(w, df, postings)`` with
    ``postings`` the comma-joined sorted doc ids (canonical string —
    integers render identically everywhere).

    Terms appearing in more than ``max_df`` documents are dropped
    BEFORE postings are collected — the df filter is a
    map-side-partial count aggregate, so a stopword in a billion
    documents costs a partial count per task and is gone before any
    list exists.  ``collect_list`` therefore never exceeds ``max_df``
    elements per group.
    """
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    pairs = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("w"),
    )
    keep = (
        pairs.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
    )
    return (
        pairs.join(keep, "w")
        .groupBy("w", "df")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("doc_id"))
            ).alias("postings")
        )
        .select("w", "df", "postings")
    )
