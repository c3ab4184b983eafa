"""Model-based document quality filtering: multinomial Naive Bayes.

The third leg of the curation-filter taxonomy next to the rule-based
(Gopher, C4) and LM-based (CCNet) signals: web-scale pipelines train a
classifier on "reference corpus vs. random crawl" labels and keep
documents the model scores reference-like — GPT-3 (Brown et al. 2020,
Appendix A) with logistic regression over hashed features, the
original quality-at-scale recipe.  Multinomial Naive Bayes (McCallum &
Nigam 1998) is the closed-form member of that family: training IS one
counting aggregate per class, so — unlike iterative LR — the whole
train+score pipeline stays deterministic, declarative DataFrame
algebra with a bit-portable SQL twin.

- ``nb_train``: token counts per class over a labeled corpus →
  ``{"cls": DF[label, n_c (token count), n_d (doc count)],
  "tok": DF[label, w, c], "vocab": DF[v]}`` — all vocabulary-bounded,
  broadcast-able.
- ``nb_log_odds``: per-doc log-odds between two labels,
  ``sum_w [ln(c_pos(w)+1) - ln(n_pos+v)] - sum_w [...neg...]``
  plus the class-prior log-ratio from doc counts.  Laplace add-one
  keeps every term finite; every log argument is an engine-computed
  integer count (hash-portable, the DSIR/lm.py trick).  Positive
  log-odds ⇒ the doc looks like the positive (reference) class.

Scale shape: one token explode over the scored corpus, two broadcast
joins against vocabulary-bounded count tables, one map-side-partial
``groupBy(id)``.  Zero Python UDFs, zero windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from proxyfeatureextraction_spark.functions.text import (
    tokens as _tokens,  # the shared null-safe space tokenizer
)


def nb_train(
    df: DataFrame, label_col: str = "label", text_col: str = "text"
) -> dict[str, DataFrame]:
    """One counting pass: per-class token totals + doc counts, per
    (class, token) counts, and the global vocabulary size."""
    toks = df.select(
        F.col(label_col).alias("label"), F.explode(_tokens(text_col)).alias("w")
    )
    tok = toks.groupBy("label", "w").agg(F.count(F.lit(1)).alias("c"))
    cls_tok = toks.groupBy("label").agg(F.count(F.lit(1)).alias("n_c"))
    cls_doc = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_d")
    )
    cls = cls_doc.join(cls_tok, "label", "left").select(
        "label", F.coalesce(F.col("n_c"), F.lit(0)).alias("n_c"), "n_d"
    )
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    return {"cls": cls, "tok": tok, "vocab": vocab}


def nb_log_odds(
    df: DataFrame,
    model: dict[str, DataFrame],
    pos_label,
    neg_label,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``(id_col, n_tok, log_odds, keep)``: the Naive Bayes
    posterior log-ratio ln P(pos|doc) - ln P(neg|doc); ``keep`` =
    log_odds > 0 (doc looks reference-like).  Empty docs score exactly
    the prior log-ratio."""
    if pos_label == neg_label:
        raise ValueError(
            f"pos_label and neg_label must differ, got {pos_label!r} twice"
        )
    pos, neg = F.lit(pos_label), F.lit(neg_label)
    two = model["cls"].filter(F.col("label").isin([pos_label, neg_label]))
    # one-row frame: (n_pos tokens, n_neg tokens, prior log-ratio)
    consts = two.agg(
        F.sum(F.when(F.col("label") == pos, F.col("n_c"))).alias("np"),
        F.sum(F.when(F.col("label") == neg, F.col("n_c"))).alias("nn"),
        (
            F.log(F.sum(F.when(F.col("label") == pos, F.col("n_d"))))
            - F.log(F.sum(F.when(F.col("label") == neg, F.col("n_d"))))
        ).alias("prior"),
    )
    tw = (
        model["tok"]
        .filter(F.col("label").isin([pos_label, neg_label]))
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("label") == pos, F.col("c"))).alias("cp"),
            F.sum(F.when(F.col("label") == neg, F.col("c"))).alias("cn"),
        )
    )
    exploded = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("w")
    )
    per_tok = (
        exploded.join(F.broadcast(tw), "w", "left")
        .crossJoin(F.broadcast(model["vocab"]))
        .crossJoin(F.broadcast(consts))
        .select(
            id_col,
            (
                (F.log(F.coalesce(F.col("cp"), F.lit(0)) + F.lit(1))
                 - F.log(F.col("np") + F.col("v")))
                - (F.log(F.coalesce(F.col("cn"), F.lit(0)) + F.lit(1))
                   - F.log(F.col("nn") + F.col("v")))
            ).alias("llr"),
        )
    )
    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"), F.sum("llr").alias("s")
    )
    return (
        df.select(id_col).distinct()
        .join(agg, id_col, "left")
        .crossJoin(F.broadcast(consts.select("prior")))
        .select(
            id_col,
            F.coalesce(F.col("n_tok"), F.lit(0)).alias("n_tok"),
            (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("prior")).alias(
                "log_odds"
            ),
        )
        .withColumn("keep", F.col("log_odds") > 0)
    )
