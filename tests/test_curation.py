"""Curation-layer tests: deterministic splits/sampling, eval-set
decontamination, PII scrubbing, greedy sequence packing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.operators.curation import (
    decontaminate,
    hash_split,
    pack_sequences,
    sample_per_group,
    split_bounds,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} " + " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)),
         ["en", "es", "fr"][i % 3])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df = df.cache()
    df.count()
    return df


# ---------------------------------------------------------------- hash_split


def test_hash_split_total_and_stable(spark, docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    pdf = out.select("doc_id", "split").toPandas()
    assert len(pdf) == 300 and pdf["split"].notna().all()
    # stable under physical reordering / repartitioning
    pdf2 = (
        hash_split(
            docs.repartition(7).orderBy(F.desc("doc_id")),
            {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=5,
        )
        .select("doc_id", "split")
        .toPandas()
    )
    merged = pdf.merge(pdf2, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()


def test_hash_split_proportions(spark):
    big = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = hash_split(big, {"train": 0.9, "val": 0.05, "test": 0.05}).groupBy(
        "split"
    ).count().toPandas().set_index("split")["count"]
    assert abs(out["train"] / 20_000 - 0.9) < 0.02
    assert abs(out["val"] / 20_000 - 0.05) < 0.01
    assert abs(out["test"] / 20_000 - 0.05) < 0.01


def test_split_bounds_reject_bad_weights():
    with pytest.raises(ValueError):
        split_bounds({"a": 0.0})


# ---------------------------------------------------------- sample_per_group


def test_sample_per_group_caps_and_determinism(docs):
    out = sample_per_group(docs, "lang", 10, seed=1)
    pdf = out.groupBy("lang").count().toPandas()
    assert (pdf["count"] == 10).all()
    ids_a = set(out.toPandas()["doc_id"])
    ids_b = set(sample_per_group(docs.repartition(5), "lang", 10, seed=1).toPandas()["doc_id"])
    assert ids_a == ids_b
    ids_c = set(sample_per_group(docs, "lang", 10, seed=2).toPandas()["doc_id"])
    assert ids_a != ids_c  # different seed, (almost surely) different draw


def test_sample_per_group_small_group_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
    )
    out = sample_per_group(df, "lang", 5).toPandas()
    assert len(out) == 3


# ------------------------------------------------- weighted_sample_per_group


def test_weighted_sample_matches_aes_reference(spark, docs):
    """Exact parity with a pandas replay of the A-ES key formula
    (u^(1/w) on the same portable hash) — no statistics needed."""
    import numpy as np

    from proxyfeatureextraction_spark.operators.curation import (
        OP_WSAMPLE,
        op_seed,
        weighted_sample_per_group,
    )
    from proxyfeatureextraction_spark.operators.dedup import HASH_MOD, perm_params

    wdf = docs.withColumn("wt", (F.col("doc_id") % 7 + 1).cast("double"))
    got = (
        weighted_sample_per_group(wdf, "lang", 4, "wt", seed=11)
        .select("lang", "doc_id")
        .toPandas()
    )
    pdf = wdf.select("lang", "doc_id", "wt").toPandas()
    a, b = perm_params(op_seed(11, OP_WSAMPLE))
    h = (pdf["doc_id"] % HASH_MOD) * a % HASH_MOD  # staged like int64 spark ops
    h = (h + b) % HASH_MOD
    pdf["key"] = np.power((h + 1) / float(HASH_MOD + 1), 1.0 / pdf["wt"])
    exp = (
        pdf.sort_values(["key", "doc_id"], ascending=[False, True], kind="stable")
        .groupby("lang")
        .head(4)
    )
    assert set(map(tuple, got[["lang", "doc_id"]].to_numpy())) == set(
        map(tuple, exp[["lang", "doc_id"]].to_numpy())
    )


def test_weighted_sample_favors_heavy_rows_and_drops_nonpositive(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        weighted_sample_per_group,
    )

    rows = [(i, "g", 1000.0 if i == 0 else 1.0) for i in range(60)]
    rows += [(100, "g", 0.0), (101, "g", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, wt double")
    hits = 0
    for seed in range(8):
        got = weighted_sample_per_group(df, "lang", 5, "wt", seed=seed).toPandas()
        assert len(got) == 5
        assert not set(got["doc_id"]) & {100, 101}
        hits += int(0 in set(got["doc_id"]))
    assert hits >= 7  # weight-1000 row is near-certain to be drawn


# -------------------------------------------------------------- decontaminate


def test_decontaminate_flags_ngram_overlap(spark):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains the eval 8-gram "alpha beta ... theta" verbatim
            (1, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
            (2, "totally unrelated words nothing shared here at all ok"),
            # shares words but no 8-gram run
            (3, "alpha beta gamma unrelated delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = (
        decontaminate(train, eval_df, n=8)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] >= 1
    assert not bool(out.loc[2, "contaminated"]) and out.loc[2, "n_hits"] == 0
    assert not bool(out.loc[3, "contaminated"])
    assert len(out) == 3  # every train doc reported


def test_decontaminate_short_eval_doc_matches_verbatim(spark):
    # eval doc shorter than n words falls back to a whole-text shingle,
    # so verbatim copies still match; supersets do not
    eval_df = spark.createDataFrame([(9, "short eval item")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "short eval item"), (2, "short eval item plus more")],
        "doc_id long, text string",
    )
    out = decontaminate(train, eval_df, n=8).toPandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])


def test_decontaminate_shuffle_fallback_matches_broadcast(spark, docs):
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    a = decontaminate(tr, ev, n=3, broadcast_eval=True).toPandas()
    b = decontaminate(tr, ev, n=3, broadcast_eval=False).toPandas()
    key = ["doc_id", "n_hits", "contaminated"]
    assert (
        a[key].sort_values("doc_id").reset_index(drop=True).equals(
            b[key].sort_values("doc_id").reset_index(drop=True)
        )
    )


def test_decontaminate_fuzzy_flags_near_dups(spark):
    from proxyfeatureextraction_spark.operators.curation import decontaminate_fuzzy

    eval_df = spark.createDataFrame(
        [(50, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # word-set jaccard 9/9 = 1.0 (exact copy)
            (1, "the quick brown fox jumps over the lazy dog today"),
            # one word swapped: |inter|=8, |union|=10 → 0.8 — at threshold
            (2, "the quick brown fox jumps over the lazy cat today"),
            (3, "completely different content with no shared vocabulary whatsoever"),
        ],
        "doc_id long, text string",
    )
    out = (
        decontaminate_fuzzy(train, eval_df, threshold=0.8, n_perm=16, bands=16)
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "max_jaccard"] == 1.0
    assert bool(out.loc[2, "contaminated"]) and abs(out.loc[2, "max_jaccard"] - 0.8) < 1e-9
    assert not bool(out.loc[3, "contaminated"]) and out.loc[3, "n_matches"] == 0
    assert len(out) == 3


def test_decontaminate_fuzzy_never_pairs_train_with_train(spark):
    from proxyfeatureextraction_spark.operators.curation import decontaminate_fuzzy

    # two identical train docs, eval unrelated: no contamination
    train = spark.createDataFrame(
        [(1, "same text here okay fine"), (2, "same text here okay fine")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(9, "entirely unrelated evaluation material present")], "doc_id long, text string"
    )
    out = decontaminate_fuzzy(train, eval_df, threshold=0.5).toPandas()
    assert not out["contaminated"].any()


def test_decontaminate_fuzzy_shuffle_fallback_matches_broadcast(spark, docs):
    from proxyfeatureextraction_spark.operators.curation import decontaminate_fuzzy

    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    a = (
        decontaminate_fuzzy(tr, ev, threshold=0.6, broadcast_eval=True)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        decontaminate_fuzzy(tr, ev, threshold=0.6, broadcast_eval=False)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


# --------------------------------------------------------------- scrub_pii


def test_scrub_pii_masks_and_counts(spark):
    from proxyfeatureextraction_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server 192.168.1.254 then call 555-123-4567 or 800 555 1212"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    cols = scrub_pii("text")
    out = (
        df.select("doc_id", *[v.alias(k) for k, v in cols.items()])
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_emails"] == 1 and "<email>" in out.loc[1, "scrubbed"]
    assert "bob" not in out.loc[1, "scrubbed"]
    assert out.loc[2, "n_ips"] == 1 and out.loc[2, "n_phones"] == 2
    assert "<ip>" in out.loc[2, "scrubbed"] and out.loc[2, "scrubbed"].count("<phone>") == 2
    assert out.loc[3, "scrubbed"] == "" and out.loc[3, "n_emails"] == 0


# ------------------------------------------------------------ curate_corpus


def test_curate_corpus_end_to_end_labels(spark):
    from proxyfeatureextraction_spark.operators.curation import curate_corpus

    T = "the cat sat on a mat with many other friendly cats nearby today"
    T2 = "the cat sat on a mat with many other friendly dogs nearby today"
    eval_df = spark.createDataFrame(
        [(100, "alpha bravo charlie delta echo foxtrot golf hotel india")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "x"),  # quality fail (short): must NOT vote in dedup
            (2, T),  # survivor of the {2,3,4} cluster
            (3, T),  # exact dup
            (4, T2),  # near dup (word-set jaccard 12/14 ≈ 0.857)
            (5, "an entirely unique document about the weather and a garden full of plants"),
            (6, "note that alpha bravo charlie delta echo foxtrot golf hotel india appears in the middle here"),
        ],
        "doc_id long, text string",
    )
    out = (
        curate_corpus(
            train, eval_df, weights={"train": 0.5, "val": 0.5},
            threshold=0.8, min_quality=0.8, decon_n=8,
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "reason"] == "quality"
    assert out.loc[2, "reason"] == "kept"
    assert out.loc[3, "reason"] == "duplicate"
    assert out.loc[4, "reason"] == "duplicate"
    assert out.loc[5, "reason"] == "kept"
    assert out.loc[6, "reason"] == "contaminated"
    assert (out["keep"] == (out["reason"] == "kept")).all()
    assert out["split"].isin(["train", "val"]).all()  # every doc labeled
    assert len(out) == 6


# ----------------------------------------------------------- pack_sequences


def _greedy_reference(tokens: list[int], cap: int) -> list[int]:
    bins, bin_id, fill, first = [], 0, 0, True
    for t in tokens:
        if first:
            fill, first = t, False
        elif fill + t <= cap:
            fill += t
        else:
            bin_id, fill = bin_id + 1, t
        bins.append(bin_id)
    return bins


def test_pack_sequences_matches_greedy_reference(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(200), "n_tok": [(i * 37) % 190 + 1 for i in range(200)]}
    )
    df = spark.createDataFrame(pdf)
    out = (
        pack_sequences(df, max_tokens=256, n_shards=4, tok_col="n_tok", seed=2)
        .toPandas()
        .sort_values(["shard", "doc_id"])
    )
    assert len(out) == 200
    for _, grp in out.groupby("shard"):
        toks = grp.sort_values("doc_id")["n_tok"].tolist()
        assert grp.sort_values("doc_id")["bin_id"].tolist() == _greedy_reference(
            toks, 256
        )
    # capacity respected except oversized singletons
    over = out[out["bin_fill"] > 256]
    for _, row in over.iterrows():
        same_bin = out[(out["shard"] == row["shard"]) & (out["bin_id"] == row["bin_id"])]
        assert len(same_bin) == 1 and row["n_tok"] > 256


def test_pack_sequences_property_random_shapes(spark):
    """Property sweep (hypothesis): random token lists — including
    zeros and over-capacity docs — must match the greedy reference in
    every shard, with non-decreasing bin ids in doc order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
        cap=st.integers(min_value=1, max_value=200),
    )
    def prop(toks, cap):
        pdf = pd.DataFrame({"doc_id": range(len(toks)), "n_tok": toks})
        out = (
            pack_sequences(
                spark.createDataFrame(pdf), max_tokens=cap, n_shards=3,
                tok_col="n_tok", seed=4,
            )
            .toPandas()
            .sort_values(["shard", "doc_id"])
        )
        assert len(out) == len(toks)
        for _, grp in out.groupby("shard"):
            ordered = grp.sort_values("doc_id")
            assert ordered["bin_id"].tolist() == _greedy_reference(
                ordered["n_tok"].tolist(), cap
            )
            assert ordered["bin_id"].is_monotonic_increasing

    prop()


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 999), (3, 100)], "doc_id long, n_tok long"
    )
    out = (
        pack_sequences(df, max_tokens=256, n_shards=1, tok_col="n_tok")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[2, "bin_id"] not in (out.loc[1, "bin_id"], out.loc[3, "bin_id"])


def test_pack_sequences_rejects_nonpositive_capacity(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, max_tokens=0)


def test_pack_sequences_shard_guard_fires(spark, docs):
    from pyspark.errors.exceptions.captured import PythonException

    out = pack_sequences(docs, max_tokens=256, n_shards=1, max_shard_rows=10)
    with pytest.raises(PythonException, match="max_shard_rows"):
        out.count()


# ------------------------------------------------------------- top_ngrams


def test_top_ngrams_counts_and_order(spark):
    from proxyfeatureextraction_spark.functions.text import top_ngrams

    df = spark.createDataFrame(
        [
            (1, "a b c a b"),
            (2, "a b x y"),
            (3, "z"),  # shorter than n: whole text becomes the gram
        ],
        "doc_id long, text string",
    )
    out = top_ngrams(df, n=2, k=10, min_count=1).toPandas()
    top = out.iloc[0]
    assert top["gram"] == "a b" and top["n_occ"] == 3 and top["n_docs"] == 2
    assert "z" in set(out["gram"])
    # deterministic order: count desc then gram asc
    assert list(out["n_occ"]) == sorted(out["n_occ"], reverse=True)


def test_top_ngrams_plan_is_take_ordered(spark, docs):
    """limit-after-orderBy must execute as TakeOrderedAndProject — a
    global Sort before the limit would materialize the full gram table."""
    from proxyfeatureextraction_spark.functions.text import top_ngrams

    plan = (
        top_ngrams(docs, n=2, k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ----------------------------------------------------- streaming parity


def test_curation_columns_stream_parity(spark, docs, tmp_path):
    """The stateless curation layer (split label, PII scrub, quality)
    must run unchanged on a readStream — same rows as batch. This is
    what lets ingest-time curation live in the streaming pipeline."""
    from proxyfeatureextraction_spark.functions.text import quality_score, scrub_pii
    from proxyfeatureextraction_spark.operators.curation import split_assign

    path = str(tmp_path / "cur_src")
    docs.write.mode("overwrite").parquet(path)

    def curate_cols(df):
        pii = scrub_pii("text")
        return df.select(
            "doc_id",
            split_assign({"train": 0.9, "val": 0.1}, seed=2).alias("split"),
            pii["n_emails"].alias("n_emails"),
            pii["scrubbed"].alias("scrubbed"),
            quality_score("text").alias("quality"),
        )

    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        curate_cols(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cur_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = (
        spark.table("cur_stream").toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = (
        curate_cols(spark.read.parquet(path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp) and len(got) == 300


# ----------------------------------------------------------- plan shapes


def test_hash_split_plan_is_narrow(spark, docs):
    """The split label must fuse into the scan: no Exchange anywhere —
    at 100 TB a split column that costs a shuffle is wrong."""
    plan = (
        hash_split(docs, {"train": 0.9, "test": 0.1})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_decontaminate_plan_broadcasts_eval(spark, docs):
    """The eval shingle set must reach the train scan as a broadcast
    join — never a cross join, never a full-corpus shuffle join."""
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    plan = (
        decontaminate(tr, ev, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_fuzzy_plan_broadcasts_eval(spark, docs):
    from proxyfeatureextraction_spark.operators.curation import decontaminate_fuzzy

    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    plan = (
        decontaminate_fuzzy(tr, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------ compression_ratio


def test_compression_ratio_matches_zlib_and_separates_entropy(spark):
    import zlib

    from proxyfeatureextraction_spark.functions.text import compression_ratio

    rep = "spam " * 400
    prose = "the quick brown fox jumps over the lazy dog and keeps going " * 20
    rand = " ".join(f"x{i * 2654435761 % 100003}" for i in range(300))
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, rand), (4, None), (5, "")],
        "doc_id long, text string",
    )
    out = (
        df.select("doc_id", compression_ratio("text").alias("cr"))
        .toPandas()
        .set_index("doc_id")["cr"]
    )
    for i, t in [(1, rep), (2, prose), (3, rand)]:
        exp = round(len(zlib.compress(t.encode(), 6)) / len(t.encode()), 6)
        assert out[i] == exp
    assert out[1] < out[2] < out[3]  # repetitive < prose < high-entropy
    assert out[4] == 0.0 and out[5] == 0.0


# ------------------------------------------------------------ profile_numeric


def test_profile_numeric_stats(spark):
    from proxyfeatureextraction_spark.operators.curation import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, None), (3.0, 30), (4.0, 40), (None, 50)],
        "a double, b int",
    )
    out = profile_numeric(df, ["a", "b"]).toPandas().set_index("col")
    assert out.loc["a", "n"] == 5 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 4
    assert out.loc["a", "vmin"] == 1.0 and out.loc["a", "vmax"] == 4.0
    assert out.loc["a", "p50"] == 2.5  # exact interpolation over 4 non-nulls
    assert out.loc["b", "n_null"] == 1 and out.loc["b", "mean"] == 32.5


# ------------------------------------------------------------- curate job


def test_curate_job_end_to_end(spark, tmp_path):
    """The spark-submit curation job: writes split-partitioned curated
    docs plus a pack plan, and its summary accounts for every doc."""
    import json

    from proxyfeatureextraction_spark.jobs.curate import main, parse_weights

    src = str(tmp_path / "docs_src")
    rows = [
        (i, " ".join(f"w{(i * 11 + j) % 29}" for j in range(30)) + " the a and of it",
         "en", "s0", 0)
        for i in range(120)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "curated")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([
            "--input", src, "--eval", src, "--output", out,
            "--weights", "train=0.9,val=0.1", "--pack-tokens", "128",
            "--pack-shards", "4",
        ])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert sum(summary["reasons"].values()) == 120
    written = spark.read.parquet(f"{out}/docs")
    assert written.count() == 120 and "split" in written.columns
    # eval == input → every survivor is contaminated; nothing packs
    assert summary["reasons"].get("kept", 0) == 0
    assert parse_weights("a=1,b=2") == {"a": 1.0, "b": 2.0}


# ------------------------------------------------------ review regressions


def test_curate_corpus_respects_custom_text_col(spark):
    from proxyfeatureextraction_spark.operators.curation import curate_corpus

    long_a = "the cat sat on a mat with many other friendly cats nearby today"
    train = spark.createDataFrame(
        [(1, long_a), (2, "an entirely unique document about the weather and a garden")],
        "doc_id long, content string",
    )
    eval_df = spark.createDataFrame([(9, long_a)], "doc_id long, content string")
    out = (
        curate_corpus(
            train, eval_df, weights={"train": 1.0}, min_quality=0.0,
            text_col="content", decon_n=8,
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "reason"] == "contaminated"  # eval copy detected via content col
    assert out.loc[2, "reason"] == "kept"


def test_band_signatures_rejects_bad_band_count(spark, docs):
    from proxyfeatureextraction_spark.operators.dedup import band_signatures

    for bad in (0, 5, 32):
        with pytest.raises(ValueError, match="divisor"):
            band_signatures(docs, n_perm=16, bands=bad)


def test_pack_sequences_null_token_counts_behave_like_zero(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 100)], "doc_id long, n_tok long"
    )
    out = (
        pack_sequences(df, max_tokens=150, n_shards=1, tok_col="n_tok")
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == 3 and out.loc[2, "n_tok"] == 0
    # 100 + 0 fits the first bin; the second 100 opens a new one
    assert out.loc[1, "bin_id"] == out.loc[2, "bin_id"] != out.loc[3, "bin_id"]


def test_profile_numeric_handles_quoted_column_names(spark):
    from proxyfeatureextraction_spark.operators.curation import profile_numeric

    df = spark.createDataFrame([(1.0,), (3.0,)], ["event value"])
    out = profile_numeric(df, ["event value"]).toPandas().set_index("col")
    assert out.loc["event value", "p50"] == 2.0


def test_corpus_report_approx_within_rsd_and_exact_digest_equiv(spark):
    """exact=False (HyperLogLog++) lands within a few rsd of the true
    distinct count; exact=True (digest-keyed) equals a naive
    countDistinct(text), including NULL-text handling."""
    from proxyfeatureextraction_spark.operators.curation import corpus_report
    from pyspark.sql import functions as F

    n_distinct = 500
    rows = [(i, "s", f"unique document body number {i}") for i in range(n_distinct)]
    rows += [(1000 + i, "s", "a repeated document") for i in range(50)]
    rows += [(2000, "s", None), (2001, "s", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    true_distinct = n_distinct + 1  # NULLs are ignored by countDistinct

    exact = corpus_report(df).collect()[0]
    assert exact["n_distinct"] == true_distinct
    naive = df.groupBy("source").agg(F.countDistinct("text").alias("nd")).collect()[0]
    assert exact["n_distinct"] == naive["nd"]

    rsd = 0.05
    approx = corpus_report(df, exact=False, rsd=rsd).collect()[0]
    rel_err = abs(approx["n_distinct"] - true_distinct) / true_distinct
    assert rel_err <= 4 * rsd, f"approx distinct off by {rel_err:.3f}"
    assert abs(approx["dup_rate"] - exact["dup_rate"]) <= 4 * rsd


# ----------------------------------------------------------------- mix_corpus


def test_mix_corpus_shares_and_determinism(spark):
    from proxyfeatureextraction_spark.operators.curation import mix_corpus

    rows = [(i, "a" if i < 6000 else ("b" if i < 9000 else "c"))
            for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = mix_corpus(df, {"a": 1.0, "b": 1.0}, group_col="grp", seed=2)
    pdf = out.groupBy("grp").count().toPandas().set_index("grp")["count"]
    # group 'c' has no weight: dropped entirely
    assert "c" not in pdf.index
    # b (3000 docs) has the highest target/current ratio: kept whole
    assert pdf["b"] == 3000
    # a is downsampled toward b's size (hash thresholding is exact in
    # expectation: 3000 ± sampling noise)
    assert abs(pdf["a"] - 3000) < 200
    # deterministic under repartition/reorder
    again = mix_corpus(
        df.repartition(17), {"a": 1.0, "b": 1.0}, group_col="grp", seed=2
    )
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in out.collect()}
    with pytest.raises(ValueError, match="weights"):
        mix_corpus(df, {}, group_col="grp")
    with pytest.raises(ValueError, match="weights"):
        mix_corpus(df, {"a": -1.0}, group_col="grp")


def test_mix_corpus_monotone_in_weight(spark):
    """Raising a group's weight only ADDS docs from it (hash threshold
    grows) — incremental mixture tuning never churns kept docs."""
    from proxyfeatureextraction_spark.operators.curation import mix_corpus

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    lo = {r.doc_id for r in
          mix_corpus(df, {"a": 1.0, "b": 4.0}, group_col="grp").filter("grp='a'").collect()}
    hi = {r.doc_id for r in
          mix_corpus(df, {"a": 2.0, "b": 4.0}, group_col="grp").filter("grp='a'").collect()}
    assert lo <= hi and len(hi) > len(lo)


def test_mix_then_split_hash_domains_independent(spark):
    """mix_corpus and hash_split at the SAME (default) seed must draw
    independent hashes (advisor finding, round 4): before hash-domain
    separation, a group downsampled to keep < train-fraction retained
    only low-hash docs, so its val/test splits came back empty — a
    silent statistical bias in exactly the intended composition."""
    from proxyfeatureextraction_spark.operators.curation import (
        hash_split,
        mix_corpus,
    )

    rows = [(i, "a" if i < 18000 else "b") for i in range(20000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    # 'a' is downsampled to ~2000/18000 ≈ 0.11 keep — well under the
    # 0.85 train fraction that used to swallow every kept low-hash doc
    mixed = mix_corpus(df, {"a": 1.0, "b": 1.0}, group_col="grp", seed=0)
    split = hash_split(
        mixed, {"train": 0.85, "val": 0.1, "test": 0.05}, seed=0
    )
    pdf = (
        split.filter("grp = 'a'").groupBy("split").count().toPandas()
        .set_index("split")["count"]
    )
    n = pdf.sum()
    # val and test must be populated and near their target shares
    assert pdf.get("val", 0) > 0.05 * n
    assert pdf.get("test", 0) > 0.02 * n


def test_clean_lines_rules(spark):
    from proxyfeatureextraction_spark.operators.curation import clean_lines

    docs = [
        (0, "good line with words.\nno\nthis has javascript inside\nkeep me ok."),
        (1, "lorem ipsum dolor sit amet.\nfine line here too."),
        (2, "short\nalso no"),
        (3, None),
        (4, "Ends with bang!\nends with quote\"\nno terminal punct here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in clean_lines(
            df, min_words_per_line=3, line_blocklist=("javascript",)
        ).collect()
    }
    assert got[0]["text"] == "good line with words.\nkeep me ok."
    assert got[0]["n_lines_in"] == 4 and got[0]["n_lines_kept"] == 2
    assert got[0]["keep"]
    # doc blocklist ("lorem ipsum") blocks the whole doc even though a line passes
    assert got[1]["doc_blocked"] and not got[1]["keep"]
    assert got[1]["n_lines_kept"] == 2
    # every line under min_words -> keep False via min_lines
    assert got[2]["n_lines_kept"] == 0 and not got[2]["keep"]
    assert got[3]["text"] == "" and got[3]["n_lines_in"] == 0 and not got[3]["keep"]
    # terminal punctuation mode keeps only .!?" enders
    strict = {
        r["doc_id"]: r.asDict()
        for r in clean_lines(df, require_terminal_punct=True).collect()
    }
    assert strict[4]["n_lines_kept"] == 2
    assert strict[4]["text"] == 'Ends with bang!\nends with quote"'


def test_dedup_lines_first_occurrence(spark):
    from proxyfeatureextraction_spark.operators.curation import dedup_lines

    docs = [
        (0, "alpha line\nbeta line\nalpha line"),   # in-doc repeat removed
        (1, "beta line\ngamma line"),               # beta seen in doc 0
        (2, "alpha line\nbeta line"),               # fully duplicate doc
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in dedup_lines(df).collect()}
    assert got[0]["text"] == "alpha line\nbeta line"
    assert got[0]["n_lines"] == 3 and got[0]["n_lines_kept"] == 2
    assert got[1]["text"] == "gamma line"
    assert got[2]["text"] == "" and got[2]["n_lines_kept"] == 0
    assert got[3]["text"] == "" and got[3]["n_lines"] == 0
    # survivors' line multiset == distinct lines of the corpus
    kept = [l for r in got.values() if r["text"] for l in r["text"].split("\n")]
    assert sorted(kept) == ["alpha line", "beta line", "gamma line"]


def test_dedup_lines_digest_exchange(spark):
    """First-occurrence pick must be a digest-keyed AGGREGATE (map-side
    partial, skew-immune), never a window over the line digest — at
    100 TB the hot digests are exactly the boilerplate lines with
    billions of occurrences, and a window would sort every occurrence
    on one task with no partial (round-4 verdict, What's wrong #1).
    Exchange keys must be the digest pair, never line text (the
    round-3 digest-keying rule)."""
    from proxyfeatureextraction_spark.operators.curation import dedup_lines

    df = spark.createDataFrame([(0, "a\nb")], "doc_id long, text string")
    plan = dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    import re

    assert "Window" not in plan, plan
    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert any("h1" in p and "h2" in p for p in parts), parts
    assert not any("line#" in p for p in parts), parts
    # the digest aggregate gets a partial (HashAggregate pair) so hot
    # lines collapse map-side before the exchange
    assert "partial_min" in plan or "partial_first" in plan, plan


def test_chunk_docs_windows(spark):
    from proxyfeatureextraction_spark.operators.curation import chunk_docs

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, "a b c"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = chunk_docs(df, max_words=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 10 words, windows of 4 at stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["text"] for r in c0] == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    assert [r["n_words"] for r in c0] == [4, 4, 4]
    # short doc: one (partial) chunk
    assert [r["text"] for r in by_doc[1]] == ["a b c"]
    assert by_doc[1][0]["n_words"] == 3
    # empty / null docs emit nothing
    assert 2 not in by_doc and 3 not in by_doc
    # disjoint mode (stride == max_words) reconstructs the document
    dis = sorted(
        chunk_docs(df, max_words=4, stride=4).filter("doc_id = 0").collect(),
        key=lambda r: r["chunk_id"],
    )
    assert " ".join(r["text"] for r in dis) == " ".join(words)
    assert [r["n_words"] for r in dis] == [4, 4, 2]
    with pytest.raises(ValueError):
        chunk_docs(df, max_words=0)


def test_dsir_weights_replay_and_ordering(spark):
    import math

    from proxyfeatureextraction_spark.operators.curation import dsir_weights
    from proxyfeatureextraction_spark.operators.dedup import HASH_BASE, HASH_MOD

    raw = [
        (0, "roses are red violets are blue"),
        (1, "roses are red roses are red"),
        (2, "stock market quarterly earnings report today"),
        (3, ""),
        (4, "solo"),
    ]
    tgt = [(100, "roses are red"), (101, "violets are blue roses")]
    B, A = 64, 1.0
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(tgt, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in dsir_weights(rdf, tdf, n_buckets=B, alpha=A).collect()
    }

    def phash(s):
        h = 0
        for c in s:
            h = (h * HASH_BASE + ord(c)) % HASH_MOD
        return h

    def grams(text):
        import re as _re

        toks = [w for w in _re.split(r"\s+", text or "") if w]
        out = list(toks)
        # STRICT n-grams: a 1-word doc contributes no bigrams (no
        # whole-text fallback — that would double-count short docs)
        out += [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        return out

    cr, ct = {}, {}
    for _, t in raw:
        for g in grams(t):
            cr[phash(g) % B] = cr.get(phash(g) % B, 0) + 1
    for _, t in tgt:
        for g in grams(t):
            ct[phash(g) % B] = ct.get(phash(g) % B, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    for doc_id, t in raw:
        gs = [phash(g) % B for g in grams(t)]
        want = (
            round(
                sum(math.log(ct.get(b, 0) + A) - math.log(cr.get(b, 0) + A) for b in gs)
                + len(gs) * (math.log(tr + A * B) - math.log(tt + A * B)),
                6,
            )
            if gs
            else 0.0
        )
        assert got[doc_id]["n_grams"] == len(gs), doc_id
        assert got[doc_id]["log_importance"] == pytest.approx(want, abs=1e-6), doc_id
    # docs made of target-like phrases outrank off-distribution docs
    assert got[0]["log_importance"] > got[2]["log_importance"]
    assert got[1]["log_importance"] > got[2]["log_importance"]
    # empty doc scores 0 with 0 grams
    assert got[3]["n_grams"] == 0 and got[3]["log_importance"] == 0.0
    with pytest.raises(ValueError):
        dsir_weights(rdf, tdf, n_buckets=0)


def test_round4_stateless_ops_stream_parity(spark, docs, tmp_path):
    """clean_lines and chunk_docs are per-row (HOFs + a generator), so
    they must run unchanged on a readStream — ingest-time boilerplate
    stripping and chunking without a separate batch pass."""
    from proxyfeatureextraction_spark.operators.curation import chunk_docs, clean_lines

    path = str(tmp_path / "r4_src")
    docs.write.mode("overwrite").parquet(path)

    def pipe(df):
        cleaned = clean_lines(df, min_words_per_line=2)
        return chunk_docs(cleaned, max_words=16, stride=12)

    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        pipe(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("r4_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    keys = ["doc_id", "chunk_id"]
    got = spark.table("r4_stream").toPandas().sort_values(keys).reset_index(drop=True)
    exp = pipe(spark.read.parquet(path)).toPandas().sort_values(keys).reset_index(drop=True)
    assert got.equals(exp) and len(got) > 0


def test_shuffle_shards_deterministic_dense(spark):
    from proxyfeatureextraction_spark.operators.curation import shuffle_shards

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = shuffle_shards(df, n_shards=4, seed=1).collect()
    b = shuffle_shards(df.repartition(7), n_shards=4, seed=1).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["shard_pos"]) for r in rows)
    # deterministic and stable under input re-partitioning
    assert key(a) == key(b) and len(a) == 200
    # dense 1..n positions inside every shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed is a genuinely different permutation
    c = shuffle_shards(df, n_shards=4, seed=2).collect()
    assert key(a) != key(c)
    moved = sum(
        1
        for (d1, s1, _), (d2, s2, _) in zip(
            sorted((r["doc_id"], r["shard"], 0) for r in a),
            sorted((r["doc_id"], r["shard"], 0) for r in c),
        )
        if s1 != s2
    )
    assert moved > 50  # not a rotation: most rows change shard
    with pytest.raises(ValueError):
        shuffle_shards(df, n_shards=0)


def test_curate_job_ordered_shards(spark, tmp_path):
    """--order-shards writes kept train docs in deterministic training
    order: shard-partitioned, dense shard_pos, reproducible from seed."""
    import json

    from proxyfeatureextraction_spark.jobs.curate import main

    src = str(tmp_path / "docs_src2")
    ev = str(tmp_path / "eval_src2")
    rows = [
        (i, " ".join(f"w{(i * 13 + j) % 97}" for j in range(30)) + " the a and of it",
         "en", "s0", 0)
        for i in range(100)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(900, "completely disjoint eval text with zero overlapping grams here at all",
          "en", "s0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(ev)
    out = str(tmp_path / "curated2")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([
            "--input", src, "--eval", ev, "--output", out,
            "--weights", "train=1.0", "--order-shards", "4", "--seed", "7",
        ])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["order_shards"] == 4
    ordered = spark.read.parquet(f"{out}/train_ordered")
    kept = summary["reasons"].get("kept", 0)
    assert kept > 0 and ordered.count() == kept
    pdf = ordered.select("shard", "shard_pos", "doc_id").toPandas()
    for shard, grp in pdf.groupby("shard"):
        assert sorted(grp["shard_pos"]) == list(range(1, len(grp) + 1))


def test_dsir_rejects_empty_ns(spark):
    from proxyfeatureextraction_spark.operators.curation import dsir_weights

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_weights(df, df, ns=())


def test_dsir_fast_path_matches_gram_counts(spark):
    """portable=False swaps the bucket hash (xxhash64) — scores shift
    with the bucketing but per-doc gram counts and determinism hold."""
    from proxyfeatureextraction_spark.operators.curation import dsir_weights

    raw = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i}") for i in range(20)],
        "doc_id long, text string",
    )
    tgt = raw.filter("doc_id < 5")
    slow = dsir_weights(raw, tgt, n_buckets=64).toPandas().set_index("doc_id")
    fast1 = dsir_weights(raw, tgt, n_buckets=64, portable=False).toPandas().set_index("doc_id")
    fast2 = dsir_weights(raw, tgt, n_buckets=64, portable=False).toPandas().set_index("doc_id")
    assert fast1.equals(fast2)  # deterministic
    assert (slow["n_grams"] == fast1["n_grams"]).all()
    # same-shaped signal: target members outrank the non-target tail
    assert fast1.loc[0, "log_importance"] >= fast1["log_importance"].min()


def test_mix_corpus_zero_weight_groups_defined(spark):
    """Weight 0 means 'drop this group' — a corpus whose every present
    group has weight 0 yields a well-defined empty result, not a
    0/0 → NULL keep fraction."""
    from proxyfeatureextraction_spark.operators.curation import mix_corpus

    df = spark.createDataFrame(
        [(i, "a") for i in range(10)], "doc_id long, lang string"
    )
    out = mix_corpus(df, {"a": 0.0, "b": 1.0}, group_col="lang")
    assert out.count() == 0
    # and a present zero-weight group is dropped while others survive
    df2 = spark.createDataFrame(
        [(i, "a" if i < 5 else "b") for i in range(10)], "doc_id long, lang string"
    )
    out2 = mix_corpus(df2, {"a": 0.0, "b": 1.0}, group_col="lang").collect()
    assert out2 and all(r["lang"] == "b" for r in out2)


def test_domain_temperature_matches_python_replay(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        domain_temperature,
    )

    sizes = {"web": 70, "code": 20, "books": 10}
    rows = [(g, i) for g, n in sizes.items() for i in range(n)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {r["source"]: r for r in domain_temperature(df, alpha=0.3).collect()}
    tot = sum(sizes.values())
    s = sum((n / tot) ** 0.3 for n in sizes.values())
    for g, n in sizes.items():
        p = n / tot
        w = p**0.3 / s
        assert got[g]["n_docs"] == n
        assert got[g]["p"] == pytest.approx(round(p, 6), abs=1e-9)
        assert got[g]["w"] == pytest.approx(round(w, 6), abs=1e-9)
        assert got[g]["boost"] == pytest.approx(round(w / p, 6), abs=1e-9)


def test_domain_temperature_flattens_toward_uniform(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        domain_temperature,
    )

    rows = [(g, i) for g, n in {"big": 90, "small": 10}.items() for i in range(n)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    # alpha < 1 upsamples the rare domain, damps the dominant one;
    # alpha = 1 reproduces the natural shares exactly
    w03 = {r["source"]: r for r in domain_temperature(df, alpha=0.3).collect()}
    w10 = {r["source"]: r for r in domain_temperature(df, alpha=1.0).collect()}
    assert w03["small"]["boost"] > 1.0 > w03["big"]["boost"]
    assert w03["small"]["w"] > w10["small"]["w"]
    assert w10["big"]["w"] == pytest.approx(0.9, abs=1e-9)
    assert w10["small"]["boost"] == pytest.approx(1.0, abs=1e-9)
    # weights always renormalize to 1
    assert sum(r["w"] for r in w03.values()) == pytest.approx(1.0, abs=2e-6)
    with pytest.raises(ValueError):
        domain_temperature(df, alpha=0.0)


def test_domain_temperature_single_scan_no_window(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        domain_temperature,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "source string, doc_id long"
    )
    plan = (
        domain_temperature(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowExec" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# corpus_diff / contamination_report / token_histogram (round 5b)
# ---------------------------------------------------------------------------


def test_corpus_diff_statuses(spark):
    from proxyfeatureextraction_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gone"), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new"), (5, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        # null text hashes as '' so a null→empty flap is NOT a change
        5: "unchanged",
    }


def test_corpus_diff_digest_only_exchange(spark):
    from proxyfeatureextraction_spark.operators.curation import corpus_diff

    old = spark.createDataFrame([(1, "x" * 50)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x" * 50)], "doc_id long, text string")
    plan = (
        corpus_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    )
    # the join must consume pre-hashed projections: the raw text column
    # appears only inside the sha2 scan-side Projects (and the scans
    # themselves), never in the join keys or output
    for line in plan.splitlines():
        if "text#" in line:
            assert "sha2(" in line or "LogicalRDD" in line, line
        if "Join" in line:
            assert "text#" not in line


def test_contamination_report_fractions(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        contamination_report,
    )

    # 9-word train doc → 8-grams: w1..w8, w2..w9
    train = spark.createDataFrame(
        [(1, "a b c d e f g h i")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [
            (100, "a b c d e f g h i"),   # both grams hit → frac 1.0
            (101, "Z b c d e f g h Z"),   # 2 grams, 0 hit
            (102, "short text"),          # <8 words → whole-text shingle, miss
            (103, "b c d e f g h i EXTRA"),  # grams: b..i (hit), c..EXTRA (miss)
        ],
        "doc_id long, text string",
    )
    got = {
        r["eval_id"]: r for r in contamination_report(train, ev, n=8).collect()
    }
    assert got[100]["n_grams"] == 2 and got[100]["n_hit"] == 2
    assert got[100]["frac"] == pytest.approx(1.0)
    assert got[101]["n_hit"] == 0 and got[101]["frac"] == 0.0
    assert got[102]["n_grams"] == 1 and got[102]["n_hit"] == 0
    assert got[103]["n_grams"] == 2 and got[103]["n_hit"] == 1
    assert got[103]["frac"] == pytest.approx(0.5)


def test_contamination_report_broadcasts_eval(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        contamination_report,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e f g h i")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h i")], "doc_id long, text string"
    )
    plan = (
        contamination_report(train, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_histogram_bit_length_buckets(spark):
    from proxyfeatureextraction_spark.operators.curation import token_histogram

    rows = [
        ("s", ""),             # 0 tokens  → bucket 1
        ("s", "one"),          # 1 token   → bucket 1
        ("s", "a b"),          # 2 tokens  → bucket 2
        ("s", "a b c"),        # 3 tokens  → bucket 2
        ("s", "a b c d"),      # 4 tokens  → bucket 3
        ("t", " ".join("w" for _ in range(7))),   # 7  → bucket 3
        ("t", " ".join("w" for _ in range(8))),   # 8  → bucket 4
        ("t", " ".join("w" for _ in range(15))),  # 15 → bucket 4
        ("t", " ".join("w" for _ in range(16))),  # 16 → bucket 5
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["grp"], r["bucket"]): (r["n_docs"], r["tok_sum"])
        for r in token_histogram(df).collect()
    }
    assert got[("s", 1)] == (2, 1)
    assert got[("s", 2)] == (2, 5)
    assert got[("s", 3)] == (1, 4)
    assert got[("t", 3)] == (1, 7)
    assert got[("t", 4)] == (2, 23)
    assert got[("t", 5)] == (1, 16)
    assert len(got) == 6


# ----------------------------------------------------------- split_by_cluster


def test_split_by_cluster_atomic_and_singleton_parity(spark):
    from proxyfeatureextraction_spark.operators.curation import split_by_cluster

    dup_rows = []
    for i in range(40):
        t = "dup body " + " ".join(f"w{i}x{j}" for j in range(10))
        dup_rows += [(2 * i, t), (2 * i + 1, t)]
    singles = [
        (1000 + i, "unique " + " ".join(f"u{i}y{j}" for j in range(10)))
        for i in range(60)
    ]
    df = spark.createDataFrame(dup_rows + singles, "doc_id long, text string")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_by_cluster(df, w, seed=3).toPandas()
    assert len(out) == 140
    # clusters are atoms: exactly one split label per cluster_rep
    assert (out.groupby("cluster_rep")["split"].nunique() == 1).all()
    # the duplicate pairs really clustered onto the even (min) id
    pairs = out[out.doc_id < 1000]
    for i in range(40):
        reps = pairs[pairs.doc_id.isin([2 * i, 2 * i + 1])]["cluster_rep"]
        assert set(reps) == {2 * i}
    # singleton labels coincide with hash_split at the same seed
    hs = hash_split(df, w, seed=3).select("doc_id", "split").toPandas()
    merged = out[out.doc_id >= 1000].merge(hs, on="doc_id", suffixes=("", "_hs"))
    assert (merged["split"] == merged["split_hs"]).all()


def test_split_by_cluster_precomputed_clusters(spark):
    from proxyfeatureextraction_spark.operators.curation import split_by_cluster

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    # hand-built clustering: everyone assigned to rep 0 or rep 1 by parity
    cl = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "doc_id long, cluster_rep long"
    )
    out = split_by_cluster(
        df, {"train": 0.5, "test": 0.5}, clusters=cl, seed=9
    ).toPandas()
    assert (out.groupby("cluster_rep")["split"].nunique() == 1).all()
    assert set(out["cluster_rep"]) == {0, 1}


# --------------------------------------------------- sample_stratified


def test_stratified_allocation_hamilton():
    from proxyfeatureextraction_spark.operators.curation import (
        stratified_allocation,
    )

    counts = {"a": 10, "b": 20, "c": 5, "d": 1}
    alloc = stratified_allocation(counts, 7)
    assert sum(alloc.values()) == 7
    total = sum(counts.values())
    # Hamilton quota property: floor(q) <= alloc <= ceil(q)
    for g, c in counts.items():
        q = 7 * c / total
        assert int(q) <= alloc[g] <= int(q) + 1
    # integer determinism: same dict again
    assert stratified_allocation(counts, 7) == alloc
    # n == total -> everyone whole
    assert stratified_allocation(counts, total) == counts
    import pytest as _pt

    with _pt.raises(ValueError):
        stratified_allocation(counts, total + 1)


def test_sample_stratified_draw(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        sample_stratified,
        stratified_allocation,
    )

    rows = [(i, "g%d" % (i % 3)) for i in range(90)] + [
        (1000 + i, "g3") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = sample_stratified(df, "src", 37, id_col="doc_id", seed=4).toPandas()
    counts = {"g0": 30, "g1": 30, "g2": 30, "g3": 10}
    alloc = stratified_allocation(counts, 37)
    got = out.groupby("src")["doc_id"].count().to_dict()
    assert got == {g: a for g, a in alloc.items() if a}
    # repartition invariance (hash order, not partition order)
    out2 = (
        sample_stratified(df.repartition(7), "src", 37, id_col="doc_id", seed=4)
        .toPandas()
    )
    assert sorted(out2.doc_id) == sorted(out.doc_id)
    # a different seed draws a different subset (same allocation)
    out3 = sample_stratified(df, "src", 37, id_col="doc_id", seed=5).toPandas()
    assert sorted(out3.doc_id) != sorted(out.doc_id)
    assert out3.groupby("src")["doc_id"].count().to_dict() == got


# ------------------------------------------------------ epoch_schedule


def test_epoch_schedule_multiset(spark):
    from proxyfeatureextraction_spark.operators.curation import (
        OP_EPOCH,
        epoch_bounds,
        epoch_schedule,
        op_seed,
    )
    from proxyfeatureextraction_spark.operators.dedup import (
        HASH_MOD,
        perm_params,
    )

    rows = [(i, ["a", "b", "c", "x"][i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    eps = {"a": 2.0, "b": 0.5, "c": 2.25}
    out = epoch_schedule(df, eps, default=1.0, seed=6).toPandas()

    a, b = perm_params(op_seed(6, OP_EPOCH))
    def n_rep(i, src):
        base, thr = epoch_bounds(eps.get(src, 1.0))
        return base + (1 if ((i % HASH_MOD) * a + b) % HASH_MOD < thr else 0)

    per_doc = out.groupby("doc_id")["epoch"].agg(["count", "min", "max"])
    for i, src in rows:
        want = n_rep(i, src)
        if want == 0:
            assert i not in per_doc.index
        else:
            assert per_doc.loc[i, "count"] == want
            assert per_doc.loc[i, "min"] == 0
            assert per_doc.loc[i, "max"] == want - 1
    # integral epochs repeat exactly; the fractional threshold actually
    # fires both ways somewhere in the fixture
    assert all(n_rep(i, "a") == 2 for i, _ in rows)
    reps_b = {n_rep(i, "b") for i, s in rows if s == "b"}
    reps_c = {n_rep(i, "c") for i, s in rows if s == "c"}
    assert reps_b == {0, 1} and reps_c == {2, 3}


def test_epoch_schedule_negative_raises():
    from proxyfeatureextraction_spark.operators.curation import epoch_bounds
    import pytest as _pt

    with _pt.raises(ValueError):
        epoch_bounds(-0.1)


# ---------------------------------------------------------------------------
# ngram_novelty / curriculum_order (round 5c)
# ---------------------------------------------------------------------------


def test_ngram_novelty_known_values(spark):
    """Hand-computed bigram novelty on a 4-doc corpus with planned
    overlap: earliest doc owns the gram, exact dup scores 0.0, short
    doc scores (0, 0, 0.0)."""
    from proxyfeatureextraction_spark.operators.curation import ngram_novelty

    df = spark.createDataFrame(
        [
            (0, "a b c"),        # grams {ab, bc} — both first here
            (1, "b c d"),        # {bc(old), cd(new)} -> 1/2
            (2, "a b c"),        # exact dup -> 0/2
            (3, "x"),            # < n words -> no grams
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df, n=2).collect()
    }
    assert rows[0] == (2, 2, 1.0)
    assert rows[1] == (2, 1, 0.5)
    assert rows[2] == (2, 0, 0.0)
    assert rows[3] == (0, 0, 0.0)


def test_ngram_novelty_repeated_gram_counted_once(spark):
    """Within-doc repeats collapse (array_distinct): 'a b a b' has
    3 bigram occurrences but 2 DISTINCT grams."""
    from proxyfeatureextraction_spark.operators.curation import ngram_novelty

    df = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    r = ngram_novelty(df, n=2).collect()[0]
    assert (r["n_grams"], r["n_novel"], r["novelty"]) == (2, 2, 1.0)


def test_ngram_novelty_no_gram_keyed_join(spark):
    """Scale shape: 'is this doc first?' must be answered by aggregates
    (groupBy gram digest -> min doc, then groupBy winner -> count), not
    a gram-keyed join back — at 100 TB the hot boilerplate gram would
    funnel every holding doc through one join task. The only join key
    allowed in the plan is doc_id; gram text must never ride an
    exchange."""
    from proxyfeatureextraction_spark.operators.curation import ngram_novelty

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = ngram_novelty(df)._jdf.queryExecution().executedPlan().toString()
    import re

    joins = re.findall(r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)[^\n]*", plan)
    assert joins, plan
    assert all("doc_id" in j and "h#" not in j for j in joins), joins
    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert not any("text#" in p or re.search(r"\bg#", p) for p in parts), parts


def test_ngram_novelty_matches_python_replica(spark, docs_df=None):
    """Differential: pandas/python replica over a 60-doc synthetic
    corpus with heavy overlap, portable and xxhash64 paths both."""
    from proxyfeatureextraction_spark.operators.curation import ngram_novelty

    words = ["w%d" % (i % 17) for i in range(40)]
    texts = [" ".join(words[(i * 3) % 13 : (i * 3) % 13 + 6 + i % 5]) for i in range(60)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n = 3
    seen: dict[tuple, int] = {}
    per_doc = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        grams = {tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)} if len(toks) >= n else set()
        for g in grams:
            seen.setdefault(g, i)
        per_doc[i] = grams
    for portable in (True, False):
        rows = {
            r["doc_id"]: (r["n_grams"], r["n_novel"])
            for r in ngram_novelty(df, n=n, portable=portable).collect()
        }
        for i in range(60):
            g = per_doc[i]
            nov = sum(1 for x in g if seen[x] == i)
            assert rows[i] == (len(g), nov), (portable, i, rows[i], (len(g), nov))


def _curriculum_replica(pairs, n_phases, ascending=True):
    """(id, score) -> {id: (rank, phase, phase_pos)} by definition."""
    ordered = sorted(pairs, key=lambda p: (p[1] if ascending else -p[1], p[0]))
    total = len(ordered)
    base, rem = divmod(total, n_phases)
    out = {}
    for idx, (i, _s) in enumerate(ordered, start=1):
        head = rem * (base + 1)
        if idx <= head:
            ph = (idx + base) // (base + 1)
            start = (ph - 1) * (base + 1)
        else:
            ph = rem + -(-(idx - head) // max(base, 1))
            start = head + (ph - 1 - rem) * base
        out[i] = (idx, ph, idx - start)
    return out


def test_curriculum_order_exact_rank_and_ntile(spark):
    """Exact global rank + NTILE phases vs the by-definition replica,
    with duplicate scores crossing bucket boundaries; output invariant
    to n_buckets (bucketing is an execution detail, not semantics)."""
    from proxyfeatureextraction_spark.operators.curation import curriculum_order

    pairs = [(i, float((i * 7) % 23)) for i in range(101)]  # heavy ties
    df = spark.createDataFrame(pairs, "doc_id long, s double")
    want = _curriculum_replica(pairs, 4)
    ref = None
    for nb in (2, 7, 16):
        got = {
            r["doc_id"]: (r["rank"], r["phase"], r["phase_pos"], r["order_key"])
            for r in curriculum_order(df, "s", 4, seed=3, n_buckets=nb).collect()
        }
        assert {k: v[:3] for k, v in got.items()} == want
        if ref is None:
            ref = got
        assert got == ref  # order_key included: fully invariant
    # phase sizes: first rem phases carry one extra row
    sizes = {}
    for _r, ph, _p, _k in ref.values():
        sizes[ph] = sizes.get(ph, 0) + 1
    assert sizes == {1: 26, 2: 25, 3: 25, 4: 25}


def test_curriculum_order_descending_and_errors(spark):
    from proxyfeatureextraction_spark.operators.curation import curriculum_order

    pairs = [(i, float(i)) for i in range(10)]
    df = spark.createDataFrame(pairs, "doc_id long, s double")
    got = {
        r["doc_id"]: r["rank"]
        for r in curriculum_order(df, "s", 3, ascending=False, n_buckets=3).collect()
    }
    assert got == {i: 10 - i for i in range(10)}
    with pytest.raises(ValueError):
        curriculum_order(df, "s", 0)


def test_curriculum_order_no_global_window(spark):
    """The classic global-rank trap is Window.orderBy(score) with no
    partition keys — every row through one task. The plan must only
    contain windows partitioned by the bucket column."""
    from proxyfeatureextraction_spark.operators.curation import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(50)], "doc_id long, s double"
    )
    plan = (
        curriculum_order(df, "s", 4, n_buckets=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    wins = re.findall(r"Window [^\n]*", plan)
    assert wins, plan
    # every Window node must carry a partition spec (no empty partitionBy)
    for w in wins:
        assert "_b#" in w, w


# ---------------------------------------------------------------------------
# time_split_purged / psi_drift (round 5c)
# ---------------------------------------------------------------------------


def test_time_split_purged_roles(spark):
    """3 folds over ts 0..30 (width 10), embargo 2: hand-checked roles
    for boundary, interior, and embargo-zone rows against every fold."""
    from proxyfeatureextraction_spark.operators.curation import time_split_purged

    rows = [(i, float(t)) for i, t in enumerate([0, 5, 9, 11, 19, 21, 30])]
    df = spark.createDataFrame(rows, "rid long, t double")
    got = {
        (r["fold"], r["rid"]): r["role"]
        for r in time_split_purged(df, "t", 3, embargo=2.0).collect()
    }
    assert len(got) == 21  # 7 rows x 3 folds
    # fold 0 covers [0,10): t=0,5,9 test; t=11 inside embargo (10+2) ->
    # purged; t>=12 train
    assert got[(0, 0)] == "test" and got[(0, 2)] == "test"
    assert got[(0, 3)] == "purged"
    assert got[(0, 4)] == "train" and got[(0, 6)] == "train"
    # fold 1 covers [10,20): t=9 purged (>= 10-2), t=5 train,
    # t=21 purged (< 20+2), t=30 train
    assert got[(1, 2)] == "purged" and got[(1, 1)] == "train"
    assert got[(1, 5)] == "purged" and got[(1, 6)] == "train"
    # fold 2 covers [20, 30+1): max row is test, t=19 purged (>= 20-2)
    assert got[(2, 6)] == "test" and got[(2, 4)] == "purged"
    # every row is test in exactly ONE fold (the partition property)
    from collections import Counter

    tests = Counter(rid for (f, rid), role in got.items() if role == "test")
    assert tests == Counter({i: 1 for i in range(7)})


def test_time_split_purged_zero_embargo_and_errors(spark):
    from proxyfeatureextraction_spark.operators.curation import time_split_purged

    df = spark.createDataFrame([(0, 1.0), (1, 2.0)], "rid long, t double")
    got = {
        (r["fold"], r["rid"]): r["role"]
        for r in time_split_purged(df, "t", 2, embargo=0.0).collect()
    }
    # no purged rows with zero embargo: test or train everywhere
    assert set(got.values()) == {"test", "train"}
    with pytest.raises(ValueError):
        time_split_purged(df, "t", 0)
    with pytest.raises(ValueError):
        time_split_purged(df, "t", 2, embargo=-1.0)


def test_time_split_purged_no_shuffle(spark):
    """The plan must be scan -> broadcast crossJoin -> project: no
    Exchange hashpartitioning anywhere (the fold spec broadcasts)."""
    from proxyfeatureextraction_spark.operators.curation import time_split_purged

    df = spark.createDataFrame([(0, 1.0), (1, 5.0)], "rid long, t double")
    plan = (
        time_split_purged(df, "t", 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan


def test_psi_drift_identical_and_shifted(spark):
    """PSI == 0 for identical distributions; a clear mean shift pushes
    the summed index over the 0.25 'shifted' threshold; counts land in
    the right equal-width buckets (hand-checked)."""
    from proxyfeatureextraction_spark.operators.curation import psi_drift
    import math

    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "v double"
    )
    same = psi_drift(ref, ref, "v", n_buckets=5).collect()
    assert all(r["psi"] == 0.0 for r in same)
    assert {r["bucket"]: r["n_ref"] for r in same} == {i: 20 for i in range(5)}
    # ref range is [0,9]; shifted sample sits at the top edge
    cur = spark.createDataFrame(
        [(9.0,) for _ in range(100)], "v double"
    )
    shifted = psi_drift(ref, cur, "v", n_buckets=5).collect()
    assert sum(r["psi"] for r in shifted) > 0.25
    # all current mass clamps into the LAST bucket
    by_b = {r["bucket"]: r["n_cur"] for r in shifted}
    assert by_b[4] == 100 and sum(by_b.values()) == 100
    # python replica of one bucket's psi term
    r0 = next(r for r in shifted if r["bucket"] == 0)
    p_ref, p_cur = 20 / 100, 1e-6
    want = round((p_cur - p_ref) * math.log(p_cur / p_ref), 6)
    assert r0["psi"] == want


def test_psi_drift_bounds_and_errors(spark):
    from proxyfeatureextraction_spark.operators.curation import psi_drift

    ref = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    cur = spark.createDataFrame([(5.0,), (None,)], "v double")
    rows = psi_drift(ref, cur, "v", n_buckets=2, bounds=(0.0, 4.0)).collect()
    # caller bounds pin the buckets: [0,2) and [2,4]; 5.0 clamps into
    # bucket 1; the null is excluded
    by_b = {r["bucket"]: (r["n_ref"], r["n_cur"]) for r in rows}
    assert by_b == {0: (1, 0), 1: (1, 1)}
    with pytest.raises(ValueError):
        psi_drift(ref, cur, "v", n_buckets=0)


def test_sample_stratified_null_stratum_dropped(spark):
    """NULL strata can't key a create_map or an allocation quota —
    they are dropped (mix_corpus policy), not crashed on."""
    from proxyfeatureextraction_spark.operators.curation import sample_stratified

    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, None), (3, "b"), (4, "b")],
        "doc_id long, g string",
    )
    got = sample_stratified(df, "g", 4).collect()
    assert all(r["g"] is not None for r in got)
    assert len(got) == 4  # quota filled from the non-null strata


def test_token_histogram_null_text_bucket_one(spark):
    """NULL text counts as zero tokens -> bucket 1 with tok_sum 0
    (the shared tokenizer is null-safe), matching the oracle's
    coalesce instead of emitting a NULL bucket row."""
    from proxyfeatureextraction_spark.operators.curation import token_histogram

    df = spark.createDataFrame(
        [(0, "s1", None), (1, "s1", "one two")],
        "doc_id long, source string, text string",
    )
    rows = {(r["grp"], r["bucket"]): (r["n_docs"], r["tok_sum"])
            for r in token_histogram(df).collect()}
    assert rows[("s1", 1)] == (1, 0)
    assert rows[("s1", 2)] == (1, 2)


# ---------------------------------------------------------------------------
# robust_scale / rrf_fuse (round 5c)
# ---------------------------------------------------------------------------


def test_robust_scale_values_and_nulls(spark):
    """Hand-computed median/IQR scaling: values 0..8 -> med 4, IQR 4;
    NULLs pass through; constant column divides by 1."""
    from proxyfeatureextraction_spark.operators.curation import robust_scale

    df = spark.createDataFrame(
        [(i, float(i), 7.0) for i in range(9)] + [(9, None, 7.0)],
        "rid long, v double, k double",
    )
    rows = {r["rid"]: (r["v_scaled"], r["k_scaled"])
            for r in robust_scale(df, ["v", "k"]).collect()}
    assert rows[0] == (-1.0, 0.0)   # (0-4)/4 ; (7-7)/1
    assert rows[4] == (0.0, 0.0)
    assert rows[8] == (1.0, 0.0)
    assert rows[9] == (None, 0.0)   # NULL stays NULL
    with pytest.raises(ValueError):
        robust_scale(df, [])
    with pytest.raises(ValueError):
        robust_scale(df.select("rid", df.v.cast("double").alias("n")).where("n is null"), ["n"])


def test_robust_scale_single_agg_pass(spark):
    """All columns' percentiles come from ONE aggregate (no per-column
    scans): exactly one Aggregate in the optimized stats plan and the
    output plan is a pure Project over the scan."""
    from proxyfeatureextraction_spark.operators.curation import robust_scale

    df = spark.createDataFrame([(0, 1.0, 2.0)], "rid long, a double, b double")
    plan = robust_scale(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "SortAggregate" not in plan, plan


def test_rrf_fuse_known_values_and_missing_ids(spark):
    """RRF on two 3-item rankings with a partial overlap: fused scores
    match the 1/(60+r) hand sum; ids missing from one ranking get only
    the other's contribution; top_k orders by (score desc, id)."""
    from proxyfeatureextraction_spark.operators.curation import rrf_fuse

    ra = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    rb = spark.createDataFrame([(2, 1), (1, 2), (9, 3)], "doc_id long, rank int")
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([ra, rb]).collect()}
    assert got[1] == round(1 / 61 + 1 / 62, 6)
    assert got[2] == round(1 / 62 + 1 / 61, 6)
    assert got[3] == round(1 / 63, 6)
    assert got[9] == round(1 / 63, 6)
    top = rrf_fuse([ra, rb], top_k=3).collect()
    assert [r["doc_id"] for r in top] == [1, 2, 3]  # tie 3 vs 9 -> lower id
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([ra], k0=0)


def test_rrf_fuse_no_global_sort_without_topk(spark):
    """Without top_k the plan must contain no global Sort/Exchange
    rangepartitioning (the caller orders at the sink); with top_k it
    plans TakeOrderedAndProject, never a full sort."""
    from proxyfeatureextraction_spark.operators.curation import rrf_fuse

    ra = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    plan = rrf_fuse([ra])._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan and "Sort " not in plan, plan
    plan_k = rrf_fuse([ra], top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan_k, plan_k
