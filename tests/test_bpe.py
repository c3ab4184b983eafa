"""Real BPE token counting: trainer determinism, differential parity
between the greedy lowest-rank encoder and an independently-coded
apply-in-training-order reference (the two classic, provably
equivalent formulations), and the Spark surface."""

from __future__ import annotations

import pytest

from proxyfeatureextraction_spark.functions.bpe import (
    PRETOKEN_RE,
    _byte_symbols,
    bpe_token_count,
    bpe_tokens,
    count_text,
    encode_pretoken,
    load_merges_txt,
    save_merges_txt,
    train_bpe_merges,
)

CORPUS = [
    "the lower river flows lower and lower toward the lowest delta",
    "newest widest lowest the newest of the new tests",
    "distributed query engines shuffle the least data when partitioned",
    "the the the lower newest lowest engines engines",
    "numbers 12345 and 987 mix with, punctuation! and   spaces",
]


def _reference_encode(pretoken: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sennrich-style reference: apply each merge over the symbol list
    IN TRAINING ORDER (not lowest-rank-first like the engine's greedy
    loop) — an independent formulation that must produce identical
    segmentations."""
    syms = list(_byte_symbols(pretoken))
    for a, b in merges:
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


def test_trainer_deterministic_and_effective():
    m1 = train_bpe_merges(CORPUS, 60)
    m2 = train_bpe_merges(list(CORPUS), 60)
    assert m1 == m2 and len(m1) > 10
    ranks = {p: i for i, p in enumerate(m1)}
    # more merges => fewer tokens, floor at the pre-token count
    n_none = sum(len(PRETOKEN_RE.findall(t)) for t in CORPUS)
    n_raw = sum(count_text(t, {}) for t in CORPUS)
    n_bpe = sum(count_text(t, ranks) for t in CORPUS)
    assert n_none < n_bpe < n_raw


def test_greedy_matches_in_order_reference():
    merges = train_bpe_merges(CORPUS, 80)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in CORPUS + ["unseen wording exercises fallback splits 2024!"]:
        for pt in PRETOKEN_RE.findall(t):
            got = list(encode_pretoken(_byte_symbols(pt), ranks))
            assert got == _reference_encode(pt, merges), pt


def test_count_empty_null_and_additivity():
    merges = train_bpe_merges(CORPUS, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    assert count_text(None, ranks) == 0
    assert count_text("", ranks) == 0
    t = CORPUS[0]
    per_pt = sum(
        len(encode_pretoken(_byte_symbols(pt), ranks))
        for pt in PRETOKEN_RE.findall(t)
    )
    assert count_text(t, ranks) == per_pt


def test_merges_txt_roundtrip(tmp_path):
    merges = train_bpe_merges(CORPUS, 30)
    p = str(tmp_path / "merges.txt")
    save_merges_txt(merges, p)
    assert load_merges_txt(p) == merges


def test_merges_txt_rejects_malformed(tmp_path):
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("a b c\n")
    with pytest.raises(ValueError, match="malformed"):
        load_merges_txt(p)


def test_spark_count_matches_driver(spark):
    merges = train_bpe_merges(CORPUS, 60)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = [(i, t) for i, t in enumerate(CORPUS)] + [(97, None), (98, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe"]
        for r in bpe_token_count(df, merges).collect()
    }
    for i, t in rows:
        assert got[i] == count_text(t, ranks), i
    # token strings agree with the count
    toks = {
        r["doc_id"]: r["bpe_tokens"] for r in bpe_tokens(df, merges).collect()
    }
    assert all(len(toks[i]) == got[i] for i, _ in rows)


def test_pack_sequences_with_bpe_budget(spark):
    from proxyfeatureextraction_spark.operators.curation import pack_sequences

    merges = train_bpe_merges(CORPUS, 60)
    rows = [(i, CORPUS[i % len(CORPUS)]) for i in range(40)]
    df = bpe_token_count(
        spark.createDataFrame(rows, "doc_id long, text string"), merges
    )
    packed = pack_sequences(df, max_tokens=64, n_shards=4, tok_col="n_bpe")
    pdf = packed.toPandas()
    assert (pdf["bin_fill"] <= 64).all()
    assert (pdf.groupby(["shard", "bin_id"])["n_tok"].sum() <= 64).all()
    assert len(pdf) == 40


def test_distributed_trainer_matches_driver(spark):
    """The Spark trainer (Arrow Counter pre-agg -> vocab groupBy ->
    driver merge loop) must be bit-identical to the in-memory trainer
    on the same corpus — the merge loop is shared, so this pins the
    distributed word-frequency stage."""
    from proxyfeatureextraction_spark.functions.bpe import (
        bpe_train,
        train_bpe_merges_distributed,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    ).repartition(4)
    ref = train_bpe_merges(CORPUS, 60)
    got = train_bpe_merges_distributed(df, 60)
    assert got == ref
    tbl = bpe_train(df, 60)
    assert [tuple(r) for r in tbl.orderBy("rank").select("left", "right").collect()] == ref


def test_distributed_trainer_guards_and_pruning(spark):
    from proxyfeatureextraction_spark.functions.bpe import (
        corpus_word_freq,
        train_bpe_merges_distributed,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_words"):
        train_bpe_merges_distributed(df, 10, max_words=3)
    # min_freq prunes the tail: strictly fewer surviving pre-tokens
    all_rows = corpus_word_freq(df).count()
    pruned = corpus_word_freq(df, min_freq=3).count()
    assert 0 < pruned < all_rows
