"""Similarity search: brute-force exactness (vs a numpy reference) and
LSH recall floor vs brute force."""

from __future__ import annotations

import os

import numpy as np
import pytest

from proxyfeatureextraction_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata absent")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_bruteforce_matches_numpy(spark, emb):
    got = cosine_topk_bruteforce(emb, k=3).toPandas()
    pdf = emb.toPandas()
    m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 6)
    ids = pdf["vec_id"].to_numpy()
    for vid in ids[:20]:
        i = int(np.flatnonzero(ids == vid)[0])
        s = sims[i].copy()
        s[i] = -np.inf
        order = np.lexsort((ids, -s))[:3]
        mine = got[got["vec_id"] == vid].sort_values("rk")
        assert mine["neighbor"].tolist() == ids[order].tolist()
        np.testing.assert_allclose(mine["cosine"].to_numpy(), s[order], atol=1e-9)


def test_ivf_recall_floor(spark, emb):
    from proxyfeatureextraction_spark.operators.similarity import cosine_topk_ivf

    exact = cosine_topk_bruteforce(emb, k=3).toPandas()
    approx = cosine_topk_ivf(emb, k=3, n_cells=8, n_probe=2).toPandas()
    exact_pairs = set(zip(exact["vec_id"], exact["neighbor"]))
    approx_pairs = set(zip(approx["vec_id"], approx["neighbor"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 8 cells, 2-probe, 500 random vectors: partial recall, far above
    # chance (each vector sees ~2/8 of the corpus as candidates)
    assert recall > 0.5, recall
    # determinism (sampled centroids + rounded cell ranking are pinned)
    again = cosine_topk_ivf(emb, k=3, n_cells=8, n_probe=2).toPandas()
    assert set(zip(again["vec_id"], again["neighbor"])) == approx_pairs
    # cosines of found pairs are EXACT (rerank is exact within cells)
    exact_cos = {(r.vec_id, r.neighbor): r.cosine for r in exact.itertuples()}
    for r in approx.itertuples():
        if (r.vec_id, r.neighbor) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.vec_id, r.neighbor)]) < 1e-9


def test_bruteforce_guard_fails_fast(spark, emb, monkeypatch):
    """Over-bound corpora must raise BEFORE any driver collect and the
    error must route to the ANN paths (mirrors jaccard_pairs' guard)."""
    with pytest.raises(ValueError, match="cosine_topk_lsh"):
        cosine_topk_bruteforce(emb, k=3, max_rows=10).count()
    with pytest.raises(ValueError, match="cells"):
        cosine_topk_bruteforce(emb, k=3, max_rows=10**9, max_cells=100).count()
    # structural: the guard sits before the collect — poison toPandas to
    # prove an over-bound corpus NEVER reaches it (ValueError, not this)
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("over-bound corpus reached toPandas")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    with pytest.raises(ValueError, match="exceeds the exact-baseline"):
        cosine_topk_bruteforce(emb, k=3, max_rows=10)


def test_bucketed_rerank_chunking_is_invariant(spark, emb):
    """chunk_rows only splits the matmul: tiny chunks vs one big chunk
    must give byte-identical (vec_id, neighbor, cosine, rk) sets, and a
    single all-corpus bucket must equal exact brute force."""
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.operators.similarity import _bucketed_topk

    one_bucket = emb.select(
        F.col("vec_id"), F.lit(0).cast("long").alias("bucket"), F.col("embedding")
    )
    small = _bucketed_topk(one_bucket, k=3, max_bucket=None, chunk_rows=7).toPandas()
    big = _bucketed_topk(one_bucket, k=3, max_bucket=None, chunk_rows=10**6).toPandas()
    key = lambda pdf: set(  # noqa: E731
        zip(pdf["vec_id"], pdf["neighbor"], pdf["cosine"], pdf["rk"])
    )
    assert key(small) == key(big)
    exact = cosine_topk_bruteforce(emb, k=3).toPandas()
    assert key(small) == key(exact)


def test_hot_bucket_cap_drops_megabucket(spark):
    """Adversarial corpus: 200k vectors ALL hashed to one bucket. The
    max_bucket cap must drop the bucket before the grouped-map — the
    O(bucket²) rerank never runs (output is empty and the job finishes
    in seconds, not the ~3×10¹⁰-cell matrix the uncapped tail implies).
    A small healthy bucket in the same frame still reranks."""
    import pandas as pd
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.operators.similarity import _bucketed_topk

    n_mega = 200_000
    mega = spark.range(n_mega).select(
        F.col("id").alias("vec_id"),
        F.lit(0).cast("long").alias("bucket"),
        F.array(*[(F.rand(seed=i) * 2 - 1).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    healthy = spark.range(n_mega, n_mega + 50).select(
        F.col("id").alias("vec_id"),
        F.lit(1).cast("long").alias("bucket"),
        F.array(*[(F.rand(seed=100 + i) * 2 - 1).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    out = _bucketed_topk(mega.unionByName(healthy), k=3, max_bucket=50_000).toPandas()
    assert (out["vec_id"] >= n_mega).all() and len(out) == 50 * 3
    # and with a cap admitting the bucket, chunking (not O(bucket²)
    # materialization) is what runs — spot-check a 5k slice completes
    slice5k = mega.filter(F.col("vec_id") < 5_000)
    got = _bucketed_topk(slice5k, k=1, max_bucket=10_000, chunk_rows=512).count()
    assert got == 5_000


def test_ivf_auto_cell_sizing(spark, emb):
    """n_cells=None sizes cells as max(16, ceil(sqrt(n))) from one count;
    results stay deterministic with a sane recall floor."""
    from proxyfeatureextraction_spark.operators.similarity import cosine_topk_ivf

    n = emb.count()  # 500 → 23 cells
    auto = cosine_topk_ivf(emb, k=3, n_cells=None, n_probe=2).toPandas()
    again = cosine_topk_ivf(emb, k=3, n_cells=None, n_probe=2).toPandas()
    assert set(zip(auto["vec_id"], auto["neighbor"])) == set(
        zip(again["vec_id"], again["neighbor"])
    )
    exact = cosine_topk_bruteforce(emb, k=3).toPandas()
    exact_pairs = set(zip(exact["vec_id"], exact["neighbor"]))
    recall = len(set(zip(auto["vec_id"], auto["neighbor"])) & exact_pairs) / len(
        exact_pairs
    )
    # 23 cells 2-probe: sparser than the pinned 8-cell gate, so a lower
    # floor — but still far above the 2/23 chance candidate rate
    assert recall > 0.25, recall
    assert n == 500


def test_lsh_recall_floor(spark, emb):
    exact = cosine_topk_bruteforce(emb, k=3).toPandas()
    approx = cosine_topk_lsh(emb, k=3, n_planes=4, n_tables=8, seed=42).toPandas()
    exact_pairs = set(zip(exact["vec_id"], exact["neighbor"]))
    approx_pairs = set(zip(approx["vec_id"], approx["neighbor"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 4 hyperplanes → 16 buckets over 500 random vectors: recall is
    # necessarily partial but must be far above chance (~top-3/bucket)
    assert recall > 0.5, recall
    # determinism
    again = cosine_topk_lsh(emb, k=3, n_planes=4, n_tables=8, seed=42).toPandas()
    assert set(zip(again["vec_id"], again["neighbor"])) == approx_pairs


def test_quantize_embeddings_roundtrip_and_top1_agreement(spark, emb):
    """int8 quantization: |dequantized − original| ≤ scale/2 per
    element, all-zero vectors stay zero with scale 0, and brute-force
    top-1 neighbors on dequantized vectors agree with full precision
    for ≥ 90% of vectors (the storage-tier accuracy story)."""
    import numpy as np

    from proxyfeatureextraction_spark.operators.similarity import (
        quantize_embeddings,
    )

    pdf = emb.toPandas()
    q = quantize_embeddings(emb, round_digits=None or 6).toPandas().set_index("vec_id")
    full = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    deq = {}
    for vid, row in q.iterrows():
        qv = np.array(row["qvec"], dtype=np.float64)
        assert np.abs(qv).max() <= 127
        deq[vid] = qv * row["scale"]
        # roundtrip bound: half a quantization step, plus the error the
        # 6-digit-rounded scale itself contributes (≤ 127 · 5e-7)
        assert (
            np.abs(deq[vid] - full[vid]).max()
            <= row["scale"] / 2 + 127 * 5e-7 + 1e-9
        )
    ids = sorted(full)
    F_ = np.vstack([full[i] for i in ids])
    D_ = np.vstack([deq[i] for i in ids])

    def top1(M):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        np.fill_diagonal(S, -np.inf)
        return S.argmax(axis=1)

    agree = (top1(F_) == top1(D_)).mean()
    assert agree >= 0.9


def test_zero_norm_embeddings_never_produce_nan(spark):
    """Review regression: an all-zero embedding must score cosine 0
    (not NaN, which Spark's desc ordering ranks FIRST) on every path."""
    import numpy as np

    from proxyfeatureextraction_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    rows = [(i, [float((i + j) % 5) for j in range(8)]) for i in range(1, 20)]
    rows.append((0, [0.0] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for fn in (cosine_topk_bruteforce, cosine_topk_lsh, cosine_topk_ivf):
        pdf = fn(df, k=3).toPandas()
        assert not pdf["cosine"].isna().any(), fn.__name__
        zero_rows = pdf[pdf["vec_id"] == 0]
        assert (zero_rows["cosine"] <= 0.0 + 1e-9).all(), fn.__name__


def test_bruteforce_empty_input_returns_empty(spark):
    from proxyfeatureextraction_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_topk_bruteforce(empty, k=3).count() == 0


def test_semantic_dedup_keep_rule(spark):
    """SemDeDup keeps the group member LEAST similar to its centroid
    (ties to the lower id); singletons survive; eps=1.01 keeps all."""
    from proxyfeatureextraction_spark.operators.similarity import semantic_dedup

    rows = [
        # cell seeds (lowest ids become centroids)
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        # near-dup pair aligned with centroid 0: 10 exactly on it,
        # 11 slightly off -> 11 has LOWER cent_cos and must survive
        (10, [2.0, 0.0, 0.0, 0.0]),
        (11, [0.9, 0.1, 0.0, 0.0]),
        # singleton in cell 1
        (20, [0.1, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r.asDict() for r in semantic_dedup(df, eps=0.95, n_cells=2).collect()}
    assert len(got) == 5  # total assignment
    # 0 and 10 are identical directions -> same cluster, rep = 0
    assert got[10]["cluster_rep"] == 0
    assert got[11]["cluster_rep"] == 0  # transitively via 10 (cos(0,11) ~ .994)
    grp = [v for v in got.values() if v["cluster_rep"] == 0]
    keepers = [v["vec_id"] for v in grp if v["keep"]]
    least = min(grp, key=lambda v: (v["cent_cos"], v["vec_id"]))
    assert keepers == [least["vec_id"]] == [11]
    # singleton survives
    assert got[20]["keep"]
    # eps above 1.0: no pairs at all, everyone survives as own rep
    all_keep = semantic_dedup(df, eps=1.01, n_cells=2).collect()
    assert all(r["keep"] and r["cluster_rep"] == r["vec_id"] for r in all_keep)


def test_semantic_dedup_lloyd_total_assignment(spark):
    """Lloyd refinement must preserve the total-assignment contract
    and keep exact duplicates collapsed."""
    from proxyfeatureextraction_spark.operators.similarity import semantic_dedup

    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.5])
            for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, eps=0.999, n_cells=3, iterations=2).collect()
    assert len(out) == 12
    assert sorted({r["vec_id"] for r in out}) == list(range(12))
    # the three direction groups are exact dups within a cell: one survivor each
    by_rep = {}
    for r in out:
        by_rep.setdefault(r["cluster_rep"], []).append(r)
    for rep, members in by_rep.items():
        assert sum(m["keep"] for m in members) == 1


def test_semantic_dedup_rejects_bad_params(spark):
    from proxyfeatureextraction_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        semantic_dedup(df, n_cells=0)
    with pytest.raises(ValueError):
        semantic_dedup(df, iterations=-1)


def test_semantic_dedup_capped_cells_not_kept(spark):
    """Members of cells over max_cell must come back capped=True and
    keep=False — never silently 'kept' without having been compared."""
    from proxyfeatureextraction_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, float(i) * 1e-4, 0.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, eps=0.99, n_cells=1, max_cell=5).collect()
    assert len(out) == 10
    assert all(r["capped"] and not r["keep"] for r in out)
    # same input with the cap lifted: exactly one survivor, none capped
    ok = semantic_dedup(df, eps=0.99, n_cells=1, max_cell=None).collect()
    assert sum(r["keep"] for r in ok) == 1
    assert not any(r["capped"] for r in ok)


def test_semantic_dedup_capped_flag_not_a_window(spark):
    """The capped flag must come from a groupBy-count broadcast join,
    not a count window over `cell` (round-4 verdict, What's wrong #2):
    a window funnels every member of a degenerate hot cell — embeddings
    included — through one task, i.e. the guard against oversized cells
    would itself materialize the oversized cell on a single partition."""
    from proxyfeatureextraction_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, float(i) * 1e-4, 0.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        semantic_dedup(df, eps=0.99, n_cells=1, max_cell=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # no window partitioned on the cell id anywhere in the plan (the
    # only window left is the per-cluster representative rank)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert not spec.startswith("cell#"), spec
    assert "partial_count" in plan, plan


# ------------------------------------------------------------ kcenter_select


def _kcenter_replay(ids, mat, k):
    """Pure-python greedy farthest-point replay (same tie rules).

    Sums are SEQUENTIAL left folds — numpy's pairwise/SIMD summation can
    differ from Spark's F.aggregate fold by 1 ULP, which flips argmax
    ties between exactly-duplicated rows.
    """
    import math

    def fold_sum(xs):
        acc = 0.0
        for x in xs:
            acc += x
        return acc

    u = []
    for row in mat:
        nrm = math.sqrt(fold_sum(x * x for x in row))
        u.append([x / (nrm if nrm != 0.0 else 1.0) for x in row])
    n = len(ids)
    dmin = [2.0] * n
    alive = [True] * n
    picks = []
    for r in range(min(k, n)):
        # argmax(dmin, tie -> lowest id) over alive rows
        best = max(
            (i for i in range(n) if alive[i]),
            key=lambda i: (dmin[i], -ids[i]),
        )
        picks.append((r, int(ids[best]), float(dmin[best])))
        alive[best] = False
        ub = u[best]
        for i in range(n):
            d = 1.0 - fold_sum(a * b for a, b in zip(u[i], ub))
            if d < dmin[i]:
                dmin[i] = d
    return picks


def test_kcenter_select_matches_greedy_replay(spark):
    import numpy as np

    from proxyfeatureextraction_spark.operators.similarity import kcenter_select

    ids = list(range(40))
    mat = np.array(
        [[((i * 7 + j * 3) % 13) - 6.0 for j in range(8)] for i in ids]
    )
    mat[25] = mat[3]  # exact duplicate: must never be picked right after 3
    mat[30] = 0.0  # zero-norm row
    rows = [(i, [float(x) for x in mat[i]]) for i in ids]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = (
        kcenter_select(df, k=10, checkpoint_every=4)
        .orderBy("rank")
        .collect()
    )
    want = _kcenter_replay(
        np.array(ids), np.vstack([np.array(r[1], dtype=np.float32) for r in rows]).astype(np.float64), 10
    )
    assert [(g["rank"], g["id"]) for g in got] == [(r, i) for r, i, _ in want]
    for g, (_, _, d) in zip(got, want):
        assert abs(g["dmin"] - d) < 1e-9


def test_kcenter_select_k_exceeds_rows(spark):
    from proxyfeatureextraction_spark.operators.similarity import kcenter_select

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_select(df, k=10).collect()
    assert len(out) == 4  # stops when the working set is exhausted
    assert sorted(r["id"] for r in out) == [0, 1, 2, 3]


# ------------------------------------------------------- embedding_pca


def _pca_replay(mat, k, whiten=False, eps=1e-12):
    import numpy as np

    n = len(mat)
    mean = mat.sum(axis=0) / n
    cov = mat.T @ mat / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:k]
    w = evecs[:, order].T
    lam = np.maximum(evals[order], 0.0)
    for j in range(k):
        i = int(np.argmax(np.abs(w[j])))
        if w[j, i] < 0:
            w[j] = -w[j]
    proj = (mat - mean) @ w.T
    if whiten:
        proj = proj / np.sqrt(np.maximum(lam, eps))
    return proj


def test_embedding_pca_matches_numpy(spark):
    import numpy as np

    from proxyfeatureextraction_spark.operators.similarity import embedding_pca

    rng_free = np.array(
        [
            [((i * 13 + j * 7) % 23) - 11.0 + 0.5 * ((i * j) % 5) for j in range(6)]
            for i in range(80)
        ]
    )
    rows = [(i, [float(x) for x in rng_free[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = (
        embedding_pca(df, k=3)
        .orderBy("vec_id")
        .toPandas()
    )
    mat = rng_free.astype(np.float32).astype(np.float64)
    want = _pca_replay(mat, 3)
    got = np.vstack(out["pca"].to_numpy())
    assert np.allclose(got, want, atol=1e-7)
    expl = np.array(out["explained"].iloc[0])
    assert expl.shape == (3,)
    assert (np.diff(expl) <= 1e-12).all() and expl.sum() <= 1.0 + 1e-9


def test_embedding_pca_whiten_unit_variance(spark):
    import numpy as np

    from proxyfeatureextraction_spark.operators.similarity import embedding_pca

    mat = np.array(
        [[np.sin(i * 0.7 + j) * (j + 1) for j in range(5)] for i in range(200)]
    )
    rows = [(i, [float(x) for x in mat[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_pca(df, k=2, whiten=True).orderBy("vec_id").toPandas()
    got = np.vstack(out["pca"].to_numpy())
    assert np.allclose(got.var(axis=0, ddof=0), 1.0, atol=1e-6)


def test_embedding_pca_k_exceeds_dim(spark):
    import pytest as _pt

    from proxyfeatureextraction_spark.operators.similarity import embedding_pca

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pt.raises(ValueError):
        embedding_pca(df, k=3).collect()


# ------------------------------------------------------- mmr_select


def _mmr_replay(ids, mat, rel, k, lam):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    u = mat / np.where(norms == 0, 1.0, norms)
    alive = np.ones(len(ids), dtype=bool)
    smax = np.zeros(len(ids))
    out = []
    for r in range(min(k, len(ids))):
        obj = lam * rel - (1.0 - lam) * smax
        cand = np.where(alive)[0]
        best = cand[np.lexsort((ids[cand], -obj[cand]))[0]]
        out.append((r, int(ids[best]), float(obj[best])))
        sims = u @ u[best]
        smax = np.maximum(smax, sims)
        alive[best] = False
    return out


def test_mmr_select_matches_greedy_replay(spark):
    import numpy as np

    from proxyfeatureextraction_spark.operators.similarity import mmr_select

    ids = list(range(30))
    mat = np.array(
        [[((i * 5 + j * 11) % 17) - 8.0 for j in range(6)] for i in ids]
    )
    mat[12] = mat[4]  # exact duplicate: heavy redundancy penalty
    mat[20] = 0.0     # zero-norm row: similarity 0 to everything
    rel = np.array([((i * 13) % 7) / 7.0 for i in ids])
    rows = [(i, [float(x) for x in mat[i]], float(rel[i])) for i in ids]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, rel double"
    )
    got = (
        mmr_select(df, k=9, score_col="rel", lam=0.6, checkpoint_every=4)
        .orderBy("rank")
        .collect()
    )
    m32 = np.vstack([np.array(r[1], dtype=np.float32) for r in rows]).astype(np.float64)
    want = _mmr_replay(np.array(ids), m32, rel, 9, 0.6)
    assert [(g["rank"], g["id"]) for g in got] == [(r, i) for r, i, _ in want]
    for g, (_, _, m) in zip(got, want):
        assert abs(g["mmr"] - m) < 1e-9
    # the exact duplicate of an early pick must not follow it directly:
    picked = [g["id"] for g in got]
    if 4 in picked and 12 in picked:
        assert abs(picked.index(4) - picked.index(12)) > 1


def test_mmr_select_lambda_extremes_and_errors(spark):
    """λ=1 is exactly top-k by (score desc, id); λ=0 ignores relevance
    (round 0 → lowest id by the tie rule)."""
    from proxyfeatureextraction_spark.operators.similarity import mmr_select

    rows = [
        (0, [1.0, 0.0], 0.1),
        (1, [1.0, 0.0], 0.9),
        (2, [0.0, 1.0], 0.5),
        (3, [0.0, 1.0], 0.5),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, rel double"
    )
    top = [r["id"] for r in mmr_select(df, 4, "rel", lam=1.0).orderBy("rank").collect()]
    assert top == [1, 2, 3, 0]  # pure score, ties to lower id
    spread = [r["id"] for r in mmr_select(df, 2, "rel", lam=0.0).orderBy("rank").collect()]
    assert spread == [0, 2]  # id 0 first (all obj 0), then the orthogonal one
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mmr_select(df, 0, "rel")
    with _pytest.raises(ValueError):
        mmr_select(df, 2, "rel", lam=1.5)
