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
