"""The hot-bucket/postings cap guards must be aggregate+anti-join
shaped (map-side partial, skew-immune), never count windows — a count
window funnels the hottest bucket through one task before it can drop
it (the same hazard class as round 4's dedup_lines finding)."""

from __future__ import annotations

import pytest

from proxyfeatureextraction_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_candidates,
    winnow_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"w{i} w{i + 1} w{i + 2} common phrase shared by many docs w{i}")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize(
    "build",
    [
        lambda d: minhash_lsh_candidates(d, max_bucket=5),
        lambda d: winnow_pairs(d, max_postings=5),
        lambda d: simhash_candidates(d, max_hamming=2, max_bucket=5),
    ],
    ids=["minhash_cap", "winnow_cap", "simhash_cap"],
)
def test_cap_guard_plan_has_no_window(docs, build):
    plan = build(docs)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window " not in plan


def test_cap_semantics_unchanged(docs):
    # the anti-join form must keep exactly the rows the window form
    # kept: sub-cap postings survive, over-cap postings vanish
    uncapped = winnow_pairs(docs, max_postings=None).count()
    capped = winnow_pairs(docs, max_postings=2).count()
    assert 0 <= capped < uncapped
