"""Classification data-plane parity vs the ACTUAL reference code.

Differentially validates the engine's scan+label+merge plan
(sources.transcripts.scan_feature_csvs + plans.dataset.build_dataset)
against ``classification/data.py`` imported from the read-only
reference snapshot: filename-pattern selection (data.py:10-15, incl.
the substring quirk where feature_type 'ta' also matches
'delta_bg.csv'), bg/relay labeling, and the second-feature-set inner
merge on (folder_name, conn) with the second label dropped
(data.py:127-129). Skipped cleanly where the snapshot is absent.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference snapshot absent")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def _mk_csv(path, folder, conns, seed, extra_col):
    rng = np.random.default_rng(seed)
    pd.DataFrame(
        {
            "folder_name": folder,
            "conn": conns,
            extra_col: np.round(rng.normal(size=len(conns)), 6),
        }
    ).to_csv(path, index=False)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("clsdata")
    for split in ("train", "test", "val"):
        d = root / split
        d.mkdir()
        base = hash(split) % 1000
        # hayes family: two bg files, one relay file
        _mk_csv(d / "hayes_bg_0.csv", "f0", [f"c{i}" for i in range(4)], base + 1, "hx")
        _mk_csv(d / "hayes_bg_1.csv", "f1", [f"c{i}" for i in range(3)], base + 2, "hx")
        _mk_csv(d / "hayes_relay_0.csv", "f0", [f"c{i}" for i in range(4)], base + 3, "hx")
        # ta family (same keys so the two-feature merge is non-trivial)
        _mk_csv(d / "ta_bg_0.csv", "f0", [f"c{i}" for i in range(4)], base + 4, "tx")
        _mk_csv(d / "ta_bg_1.csv", "f1", [f"c{i}" for i in range(3)], base + 5, "tx")
        _mk_csv(d / "ta_relay_0.csv", "f0", [f"c{i}" for i in range(4)], base + 6, "tx")
        # substring quirk: 'ta' in 'delta_bg_0.csv' → selected for 'ta'
        _mk_csv(d / "delta_bg_0.csv", "f2", ["c0", "c1"], base + 7, "tx")
        # and its hayes twin so the merge finds the keys on both sides
        _mk_csv(d / "hayes_bg_2.csv", "f2", ["c0", "c1"], base + 8, "hx")
        # decoys the pattern must ignore: no bg/relay marker
        _mk_csv(d / "hayes_summary.csv", "f9", ["c9"], base + 9, "hx")
        _mk_csv(d / "ta_notes.csv", "f9", ["c9"], base + 10, "tx")
    return root


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    # (folder_name, conn) is not unique (bg+relay rows share keys, and
    # the merge fans out across them) — sort on ALL columns to compare
    # the row multisets
    return pdf[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _engine_split(spark, split_dir, feature_type, feature_type_2=None):
    from proxyfeatureextraction_spark.plans.dataset import build_dataset
    from proxyfeatureextraction_spark.sources.transcripts import scan_feature_csvs

    tables = [scan_feature_csvs(spark, str(split_dir), feature_type)]
    if feature_type_2:
        tables.append(scan_feature_csvs(spark, str(split_dir), feature_type_2))
    out = build_dataset(tables, keys=("folder_name", "conn"))
    return _norm(out.drop("source").toPandas())


def test_single_feature_parity(spark, fixture_dir):
    from classification.data import get_full_df

    for split in ("train", "test", "val"):
        theirs = _norm(get_full_df("hayes", fixture_dir / split))
        mine = _engine_split(spark, fixture_dir / split, "hayes")
        pd.testing.assert_frame_equal(
            mine, theirs, check_dtype=False, check_like=True
        )


def test_two_feature_merge_parity(spark, fixture_dir):
    from classification.data import get_feature_splits

    ref_train, ref_test, ref_val = get_feature_splits(
        "hayes", "ta", fixture_dir, use_br=False
    )
    for split, theirs in (("train", ref_train), ("test", ref_test), ("val", ref_val)):
        mine = _engine_split(spark, fixture_dir / split, "hayes", "ta")
        pd.testing.assert_frame_equal(
            mine, _norm(theirs), check_dtype=False, check_like=True
        )


def test_substring_quirk_selected(spark, fixture_dir):
    """'ta' must match 'delta_bg_0.csv' (reference substring rule)."""
    from proxyfeatureextraction_spark.sources.transcripts import scan_feature_csvs

    got = scan_feature_csvs(spark, str(fixture_dir / "train"), "ta").toPandas()
    assert "f2" in set(got["folder_name"])  # rows from delta_bg_0.csv
    assert "f9" not in set(got["folder_name"])  # decoys excluded
