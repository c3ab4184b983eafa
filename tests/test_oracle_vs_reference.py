"""Differential validation: the in-repo pandas oracles vs the ACTUAL
reference implementation (imported read-only from /root/reference).

These tests exist only in the sandbox where the reference snapshot is
present; they pin the oracles to the reference's real behavior —
including the name/value misalignments — so every downstream Spark
parity test inherits that guarantee. Skipped cleanly elsewhere.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

from tests.oracle.packet_view import to_packet_view
from tests.oracle.ref_hayes import FEATURE_NAMES, hayes_by_conn
from tests.oracle.ref_host import host_by_conn
from tests.oracle.ref_rtt import rtt_by_conn
from tests.oracle.ref_slt import slt_by_conn

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference snapshot absent")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def packets(transcripts_pdf):
    return to_packet_view(transcripts_pdf)


def _join_compare(mine: pd.DataFrame, theirs: pd.DataFrame, key="conn", atol=1e-5):
    assert set(mine[key]) == set(theirs[key])
    assert list(mine.columns) == list(theirs.columns), (
        f"column mismatch: {set(mine.columns) ^ set(theirs.columns)}"
    )
    m = mine.sort_values(key).reset_index(drop=True)
    t = theirs.sort_values(key).reset_index(drop=True)
    for c in mine.columns:
        if c == key:
            continue
        np.testing.assert_allclose(
            m[c].astype(float), t[c].astype(float), atol=atol, equal_nan=True, err_msg=c
        )


def test_hayes_oracle_matches_reference(packets):
    from feature_extraction.extractors.ta_extractor import TAFeatureExtractor

    class _Hayes(TAFeatureExtractor):
        # isolate the Hayes block (skip the host merge, ta_extractor.py:57-60)
        def process_df(self, pkt_limit):
            from feature_extraction.extractors.hayes_usenix2019_features import get_features

            rows = []
            for conn, group in self.conn_df.groupby("conn", sort=False):
                lst = group.values.tolist()
                if len(lst) < pkt_limit:
                    continue
                vals = get_features(lst[:pkt_limit], conn, limit=0)
                if vals:
                    rows.append({"conn": conn, **dict(zip(self.feature_names, vals))})
            return pd.DataFrame(rows)

    theirs = _Hayes(packets).process_df(pkt_limit=20)
    mine = hayes_by_conn(packets, pkt_limit=20)
    assert list(theirs.columns) == ["conn", *FEATURE_NAMES]
    _join_compare(mine, theirs)


def test_slt_oracle_matches_reference(packets):
    from feature_extraction.extractors.slt_extractor import SLTExtractor

    theirs = SLTExtractor(packets).process_df(pkt_limit=20)
    mine = slt_by_conn(packets, pkt_limit=20)
    _join_compare(mine, theirs.reset_index(drop=True))


def test_host_oracle_matches_reference(packets):
    from feature_extraction.extractors.host_feature_helpers import extract_features_by_conn

    for gw in (True, False):
        theirs = extract_features_by_conn(packets.copy(), gw=gw)
        mine = host_by_conn(packets, gw=gw)
        _join_compare(mine, theirs)


def test_rtt_oracle_matches_reference(packets):
    from feature_extraction.extractors.thesis_extractor import ThesisExtractor

    theirs = ThesisExtractor(packets).process_df(pkt_limit=20)
    mine = rtt_by_conn(packets, pkt_limit=20)
    _join_compare(mine, theirs)
