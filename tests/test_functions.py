"""Text-function and multimodal-plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_and_featurize,
    frame_sample_plan,
    media_from_documents,
)
from proxyfeatureextraction_spark.functions.text import with_text_features

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    import os

    if not os.path.isdir(SF):
        pytest.skip("testdata absent")
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_text_features(spark, docs):
    out = with_text_features(docs).toPandas()
    assert (out["n_tokens"] > 0).all()
    assert (out["n_bpe_tokens"] >= out["n_tokens"]).all()  # regex splits at least as fine
    assert out["avg_token_len"].between(1, 20).all()
    assert out["stopword_ratio"].between(0, 1).all()
    assert out["quality_score"].between(0, 1).all()
    assert set(out["lang_guess"]) <= {"en", "es", "fr", "de"}
    # fingerprint deterministic + content-sensitive
    again = with_text_features(docs).toPandas()
    assert out.sort_values("doc_id")["fingerprint"].tolist() == again.sort_values("doc_id")[
        "fingerprint"
    ].tolist()
    assert out["fingerprint"].nunique() > len(out) * 0.9


def test_multimodal_plumbing(spark, docs):
    media = media_from_documents(docs)
    decoded = decode_and_featurize(media).toPandas()
    assert len(decoded) == docs.count()
    assert decoded["feat"].map(len).eq(FEATURE_DIM).all()
    # deterministic
    again = decode_and_featurize(media).toPandas().sort_values("media_id")
    d = decoded.sort_values("media_id")
    assert d["payload_sha1"].tolist() == again["payload_sha1"].tolist()
    np.testing.assert_allclose(
        np.vstack(d["feat"].to_numpy()), np.vstack(again["feat"].to_numpy())
    )
    # payload byte counts match text lengths (ascii corpus)
    n_chars = docs.select("doc_id", F.length("text").alias("n")).toPandas().set_index("doc_id")
    got = d.set_index("media_id")["payload_bytes"]
    assert (got.sort_index() == n_chars["n"].sort_index()).all()


def test_multimodal_real_mode_stubbed(spark, docs):
    media = media_from_documents(docs).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|real codecs"):
        decode_and_featurize(media, decode_mode="real").collect()


def test_resize_plan_geometry(spark, docs):
    from proxyfeatureextraction_spark.functions.multimodal import resize_plan

    media = media_from_documents(docs)
    out = resize_plan(media, max_w=256, max_h=256).toPandas()
    assert len(out) > 0
    # fits the box, never upscales, never degenerates
    assert (out["out_w"] <= 256).all() and (out["out_h"] <= 256).all()
    assert (out["out_w"] >= 1).all() and (out["out_h"] >= 1).all()
    assert (out["scale"] <= 1.0).all()
    big = out[(out["width"] > 256) | (out["height"] > 256)]
    small = out[(out["width"] <= 256) & (out["height"] <= 256) & (out["width"] >= 1)]
    # downscaled images touch the box on their long edge (floor slack 1px)
    assert ((big["out_w"] >= 255) | (big["out_h"] >= 255)).all()
    # already-fitting images pass through unchanged
    assert (small["out_w"] == small["width"].clip(lower=1)).all()


def test_frame_sampling(spark, docs):
    media = media_from_documents(docs)
    frames = frame_sample_plan(media, every_ms=5000).toPandas()
    vids = media.filter("kind = 'video'").toPandas()
    assert set(frames["media_id"]) == set(vids["media_id"])
    per = frames.groupby("media_id")["frame_ms"].agg(["min", "max", "count"])
    assert (per["min"] == 0).all()
