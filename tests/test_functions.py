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


def test_multimodal_real_mode_rejects_unknown_formats(spark, docs):
    """Text payloads carry no media magic: real mode must raise at the
    entropy-codec slot, not fake a decode."""
    media = media_from_documents(docs).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|entropy codec"):
        decode_and_featurize(media, decode_mode="real").collect()


def _wav_bytes(freq=440.0, rate=8000, dur=0.25, width=2):
    import io
    import wave

    n = int(rate * dur)
    x = np.sin(2 * np.pi * freq * np.arange(n) / rate)
    pcm = (x * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(pcm)
    return buf.getvalue()


def _ppm_bytes(w=4, h=3):
    # red ramp, constant green, zero blue
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[..., 1] = 128
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _bmp_bytes(w=3, h=2):
    import struct

    # solid blue 24-bit bottom-up BMP with row padding
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for _ in range(h):
        row = bytes([255, 0, 0] * w)  # BGR: blue
        px += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + bytes(px)


def test_multimodal_real_decode_wav_ppm_bmp(spark):
    """The container-feasible codecs REALLY decode: WAV signal stats and
    PPM/BMP pixel stats match independent numpy computation."""
    rows = [
        (1, "audio", _wav_bytes(), "audio/wav", None, None, 250),
        (2, "image", _ppm_bytes(), "image/x-portable-pixmap", 4, 3, None),
        (3, "image", _bmp_bytes(), "image/bmp", 3, 2, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    d = (
        decode_and_featurize(media, decode_mode="real")
        .toPandas()
        .set_index("media_id")
    )
    wav = d.loc[1, "feat"]
    assert wav[0] == 8000.0 and wav[1] == 2000.0  # rate, n_samples
    assert abs(wav[3] - np.sqrt(0.5)) < 0.01  # sine RMS ≈ 1/√2
    assert wav[4] <= 1.0 and wav[4] > 0.99  # peak ≈ 1
    # 440 Hz falls in the 250-500 band (bands start at index 8 → third
    # band is index 10); the other bands carry ~zero energy
    assert wav[10] > 0.9, wav
    assert wav[8] < 0.01 and wav[9] < 0.01 and wav[11] < 0.01
    ppm = d.loc[2, "feat"]
    assert ppm[0] == 4.0 and ppm[1] == 3.0
    assert abs(ppm[3] - np.mean([0, 85, 170, 255]) / 255) < 1e-6  # R mean
    assert abs(ppm[4] - 128 / 255) < 1e-6  # G mean
    assert ppm[5] == 0.0  # B mean
    bmp = d.loc[3, "feat"]
    assert bmp[0] == 3.0 and bmp[1] == 2.0
    assert bmp[3] == 0.0 and bmp[4] == 0.0 and abs(bmp[5] - 1.0) < 1e-6  # solid blue


def test_normalize_text_edges_and_dedup_composition(spark):
    """Edge cases (null, control chars, cased URLs/emails, digit runs),
    idempotence, and the point of it all: docs differing only in case /
    URL / whitespace normalize to the SAME text and exact-dedup
    collapses them."""
    from proxyfeatureextraction_spark.functions.text import normalize_text
    from proxyfeatureextraction_spark.operators.dedup import exact_dedup

    rows = [
        (1, "Visit https://EXAMPLE.com/Path?q=1 NOW\tplease"),
        (2, "visit   <url> now please"),          # normalized twin of 1
        (3, None),
        (4, "mail Bob@Ex.COM x7y99"),
        (5, "\x07\x1f  spaced\x00out  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id", normalize_text("text", mask_digits=True).alias("norm")
    )
    got = {r.doc_id: r.norm for r in out.collect()}
    assert got[1] == "visit <url> now please" == got[2]
    assert got[3] == ""
    assert got[4] == "mail <email> x<num>y<num>"
    assert got[5] == "spaced out"
    # idempotent: normalizing the normalized column is a no-op
    again = {
        r.doc_id: r.n2
        for r in out.select(
            "doc_id", normalize_text("norm", mask_digits=True).alias("n2")
        ).collect()
    }
    assert again == got
    # composition: dedup over the normalized column collapses 1 and 2
    groups = exact_dedup(out.select("doc_id", F.col("norm").alias("text")))
    stats = {(r.keep_id, r.copies) for r in groups.collect()}
    assert (1, 2) in stats


def test_resize_pixels_real_bilinear(spark):
    """Real pixel resize: decodes, bilinear-downsamples (checked against
    an independent numpy computation on a gradient image), re-encodes as
    P6 that round-trips through the decoder; never upscales."""
    from proxyfeatureextraction_spark.functions.multimodal import (
        _bilinear_resize,
        _decode_pnm,
        resize_pixels,
    )

    w, h = 8, 6
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    ppm = b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    small = _ppm_bytes(4, 3)  # smaller than the box: must NOT upscale
    media = spark.createDataFrame(
        [
            (1, "image", ppm, "image/x-portable-pixmap", w, h, None),
            (2, "image", small, "image/x-portable-pixmap", 4, 3, None),
            (3, "audio", _wav_bytes(), "audio/wav", None, None, 250),
        ],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = resize_pixels(media, max_w=4, max_h=4).toPandas().set_index("media_id")
    assert set(out.index) == {1, 2}  # audio rows filtered out
    r1 = out.loc[1]
    assert (r1["out_w"], r1["out_h"]) == (4, 3)  # 8x6 fit into 4x4
    got = _decode_pnm(bytes(r1["payload"]))
    exp = np.clip(
        np.round(_bilinear_resize(img.astype(np.float64) / 255.0, 4, 3) * 255), 0, 255
    ) / 255.0
    np.testing.assert_allclose(got, exp, atol=1e-9)
    r2 = out.loc[2]
    assert (r2["out_w"], r2["out_h"]) == (4, 3)  # unchanged (no upscale)
    rt = _decode_pnm(bytes(r2["payload"]))
    np.testing.assert_allclose(rt, _decode_pnm(small), atol=1 / 255 + 1e-9)


def test_audio_window_stats_real(spark):
    """Windowed WAV stats: a half-silent, half-tone clip shows ~zero RMS
    in early windows and sine RMS in late ones; window boundaries and
    ragged tail length are exact."""
    import io
    import wave

    from proxyfeatureextraction_spark.functions.multimodal import audio_window_stats

    rate = 8000
    n = rate // 2 + 120  # 0.5 s + ragged 120-sample tail
    x = np.zeros(n)
    x[rate // 4 :] = np.sin(2 * np.pi * 200 * np.arange(n - rate // 4) / rate)
    pcm = (x * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm)
    media = spark.createDataFrame(
        [(1, "audio", buf.getvalue(), "audio/wav", None, None, None),
         (2, "image", b"P6\n1 1\n255\n\x00\x00\x00", "x", 1, 1, None)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = (
        audio_window_stats(media, window_ms=100)
        .toPandas()
        .sort_values("win_idx")
        .reset_index(drop=True)
    )
    # image row filtered; 4120 samples / 800-per-window → 6 windows
    assert list(out["media_id"].unique()) == [1]
    assert len(out) == 6
    assert list(out["n_samples"]) == [800] * 5 + [120]
    assert list(out["start_ms"]) == [0, 100, 200, 300, 400, 500]
    assert out.loc[0, "rms"] < 1e-9 and out.loc[0, "zcr"] == 0.0
    # windows 3-4 are pure tone: RMS ≈ 1/√2, zcr ≈ 2·f/rate
    for i in (3, 4):
        assert abs(out.loc[i, "rms"] - np.sqrt(0.5)) < 0.01
        assert abs(out.loc[i, "zcr"] - 2 * 200 / rate) < 0.01
    # window 2 is half silent, half tone: rms ≈ sqrt(0.5 * 0.5)
    assert abs(out.loc[2, "rms"] - np.sqrt(0.25)) < 0.01


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


def test_gopher_quality_rules(spark):
    """Gopher §A1.1.1 signals: a clean prose doc passes; short, symbol-
    spam, bullet-list and null docs fail for the right reasons."""
    from proxyfeatureextraction_spark.functions.text import gopher_quality

    clean = " ".join(
        "the quick brown fox and that dog have fun with everyone to be seen of"
        .split() * 8
    )  # 15 words x 8 = 120, stopword-rich, alphabetic
    symbol = "the of and to " + "#tag " * 60
    bullets = "\n".join("- item number {}".format(i) for i in range(10))
    rows = [
        (1, clean),
        (2, "too short"),
        (3, symbol),
        (4, bullets),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = gopher_quality("text")
    got = {
        r.doc_id: r.asDict()
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in sig.items()]
        ).collect()
    }
    assert got[1]["passes_gopher"] is True
    assert got[1]["n_words"] == 120 and got[1]["stop_hits"] >= 2
    assert got[2]["passes_gopher"] is False          # < 50 words
    assert got[3]["symbol_word_ratio"] > 0.1 and not got[3]["passes_gopher"]
    assert got[4]["bullet_line_ratio"] == 1.0 and not got[4]["passes_gopher"]
    assert got[5]["n_words"] == 0 and got[5]["passes_gopher"] is False


def _rep_replay(text):
    """Naive single-doc replay of gopher_repetition's definitions."""
    t = text or ""
    words = [w for w in __import__("re").split(r"\s+", t) if w]
    nc = max(len(t), 1)

    def dup_fracs(parts):
        n = len(parts)
        seen, dchars, chars = [], 0, 0
        for p in parts:
            chars += len(p)
            if p not in seen:
                seen.append(p)
                dchars += len(p)
        return (
            round((n - len(seen)) / max(n, 1), 6),
            round((chars - dchars) / max(chars, 1), 6),
        )

    lines = [l for l in t.split("\n") if l]
    paras = [p for p in t.split("\n\n") if p.strip()]
    out = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = dup_fracs(lines)
    out["dup_para_frac"], out["dup_para_char_frac"] = dup_fracs(paras)
    for n in range(2, 11):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        if counts:
            top = max(counts.items(), key=lambda kv: (kv[1], kv[1] * len(kv[0])))
            topcov = top[1] * len(top[0])
            dupcov = sum(c * len(g) for g, c in counts.items() if c >= 2)
        else:
            topcov = dupcov = 0
        if n in (2, 3, 4):
            out[f"top_{n}gram_char_frac"] = round(min(1.0, topcov / nc), 6)
        else:
            out[f"dup_{n}gram_char_frac"] = round(min(1.0, dupcov / nc), 6)
    return out


def test_gopher_repetition_replay(spark):
    from proxyfeatureextraction_spark.functions.text import gopher_repetition

    docs = [
        (0, "the cat sat on the mat while the cat sat on the rug"),
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "line one here\nline one here\nline two here\nline one here"),
        (3, "para a words\n\npara a words\n\npara b words"),
        (4, "one two"),          # shorter than most n
        (5, "solo"),             # no 2-grams at all
        (6, ""),                 # empty
        (7, None),               # null == empty
        (8, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(df).collect()
    }
    for doc_id, text in docs:
        want = _rep_replay(text)
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-9), (
                doc_id,
                k,
                got[doc_id][k],
                v,
            )
    # spam doc: one gram dominates at every n -> fails; alphabet passes
    assert not got[1]["passes_repetition"]
    assert got[8]["passes_repetition"]
    # duplicate-line doc: 2 of 4 lines are repeats
    assert got[2]["dup_line_frac"] == pytest.approx(0.5)
    # null and empty text behave identically
    g6 = {k: v for k, v in got[6].items() if k != "doc_id"}
    g7 = {k: v for k, v in got[7].items() if k != "doc_id"}
    assert g6 == g7


def test_gopher_repetition_no_text_in_exchange(spark):
    """The n-gram aggregation exchange must carry digests, not gram
    text: the digest-keying rule from the round-3 verdict, asserted on
    the physical plan."""
    from proxyfeatureextraction_spark.functions.text import gopher_repetition

    df = spark.createDataFrame([(0, "a b c a b c")], "doc_id long, text string")
    plan = gopher_repetition(df)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "gram" not in m.group(1), m.group(0)


def test_gopher_quality_counts_words_across_lines(spark):
    """Words split on \\s+, not single spaces: line breaks must not
    glue the last word of one line to the first of the next (that
    undercounted n_words and stopword hits on multi-line prose)."""
    from proxyfeatureextraction_spark.functions.text import gopher_quality

    df = spark.createDataFrame(
        [(0, "the cat\nthe dog sat"), (1, "the cat the dog sat")],
        "doc_id long, text string",
    )
    sig = gopher_quality("text")
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[c.alias(k) for k, c in sig.items()]).collect()
    }
    assert got[0]["n_words"] == 5 == got[1]["n_words"]
    assert got[0]["stop_hits"] == got[1]["stop_hits"] == 1  # 'the'
    assert got[0]["mean_word_len"] == got[1]["mean_word_len"]


def test_collocations_pmi_replay(spark):
    from collections import Counter
    from math import log

    from proxyfeatureextraction_spark.functions.text import collocations_pmi

    texts = [
        "new york is a big city",
        "new york has a big port",
        "in new york the port is big",
        "a city has a port",
        "",  # no tokens -> no bigrams
        "single",  # one token -> no bigrams
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = collocations_pmi(df, k=10, min_count=2).toPandas()

    uni: Counter = Counter()
    bg: Counter = Counter()
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        uni.update(ws)
        bg.update(zip(ws, ws[1:]))
    tt, bb = sum(uni.values()), sum(bg.values())
    exp = sorted(
        (
            round(
                log(c) + log(tt) + log(tt) - log(bb) - log(uni[a]) - log(uni[b]),
                6,
            ),
            a,
            b,
            c,
        )
        for (a, b), c in bg.items()
        if c >= 2
    )
    exp = [(a, b, c, p) for p, a, b, c in sorted(exp, key=lambda r: (-r[0], r[1], r[2]))][:10]
    assert list(map(tuple, got[["w1", "w2", "c_xy", "pmi"]].itertuples(index=False))) == exp
    # the collocation "new york" (always adjacent) must outrank the
    # frequency-driven stopword pair ("a", "big" etc.)
    assert (got.loc[0, "w1"], got.loc[0, "w2"]) == ("new", "york")
