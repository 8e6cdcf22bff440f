"""Text analysis + multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from matomo_log_analytics_ray.ops import multimodal, textstats


def test_token_counts():
    df = pd.DataFrame({"text": ["hello world", "a,b c3 d-4", "", None]})
    out = textstats.token_count_batch(df)
    assert out["n_words"].tolist() == [2, 3, 0, 0]
    # BPE-ish: 'a' ',' 'b' 'c' '3' 'd' '-' '4' = 8
    assert out["n_tokens"].tolist() == [2, 8, 0, 0]


def test_quality_score_orders_prose_above_noise():
    prose = "the cat sat on the mat and the dog was in the garden with the children"
    noise = "@@@ ### !!! $$$ %%% ^^^ &&&"
    out = textstats.quality_batch(pd.DataFrame({"text": [prose, noise]}))
    assert out["quality_score"].iloc[0] > out["quality_score"].iloc[1]
    assert out["punct_ratio"].iloc[1] > 0.5
    assert out["stopword_ratio"].iloc[0] > 0.3


def test_langid_heuristic():
    df = pd.DataFrame(
        {
            "text": [
                "the house is near the river and the trees",
                "el perro y el gato en la casa de los abuelos",
                "o menino e a menina do bairro em um parque",
                "zzzz qqqq xxxx",
            ]
        }
    )
    out = textstats.langid_batch(df)
    assert out["lang_pred"].tolist() == ["en", "es", "pt", "und"]


def test_fingerprint_order_sensitive_case_insensitive():
    df = pd.DataFrame(
        {
            "text": [
                "alpha beta gamma",
                "Alpha   BETA gamma",  # same words modulo case/space
                "gamma beta alpha",    # same words, different order
            ]
        }
    )
    out = textstats.fingerprint_batch(df)
    fp = out["fingerprint"].tolist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_media_feature_extraction_pipeline():
    tbl = multimodal.generate_fake_media(64)
    ds = ray.data.from_arrow(tbl)
    out = multimodal.extract_features(ds, batch_size=16, concurrency=2).to_pandas()
    assert len(out) == 64
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (64, multimodal.FEATURE_DIM)
    # features are normalized histograms
    assert np.allclose(feats.sum(axis=1), 1.0, atol=1e-5)
    assert (out["payload_bytes"] > 0).all()
    # deterministic across runs
    out2 = multimodal.extract_features(ds, batch_size=16, concurrency=2).to_pandas()
    assert np.allclose(feats, np.stack(out2.sort_values("media_id")["features"].to_numpy()))


def test_media_strict_mode_raises():
    # strict raises only for types with NO built-in codec (compressed
    # images need PIL, absent here); bmp/wav rows decode for real
    df = pd.DataFrame(
        {
            "media_id": [0],
            "media_type": ["image/png"],
            "payload": [b"\x89PNG not really"],
        }
    )
    ex = multimodal.MediaFeatureExtractor(strict=True)
    with pytest.raises(NotImplementedError):
        ex(df)


def test_media_builtin_codec_roundtrip():
    """BMP and WAV encode->decode round-trips exactly (pure-python
    codecs, no optional dependency)."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    w, h, back = multimodal.decode_bmp(multimodal.encode_bmp(rgb))
    assert (w, h) == (21, 13)
    assert np.array_equal(back, rgb)

    samples = rng.integers(-30000, 30000, size=4321).astype(np.int16)
    rate, back_s = multimodal.decode_wav(
        multimodal.encode_wav_pcm16(samples, 22050)
    )
    assert rate == 22050
    assert np.array_equal(back_s, samples)


def test_media_strict_real_decode_passes_for_builtin_types():
    """The fixture's bmp/wav payloads are REAL: strict feature
    extraction succeeds and decoded dims equal the metadata."""
    tbl = multimodal.generate_fake_media(64, seed=11)
    df = tbl.to_pandas()
    sub = df[df["media_type"].isin(["image/bmp", "audio/wav"])]
    assert len(sub) > 0
    ex = multimodal.MediaFeatureExtractor(strict=True)
    out = ex(sub)
    assert len(out) == len(sub)
    feats = np.stack(out["features"].to_numpy())
    assert np.allclose(feats.sum(axis=1), 1.0, atol=1e-5)
    for r in sub.itertuples():
        if r.media_type == "image/bmp":
            w, h, _ = multimodal.decode_bmp(r.payload)
            assert (w, h) == (r.width, r.height)
        else:
            rate, samples = multimodal.decode_wav(r.payload)
            assert rate == r.sample_rate
            assert len(samples) == round(float(r.duration_s) * rate)


def test_media_resize_and_frame_sampling():
    import math

    import numpy as np
    import ray.data

    from matomo_log_analytics_ray.ops import multimodal

    tbl = multimodal.generate_fake_media(128, seed=5)
    ds = ray.data.from_arrow(tbl)

    resized = multimodal.resize_images(ds, 64, 64, concurrency=(1, 2)).to_pandas()
    img = resized[resized["media_type"].str.startswith("image/")]
    assert (img["width"] == 64).all() and (img["height"] == 64).all()
    # bmp rows took the REAL built-in resize (decode->resample->encode);
    # png/jpeg rows took the deterministic fake path
    bmp = img[img["media_type"] == "image/bmp"]
    assert len(bmp) > 0
    for raw in bmp["payload"]:
        w, h, _ = multimodal.decode_bmp(raw)
        assert (w, h) == (64, 64)
    fake = img[img["media_type"] != "image/bmp"]
    assert fake["payload"].map(len).eq(64 * 64 // 64).all()
    vid = resized[resized["media_type"] == "video/mp4"]
    src = tbl.to_pandas().set_index("media_id")
    for r in vid.itertuples():  # non-image rows untouched
        assert r.payload == src.loc[r.media_id, "payload"]

    frames = multimodal.sample_frames(ds, fps=2.0, max_frames=16, concurrency=(1, 2)).to_pandas()
    assert set(frames["media_id"]) == set(src[src["media_type"] == "video/mp4"].index)
    for mid, g in frames.groupby("media_id"):
        want = min(16, max(1, math.ceil(src.loc[mid, "duration_s"] * 2.0)))
        assert len(g) == want
        assert sorted(g["frame_idx"]) == list(range(want))
        assert np.allclose(np.sort(g["frame_ts_s"]), np.arange(want) / 2.0)


def test_media_resize_strict_raises():
    import pytest
    import ray.data

    from matomo_log_analytics_ray.ops import multimodal

    # a compressed image with no PIL must raise in strict mode; bmp
    # rows would succeed (built-in codec), so pin the type explicitly
    df = pd.DataFrame(
        {
            "media_id": pd.Series([0], dtype="int64"),
            "media_type": ["image/jpeg"],
            "payload": [b"\xff\xd8 not a real jpeg"],
            "width": pd.Series([32], dtype="int32"),
            "height": pd.Series([32], dtype="int32"),
        }
    )
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception):
        multimodal.resize_images(ds, 32, 32, strict=True).to_pandas()


def test_repetition_signals():
    """Dup-n-gram repetition fractions: hand-computed values on tiny
    docs, zero on empty/one-word docs, high on degenerate repeats."""
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b a b a b",          # 2 distinct words of 6; 'a b' bigram x3 of 5
                "one two three four",   # all distinct, all bigrams unique
                "",                      # no words
                "word",                  # one word, no bigrams
            ],
        }
    )
    out = textstats.repetition_batch(df)
    r0 = out.iloc[0]
    assert abs(r0.dup_word_frac - (1 - 2 / 6)) < 1e-6
    assert abs(r0.top_bigram_frac - 3 / 5) < 1e-6
    assert abs(r0.dup_bigram_frac - 1.0) < 1e-6  # 'a b' x3 + 'b a' x2 all dup
    r1 = out.iloc[1]
    assert r1.dup_word_frac == 0 and abs(r1.top_bigram_frac - 1 / 3) < 1e-6
    assert r1.dup_bigram_frac == 0
    assert (out.iloc[2][["dup_word_frac", "top_bigram_frac", "dup_bigram_frac"]] == 0).all()
    assert (out.iloc[3][["top_bigram_frac", "dup_bigram_frac"]] == 0).all()


def test_tfidf_top_terms_paths_agree():
    """Broadcast and join paths produce the identical ranked terms;
    ranking is (tfidf desc, word asc) on 6dp-rounded scores."""
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "apple banana apple",
                "banana cherry cherry cherry",
                "apple unique",
                "",
                "common common common",
                "common banana",
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    outs = []
    for limit in (5_000_000, 0):
        out = (
            textstats.tfidf_top_terms(ds, k=2, broadcast_limit=limit)
            .to_pandas()
            .sort_values(["doc_id", "tfidf", "word"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # doc 2: 'unique' (df=1) must outrank 'apple' (df=2)
    d2 = got[got.doc_id == 2]["word"].tolist()
    assert d2[0] == "unique" and "apple" in d2
    # empty doc contributes no rows
    assert (got.doc_id != 3).all()
    # doc 0: apple tf=2 beats banana tf=1 (same-ish df)
    d0 = got[got.doc_id == 0]["word"].tolist()
    assert d0[0] == "apple"


def test_text_clean_redaction_chain():
    from matomo_log_analytics_ray.ops import textclean

    df = pd.DataFrame(
        {
            "text": [
                "Contact Bob@Example.COM or visit https://x.io/a?b=1 now",
                "  lots\tof\n whitespace  and 12345 numbers 6789 ",
                None,
                "clean already",
            ]
        }
    )
    out = textclean.clean_batch(df)
    assert out["clean_text"].iloc[0] == "contact <email> or visit <url> now"
    assert out["n_redactions"].iloc[0] == 2
    assert out["clean_text"].iloc[1] == "lots of whitespace and <num> numbers <num>"
    assert out["n_redactions"].iloc[1] == 2
    assert out["clean_text"].iloc[2] == "" and out["n_redactions"].iloc[2] == 0
    assert out["clean_text"].iloc[3] == "clean already"


def test_decontaminate_planted_overlap():
    from matomo_log_analytics_ray.ops import decontam

    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [100], "text": ["the quick brown fox jumps"]})
    )
    train = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a sentence with the quick brown fox inside it",  # 2 shared 3-grams
                    "completely different words here",
                    "quick brown fox jumps again",  # 'quick brown fox','brown fox jumps'
                    "",  # empty
                ],
            }
        )
    ).repartition(2)
    out = decontam.decontaminate(train, bench).to_pandas().sort_values("doc_id")
    assert out["n_overlap"].tolist() == [2, 0, 2, 0]
    assert out["contaminated"].tolist() == [True, False, True, False]


def test_decontaminate_empty_benchmark():
    from matomo_log_analytics_ray.ops import decontam

    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "text": pd.Series([], dtype=object)})
    )
    train = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["anything"]}))
    out = decontam.decontaminate(train, bench).to_pandas()
    assert out["n_overlap"].tolist() == [0] and not out["contaminated"].iloc[0]


def test_truncate_batch():
    from matomo_log_analytics_ray.ops import textclean

    df = pd.DataFrame({"text": ["a b c d e", "one  two", None, ""]})
    out = textclean.truncate_batch(df, max_words=3)
    assert out["truncated_text"].tolist() == ["a b c", "one two", "", ""]
    assert out["n_words_kept"].tolist() == [3, 2, 0, 0]
    assert out["was_truncated"].tolist() == [True, False, False, False]


def test_media_codec_adapter_uses_pil_when_importable(monkeypatch):
    """The optional-dependency adapter: when _load_pil resolves, the
    real decode branch runs (strict=True no longer raises for images)
    and features come from the decoded thumbnail."""
    import numpy as np

    from matomo_log_analytics_ray.ops import multimodal

    class FakeImage:
        def __init__(self, val):
            self.val = val

        def convert(self, mode):
            return self

        def resize(self, wh):
            self.wh = wh
            return self

        def __array__(self, dtype=None, copy=None):
            return np.full((self.wh[1], self.wh[0]), self.val, dtype=np.float32)

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImage(float(buf.getvalue()[0]))

    monkeypatch.setattr(multimodal, "_load_pil", lambda: FakePIL)
    ex = multimodal.MediaFeatureExtractor(strict=True)
    batch = pd.DataFrame(
        {
            "media_id": [1, 2],
            "media_type": ["image/png", "image/png"],
            "payload": [bytes([255, 9, 9]), bytes([0, 7])],
        }
    )
    out = ex(batch)
    feats = np.stack(out["features"].to_numpy())
    assert np.allclose(feats[0], 1.0)  # first byte 255 -> all-ones gray
    assert np.allclose(feats[1], 0.0)
    # types with no codec at all still raise under strict
    video = pd.DataFrame(
        {"media_id": [3], "media_type": ["video/mp4"], "payload": [b"abc"]}
    )
    with pytest.raises(NotImplementedError):
        ex(video)
    # and the built-in wav decoder rejects garbage bytes loudly
    audio = pd.DataFrame(
        {"media_id": [4], "media_type": ["audio/wav"], "payload": [b"abc"]}
    )
    with pytest.raises(Exception):
        ex(audio)


def test_media_resize_adapter_uses_pil_when_importable(monkeypatch):
    from matomo_log_analytics_ray.ops import multimodal

    class FakeImage:
        format = "PNG"

        def resize(self, wh):
            self.wh = wh
            return self

        def save(self, buf, format=None):
            buf.write(b"resized-%dx%d" % self.wh)

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImage()

    monkeypatch.setattr(multimodal, "_load_pil", lambda: FakePIL)
    rz = multimodal.MediaResizer(32, 16, strict=True)
    batch = pd.DataFrame(
        {
            "media_id": [1],
            "media_type": ["image/jpeg"],
            "payload": [b"xyz"],
            "width": [100],
            "height": [50],
        }
    )
    out = rz(batch)
    assert out["payload"].iloc[0] == b"resized-32x16"
    assert out["width"].iloc[0] == 32 and out["height"].iloc[0] == 16


def test_quality_langid_fused_equals_chained():
    """quality_langid_batch is a pure fusion: byte-identical output to
    quality_batch -> langid_batch on well-formed, hostile, and empty
    inputs (the prepare pipeline's enrich stage relies on this)."""
    import numpy as np

    rng = np.random.default_rng(9)
    vocab = ["the", "el", "de", "zqx", "and", "que", "para", "bbb"]
    rows = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(200)
    ]
    hostile = [None, "", "   ", "\t\n", "a!b.c?d", "THE QUICK", "123 456"]
    for df in (
        pd.DataFrame({"doc_id": range(len(rows)), "text": rows}),
        pd.DataFrame({"doc_id": range(len(hostile)), "text": hostile}),
        pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "text": pd.Series([], dtype=object)}
        ),
    ):
        chained = textstats.langid_batch(textstats.quality_batch(df))
        fused = textstats.quality_langid_batch(df)
        pd.testing.assert_frame_equal(
            fused.reset_index(drop=True),
            chained.reset_index(drop=True),
        )
