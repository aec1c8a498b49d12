"""Multimodal binary-column plumbing: Arrow-batched feature kernel,
sha256 invariant, stubbed decode."""

from __future__ import annotations

import hashlib

import pytest

from linkgraph import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "hello world", "en", "s0", 11),
            (1, "größer blob ü", "de", "s1", 13),  # multibyte utf-8
            (2, "", "en", "s2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_blob_features_sha_and_bytes(spark, docs):
    rows = {r["doc_id"]: r for r in mm.blob_features(docs).collect()}
    assert rows[0]["content_sha"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows[0]["n_bytes"] == 11
    # multibyte: n_bytes > n_chars
    assert rows[1]["n_bytes"] == len("größer blob ü".encode())
    assert rows[2]["n_bytes"] == 0
    assert len(rows[0]["feature"]) == mm.FEATURE_DIM
    # deterministic feature
    again = {r["doc_id"]: r["feature"] for r in mm.blob_features(docs).collect()}
    assert again[0] == rows[0]["feature"]


def test_decode_is_stubbed():
    if mm.HAVE_PIL:
        pytest.skip("PIL present; stub not active")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n")


def test_meta_struct(spark, docs):
    row = mm.attach_blob(docs).where("doc_id = 1").collect()[0]
    assert row["meta"]["lang"] == "de"
    assert row["meta"]["n_chars"] == 13
    assert isinstance(row["blob"], (bytes, bytearray))


def test_ppm_decode_roundtrip():
    import numpy as np
    from linkgraph.multimodal import decode_image, make_ppm

    payload = make_ppm(7, 5, seed=3)
    img = decode_image(payload)
    assert img.shape == (5, 7, 3)
    # roundtrip: re-encoding the array gives the same payload
    assert make_ppm(7, 5, seed=3)[-img.size:] == img.tobytes()


def test_bmp_decode():
    import numpy as np
    from linkgraph.multimodal import decode_image

    # hand-built 2x2 24-bit BMP, bottom-up rows padded to 4 bytes
    w, h = 2, 2
    row = (w * 3 + 3) & ~3
    pix = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)  # RGB truth
    bgr = pix[..., ::-1]
    body = b"".join(bgr[r].tobytes() + b"\x00" * (row - w * 3) for r in (1, 0))
    header = (
        b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00" * 24
    )
    img = decode_image(header + body)
    assert (img == pix).all()


def test_ppm_decode_maxval_digits_in_dims():
    # width 255 makes the maxval token '255' appear earlier in the
    # header — a token-search offset parse decodes shifted pixels
    from linkgraph.multimodal import decode_image, make_ppm

    payload = make_ppm(255, 2, seed=1)
    img = decode_image(payload)
    assert img.shape == (2, 255, 3)
    assert payload[-img.size:] == img.tobytes()


def test_feature_kernel_trailing_empty_blob(spark):
    # trailing empty payloads must not truncate the previous
    # document's histogram segment (reduceat end-clipping)
    import numpy as np

    blob = bytes(range(16))
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"")), (2, bytearray(b"")),
         (3, bytearray(bytes(range(8, 31))))],
        "doc_id long, blob binary",
    )
    out = df.mapInPandas(
        mm._feature_kernel,
        schema="doc_id long, n_bytes long, content_sha string, feature array<double>",
    )
    rows = {r["doc_id"]: r["feature"] for r in out.collect()}
    exp0 = np.frombuffer(blob, dtype=np.uint8).reshape(-1, 8).sum(axis=0)
    assert rows[0] == exp0.astype(float).tolist()
    assert rows[1] == [0.0] * mm.FEATURE_DIM
    assert rows[2] == [0.0] * mm.FEATURE_DIM
    padded3 = np.zeros(24, dtype=np.uint8)
    padded3[:23] = np.frombuffer(bytes(range(8, 31)), dtype=np.uint8)
    exp3 = padded3.reshape(-1, 8).sum(axis=0)
    assert rows[3] == exp3.astype(float).tolist()


def test_image_stats_through_spark(spark):
    import numpy as np
    from linkgraph.multimodal import image_stats, make_ppm, decode_image

    rows = [(i, bytearray(make_ppm(4 + i, 3, seed=i))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    for i in range(5):
        img = decode_image(make_ppm(4 + i, 3, seed=i))
        assert got[i]["width"] == 4 + i and got[i]["height"] == 3
        assert np.allclose(got[i]["mean_rgb"], img.reshape(-1, 3).mean(axis=0))


def test_graph_save_load_roundtrip(spark, tmp_path):
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    e = spark.createDataFrame([(1, 2, 0.5), (2, 3, 1.5)], "src long, dst long, w double")
    g = Graph.from_edges(e, directed=False, weight_col="w")
    p = str(tmp_path / "gsave")
    g.save(p)
    g2 = Graph.load(spark, p)
    assert g2.directed is False and g2.weight_col == "w"
    assert sorted(map(tuple, g2.edges.collect())) == sorted(map(tuple, e.collect()))


def test_resize_images_nearest_neighbor(spark):
    import numpy as np

    blobs = [(i, mm.make_ppm(16 + 4 * i, 12 + 2 * i, seed=i)) for i in range(3)]
    df = spark.createDataFrame(blobs, "doc_id long, blob binary")
    out = {r["doc_id"]: r for r in mm.resize_images(df, out_w=8, out_h=6).collect()}
    assert len(out) == 3
    for i in range(3):
        r = out[i]
        assert (r["width"], r["height"]) == (8, 6)
        got = mm.decode_image(bytes(r["blob"]))  # round-trips through PPM
        want = mm.resize_image(mm.decode_image(mm.make_ppm(16 + 4 * i, 12 + 2 * i, seed=i)), 8, 6)
        assert got.shape == (6, 8, 3)
        assert np.array_equal(got, want)


def test_resize_image_identity_and_upsample():
    import numpy as np

    img = mm.decode_image(mm.make_ppm(5, 4, seed=7))
    assert np.array_equal(mm.resize_image(img, 5, 4), img)  # no-op resize
    up = mm.resize_image(img, 10, 8)  # nearest-neighbor: each pixel doubled
    assert np.array_equal(up[::2, ::2], img) and np.array_equal(up[1::2, 1::2], img)


def test_sample_frames(spark):
    import numpy as np

    clips = [(0, mm.make_video(4, 3, 7, seed=1)), (1, mm.make_video(2, 2, 1, seed=2))]
    df = spark.createDataFrame(clips, "doc_id long, blob binary")
    rows = mm.sample_frames(df, every_k=3).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
        assert (r["width"], r["height"]) in [(4, 3), (2, 2)]
    assert sorted(by_doc[0]) == [0, 3, 6]  # every 3rd of 7 frames
    assert sorted(by_doc[1]) == [0]
    # frame bytes match the generator's raw frames exactly
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(7, 3, 4, 3), dtype=np.uint8)
    for idx in (0, 3, 6):
        assert by_doc[0][idx] == frames[idx].tobytes()
        assert len(by_doc[0][idx]) == 4 * 3 * 3


def test_video_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_video_meta(b"\x00\x00\x01\xba mpeg-ps")


def test_decode_audio_roundtrip():
    import numpy as np

    wav = mm.make_wav(100, rate=16000, channels=2, seed=3)
    pcm, rate = mm.decode_audio(wav)
    assert rate == 16000 and pcm.shape == (100, 2)
    rng = np.random.default_rng(3)
    want = rng.integers(-(2**15), 2**15, size=(100, 2)).astype("<i2")
    assert np.array_equal(pcm, want)


def test_audio_stats(spark):
    import numpy as np

    clips = [(i, mm.make_wav(800 * (i + 1), rate=8000, seed=i)) for i in range(3)]
    df = spark.createDataFrame(clips, "doc_id long, blob binary")
    out = {r["doc_id"]: r for r in mm.audio_stats(df).collect()}
    for i in range(3):
        r = out[i]
        assert r["n_samples"] == 800 * (i + 1) and r["rate"] == 8000
        assert abs(r["duration_s"] - 0.1 * (i + 1)) < 1e-9
        pcm, _ = mm.decode_audio(mm.make_wav(800 * (i + 1), rate=8000, seed=i))
        assert abs(r["rms"] - np.sqrt((pcm.astype(float) ** 2).mean())) < 1e-6
        assert r["peak"] == int(np.abs(pcm).max())


def test_audio_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04mp3 payload")
    with pytest.raises(NotImplementedError):  # non-PCM WAV
        bad = bytearray(mm.make_wav(10))
        bad[20] = 3  # fmt code -> IEEE float
        mm.decode_audio(bytes(bad))
