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
