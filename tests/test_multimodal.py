import pytest
from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import multimodal


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "")],
        "doc_id long, text string",
    )


def test_attach_binary_metadata(spark):
    out = multimodal.attach_binary(_docs(spark), "text")
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 11
    assert rows[3].n_bytes == 0
    assert bytes(rows[1].payload) == b"hello world"
    assert len(rows[1].content_hash) == 64
    assert rows[1].media_type == "text/plain"


def test_extract_features_plumbing(spark):
    with_bin = multimodal.attach_binary(_docs(spark), "text")
    feats = multimodal.extract_features(with_bin)
    rows = {r.doc_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3}
    assert len(rows[1].features) == multimodal.FEATURE_DIM
    assert rows[3].features == [0.0] * multimodal.FEATURE_DIM
    # deterministic
    again = {r.doc_id: r for r in multimodal.extract_features(with_bin).collect()}
    assert again[1].features == rows[1].features


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG fake")
