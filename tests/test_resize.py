"""REAL nearest-neighbor image resize (operators.multimodal.resize_nn /
resize_bmp_media): the 'resize' leg of the multimodal brief. The whole
chain — decode, NN index map, re-encode, re-decode — is exercised both
as plain functions and distributed through mapInPandas."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dmp_crawler_spark.operators import multimodal


def test_resize_nn_identity_and_known_map():
    px = multimodal._bmp_pixels(9)
    h, w = px.shape[:2]
    assert np.array_equal(multimodal.resize_nn(px, w, h), px)
    # 2x2 → 4x4 NN: each source pixel repeats in a 2x2 block
    small = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    up = multimodal.resize_nn(small, 4, 4)
    assert up.shape == (4, 4, 3)
    for y in range(4):
        for x in range(4):
            assert np.array_equal(up[y, x], small[(y * 2) // 4, (x * 2) // 4])


def test_resize_nn_matches_index_formula():
    for i in (0, 5, 13):
        px = multimodal._bmp_pixels(i)
        h, w = px.shape[:2]
        out = multimodal.resize_nn(px, 5, 4)
        for y in range(4):
            for x in range(5):
                assert np.array_equal(
                    out[y, x], px[(y * h) // 4, (x * w) // 5]
                ), (i, x, y)


def test_resize_nn_rejects_bad_size():
    px = multimodal._bmp_pixels(1)
    with pytest.raises(ValueError):
        multimodal.resize_nn(px, 0, 4)


def test_resize_bmp_media_end_to_end(spark):
    """Distributed chain: encode → decode → resize → re-encode, then the
    strict feature pass decodes the RESIZED payload; every value must
    match the numpy-side composition exactly."""
    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    resized = multimodal.resize_bmp_media(
        multimodal.bmp_media_from_ids(ids), 5, 4
    )
    feats = multimodal.extract_features(resized, strict=True)
    rows = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert len(rows) == 12
    for i, f in rows.items():
        expect_px = multimodal.resize_nn(multimodal._bmp_pixels(i), 5, 4)
        expect = (
            [5, 4]
            + expect_px.reshape(-1, 3).sum(axis=0).tolist()
            + expect_px[0, 0].tolist()
            + expect_px[2, 1].tolist()
            + expect_px[3, 4].tolist()
        )
        assert [int(v) for v in f[:14]] == expect, i


def test_resize_bmp_media_rejects_non_bmp(spark):
    media = multimodal.generate_media(spark, 2)  # hash payloads, not BMP
    with pytest.raises(Exception, match="not a BMP payload"):
        multimodal.resize_bmp_media(media, 5, 4).collect()
