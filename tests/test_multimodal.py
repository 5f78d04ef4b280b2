"""Multimodal plumbing: schema/batching real, decoders deterministic fakes."""

import numpy as np
from pyspark.sql import functions as F

from sprintz_spark.operators.multimodal import (
    audio_features,
    frame_sample,
    image_features,
    resize_images,
)


def _payloads(spark, n=50):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(n)
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def test_image_features_deterministic(spark):
    p = _payloads(spark)
    a = image_features(p).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = image_features(p).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert {"mean_r", "mean_g", "mean_b", "std_all", "phash"} <= set(a.columns)
    assert (a["mean_r"].between(0, 255)).all()


def test_resize_images_shape_and_math(spark):
    p = _payloads(spark, 20)
    out = resize_images(p, out_h=4, out_w=4).toPandas()
    assert (out["height"] == 4).all() and (out["width"] == 4).all()
    for pix in out["pixels"]:
        assert len(pix) == 4 * 4 * 3
    # resize math check against a local nearest-neighbor reference
    from sprintz_spark.operators.multimodal import _fake_decode

    row = out.iloc[0]
    src_payload = (
        p.where(F.col("doc_id") == row["doc_id"]).first()["payload"]
    )
    img = _fake_decode(src_payload)
    ys = (np.arange(4) * img.shape[0]) // 4
    xs = (np.arange(4) * img.shape[1]) // 4
    assert img[ys][:, xs].tobytes() == bytes(row["pixels"])


def test_frame_sample_rows(spark):
    p = _payloads(spark, 20)
    out = frame_sample(p, every_n=5).toPandas()
    assert len(out) > 0
    assert (out["frame_idx"] % 5 == 0).all()
    # deterministic per (payload, frame_idx)
    again = frame_sample(p, every_n=5).toPandas()
    key = ["doc_id", "frame_idx"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_audio_features(spark):
    p = _payloads(spark, 20)
    out = audio_features(p).toPandas()
    assert (out["n_samples"] >= 256).all()
    assert out["rms"].between(0, 1).all()
    assert out["zcr"].between(0, 1).all()
