"""Multimodal plumbing — schemas, batch shapes, partition sizing and
the stubbed decode/resize contract (the real codecs are absent by
design; the Spark-side dataflow is what's under test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.multimodal import (
    extract_image_features,
    frame_sample_plan,
    media_repartition,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.range(20).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 4 == 0, "video").otherwise("image").alias("kind"),
        F.encode(F.concat(F.lit("blob-"), F.col("id")), "UTF-8").alias("content"),
        F.lit("application/fake").alias("mime"),
    )


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(NotImplementedError):
        extract_image_features(media, fake=False)
    with pytest.raises(NotImplementedError):
        resize_images(media, fake=False)


def test_resize_clamps_and_preserves_aspect(media):
    out = resize_images(media, max_side=64, fake=True).collect()
    assert len(out) == 15  # images only
    for r in out:
        assert 1 <= max(r.width, r.height) <= 64
        assert r.content is not None and len(r.content) == 16
    # determinism: same input → same output
    again = resize_images(media, max_side=64, fake=True).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_frame_sample_plan_videos_only(media):
    plan = frame_sample_plan(media, every_n_frames=100, assumed_frames=300)
    rows = plan.collect()
    assert {r.media_id % 4 for r in rows} == {0}
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 100, 200] for v in per.values())


def test_media_repartition_by_bytes(media):
    out = media_repartition(media, target_bytes_per_partition=4 << 20,
                            avg_blob_bytes=1 << 20)
    assert out.rdd.getNumPartitions() == 5  # 20 × 1MB / 4MB


def test_pil_autodetect_gated(media):
    """When PIL is installed the real decoder takes over (fake=False);
    fake=True must ALWAYS pin the stub so hash-checked queries are
    immune to environment changes."""
    from graphem_rapids_spark.pipeline import multimodal as M

    if M.HAS_PIL:
        feats = M.extract_image_features(media).collect()  # real decode path
        assert all(r.n_bytes >= 0 for r in feats)
    else:
        with pytest.raises(NotImplementedError):
            M.extract_image_features(media)
    # stub path is pinned regardless of PIL
    stub = M.extract_image_features(media, fake=True).collect()
    again = M.extract_image_features(media, fake=True).collect()
    assert sorted(map(tuple, stub)) == sorted(map(tuple, again))
