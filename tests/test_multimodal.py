"""Multimodal plumbing tests: schema, mapInPandas batching, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from bibexpy_spark.training import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media(spark, n=64).persist()


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 64
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        mm.decode_features(media, fake=False).collect()


def test_fake_decode_deterministic(spark, media):
    f1 = mm.decode_features(media, fake=True).orderBy("media_id").collect()
    f2 = mm.decode_features(media, fake=True).orderBy("media_id").collect()
    assert [r["features"] for r in f1] == [r["features"] for r in f2]
    assert all(len(r["features"]) == 8 for r in f1)
    assert all(len(r["content_sha"]) == 64 for r in f1)


def test_dedup_media_exact(spark, media):
    feats = mm.decode_features(media, fake=True)
    groups = mm.dedup_media_exact(feats)
    # payloads are all distinct random bytes -> every group is a singleton
    assert groups.count() == 64
    assert groups.agg(F.max("n_members")).first()[0] == 1
