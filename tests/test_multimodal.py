"""Multimodal plumbing tests: binary payload columns through mapInPandas
stages (decode stubbed; schemas, batching, explode shape are real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkroach.functions import multimodal as mm
from sparkroach.tables import load
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    docs = load(spark, SF_SMALL, "documents")
    return mm.synthesize_media(docs).cache()


def _names_types(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema_and_meta_filter(media):
    assert _names_types(media.schema) == _names_types(mm.MEDIA_SCHEMA)
    # filters on typed meta never touch the payload (column pruning)
    wide = media.where(F.col("meta.width") > 100)
    assert 0 < wide.count() < media.count()


def test_feature_extraction_deterministic(media):
    feats = mm.extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == media.count()
    r0 = rows[0]
    assert r0.n_bytes > 0 and 0 < r0.byte_mean < 255
    assert len(r0.histogram16) == 16 and sum(r0.histogram16) == r0.n_bytes
    # deterministic across runs
    again = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert again[0].histogram16 == r0.histogram16


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x00", "image", fake=False)


def test_resize_keeps_schema(media):
    out = mm.resize_images(media.limit(10), 64, 64)
    rows = out.collect()
    assert out.schema == mm.MEDIA_SCHEMA
    assert all(r.meta.width == 64 and r.meta.height == 64 for r in rows)


def test_frame_sampling_explodes_videos(media):
    frames = mm.sample_frames(media, every_ms=1000)
    got = frames.collect()
    n_videos = media.where(F.col("kind") == "video").count()
    assert len(got) >= n_videos  # ≥1 frame per video
    assert {r.media_id for r in got} == {
        r.media_id for r in media.where(F.col("kind") == "video").collect()
    }
    one = [r for r in got if r.frame_idx == 0][0]
    assert isinstance(bytes(one.frame_payload), bytes)


def test_extract_features_arrow_buffer_edges(spark):
    """The raw-buffer reduceat lane's documented traps, hit directly:
    an empty payload mid-batch (reduceat would return a neighbor's
    byte), an empty payload in trailing position (index past the data
    buffer), and exactness of the int64 widening on 0xff bytes."""
    from sparkroach.functions import multimodal as mm

    rows = [
        (1, "image", b"abc"),
        (2, "audio", b""),  # empty mid-batch
        (3, "video", b"\x00\xff\xff"),
        (4, "image", b""),  # empty trailing
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).coalesce(1)
    got = {
        r.media_id: (r.n_bytes, r.byte_sum)
        for r in mm.extract_features_arrow(media).collect()
    }
    assert got == {1: (3, 97 + 98 + 99), 2: (0, 0), 3: (3, 510), 4: (0, 0)}

    # and the two lanes agree on real synthesized media
    from sparkroach.tables import load
    from tests.conftest import SF_SMALL

    m = mm.synthesize_media(load(spark, SF_SMALL, "documents"))
    a = {
        r.media_id: (r.n_bytes, r.byte_sum)
        for r in mm.extract_features_arrow(m).collect()
    }
    p = {
        r.media_id: (r.n_bytes, r.byte_sum)
        for r in mm.extract_features(m).collect()
    }
    assert a == p
