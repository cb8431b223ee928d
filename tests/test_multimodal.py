"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaggle_ecommerce_etl_spark.functions import multimodal as mm


def _media(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (3, "aaaa"), (4, "")],
        ["doc_id", "payload"],
    )
    return mm.wrap_as_media(df, "doc_id", "payload", "application/octet-stream")


def test_wrap_schema_and_hash(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "blob", "mime", "n_bytes", "sha"
    ]
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].n_bytes == 4
    assert rows[1].sha == rows[3].sha != rows[2].sha
    assert bytes(rows[1].blob) == b"aaaa"


def test_extract_features_mapinpandas(spark):
    feats = mm.extract_features(_media(spark), dim=4)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows[1].feature) == 4
    assert abs(sum(rows[1].feature) - 1.0) < 1e-6   # histogram normalized
    assert rows[1].feature == rows[3].feature        # same bytes → same feature
    assert rows[4].feature == [0.0, 0.0, 0.0, 0.0]   # empty blob


def test_dedup_by_content(spark):
    out = mm.dedup_by_content(_media(spark))
    survivors = {r.media_id: r.n_copies for r in out.collect()}
    assert survivors[1] == 2      # ids 1 and 3 collapse, min id survives
    assert 3 not in survivors


def test_strict_mode_raises(spark):
    with pytest.raises(Exception):
        mm.extract_features(_media(spark), strict=True).collect()
