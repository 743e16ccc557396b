"""Multimodal plumbing invariants (scale/multimodal.py) beyond the
driver-checked metadata/feature queries: the resize kernel's batch
shape, output geometry, and fail-soft empty handling."""

from __future__ import annotations

from pyspark.sql import Row

from yodel_etl_spark.scale.multimodal import _fake_decode, decode_meta, resize_media
from yodel_etl_spark.session import ship_package


def _blobs(spark):
    rows = [
        Row(media_id=1, content=bytes(range(200))),
        Row(media_id=2, content=b"\xff" * 33),
        Row(media_id=3, content=b""),
        Row(media_id=4, content=None),
    ]
    return spark.createDataFrame(rows)


def test_resize_output_geometry(spark):
    ship_package(spark)
    out = {r["media_id"]: r for r in resize_media(_blobs(spark), width=8, height=8).collect()}
    for mid in (1, 2):
        r = out[mid]
        c = _fake_decode(bytes(r["content"]))[2]
        assert len(r["resized"]) == 8 * 8 * c
        assert (r["r_width"], r["r_height"], r["r_channels"]) == (8, 8, c)
    # empty/NULL blobs fail soft to empty output, never raise
    assert out[3]["resized"] == bytearray(b"") and out[3]["r_channels"] == 0
    assert out[4]["resized"] == bytearray(b"")


def test_resize_deterministic(spark):
    ship_package(spark)
    a = {r["media_id"]: bytes(r["resized"]) for r in resize_media(_blobs(spark)).collect()}
    b = {r["media_id"]: bytes(r["resized"]) for r in resize_media(_blobs(spark)).collect()}
    assert a == b


def test_decode_meta_then_resize_compose(spark):
    """The metadata stage and the resize stage compose in one DAG —
    schema append is additive, no column clashes."""
    ship_package(spark)
    out = resize_media(decode_meta(_blobs(spark)), width=4, height=2).collect()
    r = {x["media_id"]: x for x in out}[1]
    assert r["width"] == _fake_decode(bytes(r["content"]))[0]
    assert len(r["resized"]) == 4 * 2 * r["r_channels"]
