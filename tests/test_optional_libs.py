"""Swap-point tests for optional cluster libraries (Pillow, idna, Iceberg
runtime): each real path is exercised when the library is importable and
skipped cleanly when not, so cluster enablement is config-only.  The suite
stays green BOTH with and without the libraries installed."""

from __future__ import annotations

import pytest


def _has(mod: str) -> bool:
    import importlib

    try:
        importlib.import_module(mod)
        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# Pillow decode/resize
# ---------------------------------------------------------------------------

def test_decode_image_real_path():
    PIL = pytest.importorskip("PIL")  # noqa: F841 - skip gate
    import io

    from PIL import Image

    from go_jsonschema_spark.operators.multimodal import decode_image

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (128, 64, 32)).save(buf, format="PNG")
    feats = decode_image(buf.getvalue())
    assert len(feats) == 8
    assert abs(sum(feats) - 1.0) < 1e-6


@pytest.mark.skipif(_has("PIL"), reason="PIL installed; real path covered")
def test_decode_image_raises_cleanly_without_pil():
    from go_jsonschema_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\x89PNG")


@pytest.mark.skipif(_has("PIL"), reason="PIL installed; real path covered")
def test_resize_real_path_raises_cleanly_without_pil(spark):
    from go_jsonschema_spark.operators import multimodal

    media = multimodal.synth_media(spark, 4)
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.resize_images(media, fake=False)


def test_resize_real_path_with_pil(spark):
    pytest.importorskip("PIL")
    import io

    from PIL import Image
    from pyspark.sql import functions as F

    from go_jsonschema_spark.operators import multimodal

    buf = io.BytesIO()
    Image.new("L", (16, 16), 99).save(buf, format="PNG")
    media = spark.createDataFrame(
        [("m1", "image", buf.getvalue(), None)], multimodal.MEDIA_SCHEMA
    )
    out = multimodal.resize_images(media, width=4, height=4, fake=False).collect()
    assert len(out) == 1 and len(out[0]["payload"]) == 16


# ---------------------------------------------------------------------------
# idna strict idn-hostname
# ---------------------------------------------------------------------------

def test_idn_hostname_strict_with_idna():
    pytest.importorskip("idna")
    from go_jsonschema_spark.interp import _FORMAT_CHECKS

    chk = _FORMAT_CHECKS["idn-hostname"]
    assert chk("실례.테스트") is True
    assert chk("example.com") is True
    # leading HANGUL TONE MARK / lone KATAKANA MIDDLE DOT are invalid per
    # RFC 5892 contextual rules (reference: x/net/idna ValidateLabels)
    assert chk("〮실례.실례") is False
    assert chk("・") is False
    assert chk("") is False


# ---------------------------------------------------------------------------
# Iceberg checkpoint store
# ---------------------------------------------------------------------------

def test_iceberg_store_gates_cleanly(spark):
    from go_jsonschema_spark.checkpoint import IcebergCheckpointStore

    if IcebergCheckpointStore.available(spark):
        pytest.skip("iceberg runtime present; roundtrip test covers it")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergCheckpointStore(spark, "ck.db.checkpoints")


def test_iceberg_store_roundtrip(spark, tmp_path):
    """Real MERGE protocol — runs only when the Iceberg runtime jar is on
    the classpath and a 'ck' hadoop catalog is configured (cluster CI)."""
    from go_jsonschema_spark.checkpoint import IcebergCheckpointStore

    if not IcebergCheckpointStore.available(spark):
        pytest.skip("iceberg-spark-runtime not on classpath (sandbox)")
    if "ck" not in spark.conf.get("spark.sql.catalog.ck", ""):
        try:
            spark.conf.get("spark.sql.catalog.ck")
        except Exception:
            pytest.skip("no spark.sql.catalog.ck configured")
    store = IcebergCheckpointStore(spark, "ck.db.checkpoints_test")
    store.mark_complete("r1", "b0_abc", ["a", "b"], {"a": {"n_rows": 1}}, "/o")
    store.mark_complete("r1", "b0_abc", ["a", "b"], {"a": {"n_rows": 2}}, "/o")
    got = store.completed("r1")
    assert list(got) == ["b0_abc"]
    assert got["b0_abc"]["metrics"]["a"]["n_rows"] == 2  # MERGE idempotent
