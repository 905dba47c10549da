"""The real-codec extension point (`operators/media.py::decode_real` /
`extract_media_features_real`).

PIL is absent in this sandbox, so these tests SKIP here — they exist so
the codec gate stays visible and the full binary-column -> Arrow batch ->
decode -> feature-row plumbing is exercised the moment a codec library is
installed (VERDICT r4 item 7).  The no-PIL behavior (honest
``NotImplementedError``) is asserted unconditionally.
"""

import numpy as np
import pytest

from hilbert_curve_spark.operators import media as media_ops


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_real_gate_is_honest():
    """Without PIL the gate must raise NotImplementedError (not a silent
    stub result); with PIL it must decode."""
    if _pil_available():
        pytest.skip("PIL installed — gate covered by the decode tests below")
    with pytest.raises(NotImplementedError):
        media_ops.decode_real(b"\x89PNG\r\n\x1a\n")


@pytest.fixture
def png_bytes():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    return arr, buf.getvalue()


def test_decode_real_roundtrip(png_bytes):
    arr, payload = png_bytes
    decoded = media_ops.decode_real(payload)
    assert decoded.shape == (8, 6, 3)
    assert decoded.dtype == np.float32
    np.testing.assert_allclose(decoded, arr.astype(np.float32) / 255.0)


def test_extract_media_features_real_plumbing(spark, png_bytes):
    """Binary column through the Arrow mapInPandas path: schema, batch
    shape, and feature determinism."""
    arr, payload = png_bytes
    df = spark.createDataFrame(
        [("d1", "m://doc0000000001/0", bytearray(payload)),
         ("d2", "m://doc0000000002/0", bytearray(payload))],
        "doc_id string, media_ref string, payload binary",
    )
    out = media_ops.extract_media_features_real(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "media_ref", "width", "height", "n_bytes", "feature",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows["d1"].width == 6 and rows["d1"].height == 8
    assert rows["d1"].n_bytes == len(payload)
    assert len(rows["d1"].feature) == media_ops.FEATURE_DIM
    assert rows["d1"].feature == rows["d2"].feature  # same payload, same feature
    lum = (arr.astype(np.float32) / 255.0).mean(axis=2)
    np.testing.assert_allclose(rows["d1"].feature[3], lum[:4, :3].mean(), rtol=1e-5)
