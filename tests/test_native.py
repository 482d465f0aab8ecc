"""Native decode runtime vs PIL reference."""
import os

import numpy as np
import pytest

from gaussianavatars_tpu import native


def _write_images(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    rgb = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    alpha = (rng.random((40, 60)) * 255).astype(np.uint8)
    png_rgb = str(tmp_path / "rgb.png")
    png_rgba = str(tmp_path / "rgba.png")
    jpg = str(tmp_path / "img.jpg")
    Image.fromarray(rgb, "RGB").save(png_rgb)
    Image.fromarray(np.dstack([rgb, alpha]), "RGBA").save(png_rgba)
    Image.fromarray(rgb, "RGB").save(jpg, quality=95)
    return png_rgb, png_rgba, jpg, rgb, alpha


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_decode_matches_pixels(tmp_path):
    png_rgb, png_rgba, jpg, rgb, alpha = _write_images(tmp_path)
    # Same-size decode: exact pixel match for PNG RGB.
    out = native.decode_image(png_rgb, 60, 40, (0, 0, 0))
    np.testing.assert_allclose(out, rgb / 255.0, atol=1e-6)
    # RGBA composite onto white.
    out = native.decode_image(png_rgba, 60, 40, (1, 1, 1))
    a = alpha[..., None] / 255.0
    expected = (rgb / 255.0) * a + 1.0 * (1 - a)
    np.testing.assert_allclose(out, expected, atol=1e-6)
    # JPEG: native decode must match PIL's decode of the same file exactly.
    from PIL import Image

    out = native.decode_image(jpg, 60, 40, (0, 0, 0))
    pil = np.asarray(Image.open(jpg).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(out, pil, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_resize_and_batch(tmp_path):
    png_rgb, png_rgba, jpg, rgb, alpha = _write_images(tmp_path)
    out = native.decode_image(png_rgb, 30, 20, (0, 0, 0))
    assert out.shape == (20, 30, 3)
    # Downscale should be close to the coarse average.
    assert abs(out.mean() - (rgb / 255.0).mean()) < 0.05
    batch = native.decode_batch([png_rgb, png_rgba, jpg] * 3, 30, 20, (0, 0, 0),
                                n_threads=3)
    assert batch.shape == (9, 20, 30, 3)
    np.testing.assert_allclose(batch[0], out, atol=1e-6)
    np.testing.assert_allclose(batch[3], out, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_size_and_failure(tmp_path):
    png_rgb, *_ = _write_images(tmp_path)
    assert native.image_size(png_rgb) == (60, 40)
    assert native.decode_image(str(tmp_path / "missing.png"), 8, 8, (0, 0, 0)) is None
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot really a png")
    assert native.decode_image(str(bad), 8, 8, (0, 0, 0)) is None


def test_pipeline_uses_native_or_falls_back(tmp_path):
    from gaussianavatars_tpu.data.pipeline import decode_image

    png_rgb, *_ = _write_images(tmp_path)
    out = decode_image(png_rgb, np.zeros(3), 60, 40)
    assert out.shape == (40, 60, 3) and out.dtype == np.float32
    os.environ["GSAVATARS_NO_NATIVE"] = "1"
    try:
        # Fallback still works (fresh module state not required: the env var
        # is honoured at first load; this at least exercises the PIL path
        # when the lib was never loaded).
        out2 = decode_image(png_rgb, np.zeros(3), 60, 40)
        np.testing.assert_allclose(out2, out, atol=2e-2)
    finally:
        del os.environ["GSAVATARS_NO_NATIVE"]
