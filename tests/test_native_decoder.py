"""Native C++ decode pipeline tests (builds the .so on first use)."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from vqgan_tpu.data.native import native_available, native_pipeline, native_probe

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder failed to build"
)


def _encode(img: np.ndarray, fmt: str) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format=fmt, quality=95)
    return buf.getvalue()


def test_probe_dimensions():
    img = (np.random.RandomState(0).rand(120, 200, 3) * 255).astype(np.uint8)
    assert native_probe(_encode(img, "PNG")) == (200, 120)
    assert native_probe(_encode(img, "JPEG")) == (200, 120)


def test_png_bit_exact_crop_normalize():
    rng = np.random.RandomState(1)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    data = _encode(img, "PNG")
    out = native_pipeline(data, 0, 0.5, 0.5, 256)
    oy = int(0.5 * (300 - 256 + 1))
    ox = int(0.5 * (400 - 256 + 1))
    ref = img[oy : oy + 256, ox : ox + 256].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_jpeg_decodes_close_to_pil():
    rng = np.random.RandomState(2)
    # smooth image so JPEG loss is small
    yy, xx = np.mgrid[0:128, 0:128] / 128.0
    img = (np.stack([xx, yy, (xx + yy) / 2], -1) * 255).astype(np.uint8)
    data = _encode(img, "JPEG")
    out = native_pipeline(data, 0, 0.0, 0.0, 128)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(
        np.float32
    ) / 127.5 - 1.0
    assert float(np.abs(out - ref).max()) < 0.05  # decoder rounding only


def test_upscale_when_too_small():
    img = (np.random.RandomState(3).rand(64, 64, 3) * 255).astype(np.uint8)
    out = native_pipeline(_encode(img, "PNG"), 0, 0.0, 0.0, 128)
    assert out.shape == (128, 128, 3)


def test_resize_shorter_side_path():
    img = (np.random.RandomState(4).rand(256, 512, 3) * 255).astype(np.uint8)
    out = native_pipeline(_encode(img, "PNG"), 128, 0.0, 0.0, 128)
    assert out.shape == (128, 128, 3)
    assert -1.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_garbage_returns_none():
    assert native_pipeline(b"not an image at all", 0, 0.0, 0.0, 64) is None


def test_tar_stream_native_path(tmp_path):
    from vqgan_tpu.data.tar_stream import TarImageStream
    from vqgan_tpu.data.transforms import make_native_train_transform

    path = str(tmp_path / "00000.tar")
    with tarfile.open(path, "w") as tf:
        for i in range(6):
            img = (np.random.RandomState(i).rand(80, 80, 3) * 255).astype(
                np.uint8
            )
            data = _encode(img, "PNG")
            info = tarfile.TarInfo(name=f"{i:06d}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    stream = TarImageStream(
        [path],
        make_native_train_transform(width=32, seed=0),
        batch_size=3,
        num_workers=1,
        do_shuffle=False,
        loop=False,
    )
    batches = list(stream)
    stream.close()
    assert len(batches) == 2
    assert batches[0].shape == (3, 32, 32, 3)
    assert batches[0].dtype == np.float32
