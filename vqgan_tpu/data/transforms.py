"""Host-side image transforms matching the reference's torchvision pipelines
(vae_trainer.py:93-116), implemented on numpy/cv2.

Train path (this_transform_random_crop_resize): normalize to [-1,1]; with
p=0.5 random-crop directly at `width`, else resize-shorter-side-to-width then
random-crop. Eval path (this_transform): normalize, center-crop 512, resize
to width.
"""

from __future__ import annotations

import numpy as np


def _to_float(img: np.ndarray) -> np.ndarray:
    """HWC uint8 [0,255] → float32 [-1,1] (ToTensor + Normalize ±0.5)."""
    return img.astype(np.float32) / 127.5 - 1.0


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    """Resize shorter side to ``size`` (torchvision Resize semantics)."""
    import cv2

    h, w = img.shape[:2]
    if h <= w:
        nh, nw = size, max(size, int(round(w * size / h)))
    else:
        nh, nw = max(size, int(round(h * size / w))), size
    interp = cv2.INTER_AREA if nh < h else cv2.INTER_LINEAR
    return cv2.resize(img, (nw, nh), interpolation=interp)


def _resize_exact(img: np.ndarray, size: int) -> np.ndarray:
    import cv2

    h = img.shape[0]
    interp = cv2.INTER_AREA if size < h else cv2.INTER_LINEAR
    return cv2.resize(img, (size, size), interpolation=interp)


def _random_crop(img: np.ndarray, size: int, rng: np.random.Generator):
    h, w = img.shape[:2]
    if h < size or w < size:
        img = _resize(img, size)
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top : top + size, left : left + size]


def _center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    if h < size or w < size:
        img = _resize(img, size)
        h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top : top + size, left : left + size]


def make_train_transform(width: int = 512, seed: int = 0, as_uint8: bool = False):
    """p=0.5: RandomCrop(width) directly; else Resize(width)+RandomCrop
    (vae_trainer.py:105-116). ``as_uint8`` keeps the output uint8 HWC —
    normalization then happens on device after a 4x cheaper H2D transfer
    (the train step's trace-time dtype branch).

    The optional per-call ``rng`` makes one sample's augmentation a pure
    function of that rng (indexed mode passes a position-derived generator —
    draws from the shared closure rng depend on thread scheduling, which
    would break indexed mode's batch-at-step-S determinism)."""
    shared_rng = np.random.default_rng(seed)

    def transform(img: np.ndarray, rng=None) -> np.ndarray:
        rng = shared_rng if rng is None else rng
        if rng.random() < 0.5:
            out = _random_crop(img, width, rng)
        else:
            out = _random_crop(_resize(img, width), width, rng)
        out = np.ascontiguousarray(out)
        return out if as_uint8 else _to_float(out)

    transform.accepts_rng = True
    return transform


def make_native_train_transform(width: int = 512, seed: int = 0, as_uint8: bool = False):
    """Bytes → float32 HWC via the C++ fused decode+resize+crop+normalize
    pipeline (data/native). Randomness (the p=0.5 crop-vs-resize branch and
    fractional crop offsets, mirroring vae_trainer.py:105-116) stays here;
    falls back to the Python path on decode failure.

    The returned callable has ``wants_bytes = True`` so TarImageStream skips
    its own decode.
    """
    from vqgan_tpu.data.native import native_pipeline

    shared_rng = np.random.default_rng(seed)
    fallback = make_train_transform(width, seed + 1, as_uint8=as_uint8)

    def transform(data: bytes, rng=None) -> np.ndarray:
        r = shared_rng if rng is None else rng
        resize_to = 0 if r.random() < 0.5 else width
        out = native_pipeline(
            data, resize_to, float(r.random()), float(r.random()), width,
            as_uint8=as_uint8,
        )
        if out is None:
            from vqgan_tpu.data.tar_stream import _decode_image

            img = _decode_image(data)
            if img is None:
                raise ValueError("undecodable image")
            return fallback(img, rng=rng)
        return out

    transform.wants_bytes = True
    transform.accepts_rng = True
    return transform


def make_eval_transform(width: int = 512, as_uint8: bool = False):
    """CenterCrop(512) → Resize(width) (vae_trainer.py:95-102)."""

    def transform(img: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(_resize_exact(_center_crop(img, 512), width))
        return out if as_uint8 else _to_float(out)

    return transform
