"""Video clip tar pipeline (data/video.py) + Trainer3D on real clip data."""

import io
import os
import tarfile

import numpy as np
import pytest

from vqgan_tpu.data.video import (
    create_video_dataloader,
    decode_clip,
    video_transform,
)


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _make_clip_tar(path, n_clips, t=6, h=40, w=48, seed=0, ext="npy"):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n_clips):
            clip = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
            if ext == "npz":
                buf = io.BytesIO()
                np.savez(buf, clip=clip)
                data = buf.getvalue()
            else:
                data = _npy_bytes(clip)
            info = tarfile.TarInfo(f"sample_{i:04d}.{ext}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_decode_clip_formats():
    clip = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    out = decode_clip(_npy_bytes(clip))
    np.testing.assert_array_equal(out, clip)
    buf = io.BytesIO()
    np.savez(buf, clip=clip)
    np.testing.assert_array_equal(decode_clip(buf.getvalue()), clip)
    assert decode_clip(b"not a numpy file") is None
    # wrong rank → rejected
    assert decode_clip(_npy_bytes(clip[0])) is None
    # wrong dtype → rejected (no silent uint8 coercion of float/int clips)
    assert decode_clip(_npy_bytes(clip.astype(np.float32) / 255.0)) is None
    assert decode_clip(_npy_bytes(clip.astype(np.int32))) is None


def test_video_transform_contract():
    tf = video_transform(frames=8, size=16, train=False)
    clip = np.random.default_rng(0).integers(
        0, 256, (4, 64, 48, 3), dtype=np.uint8
    )
    out = tf(clip)  # 4 < 8 frames: loops; 48 short side → stride 3 → 16
    assert out.shape == (8, 16, 16, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    # looped temporal window repeats the source frames
    np.testing.assert_array_equal(out[:4], out[4:])
    # too-small input raises (data bug surfaced, not silently upscaled)
    with pytest.raises(ValueError):
        tf(np.zeros((4, 8, 8, 3), np.uint8))


def test_video_dataloader_batches(tmp_path):
    for i in range(2):
        _make_clip_tar(tmp_path / f"{i:05d}.tar", n_clips=6, seed=i)
    it = create_video_dataloader(
        str(tmp_path / "{00000..00001}.tar"),
        batch_size=4, frames=4, size=16, num_workers=1, seed=0, loop=False,
    )
    batch = next(it)
    assert batch.shape == (4, 4, 16, 16, 3)
    assert batch.dtype == np.float32
    assert -1.0 <= batch.min() and batch.max() <= 1.0


def test_undersized_dataset_surfaces_error(tmp_path, caplog):
    """Clips smaller than the target size: per-sample resilience must not
    become a silent infinite hang — the worker logs a dataset-wide error and
    (loop=False) the iterator ends instead of blocking forever."""
    import logging

    _make_clip_tar(tmp_path / "00000.tar", n_clips=60, t=4, h=8, w=8)
    it = create_video_dataloader(
        str(tmp_path / "00000.tar"),
        batch_size=4, frames=4, size=64, num_workers=1, seed=0, loop=False,
    )
    with caplog.at_level(logging.ERROR, logger="vqgan_tpu"):
        with pytest.raises(StopIteration):
            next(it)
    assert any("ALL failed" in r.message for r in caplog.records)


def test_trainer3d_on_clip_tar(tmp_path):
    """End-to-end: the 3D trainer learns from a real clip tar."""
    from vqgan_tpu.config import TrainConfig, TVAEConfig
    from vqgan_tpu.train.trainer3d import Trainer3D

    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    _make_clip_tar(data_dir / "00000.tar", n_clips=8, t=4, h=16, w=16)
    cfg = TrainConfig(
        dataset_url=str(data_dir / "00000.tar"),
        synthetic_data=False,
        batch_size=8,  # divides the 8-device test mesh's data axis
        max_steps=2,
        num_workers=1,
        use_wandb=False,
        ckpt_dir=str(tmp_path / "ckpt"),
        run_name="vid",
        log_every=1,
        evaluate_every_n_steps=2,
    )
    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    Trainer3D(cfg, tvae_cfg, frames=4).train()
    import glob
    import json

    lines = [
        json.loads(l)
        for l in open(tmp_path / "ckpt" / "vid" / "metrics_vid.jsonl")
        if l.strip()
    ]
    assert any(np.isfinite(l["loss"]) for l in lines if "loss" in l)
    # 3D eval: quality metrics + original-vs-recon frame strip
    evals = [l for l in lines if "eval/psnr" in l]
    assert evals and all(
        np.isfinite(l[k])
        for l in evals
        for k in ("eval/psnr", "eval/ssim", "eval/recon_l2")
    )
    assert glob.glob(
        str(tmp_path / "ckpt" / "vid" / "eval" / "reconstructed_clip_frames_*.png")
    )
