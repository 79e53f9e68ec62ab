"""Tests for the L7 tools: unit-activation calibrator, FID proxy."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from vqgan_tpu.config import VAEConfig
from vqgan_tpu.models.ae import init_vae_params


def test_unit_activation_calibration_converges():
    from tools.unit_activation_reinit import adjust_weight_init

    cfg = VAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    model, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    rngs = {"sample": jax.random.PRNGKey(2)}
    params, report = adjust_weight_init(
        model, params, batch, rngs, tol=0.15, max_iters=8
    )
    conv_keys = [k for k in report if k.endswith("conv1")]
    assert conv_keys
    for k in conv_keys:
        assert abs(report[k]["final_act_std"] - 1.0) < 0.3, (k, report[k])


def test_frechet_distance_properties():
    from vqgan_tpu.losses.fid import frechet_distance

    rng = np.random.RandomState(0)
    a = rng.randn(200, 16).astype(np.float32)
    b = rng.randn(200, 16).astype(np.float32) + 3.0
    d_same = frechet_distance(a, a.copy())
    d_diff = frechet_distance(a, b)
    assert d_same < 1e-3
    assert d_diff > 100  # mean shift of 3 in 16 dims → ≥ 9*16
    # symmetric-ish
    np.testing.assert_allclose(d_diff, frechet_distance(b, a), rtol=1e-3)


def test_feature_fn_shapes():
    from vqgan_tpu.losses.fid import make_feature_fn
    from vqgan_tpu.losses.vgg import VGG16Features

    vgg = VGG16Features()
    params = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    fn = make_feature_fn(params)
    out = fn(jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 512)


def test_bench_output_contract():
    """bench.py must print a JSON line with metric/value/unit/vs_baseline
    (the driver contract, CLAUDE.md invariant)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "bench.py")).read()
    # the result dict carries the four required keys
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in src, key
    # exactly one print(json.dumps(...)) per exit path, guarded returns
    assert src.count("print(json.dumps(") >= 1
