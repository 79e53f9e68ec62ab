"""Parallelism-specific tests on the 8-fake-device CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vqgan_tpu.ops.gradnorm import gradnorm
from vqgan_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
)


def test_create_mesh_wildcard(eight_devices):
    mesh = create_mesh({"data": -1})
    assert dict(mesh.shape) == {"data": 8}
    mesh = create_mesh({"data": -1, "tensor": 2})
    assert dict(mesh.shape) == {"data": 4, "tensor": 2}


def test_create_mesh_error_message(eight_devices):
    with pytest.raises(ValueError, match="multiply to 3"):
        create_mesh({"data": 3})


def test_param_sharding_rules(eight_devices):
    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    params = {
        "kernel": jnp.zeros((3, 3, 64, 128)),
        "tiny": jnp.zeros((3, 3, 4, 6)),
        "bias": jnp.zeros((128,)),
    }
    sh = param_shardings(params, mesh)
    assert sh["kernel"].spec == P(None, None, "fsdp", "tensor")
    assert sh["bias"].spec == P()
    # dims too small to shard stay replicated
    assert sh["tiny"].spec == P(None, None, "fsdp", "tensor") or sh["tiny"].spec == P(None, None, None, None)


def test_gradnorm_pmean_matches_reference_semantics(eight_devices):
    """Inside shard_map with axis_name, the backward divides by the MEAN of
    per-shard norms — the reference's avg_scalar_over_nodes semantics
    (vae_trainer.py:40-46)."""
    mesh = create_mesh({"data": 8})
    x = jnp.arange(8.0 * 4).reshape(8, 4)

    def local_loss(xs):
        # per-shard cotangent = 2*xs; per-shard norms differ
        y = gradnorm(xs, 1.0, axis_name="data")
        return jnp.sum(jnp.square(y))

    def shard_fn(xs):
        g = jax.grad(local_loss)(xs)
        return g

    g = shard_map(
        shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data")
    )(x)
    # expected: per-shard grad 2*xs normalized by mean of shard norms
    shard_norms = [float(jnp.linalg.norm(2 * x[i: i + 1])) for i in range(8)]
    mean_norm = float(np.mean(shard_norms))
    expected = 2 * np.asarray(x) / (mean_norm + 1e-8)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


def test_batch_sharding_spec(eight_devices):
    mesh = create_mesh({"data": 4, "tensor": 2})
    bs = batch_sharding(mesh)
    assert bs.spec == P("data", None, None, None)
    mesh2 = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    bs2 = batch_sharding(mesh2)
    assert bs2.spec == P(("data", "fsdp"), None, None, None)


def test_replicated_params_stay_in_sync_after_sharded_grad(eight_devices):
    """Correct DP: a grad step on a batch sharded over 8 devices must produce
    identical (replicated) params — the property the reference's
    DDP-bypassed generator violates (SURVEY.md §2.5)."""
    mesh = create_mesh({"data": 8})
    w = jax.device_put(jnp.ones((4, 4)), replicated(mesh))
    x = jax.device_put(
        jnp.arange(8.0 * 4).reshape(8, 4), batch_sharding(mesh, ndim=2)
    )

    @jax.jit
    def step(w, x):
        def loss(w):
            return jnp.mean(jnp.square(x @ w))

        g = jax.grad(loss)(w)
        return w - 0.1 * g

    w2 = step(w, x)
    # fetch per-device copies and compare
    vals = [np.asarray(s.data) for s in w2.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(vals[0], v)


def test_spatial_context_parallel_forward_matches(eight_devices):
    """SP: sharding the image H axis over a "context" mesh axis must produce
    the same numbers as the unsharded model — GSPMD inserts the conv halo
    exchanges and GroupNorm's cross-shard reductions."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqgan_tpu.config import VAEConfig
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.parallel.mesh import batch_sharding, create_mesh

    cfg = VAEConfig(
        resolution=64, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    vae = VAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (4, 64, 64, 3), minval=-1, maxval=1
    )
    params = vae.init({"params": rng, "sample": rng}, x)["params"]

    def fwd(p, xx):
        z = vae.apply({"params": p}, xx, method=vae.encode)
        return vae.apply({"params": p}, z, method=vae.decode)

    ref = jax.jit(fwd)(params, x)

    mesh = create_mesh({"data": 2, "context": 4})
    sh = batch_sharding(mesh)
    assert sh.spec == P("data", "context", None, None), sh.spec
    xs = jax.device_put(x, sh)
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(fwd)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_spatial_context_parallel_train_step(eight_devices):
    """A full GAN train step on a data×context mesh runs and stays finite."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.losses.discriminator import PatchDiscriminator
    from vqgan_tpu.losses.lpips import LPIPS
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from vqgan_tpu.train.state import create_train_state
    from vqgan_tpu.train.step import make_train_step

    vae_cfg = VAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=2, image_size=32, do_ganloss=True, disc_type="hinge",
    )
    vae = VAE(cfg=vae_cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    rngk = jax.random.PRNGKey(0)
    gp = vae.init({"params": rngk, "sample": rngk}, x0)["params"]
    disc = PatchDiscriminator()
    dp = disc.init(jax.random.PRNGKey(1), x0)["params"]
    lpips = LPIPS()
    lp = lpips.init(jax.random.PRNGKey(2), x0, x0)["params"]
    state, g_tx, d_tx = create_train_state(cfg, gp, dp, 32, rngk)

    mesh = create_mesh({"data": 2, "context": 4})
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        lp = jax.device_put(lp, replicated(mesh))
        batch = jax.device_put(
            jnp.asarray(
                np.random.RandomState(0)
                .uniform(-1, 1, (2, 32, 32, 3))
                .astype(np.float32)
            ),
            batch_sharding(mesh),
        )
        step = jax.jit(
            make_train_step(cfg, vae_cfg, vae, disc, lpips, g_tx, d_tx),
            static_argnums=(3,), donate_argnums=(0,),
        )
        state, metrics = step(state, batch, lp, 0)
    assert np.isfinite(float(metrics["overall_vae_loss"]))


def test_split_dcn_axes_prefers_data_axis():
    from vqgan_tpu.parallel.mesh import split_dcn_axes

    ici, dcn = split_dcn_axes({"data": 8, "fsdp": 2, "tensor": 2}, 4)
    assert ici == {"data": 2, "fsdp": 2, "tensor": 2}
    assert dcn == {"data": 4, "fsdp": 1, "tensor": 1}


def test_split_dcn_axes_falls_back_to_fsdp():
    from vqgan_tpu.parallel.mesh import split_dcn_axes

    # data extent 3 is indivisible by 2 slices; fsdp=4 takes the DCN split
    ici, dcn = split_dcn_axes({"data": 3, "fsdp": 4}, 2)
    assert ici == {"data": 3, "fsdp": 2}
    assert dcn == {"data": 1, "fsdp": 2}


def test_split_dcn_axes_single_slice_identity_and_errors():
    from vqgan_tpu.parallel.mesh import split_dcn_axes

    shape = {"data": 4, "tensor": 2}
    ici, dcn = split_dcn_axes(shape, 1)
    assert ici == shape and all(v == 1 for v in dcn.values())
    # tensor/context axes never cross DCN — no data-like axis divisible by 2
    with pytest.raises(ValueError):
        split_dcn_axes({"data": 3, "tensor": 8}, 2)
