"""Golden-value parity tests: our NHWC JAX models vs the reference PyTorch
models, weights carried over by train/torch_import.py.

These tests define "checkpoint parity": a reference ``vae.state_dict()``
imported into our tree must reproduce the reference's encoder/decoder outputs
to fp32 tolerance (NCHW↔NHWC layout changes only).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_compat import import_reference_module  # noqa: E402
from vqgan_tpu.config import VAEConfig  # noqa: E402
from vqgan_tpu.models.ae import VAE  # noqa: E402
from vqgan_tpu.train.torch_import import (  # noqa: E402
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

TINY = dict(
    resolution=32,
    in_channels=3,
    ch=32,
    out_ch=3,
    num_res_blocks=1,
    z_channels=8,
)


def _build_pair(use_attn=False, use_wavelet=False, hr=False, ch_mult=(1, 2)):
    ref_ae = import_reference_module("ae")
    torch.manual_seed(0)
    # The reference's zero-bias init loop (ae.py:233-237) crashes on the
    # bias-free attention convs (AttnBlock qkv/proj_out have bias=False) —
    # a latent reference bug when use_attn=True. Patch zeros_ to skip None
    # so we can instantiate the reference model for parity comparison.
    orig_zeros = torch.nn.init.zeros_
    torch.nn.init.zeros_ = lambda t: t if t is None else orig_zeros(t)
    try:
        tvae = _make_ref_vae(ref_ae, use_attn, use_wavelet, hr, ch_mult)
    finally:
        torch.nn.init.zeros_ = orig_zeros
    cfg = VAEConfig(
        **TINY,
        ch_mult=tuple(ch_mult),
        use_attn=use_attn,
        use_wavelet=use_wavelet,
        decoder_also_perform_hr=hr,
        enc_dtype="float32",
        dec_dtype="float32",
    )
    jvae = VAE(cfg=cfg)
    params = torch_state_dict_to_params(tvae.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tvae, jvae, params


def _make_ref_vae(ref_ae, use_attn, use_wavelet, hr, ch_mult):
    # reference Encoder mutates ch_mult in wavelet mode — pass a copy
    return ref_ae.VAE(
        resolution=TINY["resolution"],
        in_channels=3,
        ch=TINY["ch"],
        out_ch=3,
        ch_mult=list(ch_mult),
        num_res_blocks=TINY["num_res_blocks"],
        z_channels=TINY["z_channels"],
        use_attn=use_attn,
        decoder_also_perform_hr=hr,
        use_wavelet=use_wavelet,
    ).eval()


def _prep_wavelet_filters():
    ref_utils = import_reference_module("utils")
    ref_utils.prepare_filter("cpu")


@pytest.mark.parametrize(
    "use_attn,use_wavelet,hr,ch_mult",
    [
        (False, False, False, (1, 2)),
        (True, False, False, (1, 2)),
        (False, False, True, (1, 2)),
        (False, True, False, (1, 2, 4)),
    ],
    ids=["plain", "attn", "hr", "wavelet"],
)
def test_vae_forward_parity(use_attn, use_wavelet, hr, ch_mult):
    if use_wavelet:
        _prep_wavelet_filters()
    tvae, jvae, params = _build_pair(use_attn, use_wavelet, hr, ch_mult)
    rng = np.random.RandomState(42)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_dec, t_z = tvae(torch.from_numpy(x))
    j_dec, j_z = jvae.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(j_z), t_z.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_dec), t_dec.numpy().transpose(0, 2, 3, 1), rtol=2e-3, atol=2e-3
    )


def test_roundtrip_export():
    tvae, jvae, params = _build_pair()
    sd = params_to_torch_state_dict(jax.tree_util.tree_map(np.asarray, params))
    orig = tvae.state_dict()
    assert set(sd.keys()) == set(orig.keys())
    for k in orig:
        np.testing.assert_allclose(sd[k], orig[k].numpy(), rtol=1e-6, atol=1e-6)


def test_tvae_forward_parity():
    ref_tae = import_reference_module("tae")
    torch.manual_seed(1)
    t_model = ref_tae.TVAE(
        resolution=16,
        in_channels=3,
        ch=32,
        out_ch=3,
        ch_mult=[1, 2],
        num_res_blocks=1,
        z_channels=8,
    ).eval()
    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.models.tae import TVAE

    cfg = TVAEConfig(
        resolution=16,
        ch=32,
        ch_mult=(1, 2),
        num_res_blocks=1,
        z_channels=8,
        compute_dtype="float32",
    )
    j_model = TVAE(cfg=cfg)
    params = torch_state_dict_to_params(t_model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.RandomState(7)
    x = rng.randn(1, 3, 4, 16, 16).astype(np.float32)  # NCTHW
    with torch.no_grad():
        t_z = t_model.encoder(torch.from_numpy(x))
    j_z = j_model.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        method=TVAE.encode,
    )
    np.testing.assert_allclose(
        np.asarray(j_z),
        t_z.numpy().transpose(0, 2, 3, 4, 1),
        rtol=5e-4,
        atol=5e-4,
    )
    # decode the mean path deterministically on both sides
    mean = t_z.numpy()[:, :8]
    with torch.no_grad():
        t_dec = t_model.decoder(torch.from_numpy(mean))
    j_dec = j_model.apply(
        {"params": params},
        jnp.asarray(mean.transpose(0, 2, 3, 4, 1)),
        method=TVAE.decode,
    )
    np.testing.assert_allclose(
        np.asarray(j_dec),
        t_dec.numpy().transpose(0, 2, 3, 4, 1),
        rtol=2e-3,
        atol=2e-3,
    )
