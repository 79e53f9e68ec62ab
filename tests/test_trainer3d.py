"""3D video VAE training smoke: loss must decrease on synthetic clips."""

import numpy as np

from vqgan_tpu.config import TrainConfig, TVAEConfig
from vqgan_tpu.train.trainer3d import Trainer3D, synthetic_video_batches


def test_synthetic_video_shapes():
    b = next(synthetic_video_batches(2, 4, 16))
    assert b.shape == (2, 4, 16, 16, 3)
    assert abs(b).max() <= 1.0
    b2 = next(synthetic_video_batches(2, 4, 16))
    np.testing.assert_array_equal(b, b2)  # deterministic


def test_trainer3d_learns(tmp_path):
    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=8,
        learning_rate_vae=0.03,  # /ch → ~1e-3 effective
        max_steps=8,
        run_name="t3d",
        use_wandb=False,
        ckpt_dir=str(tmp_path),
        log_every=100,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    import jax

    losses = []
    src = synthetic_video_batches(8, 4, 16, seed=42)
    for i in range(10):
        batch = jax.device_put(next(src), trainer.batch_shard)
        (
            trainer.params, trainer.opt_state, trainer.rng,
            trainer.vq_ema, metrics,
        ) = trainer._step(
            trainer.params, trainer.opt_state, batch, trainer.rng,
            trainer.vq_ema,
        )
        losses.append(float(metrics["recon_l2"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < losses[0], losses


def test_trainer3d_context_ring_attention(tmp_path):
    """Trainer3D on a data×context mesh: the clip's T dim is sharded and the
    mid-block attentions run as ring attention; two steps stay finite."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=4,
        max_steps=2,
        run_name="t3dring",
        use_wandb=False,
        ckpt_dir=str(tmp_path),
        log_every=1,
        mesh_shape="data=2,context=4",
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=8)
    assert trainer.model.ring_axis == "context"
    src = synthetic_video_batches(4, 8, 16, seed=7)
    batch = jax.device_put(next(src), trainer.batch_shard)
    for _ in range(2):
        (
            trainer.params, trainer.opt_state, trainer.rng,
            trainer.vq_ema, metrics,
        ) = trainer._step(
            trainer.params, trainer.opt_state, batch, trainer.rng,
            trainer.vq_ema,
        )
    assert np.isfinite(float(metrics["loss"]))
    # eval must also run on the ring/context mesh (shard_map inside jit)
    trainer._eval(2, np.asarray(next(src)))
    import glob

    assert glob.glob(
        str(tmp_path / "t3dring" / "eval" / "reconstructed_clip_frames_*.png")
    )


def test_trainer3d_context_divisibility_error(tmp_path):
    import pytest

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
    )
    cfg = TrainConfig(
        batch_size=4, max_steps=1, run_name="bad", use_wandb=False,
        ckpt_dir=str(tmp_path), mesh_shape="data=2,context=4",
    )
    with pytest.raises(ValueError, match="context extent"):
        Trainer3D(cfg, tvae_cfg, frames=6)  # t_mid=3 not divisible by 4


def test_trainer3d_checkpoint_resume(tmp_path):
    """Trainer3D saves the full (params, opt, rng, step) state and a fresh
    Trainer3D in the same run dir resumes it exactly."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=8, max_steps=2, run_name="t3dres", use_wandb=False,
        ckpt_dir=str(tmp_path), log_every=100, evaluate_every_n_steps=0,
    )
    t1 = Trainer3D(cfg, tvae_cfg, frames=4)
    final_params = t1.train()

    t2 = Trainer3D(cfg, tvae_cfg, frames=4)
    assert t2.start_step == 2
    a = jax.tree_util.tree_leaves(final_params)
    b = jax.tree_util.tree_leaves(t2.params)
    assert max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max()) for x, y in zip(a, b)
    ) < 1e-7
    # resumed training continues past max_steps without re-running steps
    t2.train()  # start_step == max_steps → zero additional steps, clean exit


def test_trainer3d_gan_stack(tmp_path):
    """--do_ganloss on the 3D trainer: the full per-frame GAN/LPIPS stack
    (PatchDiscriminator + LPIPS + GradNorm + LeCam, train/step3d.py) runs,
    both optimizers move their params, metrics carry the 2D GAN keys, and
    the frame-subset path (video_loss_frames < T) compiles and stays
    finite."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=8,
        learning_rate_vae=0.03,
        max_steps=3,
        run_name="t3dgan",
        use_wandb=False,
        ckpt_dir=str(tmp_path),
        log_every=100,
        do_ganloss=True,
        use_lecam=True,
        disc_type="hinge",
        video_loss_frames=2,  # of 4 — exercises the strided subset
        evaluate_every_n_steps=0,
        eval_batches=0,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    d0 = jax.device_get(trainer.state.d_params)
    g0 = jax.device_get(trainer.state.g_params)
    src = synthetic_video_batches(8, 4, 16, seed=42)
    for _ in range(3):
        batch = jax.device_put(next(src), trainer.batch_shard)
        trainer.state, metrics = trainer._step(
            trainer.state, batch, trainer.lpips_params
        )
    vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
    for key in (
        "perceptual_loss",
        "recon_l2",
        "kl",
        "gan/discriminator_loss",
        "gan/generator_gan_loss",
        "gan/lecam_loss",
        "overall_vae_loss",
    ):
        assert key in vals and np.isfinite(vals[key]), (key, vals)
    # both parameter sets actually trained
    d1 = jax.device_get(trainer.state.d_params)
    g1 = jax.device_get(trainer.state.g_params)

    def moved(a, b):
        return any(
            np.abs(np.asarray(x) - np.asarray(y)).max() > 0
            for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        )

    assert moved(d0, d1), "discriminator did not update"
    assert moved(g0, g1), "generator did not update"
    assert int(trainer.state.step) == 3
    # the GAN-path eval computes per-frame eval/lpips with the training
    # LPIPS net (2D metric parity)
    import json as _json

    trainer._eval(3, np.asarray(next(synthetic_video_batches(8, 4, 16))))
    log = tmp_path / "t3dgan" / "metrics_t3dgan.jsonl"
    keys = set()
    for line in open(log):
        keys |= set(_json.loads(line))
    assert "eval/lpips" in keys and "eval/psnr" in keys, keys


def test_trainer3d_gan_ema(tmp_path):
    """--ema_decay on the 3D GAN path: g_ema tracks the Polyak average and
    eval scores it (train/step3d.py, trainer3d._eval_params)."""
    import jax
    import jax.numpy as jnp

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=8, learning_rate_vae=0.03, max_steps=2, run_name="t3dema",
        use_wandb=False, ckpt_dir=str(tmp_path), log_every=100,
        do_ganloss=True, evaluate_every_n_steps=0, eval_batches=0,
        ema_decay=0.5,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    assert trainer.state.g_ema is not None
    src = synthetic_video_batches(8, 4, 16, seed=42)
    for _ in range(3):
        batch = jax.device_put(next(src), trainer.batch_shard)
        trainer.state, _ = trainer._step(
            trainer.state, batch, trainer.lpips_params
        )
    delta = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(trainer.state.g_ema),
            jax.tree_util.tree_leaves(trainer.state.g_params),
        )
    )
    assert delta > 0  # EMA lags the raw weights
    leaves_e = jax.tree_util.tree_leaves(trainer.state.g_ema)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves_e)
    # eval path picks the EMA tree
    assert trainer._eval_params is trainer.state.g_ema


def test_trainer3d_gan_checkpoint_resume(tmp_path):
    """GAN-path full-state checkpointing: a fresh Trainer3D for the same run
    resumes the TrainState (params, both optimizers, LeCam anchors, step)."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    kw = dict(
        batch_size=8, max_steps=2, run_name="t3dganck", use_wandb=False,
        ckpt_dir=str(tmp_path), log_every=100, do_ganloss=True,
        evaluate_every_n_steps=0, eval_batches=0, synthetic_data=True,
    )
    t1 = Trainer3D(TrainConfig(**kw), tvae_cfg, frames=4)
    t1.train()
    assert int(t1.state.step) == 2

    t2 = Trainer3D(TrainConfig(**kw), tvae_cfg, frames=4)
    assert t2.start_step == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t1.state.g_params)),
        jax.tree_util.tree_leaves(jax.device_get(t2.state.g_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer3d_gan_vq(tmp_path):
    """The video GAN stack composes with the VQ regularizer (loss-based,
    ema decay 0 as the train3d CLI wires it): two steps run, codebook loss
    is finite and reported."""
    import dataclasses

    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", reg_type="vq", vq_codebook_size=32,
        vq_ema_decay=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_steps=2, run_name="t3dganvq", use_wandb=False,
        ckpt_dir=str(tmp_path), log_every=100, do_ganloss=True,
        evaluate_every_n_steps=0, eval_batches=0, synthetic_data=True,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    src = synthetic_video_batches(8, 4, 16, seed=1)
    for _ in range(2):
        batch = jax.device_put(next(src), trainer.batch_shard)
        trainer.state, metrics = trainer._step(
            trainer.state, batch, trainer.lpips_params
        )
    vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(vals["kl"])  # the VQ codebook+commitment loss slot
    assert np.isfinite(vals["overall_vae_loss"])


def test_trainer3d_grad_accum_gan(tmp_path):
    """grad_accum=2 on the 3D GAN path (train/step3d.py::step_accum): D scan
    → D update → G scan; same metric surface as the plain step, both
    parameter sets move, everything finite."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    base = dict(
        batch_size=16, learning_rate_vae=0.03, max_steps=2,
        use_wandb=False, ckpt_dir=str(tmp_path), log_every=100,
        do_ganloss=True, use_lecam=True, disc_type="hinge",
        video_loss_frames=2, evaluate_every_n_steps=0, eval_batches=0,
    )
    t_acc = Trainer3D(
        TrainConfig(run_name="t3dacc", grad_accum=2, **base), tvae_cfg,
        frames=4,
    )
    t_plain = Trainer3D(
        TrainConfig(run_name="t3dplain", **base), tvae_cfg, frames=4
    )
    g0 = jax.device_get(t_acc.state.g_params)
    d0 = jax.device_get(t_acc.state.d_params)
    src = synthetic_video_batches(16, 4, 16, seed=7)
    batch = jax.device_put(next(src), t_acc.batch_shard)
    t_acc.state, m_acc = t_acc._step(t_acc.state, batch, t_acc.lpips_params)
    _, m_plain = t_plain._step(t_plain.state, batch, t_plain.lpips_params)
    assert set(jax.device_get(m_acc)) == set(jax.device_get(m_plain))
    vals = {k: float(v) for k, v in jax.device_get(m_acc).items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    # a second step: the G warmup lr is 0 at step 0, so movement shows
    # only from step 1 on (as in test_trainer3d_gan_stack's 3 steps)
    batch = jax.device_put(next(src), t_acc.batch_shard)
    t_acc.state, m_acc = t_acc._step(t_acc.state, batch, t_acc.lpips_params)
    g1 = jax.device_get(t_acc.state.g_params)
    d1 = jax.device_get(t_acc.state.d_params)

    def moved(a, b):
        return any(
            float(np.abs(np.asarray(x) - np.asarray(y)).max()) > 0
            for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        )

    assert moved(g0, g1) and moved(d0, d1)
    assert int(t_acc.state.step) == 2


def test_trainer3d_grad_accum_plain(tmp_path):
    """grad_accum on the recon-only 3D path: the microbatch scan averages
    gradients — with identical microbatches it matches the single-batch
    step's metrics exactly."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    base = dict(
        batch_size=16, learning_rate_vae=0.03, max_steps=2, use_wandb=False,
        log_every=100, evaluate_every_n_steps=0,
    )
    t = Trainer3D(
        TrainConfig(run_name="t3dpa", ckpt_dir=str(tmp_path), grad_accum=2,
                    **base),
        tvae_cfg, frames=4,
    )
    src = synthetic_video_batches(16, 4, 16, seed=3)
    batch = jax.device_put(next(src), t.batch_shard)
    t.params, t.opt_state, t.rng, t.vq_ema, metrics = t._step(
        t.params, t.opt_state, batch, t.rng, t.vq_ema
    )
    vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(vals["loss"]) and np.isfinite(vals["recon_l2"])


def test_trainer3d_vq_ema_plain(tmp_path):
    """EMA-codebook VQ on the recon-only 3D path: the quantizer's stats
    collection threads through the step functionally (train/trainer3d.py::
    make_train_step_3d, mirroring train/step.py), the codebook is
    overwritten by the EMA fold every step, and resume restores the stats."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", reg_type="vq", vq_codebook_size=32,
        vq_ema_decay=0.9, vq_revive_threshold=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_steps=2, run_name="t3dvqema", use_wandb=False,
        ckpt_dir=str(tmp_path), log_every=100, evaluate_every_n_steps=2,
        eval_batches=1, synthetic_data=True,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    assert trainer.vq_ema is not None
    cb0 = np.asarray(jax.device_get(trainer.params["reg"]["codebook"]))
    counts0 = np.asarray(jax.device_get(trainer.vq_ema["reg"]["counts"]))
    trainer.train()
    cb1 = np.asarray(jax.device_get(trainer.params["reg"]["codebook"]))
    counts1 = np.asarray(jax.device_get(trainer.vq_ema["reg"]["counts"]))
    assert float(np.abs(cb1 - cb0).max()) > 0  # EMA fold moved the codebook
    assert float(np.abs(counts1 - counts0).max()) > 0  # stats advanced
    # auto-resume restores the stats collection alongside params
    t2 = Trainer3D(cfg, tvae_cfg, frames=4)
    assert t2.start_step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t2.vq_ema["reg"]["counts"])), counts1
    )


def test_trainer3d_gan_vq_ema(tmp_path):
    """EMA-codebook VQ composes with the full video GAN stack AND grad
    accumulation (train/step3d.py): the stats ride the TrainState, the fold
    lands in g_params, dead-code revival reseeds unused codes, and the
    Polyak EMA tracks the post-fold codebook."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", reg_type="vq", vq_codebook_size=32,
        vq_ema_decay=0.9, vq_revive_threshold=0.5,
    )
    cfg = TrainConfig(
        batch_size=16, max_steps=2, run_name="t3dganvqema", use_wandb=False,
        ckpt_dir=str(tmp_path), log_every=100, do_ganloss=True,
        use_lecam=True, grad_accum=2, ema_decay=0.99, video_loss_frames=2,
        evaluate_every_n_steps=0, eval_batches=0, synthetic_data=True,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    assert trainer.state.vq_ema is not None
    cb0 = np.asarray(jax.device_get(trainer.state.g_params["reg"]["codebook"]))
    counts0 = np.asarray(
        jax.device_get(trainer.state.vq_ema["reg"]["counts"])
    )
    src = synthetic_video_batches(16, 4, 16, seed=5)
    for _ in range(2):
        batch = jax.device_put(next(src), trainer.batch_shard)
        trainer.state, metrics = trainer._step(
            trainer.state, batch, trainer.lpips_params
        )
    vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(vals["overall_vae_loss"])
    assert np.isfinite(vals["gan/discriminator_loss"])
    cb1 = np.asarray(jax.device_get(trainer.state.g_params["reg"]["codebook"]))
    counts1 = np.asarray(
        jax.device_get(trainer.state.vq_ema["reg"]["counts"])
    )
    assert float(np.abs(cb1 - cb0).max()) > 0
    assert float(np.abs(counts1 - counts0).max()) > 0
    # Polyak EMA tracks the post-fold codebook
    ema_cb = np.asarray(jax.device_get(trainer.state.g_ema["reg"]["codebook"]))
    assert float(np.abs(ema_cb - cb0).max()) > 0


def test_frame_subset_covers_all_frames():
    """--video_loss_frames coverage contract (VERDICT r3 weak-#6): for every
    (T, k) the float-phase strided sampler must (a) keep static shape k,
    (b) return strictly increasing in-range indices, and (c) give EVERY
    frame index nonzero selection probability — the old integer-shift
    sampler provably never picked frames {4, 7} at T=8, k=3."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.train.step3d import _frame_subset

    for t in (4, 5, 6, 7, 8, 12, 16):
        for k in (1, 2, 3, 4, 5):
            if k >= t:
                continue
            seen = set()
            arr = jnp.arange(t, dtype=jnp.int32).reshape(1, t, 1)
            for s in range(64):
                (picked,) = _frame_subset(
                    jax.random.PRNGKey(s), (arr,), k
                )
                idx = np.asarray(picked).reshape(-1)
                assert idx.shape == (k,), (t, k, idx)
                assert (idx >= 0).all() and (idx < t).all(), (t, k, idx)
                assert (np.diff(idx) >= 1).all(), (t, k, idx)  # distinct
                seen.update(int(i) for i in idx)
            assert seen == set(range(t)), (
                f"T={t}, k={k}: frames {set(range(t)) - seen} never selected"
            )


def test_frame_subset_identity_when_k_covers_t():
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.train.step3d import _frame_subset

    arr = jnp.arange(6, dtype=jnp.int32).reshape(1, 6, 1)
    for k in (0, 6, 7):
        (out,) = _frame_subset(jax.random.PRNGKey(0), (arr,), k)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(arr))


def test_trainer3d_recon_only_vq_revival(tmp_path):
    """--vq_revive_threshold must be honored on recon-only (no --do_ganloss)
    runs too (ADVICE r3: the non-GAN _fold never revived dead codes). With a
    threshold above every EMA count, ALL codes are dead after step 1, so
    every codebook row must be reseeded from the batch's encoder latents."""
    import jax

    tvae_kw = dict(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32", reg_type="vq", vq_codebook_size=32,
        vq_ema_decay=0.99,
    )
    base = dict(
        batch_size=8, max_steps=1, use_wandb=False, ckpt_dir=str(tmp_path),
        log_every=100, evaluate_every_n_steps=0, eval_batches=0,
        synthetic_data=True,
    )
    t_rev = Trainer3D(
        TrainConfig(run_name="rev", **base),
        TVAEConfig(vq_revive_threshold=1e9, **tvae_kw),
        frames=4,
    )
    t_plain = Trainer3D(
        TrainConfig(run_name="norev", **base),
        TVAEConfig(vq_revive_threshold=0.0, **tvae_kw),
        frames=4,
    )
    src = synthetic_video_batches(8, 4, 16, seed=3)
    batch = next(src)
    # revival reseeds from latents of the PRE-update encoder forward
    p0 = jax.device_get(t_rev.params)
    for tr in (t_rev, t_plain):
        b = jax.device_put(batch, tr.batch_shard)
        (
            tr.params, tr.opt_state, tr.rng, tr.vq_ema, _,
        ) = tr._step(tr.params, tr.opt_state, b, tr.rng, tr.vq_ema)
    cb_rev = np.asarray(jax.device_get(t_rev.params["reg"]["codebook"]))
    cb_plain = np.asarray(jax.device_get(t_plain.params["reg"]["codebook"]))
    assert float(np.abs(cb_rev - cb_plain).max()) > 1e-6, (
        "revival threshold had no effect on the recon-only path"
    )
    # every revived row must be an actual encoder latent from the batch
    z = np.asarray(
        jax.device_get(
            jax.jit(
                lambda p, x: t_rev.model.apply(
                    {"params": p}, x, method=t_rev.model.encode
                )
            )(p0, jax.numpy.asarray(batch))
        )
    ).reshape(-1, cb_rev.shape[1])
    d = np.abs(cb_rev[:, None, :] - z[None, :, :]).max(-1).min(-1)
    assert float(d.max()) < 1e-4, d.max()


def test_trainer3d_tubelet_disc(tmp_path):
    """--disc_3d tubelet: the spatio-temporal TubeletDiscriminator drives
    the video GAN step — finite metrics, both parameter sets (incl. the
    temporal mixers) move."""
    import jax

    tvae_cfg = TVAEConfig(
        resolution=16, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        compute_dtype="float32",
    )
    cfg = TrainConfig(
        batch_size=8, max_steps=3, run_name="t3dtub", use_wandb=False,
        ckpt_dir=str(tmp_path), log_every=100, do_ganloss=True,
        use_lecam=True, disc_type="hinge", video_loss_frames=2,
        disc_3d="tubelet", evaluate_every_n_steps=0, eval_batches=0,
        synthetic_data=True,
    )
    trainer = Trainer3D(cfg, tvae_cfg, frames=4)
    assert any(k.startswith("tmix") for k in trainer.state.d_params)
    import numpy as _np

    d0 = jax.device_get(trainer.state.d_params)
    g0 = jax.device_get(trainer.state.g_params)
    src = synthetic_video_batches(8, 4, 16, seed=11)
    for _ in range(3):
        batch = jax.device_put(next(src), trainer.batch_shard)
        trainer.state, metrics = trainer._step(
            trainer.state, batch, trainer.lpips_params
        )
    vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert all(_np.isfinite(v) for v in vals.values()), vals
    d1 = jax.device_get(trainer.state.d_params)
    g1 = jax.device_get(trainer.state.g_params)

    def moved(a, b):
        return any(
            float(_np.abs(_np.asarray(x) - _np.asarray(y)).max()) > 0
            for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        )

    assert moved(g0, g1) and moved(d0, d1)
    # the temporal mixers specifically received gradient
    mix_moved = any(
        float(_np.abs(_np.asarray(x) - _np.asarray(y)).max()) > 0
        for k in d0 if k.startswith("tmix")
        for x, y in zip(
            jax.tree_util.tree_leaves(d0[k]), jax.tree_util.tree_leaves(d1[k])
        )
    )
    assert mix_moved
