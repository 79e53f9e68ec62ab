"""Per-level microbench: Pallas fused-tap conv3d (k_group geometries) vs the
tap2dfat XLA lowering at each channel level of the 16f/128px 3D model
(VERDICT r4 #5 follow-through).

The end-to-end benches measure blends; this isolates WHERE each lowering
wins. The Pallas kernel's dots run K=k_group·Ci, N=Co — at Co=64 the MXU's
128 lanes are half-filled no matter what K does, while tap2dfat's fat conv
runs N=3·Co=192. At Co≥128 both fill the lanes and the kernel's ~1.5×-lower
HBM traffic should decide. This measures fwd+bwd (the training shape of the
work) per lowering per level, on the real chip.

    python tools/bench_conv3d_levels.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (label, B, T, H, W, C) — encoder level shapes of the 16f/128px bench model
# (ch=64, ch_mult 1,2,4; T and H/W halve per level), Ci=Co ResnetBlock bulk.
LEVELS = [
    ("L0_64ch_16x128", 2, 16, 128, 128, 64),
    ("L1_128ch_8x64", 2, 8, 64, 64, 128),
    ("L2_256ch_4x32", 2, 4, 32, 32, 256),
]

WARMUP = 3
ITERS = 20


def _time(fn, *args):
    fn(*args)  # compile
    for _ in range(WARMUP):
        out = fn(*args)
    _ = float(jnp.sum(out[0]).astype(jnp.float32))  # host sync (axon)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = float(jnp.sum(out[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / ITERS


def main():
    from vqgan_tpu.ops.pallas.conv3d import conv3d_ttap

    rng = np.random.RandomState(0)
    for label, b, t, h, w, c in LEVELS:
        x = jnp.asarray(rng.randn(b, t, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.02, jnp.bfloat16)
        dy = jnp.asarray(rng.randn(b, t, h, w, c), jnp.bfloat16)
        flops = 2 * 27 * c * c * b * t * h * w * 3  # fwd + dx + dk

        def fat(x, k, dy):
            def f(x, k):
                kf = jnp.transpose(k, (1, 2, 3, 0, 4)).reshape(3, 3, c, 3 * c)
                y = jax.lax.conv_general_dilated(
                    x.reshape(b * t, h, w, c), kf, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).reshape(b, t, h, w, 3 * c)
                yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                return (
                    yp[:, 0:t, :, :, 0:c]
                    + yp[:, 1 : t + 1, :, :, c : 2 * c]
                    + yp[:, 2 : t + 2, :, :, 2 * c :]
                )

            out, vjp = jax.vjp(f, x, k)
            return (jnp.sum(out),) + vjp(dy)

        def pal(x, k, dy, k_group):
            def f(x, k):
                return conv3d_ttap(x, k, False, k_group)

            out, vjp = jax.vjp(f, x, k)
            return (jnp.sum(out),) + vjp(dy)

        rec = {"level": label, "tflops_fwdbwd": round(flops / 1e12, 3)}
        dt = _time(jax.jit(fat), x, k, dy)
        rec["tap2dfat_ms"] = round(dt * 1e3, 3)
        rec["tap2dfat_tfs"] = round(flops / dt / 1e12, 1)
        for kg in (3, 9):
            try:
                dt = _time(
                    jax.jit(pal, static_argnums=(3,)), x, k, dy, kg
                )
                rec[f"pallas_kg{kg}_ms"] = round(dt * 1e3, 3)
                rec[f"pallas_kg{kg}_tfs"] = round(flops / dt / 1e12, 1)
            except Exception as e:  # noqa: BLE001 — record lowering failures
                rec[f"pallas_kg{kg}_ms"] = f"FAIL {type(e).__name__}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
