"""Probe which MXU-fattening geometries Mosaic actually lowers (VERDICT r4
#5): the round-4 Pallas conv3d lost because its (m,Ci)@(Ci,Co) dots fill
≤25% of the MXU at Ci=Co=64, and the straightforward im2col fix — lane-dim
concat of shifted windows — is rejected by Mosaic ("result/input offset
mismatch on non-concat dimension"). Before building another kernel, this
script compile-tests each candidate geometry in a minimal pallas_call on the
real TPU and reports lowered/failed + numerics vs a numpy reference.

Candidates:
  A  fat-N flat:    (m,64)@(64,192) then lane slices at 64-offset
  B  fat-N rank-3:  dot_general (m,64)@(64,3,64) -> (m,3,64), major-dim index
  C  multi-contraction: (9,m,64)x(9,64,64) contracting ((0,2),(0,1))
  D  sublane-concat transposed: 2x transpose (m,64)->(64,m), concat axis 0
     -> (128,m); dot_general ((0),(0)) vs (128,64)
  E  lane-concat (the known-rejected im2col form, as a control)

Run:  python tools/probe_mosaic_geometry.py            (real TPU)
      python tools/probe_mosaic_geometry.py --interpret (CPU semantics only)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import traceback

# --interpret must NOT touch the TPU (one client at a time; interpret-mode
# pallas runs as plain jax ops on the live backend): force CPU before jax
# initializes a backend.
if "--interpret" in sys.argv:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
    )

import numpy as np

import jax

if "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, CO = 256, 64, 64


def _run(name, kernel_fn, out_shape, inputs, expect, interpret):
    try:
        fn = pl.pallas_call(kernel_fn, out_shape=out_shape, interpret=interpret)
        got = jax.jit(fn)(*inputs)
        got = np.asarray(got)
        ok = np.allclose(got, expect, rtol=2e-2, atol=2e-2)
        print(f"  {name}: LOWERED, numerics {'OK' if ok else 'WRONG'} "
              f"(max abs err {np.abs(got - expect).max():.2e})")
        return ok
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"  {name}: FAILED — {msg}")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    interpret = args.interpret

    rng = np.random.RandomState(0)
    x = rng.randn(M, K).astype(np.float32)
    w3 = rng.randn(K, 3, CO).astype(np.float32)
    x9 = rng.randn(9, M, K).astype(np.float32)
    w9 = rng.randn(9, K, CO).astype(np.float32)
    x2 = rng.randn(2, M, K).astype(np.float32)
    w2 = rng.randn(2 * K, CO).astype(np.float32)

    print(f"backend: {jax.default_backend()}, interpret={interpret}")

    # A: flat fat-N + 64-offset lane slices
    def ka(x_ref, w_ref, o_ref):
        res = jnp.dot(x_ref[...], w_ref[...].reshape(K, 3 * CO),
                      preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        o_ref[...] = (res[:, 0:CO] + res[:, CO:2 * CO] + res[:, 2 * CO:3 * CO])

    exp_a = (x @ w3.reshape(K, 3 * CO)).reshape(M, 3, CO).sum(1)
    _run("A fat-N flat + 64-lane slices", ka,
         jax.ShapeDtypeStruct((M, CO), jnp.float32), (x, w3), exp_a, interpret)

    # B: rank-3 rhs dot_general -> (m, 3, co), major-dim indexing
    def kb(x_ref, w_ref, o_ref):
        res = jax.lax.dot_general(
            x_ref[...], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (M, 3, CO)
        o_ref[...] = res[:, 0] + res[:, 1] + res[:, 2]

    _run("B rank-3 rhs dot_general", kb,
         jax.ShapeDtypeStruct((M, CO), jnp.float32), (x, w3), exp_a, interpret)

    # C: multi-contraction (fat-K without concat)
    def kc(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...],
            dimension_numbers=(((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    exp_c = np.einsum("kmi,kio->mo", x9, w9)
    _run("C multi-contraction fat-K", kc,
         jax.ShapeDtypeStruct((M, CO), jnp.float32), (x9, w9), exp_c, interpret)

    # D: transpose to (K, M), concat on sublanes, contract dim 0
    def kd(x_ref, w_ref, o_ref):
        xt = jnp.concatenate(
            [x_ref[0].T, x_ref[1].T], axis=0)  # (2K, M) sublane concat
        o_ref[...] = jax.lax.dot_general(
            xt, w_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    exp_d = np.concatenate([x2[0].T, x2[1].T], 0).T @ w2
    _run("D sublane-concat transposed fat-K", kd,
         jax.ShapeDtypeStruct((M, CO), jnp.float32), (x2, w2), exp_d, interpret)

    # E: lane concat (known-rejected control)
    def ke(x_ref, w_ref, o_ref):
        xcat = jnp.concatenate([x_ref[0], x_ref[1]], axis=1)  # (M, 2K) lanes
        o_ref[...] = jnp.dot(xcat, w_ref[...],
                             preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    exp_e = np.concatenate([x2[0], x2[1]], 1) @ w2
    _run("E lane-concat fat-K (control)", ke,
         jax.ShapeDtypeStruct((M, CO), jnp.float32), (x2, w2), exp_e, interpret)

    # F: the REAL im2col pattern — lane-concat of SPATIALLY SHIFTED slices of
    # one padded buffer (what round 4 hit "result/input offset mismatch" on)
    H, W = 32, 34  # padded width W, output width W-2
    xs = rng.randn(H, W, K).astype(np.float32)
    w2b = rng.randn(2 * K, CO).astype(np.float32)

    def kf(x_ref, w_ref, o_ref):
        a = x_ref[:, 0:W - 2, :].reshape(H * (W - 2), K)
        b = x_ref[:, 2:W, :].reshape(H * (W - 2), K)
        xcat = jnp.concatenate([a, b], axis=1)
        o_ref[...] = jnp.dot(xcat, w_ref[...],
                             preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    exp_f = np.concatenate(
        [xs[:, 0:W - 2].reshape(-1, K), xs[:, 2:W].reshape(-1, K)], 1) @ w2b
    _run("F shifted-slice lane-concat (r4 failure repro)", kf,
         jax.ShapeDtypeStruct((H * (W - 2), CO), jnp.float32),
         (xs, w2b), exp_f, interpret)

    # G: same, but each shifted window copied/normalized to a fresh layout
    # before the concat (optimizer may or may not fold the copy away)
    def kg(x_ref, w_ref, o_ref):
        a = x_ref[:, 0:W - 2, :].reshape(H * (W - 2), K)
        b = x_ref[:, 2:W, :].reshape(H * (W - 2), K)
        a = a + jnp.zeros_like(a)
        b = b + jnp.zeros_like(b)
        xcat = jnp.concatenate([a, b], axis=1)
        o_ref[...] = jnp.dot(xcat, w_ref[...],
                             preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    _run("G shifted-slice lane-concat + copy normalize", kg,
         jax.ShapeDtypeStruct((H * (W - 2), CO), jnp.float32),
         (xs, w2b), exp_f, interpret)

    # H: the FULL conv3d im2col geometry at the 16f/128px level's shapes —
    # bf16, 9 shifted windows of a (bh+2, W+2, Ci) padded strip concat'd on
    # lanes to (bh*W, 9*Ci), one (bh*W, 9Ci)@(9Ci, Co) dot
    bh, Wf, Ci = 32, 128, 64
    xh = rng.randn(bh + 2, Wf + 2, Ci).astype(np.float32)
    wh = rng.randn(9 * Ci, CO).astype(np.float32)

    def kh(x_ref, w_ref, o_ref):
        xp = x_ref[...].astype(jnp.bfloat16)
        wins = [
            xp[dh:dh + bh, dw:dw + Wf, :].reshape(bh * Wf, Ci)
            for dh in range(3) for dw in range(3)
        ]
        xcat = jnp.concatenate(wins, axis=1)  # (bh*Wf, 9*Ci)
        o_ref[...] = jnp.dot(
            xcat, w_ref[...].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    xb = xh.astype(np.float32)  # expectation in bf16-rounded space
    import jax.numpy as _j
    xq = np.asarray(_j.asarray(xh, _j.bfloat16), np.float32)
    wq = np.asarray(_j.asarray(wh, _j.bfloat16), np.float32)
    wins_np = [
        xq[dh:dh + bh, dw:dw + Wf, :].reshape(bh * Wf, Ci)
        for dh in range(3) for dw in range(3)
    ]
    exp_h = np.concatenate(wins_np, 1) @ wq
    _run("H full im2col 9-window bf16 (kernel geometry)", kh,
         jax.ShapeDtypeStruct((bh * Wf, CO), jnp.float32),
         (xh, wh), exp_h, interpret)


if __name__ == "__main__":
    main()
