"""Microbenchmark for the Pallas VQ kernels vs the XLA formulation.

Times nearest-code search, code statistics, and the full VectorQuantizer
call at the 3D trainer's latent geometries (N tokens = B·T'·H'·W',
K codes, D = z_channels) on whichever backend is live. The XLA path
round-trips an (N, K) fp32 distance matrix (and, for EMA stats, an (N, K)
one-hot dot operand) through HBM; the Pallas kernels keep both in VMEM
(ops/pallas/vq.py). Prints one JSON line per variant.

    python tools/bench_vq.py                # default N=8192, K=16384, D=16
    python tools/bench_vq.py --n 32768 --full
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import click

    @click.command()
    @click.option("--n", type=int, default=8192, help="tokens")
    @click.option("--k", type=int, default=16384, help="codebook size")
    @click.option("--d", type=int, default=16, help="embedding dim")
    @click.option("--reps", type=int, default=3)
    @click.option("--iters", type=int, default=50,
                  help="op iterations inside ONE jitted device loop — the "
                       "tunneled per-dispatch latency (~30 ms) otherwise "
                       "swamps the op time")
    @click.option("--full", is_flag=True, help="also time the full quantizer apply (fwd+bwd)")
    def run(n, k, d, reps, iters, full):
        import jax
        import jax.numpy as jnp
        from jax import lax

        from vqgan_tpu.models.quant import VectorQuantizer
        from vqgan_tpu.ops.pallas import vq as vqops

        kz, kc = jax.random.split(jax.random.PRNGKey(0))
        z = jax.random.normal(kz, (n, d), jnp.float32)
        cb = jax.random.normal(kc, (k, d), jnp.float32)
        hbm_nk_gb = n * k * 4 / 1e9

        def timed_loop(step):
            """step: carry f32 -> carry f32, runs the op once. Times `iters`
            serialized iterations on device, synchronized by a host fetch."""

            @jax.jit
            def loop(c0):
                return lax.fori_loop(0, iters, lambda i, c: step(c), c0)

            float(loop(jnp.float32(0.0)))  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(loop(jnp.float32(0.0)))
                best = min(best, (time.perf_counter() - t0) / iters)
            return best

        for impl in ("xla", "pallas"):

            def step(c, i=impl):
                # data dependency on the carry defeats CSE across iterations
                codes = vqops.nearest_codes(z + c * 1e-38, cb, impl=i)
                return jnp.sum(codes).astype(jnp.float32) * 1e-38

            dt = timed_loop(step)
            print(json.dumps({
                "op": "nearest_codes", "impl": impl, "n": n, "k": k, "d": d,
                "ms": round(dt * 1e3, 3),
                "nk_matrix_gb": round(hbm_nk_gb, 2),
            }))

        codes0 = jax.jit(lambda zz, cc: vqops.nearest_codes(zz, cc, impl="xla"))(z, cb)
        for impl in ("xla", "pallas"):

            def step(c, i=impl):
                counts, sums = vqops.code_stats(
                    codes0 + (c * 1e-38).astype(jnp.int32), z, k,
                    with_sums=True, impl=i,
                )
                return (jnp.sum(counts) + jnp.sum(sums)).astype(jnp.float32) * 1e-38

            dt = timed_loop(step)
            print(json.dumps({
                "op": "code_stats(sums)", "impl": impl, "n": n, "k": k,
                "d": d, "ms": round(dt * 1e3, 3),
            }))

        if full:
            zz = z.reshape(1, n, 1, d)
            for impl in ("xla", "pallas"):
                vq = VectorQuantizer(
                    codebook_size=k, embedding_dim=d, ema_decay=0.0, impl=impl
                )
                variables = vq.init(jax.random.PRNGKey(1), zz)
                params = variables["params"]

                def loss(p, x, m=vq):
                    zq, aux = m.apply({"params": p}, x)
                    return jnp.sum(jnp.square(zq)) + aux["vq_loss"]

                def step(c, p=params):
                    g = jax.grad(loss)(p, zz + c * 1e-38)
                    return jnp.sum(g["codebook"]).astype(jnp.float32) * 1e-38

                dt = timed_loop(step)
                print(json.dumps({
                    "op": "quantizer fwd+bwd", "impl": impl, "n": n, "k": k,
                    "d": d, "ms": round(dt * 1e3, 3),
                }))

    main_cmd = run
    main_cmd()


if __name__ == "__main__":
    main()
