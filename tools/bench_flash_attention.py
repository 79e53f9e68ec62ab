"""Microbenchmark + block-size sweep for the Pallas flash-attention kernel.

Runs the long-clip mid-block geometry (default B=1, N=49152, H=8, D=32 —
48f/256px TVAE) through ops/flash_attention.py with different kernel tile
sizes, against the lax chunked scan, and prints one JSON line per variant.
Used to pick the _BLOCK_*_CAP defaults (BASELINE.md records results).

    python tools/bench_flash_attention.py --sweep
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import click

    @click.command()
    @click.option("--b", type=int, default=1)
    @click.option("--n", type=int, default=49152)
    @click.option("--h", type=int, default=8)
    @click.option("--d", type=int, default=32)
    @click.option("--reps", type=int, default=3)
    @click.option("--sweep", is_flag=True, help="sweep q/k tile caps")
    @click.option("--with_lax", is_flag=True, help="also time the lax scan")
    def run(b, n, h, d, reps, sweep, with_lax):
        import jax
        import jax.numpy as jnp

        from vqgan_tpu.ops import flash_attention as fa

        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
        fwd_flops = 4 * b * h * n * n * d  # qk + pv
        tot_flops = fwd_flops * 3.5  # + dq/dkv recompute-heavy backward

        def timed(name, fn):
            out = fn(q, k, v)
            s = float(jnp.sum(out if not isinstance(out, tuple) else out[0]).astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(q, k, v)
                s = float(jnp.sum(out if not isinstance(out, tuple) else out[0]).astype(jnp.float32))
            dt = (time.perf_counter() - t0) / reps
            return dt

        def report(tag, fwd_s, bwd_s):
            print(json.dumps({
                "variant": tag,
                "fwd_ms": round(fwd_s * 1e3, 1),
                "fwd_bwd_ms": round(bwd_s * 1e3, 1),
                "fwd_tflops": round(fwd_flops / fwd_s / 1e12, 2),
                "fwd_bwd_tflops": round(tot_flops / bwd_s / 1e12, 2),
            }), flush=True)

        def bench_caps(bq_cap, bk_cap, bkm_cap):
            old = (fa._BLOCK_Q_CAP, fa._BLOCK_K_CAP, fa._BLOCK_K_MAJOR_CAP)
            fa._BLOCK_Q_CAP, fa._BLOCK_K_CAP, fa._BLOCK_K_MAJOR_CAP = (
                bq_cap, bk_cap, bkm_cap)
            fa._block_sizes.cache_clear()
            try:
                f = jax.jit(fa.flash_attention_tpu)
                g = jax.jit(jax.grad(
                    lambda q, k, v: jnp.sum(
                        fa.flash_attention_tpu(q, k, v).astype(jnp.float32)),
                    argnums=(0, 1, 2)))
                fwd_s = timed("fwd", f)
                bwd_s = timed("bwd", lambda *a: g(*a)[0])
                report(f"pallas q{bq_cap} k{bk_cap} kM{bkm_cap}", fwd_s, bwd_s)
            finally:
                (fa._BLOCK_Q_CAP, fa._BLOCK_K_CAP, fa._BLOCK_K_MAJOR_CAP) = old
                fa._block_sizes.cache_clear()

        if sweep:
            for caps in [(512, 512, 1024), (512, 512, 512), (256, 256, 512),
                         (1024, 512, 1024), (512, 1024, 1024),
                         (1024, 1024, 1024), (128, 128, 128)]:
                try:
                    bench_caps(*caps)
                except Exception as e:
                    print(json.dumps({"variant": str(caps), "error": str(e)}),
                          flush=True)
        else:
            bench_caps(fa._BLOCK_Q_CAP, fa._BLOCK_K_CAP, fa._BLOCK_K_MAJOR_CAP)

        if with_lax:
            from vqgan_tpu.ops.chunked_attention import chunked_attention

            f = jax.jit(lambda q, k, v: chunked_attention(q, k, v, 1024))
            g = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    chunked_attention(q, k, v, 1024).astype(jnp.float32)),
                argnums=(0, 1, 2)))
            report("lax chunk1024", timed("fwd", f),
                   timed("bwd", lambda *a: g(*a)[0]))

    run()


if __name__ == "__main__":
    main()
