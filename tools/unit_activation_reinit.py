"""muP-style unit-activation weight-init calibrator.

JAX rebuild of the reference's standalone tool
(unit_activation_reinitializer.py:9-110): measure per-layer activation
standard deviations on one batch, then iteratively rescale each conv kernel
so its output has ~unit std, starting from a muP 1/sqrt(fan_in) init.

The reference uses torch forward hooks; the JAX equivalent is flax's
``capture_intermediates`` — every module's output is recorded functionally in
one forward pass, no hooks or mutation.

Usage:
    from tools.unit_activation_reinit import adjust_weight_init
    params, report = adjust_weight_init(model, params, batch, rngs, tol=0.1)
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def mup_reinit(params: Dict, rng: jax.Array) -> Dict:
    """Re-draw every conv/dense kernel as N(0, 1/fan_in) (muP starting point,
    reference unit_activation_reinitializer.py:74-87); biases zeroed."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for i, (path, leaf) in enumerate(flat):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 2:
            fan_in = 1
            for d in leaf.shape[:-1]:
                fan_in *= d
            k = jax.random.fold_in(rng, i)
            leaves.append(
                jax.random.normal(k, leaf.shape, leaf.dtype) / jnp.sqrt(fan_in)
            )
        elif name == "bias":
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def compute_activation_std(
    model, params: Dict, batch: jax.Array, rngs: Dict
) -> Dict[Tuple[str, ...], float]:
    """Per-module output std on one batch via capture_intermediates
    (the functional equivalent of the reference's forward hooks,
    unit_activation_reinitializer.py:9-57)."""
    _, state = model.apply(
        {"params": params},
        batch,
        rngs=rngs,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    out: Dict[Tuple[str, ...], float] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "__call__":
                    val = v[0]
                    if hasattr(val, "shape") and getattr(val, "size", 0) > 1:
                        out[tuple(path)] = float(
                            jnp.std(val.astype(jnp.float32))
                        )
                else:
                    walk(v, path + [k])

    walk(state["intermediates"], [])
    return out


def _get_node(params: Dict, path: Tuple[str, ...]):
    node = params
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def adjust_weight_init(
    model,
    params: Dict,
    batch: jax.Array,
    rngs: Dict,
    tol: float = 0.1,
    max_iters: int = 10,
    use_mup_start: bool = True,
    rng: jax.Array | None = None,
    verbose: bool = False,
) -> Tuple[Dict, Dict[str, Dict[str, float]]]:
    """Iteratively rescale conv kernels toward unit activation std
    (reference unit_activation_reinitializer.py:60-110).

    Returns (adjusted params, report {layer: {before, after, final_act_std}}).
    """
    if use_mup_start:
        params = mup_reinit(params, rng or jax.random.PRNGKey(0))
    initial = compute_activation_std(model, params, batch, rngs)
    report = {
        "/".join(p): {"initial_act_std": s} for p, s in initial.items()
    }
    for it in range(max_iters):
        stds = compute_activation_std(model, params, batch, rngs)
        worst = 0.0
        for path, act_std in stds.items():
            node = _get_node(params, path)
            if not (isinstance(node, dict) and "kernel" in node):
                continue  # only rescale parametric (conv/dense) layers
            if act_std <= 0:
                continue
            dev = abs(act_std - 1.0)
            worst = max(worst, dev)
            if dev > tol:
                node["kernel"] = node["kernel"] / act_std
        if verbose:
            print(f"iter {it}: worst |std-1| = {worst:.3f}", file=sys.stderr)
        if worst <= tol:
            break
    final = compute_activation_std(model, params, batch, rngs)
    for p, s in final.items():
        key = "/".join(p)
        if key in report:
            report[key]["final_act_std"] = s
    return params, report


if __name__ == "__main__":
    import os

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vqgan_tpu.config import VAEConfig
    from vqgan_tpu.models.ae import init_vae_params

    cfg = VAEConfig(
        resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=8,
        enc_dtype="float32", dec_dtype="float32",
    )
    model, params = init_vae_params(cfg, jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    rngs = {"sample": jax.random.PRNGKey(2)}
    params, report = adjust_weight_init(
        model, params, batch, rngs, tol=0.1, max_iters=8, verbose=True
    )
    for layer, stats in sorted(report.items()):
        if "final_act_std" in stats:
            print(
                f"{layer}: {stats['initial_act_std']:.3f} -> {stats['final_act_std']:.3f}"
            )
