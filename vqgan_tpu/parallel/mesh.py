"""Distributed runtime (L1): mesh construction and sharding rules.

The reference's L1 is torchrun + DDP/NCCL with explicit all_reduce
(vae_trainer.py:391-397, 56-60). The TPU-native equivalent is declarative:

  - one ``jax.sharding.Mesh`` over all chips with named axes
    ("data", "fsdp", "tensor"),
  - the global batch sharded over ("data", "fsdp"),
  - parameters replicated over "data", sharded over "fsdp" (ZeRO-style — the
    optimizer state shards with them) and over "tensor" along channel dims
    where divisible,
  - gradients/metrics reduced by XLA-inserted collectives over ICI; there is
    no hand-written NCCL anywhere.

The reference's quirk of *not* synchronizing generator gradients (generator
forward bypasses its DDP wrapper, vae_trainer.py:538,624 — params drift per
rank) is deliberately not reproduced: under global-batch pjit the generator
update is correct data parallelism by construction (SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor", "context")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime init — the torchrun equivalent.

    On a TPU pod every host runs this same program;
    ``jax.distributed.initialize()`` wires the coordination service so
    ``jax.devices()`` spans the whole slice and ``jax.process_index()``
    drives the per-host data split (data/tar_stream.py). Triggered by the
    standard coordinator env vars, explicit arguments, or
    VQGAN_TPU_MULTIHOST=1 (auto-calling it unconditionally breaks
    single-host setups whose images set TPU worker env vars, like this one).

    Explicit coordinates may come from the args or from
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the
    torchrun-style launch contract; on a real pod the TPU autodetection
    needs none of them. Works for CPU process clusters too (Gloo
    collectives), which is how tests/test_multiprocess.py runs the real
    2-process data-parallel contract without TPU hardware.
    """
    import os

    # NOTE: must not touch jax.devices()/process_count() here — any backend
    # query initializes XLA and makes distributed.initialize impossible
    if jax.distributed.is_initialized():
        return  # already initialized by the launcher
    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        ) or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    triggers = (
        "MEGASCALE_COORDINATOR_ADDRESS",
    )
    if (
        coordinator_address is not None
        or os.environ.get("VQGAN_TPU_MULTIHOST") == "1"
        or any(v in os.environ for v in triggers)
    ):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except Exception as e:  # pragma: no cover
            import logging

            logging.getLogger("vqgan_tpu").warning(
                f"jax.distributed.initialize() failed: {e}; continuing single-host"
            )


def split_dcn_axes(
    shape: Dict[str, int], n_slices: int
) -> tuple[Dict[str, int], Dict[str, int]]:
    """Factor an axis dict into per-slice (ICI) and cross-slice (DCN)
    extents for a multi-slice TPU job.

    DCN links are orders of magnitude slower than ICI, so only the
    gradient all-reduce should cross them: all cross-slice parallelism is
    placed on the first data-like axis whose extent divides by the slice
    count ("data" preferred, then "fsdp"); tensor/context axes — whose
    collectives run inside every layer — always stay intra-slice. This is
    the standard DCN-outermost recipe (jax-ml scaling book; equivalently
    mesh_utils.create_hybrid_device_mesh's contract).
    """
    dcn = {k: 1 for k in shape}
    if n_slices == 1:
        return dict(shape), dcn
    for ax in ("data", "fsdp"):
        ext = shape.get(ax, 1)
        if ext >= n_slices and ext % n_slices == 0:
            ici = dict(shape)
            ici[ax] = ext // n_slices
            dcn[ax] = n_slices
            return ici, dcn
    raise ValueError(
        f"no data-like axis in {shape} is divisible by the {n_slices} "
        f"slices — give 'data' (or 'fsdp') an extent that is a multiple "
        f"of the slice count"
    )


def create_mesh(
    shape: Optional[Dict[str, int]] = None, devices=None
) -> Mesh:
    """Build a Mesh from an axis dict like {"data": -1} or
    {"data": 2, "fsdp": 2, "tensor": 2}; a single -1 axis absorbs the
    remaining devices. On a multi-slice job (devices spanning several ICI
    domains, e.g. DCN-connected v5e pods) the mesh is laid out
    hybrid-aware: cross-slice traffic is confined to the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = dict(shape or {"data": -1})
    fixed = math.prod(v for v in shape.values() if v > 0)
    wildcards = [k for k, v in shape.items() if v < 0]
    if wildcards:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by {fixed}")
        shape[wildcards[0]] = n // fixed
        for k in wildcards[1:]:
            shape[k] = 1
    if math.prod(shape.values()) != n:
        raise ValueError(
            f"mesh axes {shape} multiply to {math.prod(shape.values())} "
            f"but {n} device(s) are available"
        )
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    # ICI-topology-aware device ordering: mesh_utils lays the logical mesh out
    # so neighboring mesh coordinates are ICI neighbors (ring/torus locality
    # for the collectives XLA inserts); on multi-slice jobs the hybrid layout
    # additionally keeps only the data axis crossing DCN. Fall back to a
    # plain reshape off-TPU or for device subsets.
    multi_slice = len(slice_ids) > 1 and None not in slice_ids
    if multi_slice:
        # raises outside the layout fallback below: an indivisible slice
        # count is a configuration error, not a layout-heuristic failure
        ici, dcn = split_dcn_axes(shape, len(slice_ids))
    if multi_slice:
        # never fall back silently here: a slice-oblivious reshape would put
        # per-layer collectives on DCN — the exact layout split_dcn_axes
        # exists to prevent — so hybrid-layout failures must surface
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple(ici[k] for k in axis_names),
            tuple(dcn[k] for k in axis_names),
            devices=devices,
        )
        return Mesh(dev_array, axis_names)
    try:
        from jax.experimental import mesh_utils

        if len(devices) == len(jax.devices()):
            dev_array = mesh_utils.create_device_mesh(dims, devices=devices)
        else:
            dev_array = np.asarray(devices).reshape(dims)
    except Exception:
        dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names)


def _data_axes(mesh: Mesh) -> tuple:
    return tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over data-like axes; with a "context"
    axis of extent > 1, additionally shard the H (second) dim — spatial /
    sequence parallelism. GSPMD partitions every conv spatially and inserts
    the halo exchanges (and GroupNorm's cross-shard reductions) over ICI
    automatically; no hand-written collectives. Lets one image's activations
    span several chips — resolutions beyond a single chip's HBM."""
    axes = _data_axes(mesh)
    spec = [None] * ndim
    if axes:
        spec[0] = axes if len(axes) > 1 else axes[0]
    if ndim >= 3 and "context" in mesh.axis_names and mesh.shape.get("context", 1) > 1:
        spec[1] = "context"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_leaf_shape, mesh: Mesh) -> P:
    """Sharding rule for one parameter.

    Conv kernels (..., I, O): shard O over "tensor" when divisible; shard I
    over "fsdp" when divisible (ZeRO-style weight sharding — XLA all-gathers
    before use, reduce-scatters gradients). 1D params replicate.
    """
    shape = path_leaf_shape
    has_tensor = "tensor" in mesh.axis_names and mesh.shape.get("tensor", 1) > 1
    has_fsdp = "fsdp" in mesh.axis_names and mesh.shape.get("fsdp", 1) > 1
    if len(shape) < 2:
        return P()
    spec = [None] * len(shape)
    if has_tensor and shape[-1] % mesh.shape["tensor"] == 0 and shape[-1] >= 2 * mesh.shape["tensor"]:
        spec[-1] = "tensor"
    if has_fsdp and shape[-2] % mesh.shape["fsdp"] == 0 and shape[-2] >= 2 * mesh.shape["fsdp"]:
        spec[-2] = "fsdp"
    return P(*spec)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for a param tree."""
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, _param_spec(p.shape, mesh)), params
    )


def state_shardings(state, mesh: Mesh):
    """Shardings for a full TrainState: params and optimizer moments follow
    the param rule (same shapes); scalars/rng replicate."""

    def per_leaf(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 2:
            return NamedSharding(mesh, _param_spec(shape, mesh))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(per_leaf, state)


def process_batch_block(sharding: NamedSharding, global_shape) -> list:
    """This process's contiguous (start, stop) block of a sharded global
    array, per dimension.

    Used by the trainers to feed context-parallel multi-host meshes: when
    the "context" axis shards dim 1 across devices, each host must supply
    exactly its addressable box of the global batch to
    ``jax.make_array_from_process_local_data`` — hosts in the same
    batch-row block load the SAME samples and contribute their dim-1 slice.
    Raises if this process's shards do not form one contiguous box (no such
    mesh layout is produced by create_mesh, but a custom device order
    could)."""
    global_shape = tuple(global_shape)
    imap = sharding.devices_indices_map(global_shape)
    local = [imap[d] for d in sharding.addressable_devices]

    def bounds(sl, n):
        return (sl.start or 0, n if sl.stop is None else sl.stop)

    ndim = len(global_shape)
    per_dim = [
        sorted({bounds(s[i], global_shape[i]) for s in local})
        for i in range(ndim)
    ]
    n_combos = 1
    for p in per_dim:
        n_combos *= len(p)
    distinct = {
        tuple(bounds(s[i], global_shape[i]) for i in range(ndim))
        for s in local
    }
    if n_combos != len(distinct):
        raise ValueError(
            f"process shards do not form a box: {sorted(distinct)}"
        )
    out = []
    for i, p in enumerate(per_dim):
        lo = p[0][0]
        for a, b in p:
            if a != lo:
                raise ValueError(
                    f"process shards not contiguous along dim {i}: {p}"
                )
            lo = b
        out.append((p[0][0], lo))
    return out
