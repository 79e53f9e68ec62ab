"""PyTorch ↔ JAX checkpoint conversion for the VAE families.

The reference saves weights-only ``vae.state_dict()`` files with DDP-prefixed
keys (vae_trainer.py:903-910) and loads them back stripping the torch.compile
``_orig_mod.`` prefix (vae_trainer.py:505-513). This module maps those
state_dicts into our NHWC flax param trees (and back), which is what unlocks
recon-parity tests against the published AuraEquiVAE artifact
(README.hf.md:5) and staged-training continuation from reference checkpoints
(launcher.sh:22-24).

Key mapping (see models/ae.py naming):
  torch ``encoder.down.0.block.1.conv1.weight`` (OIHW)
    → params["encoder"]["down_0"]["block_1"]["conv1"]["kernel"] (HWIO)
  torch ``encoder.mid.block_1.norm1.weight`` → [...]["mid_block_1"]["norm1"]["scale"]
  torch ``decoder.up.2.upsample.conv.bias`` → [...]["up_2"]["upsample"]["conv"]["bias"]
  Conv3d OIDHW → DHWIO for the 3D family.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_STRIP_PREFIXES = ("module.", "_orig_mod.")
_NORM_NAMES = {"norm", "norm1", "norm2", "norm_out"}


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _normalize_key(key: str) -> str:
    """Strip DDP/compile prefixes anywhere in the dotted path."""
    parts = [p for p in key.split(".") if p not in ("module", "_orig_mod")]
    return ".".join(parts)


def _structural_path(key: str) -> list[str]:
    """Convert torch dotted path to our flax module path tokens."""
    tokens = _normalize_key(key).split(".")
    out: list[str] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        # list indices merge into the preceding name: down.0 → down_0
        if i + 1 < len(tokens) and tokens[i + 1].isdigit() and t in (
            "down", "up", "block", "attn"
        ):
            out.append(f"{t}_{tokens[i+1]}")
            i += 2
            continue
        # mid.block_1 → mid_block_1 ; mid.attn_1 → mid_attn_1
        if t == "mid" and i + 1 < len(tokens):
            out.append(f"mid_{tokens[i+1]}")
            i += 2
            continue
        out.append(t)
        i += 1
    return out


def torch_state_dict_to_params(state_dict: Dict[str, "object"]) -> dict:
    """Convert a reference VAE/TVAE state_dict into a nested flax param dict."""
    params: dict = {}
    for key, value in state_dict.items():
        v = _to_np(value)
        path = _structural_path(key)
        *mods, leaf = path
        parent = mods[-1] if mods else ""
        if leaf == "weight":
            if v.ndim == 4:  # Conv2d OIHW → HWIO
                leaf_name, arr = "kernel", v.transpose(2, 3, 1, 0)
            elif v.ndim == 5:  # Conv3d OIDHW → DHWIO
                leaf_name, arr = "kernel", v.transpose(2, 3, 4, 1, 0)
            elif v.ndim == 1 and parent in _NORM_NAMES:
                leaf_name, arr = "scale", v
            else:
                leaf_name, arr = "kernel", v
        elif leaf == "bias":
            leaf_name, arr = "bias", v
        else:  # buffers (e.g. counters) — skip
            continue
        node = params
        for m in mods:
            node = node.setdefault(m, {})
        node[leaf_name] = arr.astype(np.float32)
    return params


def params_to_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax param tree → reference-style state_dict (numpy
    values; caller may wrap in torch tensors for torch.save)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node: dict, flax_path: list[str]):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, flax_path + [k])
            else:
                out[_flax_to_torch_key(flax_path + [k])] = _export_leaf(
                    np.asarray(v), flax_path + [k]
                )

    walk(params, [])
    return out


def _flax_to_torch_key(path: list[str]) -> str:
    tokens: list[str] = []
    for p in path[:-1]:
        if p.startswith("mid_"):
            tokens.extend(["mid", p[len("mid_"):]])
        elif any(
            p.startswith(f"{base}_") and p[len(base) + 1:].isdigit()
            for base in ("down", "up", "block", "attn")
        ):
            base, idx = p.rsplit("_", 1)
            tokens.extend([base, idx])
        else:
            tokens.append(p)
    leaf = path[-1]
    tokens.append({"kernel": "weight", "scale": "weight"}.get(leaf, leaf))
    return ".".join(tokens)


def _export_leaf(v: np.ndarray, path: list[str]) -> np.ndarray:
    leaf = path[-1]
    if leaf == "kernel":
        if v.ndim == 4:  # HWIO → OIHW
            return v.transpose(3, 2, 0, 1)
        if v.ndim == 5:  # DHWIO → OIDHW
            return v.transpose(4, 3, 0, 1, 2)
    return v


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pt`` checkpoint into a flax param tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_params(sd)


def save_torch_checkpoint(params: dict, path: str) -> None:
    """Export flax params as a reference-compatible torch ``.pt``."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in params_to_torch_state_dict(params).items()}
    torch.save(sd, path)
