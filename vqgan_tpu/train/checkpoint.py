"""Checkpointing: full train-state with Orbax, plus reference-compatible
weights-only import/export.

The reference saves weights-only state_dicts on eval cadence and resumes with
``--load_path`` (vae_trainer.py:505-513, 903-910) — losing optimizer state on
every restart. Here the default is a full Orbax checkpoint of the donated
TrainState (G/D params, both optimizer states, LeCam anchors, PRNG, step) so
preemption-resume is exact; the torch-format path remains for interop with
reference checkpoints (train/torch_import.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state) -> None:
        """Async save — compute continues while the checkpoint streams out."""
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_weights_torch(g_params, path: str) -> None:
    """Reference-compatible weights-only export (interop with
    vae_trainer.py:903-910 consumers)."""
    from vqgan_tpu.train.torch_import import save_torch_checkpoint

    host_params = jax.tree_util.tree_map(np.asarray, g_params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_torch_checkpoint(host_params, path)


def load_weights(path: str) -> dict:
    """Load generator weights from either a torch .pt (reference format) or
    an orbax weights dir."""
    if path.endswith((".pt", ".pth", ".bin")):
        from vqgan_tpu.train.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
