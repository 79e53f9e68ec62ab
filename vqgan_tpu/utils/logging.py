"""Observability: wandb when available, JSONL + console always.

The reference logs scalars to wandb every 5 steps, per-200-step "stepwise"
keys, image grids at eval cadence, and mirrors a formatted line to a stdlib
logger (vae_trainer.py:400-420, 712-800, 892-901). wandb is not installed in
this image, so the logger degrades to a JSONL metrics file plus the console
mirror; the wandb surface is kept behind the same interface.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


class MetricLogger:
    def __init__(
        self,
        run_name: str,
        project_name: str,
        config: Optional[dict] = None,
        use_wandb: bool = True,
        out_dir: str = ".",
        is_master: bool = True,
    ):
        self.is_master = is_master
        self.wandb = None
        self._file = None
        self.logger = logging.getLogger("vqgan_tpu")
        self.logger.setLevel(logging.INFO)
        if not is_master:
            return
        if not self.logger.handlers:
            handler = logging.StreamHandler()
            handler.setFormatter(
                logging.Formatter(
                    "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
                )
            )
            self.logger.addHandler(handler)
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project_name, name=run_name, config=config or {})
                self.wandb = wandb
            except Exception:
                self.wandb = None
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, f"metrics_{run_name}.jsonl")
        self._file = open(self._path, "a")
        if config:
            self._file.write(
                json.dumps({"_config": config, "_ts": time.time()}) + "\n"
            )
            self._file.flush()

    def log(self, metrics: Dict, step: int):
        if not self.is_master:
            return
        flat = {}
        for k, v in metrics.items():
            fv = _to_float(v)
            if fv is not None and np.isfinite(fv):
                flat[k] = fv
        if self.wandb is not None:
            self.wandb.log(flat, step=step)
        if self._file is not None:
            self._file.write(json.dumps({"step": step, **flat}) + "\n")
            self._file.flush()

    def log_images(self, images: Dict[str, np.ndarray], step: int, out_dir: str):
        """images: name → (H, W, 3) float in [0,1]. Saved as PNG; also sent
        to wandb when available (vae_trainer.py:892-901)."""
        if not self.is_master:
            return
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        for name, arr in images.items():
            img = Image.fromarray(
                (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            )
            path = os.path.join(out_dir, f"{name}_step{step}.png")
            img.save(path)
            if self.wandb is not None:
                self.wandb.log({name: [self.wandb.Image(img)]}, step=step)

    def info(self, msg: str):
        if self.is_master:
            self.logger.info(msg)

    def close(self):
        if self._file is not None:
            self._file.close()
