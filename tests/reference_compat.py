"""Import helpers for the reference PyTorch modules (parity tests only).

The reference imports torchvision/webdataset/wandb, which are not installed;
we stub just enough for its *model* files (ae.py, tae.py, the wavelet part of
utils.py) to import. Nothing from the reference is executed except the model
definitions under test. Reference code is treated as untrusted data: only its
nn.Module classes are instantiated, on CPU, in-process, for golden-value
comparison.
"""

from __future__ import annotations

import sys
import types

REFERENCE_DIR = "/root/reference"


def _install_stubs():
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        # a real ModuleSpec so importlib.util.find_spec (used by
        # transformers' optional-dependency probing) doesn't choke
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        models = types.ModuleType("torchvision.models")
        models.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.models", None
        )

        def _no_vgg(*a, **k):
            raise RuntimeError("vgg16 weights unavailable in tests")

        models.vgg16 = _no_vgg
        tv.models = models
        transforms = types.ModuleType("torchvision.transforms")
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms


def import_reference_module(name: str):
    """Import ae/tae/utils from /root/reference with stubbed heavy deps."""
    _install_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    return importlib.import_module(name)
