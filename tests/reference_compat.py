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

        class _AnyTransform:
            """Placeholder transform class: vae_trainer.py instantiates
            Compose/ToTensor/Normalize/... at module scope (:95-101); parity
            tests never run the data path, so construction is enough."""

            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        def _transforms_getattr(name):  # PEP 562
            if name.startswith("__"):
                raise AttributeError(name)
            return _AnyTransform

        transforms.__getattr__ = _transforms_getattr
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms
    # wandb / webdataset: imported at vae_trainer.py module scope (:13,21),
    # used only inside train_ddp/create_dataloader which parity tests never
    # call
    for name in ("wandb", "webdataset"):
        if name not in sys.modules:
            import importlib.machinery

            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)

            def _stub_getattr(attr):
                if attr.startswith("__"):
                    raise AttributeError(attr)
                return lambda *a, **k: None

            mod.__getattr__ = _stub_getattr
            sys.modules[name] = mod


def import_reference_module(name: str):
    """Import ae/tae/utils from /root/reference with stubbed heavy deps."""
    _install_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    return importlib.import_module(name)


def make_fake_torchvision_vgg16(seed: int = 0):
    """A torch module with the exact torchvision vgg16 ``.features`` layout
    (31 entries, convs at indices 0,2,5,7,10,12,14,17,19,21,24,26,28) but
    RANDOM weights. Installing this as torchvision.models.vgg16 lets the
    reference LPIPS / PatchDiscriminator instantiate without the pretrained
    download — weight-file-free numerical parity testing (VERDICT r1 #5)."""
    import torch
    import torch.nn as nn

    layout = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")

    class FakeVGG16(nn.Module):
        def __init__(self):
            super().__init__()
            # fresh (independent) layer objects per call, identical weights —
            # torchvision semantics: every vgg16() call returns a NEW module
            # loaded with the same pretrained weights. Sharing layer objects
            # between calls would alias the LPIPS backbone with the trainable
            # discriminator backbone.
            gen = torch.Generator().manual_seed(seed)
            layers, in_ch = [], 3
            for item in layout:
                if item == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    conv = nn.Conv2d(in_ch, item, 3, padding=1)
                    with torch.no_grad():
                        conv.weight.copy_(
                            torch.randn(conv.weight.shape, generator=gen) * 0.05
                        )
                        conv.bias.copy_(
                            torch.randn(conv.bias.shape, generator=gen) * 0.01
                        )
                    layers.append(conv)
                    layers.append(nn.ReLU(inplace=True))
                    in_ch = item
            self.features = nn.Sequential(*layers)

    def factory(*args, **kwargs):
        return FakeVGG16()

    return factory


def install_random_vgg16(seed: int = 0):
    """Point the stubbed torchvision.models.vgg16 at the random-weight
    factory (instead of raising). Returns the factory for direct use."""
    _install_stubs()
    factory = make_fake_torchvision_vgg16(seed)
    sys.modules["torchvision.models"].vgg16 = factory
    sys.modules["torchvision"].models.vgg16 = factory
    return factory
