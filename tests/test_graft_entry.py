"""The driver contract: import __graft_entry__ exactly like the driver does
and prove both entry points work — in particular that ``dryrun_multichip(8)``
passes even when the calling process cannot host 8 devices (the round-1
failure mode: the driver imports on an already-initialized 1-chip TPU
backend; MULTICHIP_r01.json was ok=false)."""

import importlib.util
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_graft_entry():
    # the driver imports the module by path from the repo root
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

def test_entry_compiles_single_device():
    g = _load_graft_entry()
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compile() is not None


def test_dryrun_multichip_in_process(eight_devices):
    """With >= 8 devices already present (this suite's CPU conftest), the
    dryrun runs in-process."""
    g = _load_graft_entry()
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_bootstrap():
    """The driver path: the calling backend cannot provide 8 devices, so the
    dryrun must self-bootstrap a virtual 8-device CPU backend in a
    subprocess. force_subprocess=True simulates the 1-chip-TPU driver."""
    g = _load_graft_entry()
    g.dryrun_multichip(8, force_subprocess=True)


def test_dryrun_subprocess_env_is_self_contained():
    """The subprocess must force its own XLA_FLAGS/JAX_PLATFORMS rather than
    inherit the caller's (which may carry TPU-oriented flags)."""
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    assert "--xla_force_host_platform_device_count=" in src
    assert "JAX_PLATFORMS" in src
