import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
# without TPU hardware; set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Silence XLA:CPU's cpu_aot_loader feature-mismatch ERROR logs: reloading ANY
# persistent-cache entry trips them because XLA bakes pseudo-features
# (+prefer-no-scatter/+prefer-no-gather) into the AOT target string and the
# loader compares it against real CPUID, which never has them — cosmetic on a
# host-keyed cache dir (the real cross-machine ISA hazard is fixed by
# _host_cpu_tag below: compile features == host features modulo the pseudo
# flags). Native FATALs and python-level compile errors still surface.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU tunnel and overrides
# JAX_PLATFORMS programmatically; pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite rebuilds near-identical GemNet
# programs across many test files, and CPU compiles of the full model are
# tens of seconds each. Shared across xdist workers and across runs
# (machine-local — gitignored). The directory is keyed by a host-CPU
# fingerprint: XLA:CPU caches AOT machine code compiled for the build host's
# exact feature set, and loading it on a different CPU trips
# cpu_aot_loader feature-mismatch errors ("could lead to execution errors
# such as SIGILL") — a workspace that migrates across machines (as this one
# does between rounds) must not reuse the old host's cache.


def _host_cpu_tag():
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    return hashlib.sha256(
        (platform.machine() + flags).encode()
    ).hexdigest()[:10]


_jax_cache = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), f".jax_cache-{_host_cpu_tag()}"
)
jax.config.update("jax_compilation_cache_dir", _jax_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_npz(tmp_path_factory):
    from gemnet_pytorch_tpu.data.synthetic import make_dataset

    path = tmp_path_factory.mktemp("data") / "synthetic.npz"
    return make_dataset(str(path), n_molecules=64, min_atoms=4, max_atoms=10, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def add_reference_shims():
    """Make /root/reference importable: shim torch_scatter + numba (absent in
    env) and legacy numpy attributes the reference relies on."""
    shim_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_shims")
    if shim_dir not in sys.path:
        sys.path.insert(0, shim_dir)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import math

    if not hasattr(np, "math"):
        np.math = math  # np.math.factorial removed in numpy>=2
    if not hasattr(np, "bool"):
        np.bool = np.bool_  # np.bool removed; used in reference data_container

    # torch>=2.7 removed the `verbose` kwarg from LR schedulers; the
    # reference's LinearWarmupExponentialDecay passes it (schedules.py:46)
    import inspect

    import torch

    sig = inspect.signature(torch.optim.lr_scheduler.LambdaLR.__init__)
    if "verbose" not in sig.parameters:
        _orig_init = torch.optim.lr_scheduler.LambdaLR.__init__

        def _init(self, optimizer, lr_lambda, last_epoch=-1, verbose=False):
            _orig_init(self, optimizer, lr_lambda, last_epoch=last_epoch)

        torch.optim.lr_scheduler.LambdaLR.__init__ = _init

    _cache_reference_sympy()


def _cache_reference_sympy():
    """Memoize the reference's sympy basis generation (memory + disk).

    `bessel_basis(7, 6)` alone costs ~13 s and every reference
    SphericalBasisLayer/TensorBasisLayer construction re-runs it
    (basis_layers.py:89-90,203-204); the parity tests build reference models
    dozens of times, dominating the suite's wall time. The formulas are pure
    functions of their int args, so a session cache is exact; the disk pickle
    additionally survives across pytest runs (best-effort: a stale/corrupt
    pickle just falls through to recomputation)."""
    import functools
    import pickle
    from pathlib import Path

    from gemnet.model.layers import basis_layers, basis_utils

    if getattr(basis_utils, "_sympy_cache_installed", False):
        return
    cache_dir = Path(__file__).resolve().parent / ".sympy_cache"

    def cached(fn):
        mem = {}

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            key = "_".join(
                [fn.__name__, *map(str, args)]
                + [f"{k}={v}" for k, v in sorted(kwargs.items())]
            )
            if key in mem:
                return mem[key]
            path = cache_dir / f"{key}.pkl"
            if path.exists():
                try:
                    mem[key] = pickle.loads(path.read_bytes())
                    return mem[key]
                except Exception:
                    pass
            val = fn(*args, **kwargs)
            mem[key] = val
            try:
                cache_dir.mkdir(exist_ok=True)
                path.write_bytes(pickle.dumps(val))
            except Exception:
                pass
            return val

        return wrapper

    bb = cached(basis_utils.bessel_basis)
    sph = cached(basis_utils.real_sph_harm)
    # patch BOTH namespaces: basis_layers binds the names at import time
    basis_utils.bessel_basis = basis_layers.bessel_basis = bb
    basis_utils.real_sph_harm = basis_layers.real_sph_harm = sph
    basis_utils._sympy_cache_installed = True
