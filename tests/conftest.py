import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
# without TPU hardware; set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
