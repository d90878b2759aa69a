"""gemnet_pytorch_tpu — a TPU-native framework for the GemNet directional GNN family.

This is a from-scratch JAX/XLA/Pallas implementation of the capabilities of the
PyTorch reference TUM-DAML/gemnet_pytorch (GemNet-T/dT/Q/dQ molecular energy +
force prediction), re-designed for TPU:

- static, padded/bucketed batch shapes so XLA compiles a handful of programs,
- the sparse atom/edge/triplet/quadruplet aggregations expressed as masked
  segment-sums and MXU-friendly batched contractions (with Pallas kernels for
  the hot paths),
- force prediction both via direct edge-vector heads and via `jax.grad` of the
  energy,
- an optax training stack (AdamW/Adam split, warmup-exponential + plateau LR,
  EMA evaluation, orbax checkpoints),
- multi-chip scaling via `jax.sharding.Mesh` + shard_map data parallelism.

Reference parity is tracked per layer in `tests/` against /root/reference.
"""

__version__ = "0.1.0"

from .config import ModelConfig, TrainConfig, load_yaml_config  # noqa: F401
