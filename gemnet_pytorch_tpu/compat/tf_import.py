"""Import TF2 GemNet checkpoints (reference `load_tfmodel`, gemnet.py:617-778).

The reference ports checkpoints from the original TensorFlow implementation;
this module provides the same bridge into this framework's flax variables.
TensorFlow is not part of the baked environment, so the reader is gated — the
name mapping itself is pure and unit-testable without TF.
"""

from __future__ import annotations

from ..config import ModelConfig


def tf_variable_names(cfg: ModelConfig) -> dict[str, tuple]:
    """Map TF checkpoint variable names (reference gemnet.py:633-778) to
    (collection, flax path or scale name, transpose) targets."""
    out: dict[str, tuple] = {
        "rbf_basis/frequencies": ("params", ("frequencies",), False),
        "atom_emb/embeddings": ("params", ("atom_emb", "embeddings"), False),
        "edge_emb/dense/kernel": ("params", ("edge_emb", "dense", "Dense_0", "kernel"), False),
    }
    shared = ["mlp_cbf3", "mlp_rbf3", "mlp_rbf_h", "mlp_rbf_out"]
    if not cfg.triplets_only:
        shared += ["mlp_rbf4", "mlp_cbf4", "mlp_sbf4"]
    for layer in shared:
        if layer in ("mlp_cbf3", "mlp_sbf4"):
            out[f"{layer}/kernel"] = ("params", (layer, "weight"), False)
        else:
            out[f"{layer}/kernel"] = ("params", (layer, "Dense_0", "kernel"), False)

    for i in range(cfg.num_blocks):
        base = f"int_blocks_{i}"
        if not cfg.triplets_only:
            for layer in ["dense_db", "mlp_rbf", "mlp_cbf", "down_projection",
                          "up_projection_ca", "up_projection_ac"]:
                out[f"int_blocks/{i}/quad_interaction/{layer}/kernel"] = (
                    "params", (base, "quad_interaction", layer, "Dense_0", "kernel"), False)
            out[f"int_blocks/{i}/quad_interaction/mlp_sbf/kernel"] = (
                "params", (base, "quad_interaction", "mlp_sbf", "weight"), False)
            for tf_name, scale in [("rbf", "had_rbf"), ("cbf", "had_cbf"),
                                   ("sbf_sum", "sum_sbf")]:
                out[f"int_blocks/{i}/quad_interaction/scale_{tf_name}/scale_factor"] = (
                    "scales", f"QuadInteraction_{i + 1}_{scale}", False)
        for layer in ["dense_ba", "mlp_rbf", "down_projection",
                      "up_projection_ac", "up_projection_ca"]:
            out[f"int_blocks/{i}/trip_interaction/{layer}/kernel"] = (
                "params", (base, "trip_interaction", layer, "Dense_0", "kernel"), False)
        out[f"int_blocks/{i}/trip_interaction/mlp_cbf/kernel"] = (
            "params", (base, "trip_interaction", "mlp_cbf", "weight"), False)
        for tf_name, scale in [("rbf", "had_rbf"), ("cbf_sum", "sum_cbf")]:
            out[f"int_blocks/{i}/trip_interaction/scale_{tf_name}/scale_factor"] = (
                "scales", f"TripInteraction_{i + 1}_{scale}", False)
        out[f"int_blocks/{i}/atom_update/dense_rbf/kernel"] = (
            "params", (base, "atom_update", "dense_rbf", "Dense_0", "kernel"), False)
        out[f"int_blocks/{i}/atom_update/scale_sum/scale_factor"] = (
            "scales", f"AtomUpdate_{i + 1}_sum", False)
        out[f"int_blocks/{i}/atom_update/layers/0/kernel"] = (
            "params", (base, "atom_update", "dense_0", "Dense_0", "kernel"), False)
        for j in range(1, cfg.num_atom + 1):
            for k in range(2):
                out[f"int_blocks/{i}/atom_update/layers/{j}/dense_mlp/layer_with_weights-{k}/kernel"] = (
                    "params", (base, "atom_update", f"res_{j-1}", f"dense_{k}", "Dense_0", "kernel"), False)
        out[f"int_blocks/{i}/concat_layer/dense/kernel"] = (
            "params", (base, "concat_layer", "dense", "Dense_0", "kernel"), False)
        out[f"int_blocks/{i}/dense_ca/kernel"] = (
            "params", (base, "dense_ca", "Dense_0", "kernel"), False)
        for stack, flax_stack, count in [
            ("layers_before_skip", "res_bef_skip", cfg.num_before_skip),
            ("layers_after_skip", "res_aft_skip", cfg.num_after_skip),
            ("residual_m", "res_m", cfg.num_concat),
        ]:
            for j in range(count):
                for k in range(2):
                    out[f"int_blocks/{i}/{stack}/{j}/dense_mlp/layer_with_weights-{k}/kernel"] = (
                        "params", (base, f"{flax_stack}_{j}", f"dense_{k}", "Dense_0", "kernel"), False)

    for i in range(cfg.num_blocks + 1):
        base = f"out_blocks_{i}"
        out[f"out_blocks/{i}/dense_rbf/kernel"] = (
            "params", (base, "dense_rbf", "Dense_0", "kernel"), False)
        out[f"out_blocks/{i}/layers/0/kernel"] = (
            "params", (base, "dense_0", "Dense_0", "kernel"), False)
        for j in range(1, cfg.num_atom + 1):
            for k in range(2):
                out[f"out_blocks/{i}/layers/{j}/dense_mlp/layer_with_weights-{k}/kernel"] = (
                    "params", (base, f"res_{j-1}", f"dense_{k}", "Dense_0", "kernel"), False)
        out[f"out_blocks/{i}/out_energy/kernel"] = (
            "params", (base, "out_energy", "Dense_0", "kernel"), False)
        out[f"out_blocks/{i}/scale_sum/scale_factor"] = ("scales", f"OutBlock_{i}_sum", False)
        if cfg.direct_forces:
            out[f"out_blocks/{i}/out_forces/kernel"] = (
                "params", (base, "out_forces", "Dense_0", "kernel"), False)
            # NOTE: the reference's load_tfmodel also copies
            # out_blocks/i/out_forces/bias (gemnet.py:764), but its own
            # constructor builds out_forces with bias=False
            # (atom_update_block.py:137-141) — that copy would crash there.
            # The bias-free head is authoritative; the TF bias is skipped.
            out[f"out_blocks/{i}/seq_forces/0/kernel"] = (
                "params", (base, "force_dense_0", "Dense_0", "kernel"), False)
            out[f"out_blocks/{i}/scale_rbf/scale_factor"] = ("scales", f"OutBlock_{i}_had", False)
            for j in range(1, cfg.num_atom + 1):
                for k in range(2):
                    out[f"out_blocks/{i}/seq_forces/{j}/dense_mlp/layer_with_weights-{k}/kernel"] = (
                        "params", (base, f"force_res_{j-1}", f"dense_{k}", "Dense_0", "kernel"), False)
    return out


def apply_tf_variables(get_tensor, cfg: ModelConfig, variables: dict) -> dict:
    """Load TF-named tensors into flax variables via a tensor-fetching
    callable — the pure apply path of `load_tf_checkpoint`, testable without
    TensorFlow (tests/test_compat.py feeds it a synthetic npz fixture).

    get_tensor(tf_name) -> np.ndarray for names from `tf_variable_names`
    (WITHOUT the '/.ATTRIBUTES/VARIABLE_VALUE' suffix). TF kernels are
    already (in, out) — the flax layout — so no transposes are needed
    (the reference transposes them INTO torch's (out, in), gemnet.py:628-630).
    """
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.scaling import set_scale_by_name

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    scales = variables.get("scale_factors", {})
    for tf_name, (collection, target, _) in tf_variable_names(cfg).items():
        value = get_tensor(tf_name)
        if collection == "scales":
            scales = set_scale_by_name(scales, target, float(value))
            continue
        node = params
        for part in target[:-1]:
            node = node[part]
        assert node[target[-1]].shape == tuple(np.shape(value)), (tf_name, target)
        node[target[-1]] = np.asarray(value)
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    if scales:
        out["scale_factors"] = scales
    return out


def load_tf_checkpoint(path: str, cfg: ModelConfig, variables: dict) -> dict:
    """Read a TF2 checkpoint and load it into flax variables
    (reference `load_tfmodel`, gemnet.py:617-778)."""
    try:
        import tensorflow as tf  # noqa: F811
    except ImportError as e:
        raise ImportError(
            "tensorflow is not installed in this environment; "
            "use compat.torch_import for .pth checkpoints instead"
        ) from e

    reader = tf.train.load_checkpoint(path)
    return apply_tf_variables(
        lambda name: reader.get_tensor(f"{name}/.ATTRIBUTES/VARIABLE_VALUE"),
        cfg, variables,
    )
