"""Loading released GemNet configurations and checkpoints.

The reference ships per-checkpoint constructor kwargs
(pretrained/GemNet-{T,Q}/model_kwargs.json) and fitted scaling factors
(pretrained/scaling_factors.json); weights come as torch .pth state dicts
(stripped from this checkout). This module loads those artifacts into this
framework: config from model_kwargs.json, scales from scaling_factors.json,
and weights through compat.torch_import when a .pth is available.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .config import ModelConfig
from .models import make_model
from .models.scaling import load_scales_from_json
from .utils.jsonio import read_json


def config_from_model_kwargs(path: str) -> ModelConfig:
    """Build a ModelConfig from a reference model_kwargs.json."""
    return ModelConfig.from_dict(read_json(path))


def load_pretrained(
    directory: str,
    sample_batch: dict,
    weights_path: Optional[str] = None,
    scale_file: Optional[str] = None,
    seed: int = 0,
):
    """(model, variables) from a reference pretrained directory.

    directory: contains model_kwargs.json (reference pretrained/GemNet-Q).
    weights_path: optional torch .pth state dict to import.
    scale_file: scaling_factors.json (defaults to the one next to the kwargs,
    then the reference's global file).
    """
    import jax.numpy as jnp

    kwargs_path = os.path.join(directory, "model_kwargs.json")
    cfg = config_from_model_kwargs(kwargs_path)
    model = make_model(cfg)
    batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(seed), batch))

    if scale_file is None:
        for cand in (
            os.path.join(directory, "scaling_factors.json"),
            os.path.join(os.path.dirname(directory), "scaling_factors.json"),
        ):
            if os.path.exists(cand):
                scale_file = cand
                break
    if scale_file:
        variables["scale_factors"] = load_scales_from_json(
            variables.get("scale_factors", {}), scale_file
        )

    if weights_path and os.path.exists(weights_path):
        import torch

        from .compat import import_reference_state_dict

        state = torch.load(weights_path, map_location="cpu")
        if "model" in state:
            state = state["model"]
        state = {k: v.numpy() for k, v in state.items()}
        variables = import_reference_state_dict(state, variables)
    return model, variables
