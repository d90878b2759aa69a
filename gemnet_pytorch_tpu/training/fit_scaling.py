"""Activation-variance scaling-factor fitting.

Functional rebuild of the reference's AutomaticFit/AutoScaleFit state machine
(gemnet/model/layers/scaling.py:7-147) and fit_scaling.py driver: factors are
fitted one at a time, in module-creation order; for each factor N batches are
run through the model, masked variance statistics Var(x_ref)/Var(y) are
accumulated (sown into the `scale_stats` collection by
models.layers.ScalingFactor), and the factor is multiplied by
sqrt(Var_in/Var_out). Results stream to the same scaling_factors.json schema.
"""

from __future__ import annotations

import logging
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gemnet import GemNet, energy_and_forces
from ..models.layers import STATS_COLLECTION
from ..models.scaling import (
    scale_names_in_creation_order,
    scales_to_dict,
    set_scale_by_name,
)
from ..utils.jsonio import update_json, write_json


def _find_stat(tree, name):
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == name:
                # sown leaves are tuples of accumulated values
                return v[0] if isinstance(v, (tuple, list)) else v
            found = _find_stat(v, name)
            if found is not None:
                return found
    return None


def fit_scaling_factors(
    model: GemNet,
    variables: dict,
    batch_iter: Iterator[dict],
    n_batches: int = 25,
    scale_file: str | None = None,
    comment: str = "GemNet",
    skip_fitted: bool = False,
    overwrite_file: bool = True,
) -> dict:
    """Fit all scale factors; returns the updated variables dict.

    skip_fitted: only fit factors still at their initial value of 1.0
    (reference overwrite_mode=2, fit_scaling.py:81-92).
    overwrite_file: re-initialize the json before fitting.
    """
    cfg = model.config
    names = scale_names_in_creation_order(cfg)
    scales = variables.get("scale_factors", {})
    params = variables["params"]

    if scale_file and overwrite_file:
        write_json(scale_file, {"comment": comment})

    @jax.jit
    def stats_step(params, scales, batch):
        vars_ = {"params": params, "scale_factors": scales}
        _, _, aux = energy_and_forces(
            model, vars_, batch, mutable=(STATS_COLLECTION,)
        )
        return aux[STATS_COLLECTION]

    current = scales_to_dict(scales)
    for name in names:
        if skip_fitted and abs(current.get(name, 1.0) - 1.0) > 1e-12:
            logging.info("skip already-fitted %s", name)
            continue
        acc = np.zeros(3, dtype=np.float64)
        for _ in range(n_batches):
            batch = {k: jnp.asarray(v) for k, v in next(batch_iter).items()}
            stats = stats_step(params, scales, batch)
            stat = _find_stat(stats, name)
            assert stat is not None, f"no stats sown for {name}"
            acc += np.asarray(stat, dtype=np.float64)
        var_in, var_out, n = acc
        if var_in == 0:
            raise ValueError(f"did not track variable {name}")
        ratio = var_out / var_in
        value = np.sqrt(1.0 / ratio).astype(np.float32)
        old = scales_to_dict(scales).get(name, 1.0)
        new = float(old * value)
        logging.info(
            "%s: Var_in=%.3f Var_out=%.3f ratio=%.3f -> scale=%.3f",
            name, var_in / n, var_out / n, ratio, new,
        )
        scales = set_scale_by_name(scales, name, new)
        if scale_file:
            update_json(scale_file, {name: new})

    out = dict(variables)
    out["scale_factors"] = scales
    return out
