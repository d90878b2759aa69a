#!/usr/bin/env python
"""Scaling-factor fitting driver — counterpart of the reference fit_scaling.py.

Builds the model with direct_forces=True (faster evaluation, reference
fit_scaling.py:119), streams validation batches, and fits each of the
activation-variance scale factors in creation order, writing
scaling_factors.json.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config.yaml")
    p.add_argument("--n-batches", type=int, default=25)
    p.add_argument("--scale-file", default="scaling_factors.json")
    p.add_argument("--dataset", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--platform", default=None)
    p.add_argument(
        "--overwrite-mode", default="1",
        help="1: overwrite file; 2: only fit unfitted; else exit "
        "(reference fit_scaling.py:81-92)",
    )
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(levelname)s): %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider, make_dataset
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.models.scaling import load_scales_from_json
    from gemnet_pytorch_tpu.training.fit_scaling import fit_scaling_factors

    config = load_yaml_config(args.config) if os.path.exists(args.config) else {}
    config["direct_forces"] = True  # faster, as in the reference
    config["triplets_only"] = config.get("triplets_only", False)
    mcfg = ModelConfig.from_dict(config)

    skip_fitted = False
    if os.path.exists(args.scale_file):
        print(f"Already found existing file: {args.scale_file}")
        if str(args.overwrite_mode) == "1":
            print("Selected: Overwrite the current file.")
        elif str(args.overwrite_mode) == "2":
            print("Selected: Only fit unfitted variables.")
            skip_fitted = True
        else:
            print("Selected: Exit script")
            return

    dataset = args.dataset or config.get("val_dataset")
    if not dataset or not os.path.exists(dataset):
        dataset = "/tmp/gemnet_fit_scaling_synthetic.npz"
        logging.warning("val dataset missing; generating synthetic at %s", dataset)
        make_dataset(dataset, n_molecules=256, seed=config.get("data_seed", 42))

    container = DataContainer(
        dataset, cutoff=mcfg.cutoff, int_cutoff=mcfg.int_cutoff,
        triplets_only=mcfg.triplets_only,
    )
    provider = DataProvider(
        container, 0, min(args.n_batches * args.batch_size, len(container)),
        args.batch_size, seed=config.get("data_seed", 42),
        shuffle=True, random_split=True,
    )
    batch_iter = provider.get_dataset("val")

    model = make_model(mcfg)
    sample = {k: jnp.asarray(v) for k, v in next(batch_iter).items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(config.get("tfseed", 1234)), sample))
    if skip_fitted:
        variables["scale_factors"] = load_scales_from_json(
            variables.get("scale_factors", {}), args.scale_file
        )

    fit_scaling_factors(
        model, variables, batch_iter, n_batches=args.n_batches,
        scale_file=args.scale_file,
        comment=config.get("comment", "GemNet"), skip_fitted=skip_fitted,
        overwrite_file=not skip_fitted,
    )
    logging.info("Fitting done. Results saved to: %s", args.scale_file)


if __name__ == "__main__":
    main()
