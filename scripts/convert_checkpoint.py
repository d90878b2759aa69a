#!/usr/bin/env python
"""Convert checkpoints between this framework (orbax) and the reference (.pth).

The reference saves/loads plain `torch.save(model.state_dict())` blobs
(reference gemnet.py:786-790); this framework saves orbax model-only
checkpoints (training/checkpoint.py save_params). Both directions:

    # orbax params checkpoint -> reference-loadable .pth
    python scripts/convert_checkpoint.py to-torch \
        --config config.yaml --params runs/x/best --out gemnet.pth

    # reference .pth -> orbax params checkpoint
    python scripts/convert_checkpoint.py from-torch \
        --config config.yaml --pth gemnet.pth --out runs/x/imported

Model shapes come from the config; the variable tree is materialized by
initializing the model on a tiny synthetic batch on CPU.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_variables(cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import (
        PadDims, _scale_graph_dims, pad_batch,
    )
    from gemnet_pytorch_tpu.data.synthetic import random_molecule
    from gemnet_pytorch_tpu.models import make_model

    rng = np.random.default_rng(0)
    Z, R = random_molecule(rng, 8)
    g = build_graph(R, np.array([8]), cfg.cutoff, cfg.int_cutoff,
                    triplets_only=cfg.triplets_only)
    dims = PadDims(
        n_mol=1, n_atoms=16, n_edges=128, n_triplets=512, kmax3=8,
        n_int_edges=0 if cfg.triplets_only else 64,
        n_intm=0 if cfg.triplets_only else 512,
        n_quads=0 if cfg.triplets_only else 512,
        kmax4=0 if cfg.triplets_only else 8,
    ).grow_to(_scale_graph_dims(g, 1.1), 1, 8)
    batch = {k: jnp.asarray(v) for k, v in
             pad_batch(g, Z, R, dims, triplets_only=cfg.triplets_only).items()}
    model = make_model(cfg)
    return dict(jax.jit(model.init)(jax.random.PRNGKey(0), batch))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["to-torch", "from-torch"])
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--params", help="orbax params checkpoint (to-torch input)")
    ap.add_argument("--pth", help="reference .pth (from-torch input)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config

    cfg = ModelConfig.from_dict(load_yaml_config(args.config))
    variables = init_variables(cfg)

    if args.mode == "to-torch":
        assert args.params, "--params required for to-torch"
        from gemnet_pytorch_tpu.compat import save_reference_checkpoint
        from gemnet_pytorch_tpu.training.checkpoint import restore_params

        # model-only checkpoints hold params (+ scale_factors); drop the
        # sown scale_stats collection from the restore target
        target = {"params": variables["params"]}
        if "scale_factors" in variables:
            target["scale_factors"] = variables["scale_factors"]
        variables = restore_params(args.params, target)
        save_reference_checkpoint(args.out, variables, cfg)
        print(f"wrote reference .pth: {args.out}")
    else:
        assert args.pth, "--pth required for from-torch"
        import torch

        from gemnet_pytorch_tpu.compat import import_reference_state_dict
        from gemnet_pytorch_tpu.training.checkpoint import save_params

        state_dict = {k: v.numpy() for k, v in
                      torch.load(args.pth, weights_only=True).items()}
        variables = import_reference_state_dict(state_dict, variables)
        save_params(args.out, variables["params"],
                    variables.get("scale_factors"))
        print(f"wrote orbax params checkpoint: {args.out}")


if __name__ == "__main__":
    main()
