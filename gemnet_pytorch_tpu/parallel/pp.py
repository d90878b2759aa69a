"""Pipeline parallelism: the interaction-block stack staged over a `pp` mesh.

The reference is strictly single-device (no counterpart; SURVEY.md §2
callout), so this is a new TPU-first layer: GemNet's block stack is a
sequential chain of structurally identical interaction+output block pairs
(models/gemnet.py block loop), which maps directly onto a GPipe schedule:

- stage s (one device on the `pp` mesh axis) owns the parameters of
  `num_blocks / S` consecutive block pairs — parameter and optimizer memory
  for the stack shrinks 1/S per chip, and so does per-stage activation
  residency for the double backward;
- a batch is split into M microbatches; the carried state per microbatch is
  tiny and fixed — (h, m, E_a, F_ca), i.e. O(nEdges * emb_size_edge) — and
  moves stage-to-stage with ONE neighbor `ppermute` per tick, which rides a
  single ICI hop on a ring-mapped mesh;
- the preamble (geometry, bases, shared down-projections, embeddings,
  OutBlock_0 — `GemNet.__call__(return_state=True)`) and the tail
  (`finalize_outputs`) run replicated and vmapped over microbatches: they
  are a small fraction of the FLOPs (no triplet/quad bilinears) and keeping
  them replicated makes the pipelined program exactly equivalent to the
  monolithic one;
- the classic GPipe bubble is (S-1)/(M+S-1) of the ticks; choose M >= 4*S.

Exactness: the schedule is pure dataflow rearrangement — same ops, same
microbatch padding — so energies, forces (both the direct head and -dE/dR
through the whole pipeline), and parameter gradients match the monolithic
model to fp tolerance (tests/test_pp.py). Gradients use the same recipe as
ep/halo: vma-tracked shard_map (`check_vma=True`) with `jax.grad` OUTSIDE,
so the transpose of the ppermute ring and of the stage-parameter indexing
is handled by JAX's varying-manual-axes machinery.

Composition: stage parameters are a stacked pytree with a leading S axis
sharded over `pp`; everything else (microbatch constants, preamble params)
is replicated over `pp`. dp x pp is IMPLEMENTED (pass dp_axis="dp" on a
2-D (dp, pp) mesh: batches gain a leading DP dim sharded over dp; each dp
row pipelines its own microbatches with all collectives on the pp axis)
and asserted equal to the monolithic model — forward and gradients with
the -dE/dR double backward — in tests/test_dp_pp.py.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.gemnet import finalize_outputs
from ..models.interaction import InteractionBlock
from ..models.layers import OutputBlock

AXIS = "pp"

_SCALE_RE = re.compile(
    r"^((?:TripInteraction|QuadInteraction|AtomUpdate|OutBlock)_)(\d+)(.*)$"
)


class PipelineStage(nn.Module):
    """`blocks_per_stage` consecutive interaction/output block pairs.

    Parameter names are stage-generic (`iblock_j` / `oblock_j`, scale names
    renumbered to the within-stage index) so ONE compiled stage program runs
    on every device of the `pp` axis; `split_pp_variables` maps the
    monolithic GemNet parameter tree onto this layout and back.
    """

    config: ModelConfig
    blocks_per_stage: int

    @nn.compact
    def __call__(self, carry, consts):
        cfg = self.config
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        h, m = carry["h"], carry["m"]
        E_a, F_ca = carry["E_a"], carry["F_ca"]
        basis, indices, masks = consts["basis"], consts["indices"], consts["masks"]
        rbf_out = consts["rbf_out"]

        IBlock = nn.remat(InteractionBlock) if cfg.remat_blocks else InteractionBlock
        OBlock = nn.remat(OutputBlock) if cfg.remat_blocks else OutputBlock
        with jax.default_matmul_precision(cfg.matmul_precision):
            for j in range(self.blocks_per_stage):
                h, m = IBlock(
                    emb_size_atom=cfg.emb_size_atom,
                    emb_size_edge=cfg.emb_size_edge,
                    emb_size_trip=cfg.emb_size_trip,
                    emb_size_quad=cfg.emb_size_quad,
                    emb_size_bil_trip=cfg.emb_size_bil_trip,
                    emb_size_bil_quad=cfg.emb_size_bil_quad,
                    num_before_skip=cfg.num_before_skip,
                    num_after_skip=cfg.num_after_skip,
                    num_concat=cfg.num_concat,
                    num_atom=cfg.num_atom,
                    triplets_only=cfg.triplets_only,
                    block_nr=j + 1,
                    activation=cfg.activation,
                    implementation=cfg.bilinear_implementation,
                    dtype=cdt,
                    name=f"iblock_{j}",
                )(h, m, basis, indices, masks)
                E, F = OBlock(
                    emb_size_atom=cfg.emb_size_atom,
                    emb_size_edge=cfg.emb_size_edge,
                    n_hidden=cfg.num_atom,
                    num_targets=cfg.num_targets,
                    activation=cfg.activation,
                    direct_forces=cfg.direct_forces,
                    output_init=cfg.output_init,
                    scale_prefix=f"OutBlock_{j + 1}",
                    dtype=cdt,
                    name=f"oblock_{j}",
                )(h, m, rbf_out, indices["id_a"], masks["edge"], masks["atom"])
                E_a = E_a + E
                F_ca = F_ca + F
        return {"h": h, "m": m, "E_a": E_a, "F_ca": F_ca}


def _rename_scales(tree, new_nr: int):
    """Renumber reference-global scale names (e.g. TripInteraction_3_had_rbf
    -> TripInteraction_1_had_rbf) so block i's scales load into the
    stage-generic module; exact inverse applied by merge_pp_variables."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for key, val in tree.items():
        mm = _SCALE_RE.match(key)
        if mm is not None and not isinstance(val, dict):
            key = f"{mm.group(1)}{new_nr}{mm.group(3)}"
        out[key] = _rename_scales(val, new_nr)
    return out


def split_pp_variables(variables, num_blocks: int, num_stages: int):
    """Monolithic GemNet variables -> (pre_vars, stacked stage_vars).

    pre_vars: everything outside the block stack (bases, embeddings,
    OutBlock_0, frequencies) — replicated over `pp`.
    stage_vars: per-collection dict with keys iblock_j / oblock_j whose
    leaves carry a leading (num_stages,) axis — shard it over `pp`.
    """
    assert num_blocks % num_stages == 0, (num_blocks, num_stages)
    k = num_blocks // num_stages
    blocked = {f"int_blocks_{i}" for i in range(num_blocks)} | {
        f"out_blocks_{i + 1}" for i in range(num_blocks)
    }
    pre_vars, per_stage = {}, [dict() for _ in range(num_stages)]
    for col, tree in dict(variables).items():
        tree = dict(tree)
        pre_vars[col] = {kk: v for kk, v in tree.items() if kk not in blocked}
        for s in range(num_stages):
            stage = {}
            for j in range(k):
                i = s * k + j
                if f"int_blocks_{i}" in tree:
                    stage[f"iblock_{j}"] = _rename_scales(
                        dict(tree[f"int_blocks_{i}"]), j + 1
                    )
                if f"out_blocks_{i + 1}" in tree:
                    stage[f"oblock_{j}"] = _rename_scales(
                        dict(tree[f"out_blocks_{i + 1}"]), j + 1
                    )
            per_stage[s][col] = stage
    stage_vars = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)
    return pre_vars, stage_vars


def merge_pp_variables(pre_vars, stage_vars, num_blocks: int, num_stages: int):
    """Inverse of split_pp_variables (also merges gradient trees)."""
    k = num_blocks // num_stages
    out = {}
    for col, tree in dict(pre_vars).items():
        out[col] = dict(tree)
    stage_vars = jax.device_get(stage_vars)
    for s in range(num_stages):
        for col, stage in dict(stage_vars).items():
            for j in range(k):
                i = s * k + j
                if f"iblock_{j}" in stage:
                    out.setdefault(col, {})[f"int_blocks_{i}"] = _rename_scales(
                        jax.tree_util.tree_map(lambda x: x[s], stage[f"iblock_{j}"]),
                        i + 1,
                    )
                if f"oblock_{j}" in stage:
                    out.setdefault(col, {})[f"out_blocks_{i + 1}"] = _rename_scales(
                        jax.tree_util.tree_map(lambda x: x[s], stage[f"oblock_{j}"]),
                        i + 1,
                    )
    return out


def stack_microbatches(batches):
    """Stack per-microbatch padded batch dicts along a leading M axis."""
    import numpy as np

    keys = batches[0].keys()
    return {kk: np.stack([b[kk] for b in batches]) for kk in keys}


def _make_pipeline_fn(model, mesh: Mesh, num_micro: int, axis: str = AXIS,
                      dp_axis: str | None = None):
    """shard_map'd (stage_vars, carry0, consts) -> (E_a, F_ca) over the
    GPipe schedule: M + S - 1 ticks; each tick = one neighbor ppermute of
    the carried state + one stage application per device.

    dp_axis: compose with data parallelism on a 2-D (dp, pp) mesh — carry0/
    consts gain a leading DP dim sharded over dp (each dp row pipelines its
    own microbatches; stage params replicate across dp, shard across pp;
    all collectives stay on the pp axis)."""
    cfg = model.config
    S = mesh.shape[axis]
    assert cfg.num_blocks % S == 0, (cfg.num_blocks, S)
    # halo-mode geometry (ep_halo) needs per-block exchanges/psums the stage
    # module does not perform — fail loudly on the unsupported combination
    assert not getattr(cfg, "ep_halo", False), (
        "pipeline parallelism does not compose with ep_halo configs; "
        "use --halo or --dp-halo instead"
    )
    stage_mod = PipelineStage(config=cfg, blocks_per_stage=cfg.num_blocks // S)
    M = num_micro
    T = M + S - 1
    perm = [(i, i + 1) for i in range(S - 1)]

    def body(stage_vars, carry0, consts):
        if dp_axis is not None:
            # local (1, M, ...) slice of the dp-sharded stack
            carry0 = jax.tree_util.tree_map(lambda x: x[0], carry0)
            consts = jax.tree_util.tree_map(lambda x: x[0], consts)
        sv = jax.tree_util.tree_map(lambda x: x[0], stage_vars)
        s = jax.lax.axis_index(axis)
        _vary = lambda x: jax.lax.pcast(x, axis, to="varying")
        state = jax.tree_util.tree_map(
            lambda x: _vary(jnp.zeros_like(x[0])), carry0
        )
        outE = _vary(jnp.zeros_like(carry0["E_a"]))
        outF = _vary(jnp.zeros_like(carry0["F_ca"]))

        # The tick loop is UNROLLED (T = M + S - 1 is static and small), not a
        # lax.scan: in jax 0.9.0, a custom_vjp op (the Pallas segment kernels)
        # taking integer operands inside a twice-differentiated scan gets its
        # residuals mis-wired (wrong dtype/shape reach the vjp rule) — see
        # tests/test_pp.py::test_jax_scan_customvjp_int_residual_bug for the
        # minimal repro pinning when this gets fixed upstream. The force-
        # training double backward hits exactly that combination. Unrolling
        # trades compile time O(T) for correctness; runtime is identical.
        for t in range(T):
            if perm:
                state = jax.tree_util.tree_map(
                    lambda x: jax.lax.ppermute(x, axis, perm), state
                )
            # stage 0 injects microbatch t's preamble state
            inj = jax.tree_util.tree_map(
                lambda x: _vary(x[min(t, M - 1)]), carry0
            )
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(s == 0, a, b), inj, state
            )
            mb = t - s  # microbatch resident on this stage at this tick
            cm = jnp.clip(mb, 0, M - 1)
            # cm is device-varying, so indexing replicated consts with it
            # already yields pp-varying arrays — no pvary needed
            c_t = jax.tree_util.tree_map(lambda x: x[cm], consts)
            new_state = stage_mod.apply(sv, state, c_t)
            valid = (mb >= 0) & (mb < M)
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(valid, a, b), new_state, state
            )
            write = valid & (s == S - 1)
            outE = jax.lax.dynamic_update_index_in_dim(
                outE, jnp.where(write, state["E_a"], outE[cm]), cm, 0
            )
            outF = jax.lax.dynamic_update_index_in_dim(
                outF, jnp.where(write, state["F_ca"], outF[cm]), cm, 0
            )
        # only the last stage holds real outputs; psum replicates them
        last = s == S - 1
        outE = jax.lax.psum(jnp.where(last, outE, jnp.zeros_like(outE)), axis)
        outF = jax.lax.psum(jnp.where(last, outF, jnp.zeros_like(outF)), axis)
        if dp_axis is not None:
            return outE[None], outF[None]
        return outE, outF

    batch_spec = P(dp_axis) if dp_axis is not None else P()
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), batch_spec, batch_spec),
        out_specs=(batch_spec, batch_spec),
        check_vma=True,
    )


def make_pp_apply(model, mesh: Mesh, num_micro: int, axis: str = AXIS,
                  dp_axis: str | None = None):
    """jitted (pre_vars, stage_vars, batches, R) -> (E, F_raw) with leading
    (num_micro,) axes — or (DP, num_micro,) under dp composition; F_raw is
    the model's raw second output (per-atom for direct_forces, per-edge
    scalar heads otherwise)."""
    cfg = model.config
    pipeline = _make_pipeline_fn(model, mesh, num_micro, axis, dp_axis)
    vm = jax.vmap if dp_axis is None else (lambda f: jax.vmap(jax.vmap(f)))

    def forward(pre_vars, stage_vars, batches, R):
        state = vm(
            lambda b, r: model.apply(pre_vars, b, r, return_state=True)
        )(batches, R)
        carry0 = {f: state[f] for f in ("h", "m", "E_a", "F_ca")}
        consts = {f: state[f] for f in ("basis", "rbf_out", "indices", "masks")}
        E_a, F_ca = pipeline(stage_vars, carry0, consts)
        return vm(
            lambda b, e, f, v: finalize_outputs(cfg, b, e, f, v)
        )(batches, E_a, F_ca, state["V_ca"])

    return forward


def _make_ef_raw(model, mesh: Mesh, num_micro: int, axis: str = AXIS,
                 dp_axis: str | None = None):
    cfg = model.config
    forward = make_pp_apply(model, mesh, num_micro, axis, dp_axis)

    def fn(pre_vars, stage_vars, batches):
        R = batches["R"]
        if cfg.direct_forces:
            return forward(pre_vars, stage_vars, batches, R)
        # -d(sum E)/dR below folds all targets into one gradient; the
        # single-device path loops per target (models/gemnet.py)
        assert cfg.num_targets == 1, (
            "pp -dE/dR force path supports num_targets == 1 only"
        )

        def energy_sum(R_):
            E, _ = forward(pre_vars, stage_vars, batches, R_)
            return jnp.sum(E), E

        dE_dR, E = jax.grad(energy_sum, has_aux=True)(R)
        # (M, nAtoms, 1, 3) — or (DP, M, nAtoms, 1, 3); num_targets == 1
        return E, -dE_dR[..., None, :]

    return fn


def make_pp_energy_and_forces(model, mesh: Mesh, num_micro: int, axis: str = AXIS,
                              dp_axis: str | None = None):
    """jitted (pre_vars, stage_vars, batches) -> (E, F) per microbatch, with
    the variant-appropriate force path (-dE/dR differentiates through the
    whole pipeline, ppermutes included). dp_axis: dp x pp on a 2-D mesh
    (batches carry a leading DP dim sharded over dp)."""
    return jax.jit(_make_ef_raw(model, mesh, num_micro, axis, dp_axis))


def make_pp_loss_and_grad(model, mesh: Mesh, loss_fn, num_micro: int,
                          axis: str = AXIS, dp_axis: str | None = None):
    """jitted (pre_vars, stage_vars, batches) -> (loss, (pre_grads,
    stage_grads)). loss_fn(E, F, batches) consumes the stacked microbatch
    outputs; gradients differentiate through the pipeline (double backward
    for -dE/dR force training), stage grads keep the stacked (S, ...)
    layout sharded over `pp`. Under dp_axis the outputs carry (DP, M, ...)
    and jax.grad outside the shard_map yields the dp-summed stage/pre
    gradients of the union loss (same recipe as dp x halo)."""
    ef = _make_ef_raw(model, mesh, num_micro, axis, dp_axis)

    def loss(pre_vars, stage_vars, batches):
        E, F = ef(pre_vars, stage_vars, batches)
        return loss_fn(E, F, batches)

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))


# ======================================================================
# trainable mode: GPipe train step with stage-sharded flat optimizer state
# ======================================================================


def _flatten_micro(x):
    """(M, rows, ...) -> (M*rows, ...): the masked num/den losses are
    invariant to this grouping, so the flattened microbatch stack is exactly
    the loss of the concatenated batch."""
    return x.reshape((-1,) + x.shape[2:])


class PPTrainer:
    """Training driver for the pipelined model (no reference counterpart —
    the reference is single-GPU; SURVEY.md §2 callout).

    State layout (training/flat_opt.py rationale): the preamble/tail
    parameters ravel into ONE replicated flat vector; the S stages' parameters
    ravel into ONE (S, P_stage) matrix sharded over `pp` — parameters, Adam
    moments, and EMA shadows for the block stack are all 1/S per chip. The
    global-norm clip spans both parts (exactly the single-device trainer's
    norm over the full gradient), computed once and fed to both updates via
    flat_opt.apply_update(clip_scale=...).

    Numerics: loss = trainer.loss_metrics_from_outputs over the microbatch
    stack flattened to one row space — identical to a single-device step on
    the concatenated M-microbatch batch (tests/test_pp.py), so a pp run is a
    plain large-batch run of the same training program.
    """

    def __init__(self, trainer, mesh: Mesh, num_micro: int, axis: str = AXIS):
        self.trainer = trainer
        self.mesh = mesh
        self.M = num_micro
        self.axis = axis
        self.S = mesh.shape[axis]
        self.cfg = trainer.model.config
        assert self.cfg.num_blocks % self.S == 0, (self.cfg.num_blocks, self.S)
        self._ef = _make_ef_raw(trainer.model, mesh, num_micro, axis)
        self.pre_unravel = None
        self.stage_unravel = None
        self._train_step = None

    # -- state --
    def init_state(self, variables):
        import numpy as np

        from ..training import flat_opt
        from ..training.trainer import MOL_METRICS, TrainState

        trainer, cfg = self.trainer, self.cfg
        pre_vars, stage_vars = split_pp_variables(
            dict(variables), cfg.num_blocks, self.S
        )
        pre_flat, self.pre_unravel = flat_opt.ravel_params(pre_vars["params"])
        stage_tree = stage_vars["params"]
        stage0 = jax.tree_util.tree_map(lambda x: x[0], stage_tree)
        _, self.stage_unravel = flat_opt.ravel_params(stage0)
        stage_flat = jax.vmap(lambda t: flat_opt.ravel_params(t)[0])(stage_tree)

        wd = trainer.cfg.weight_decay
        wd_pre, sc_pre = flat_opt.build_masks(pre_vars["params"], cfg, wd)
        # shared basis MLPs live in the preamble, so stage shared_scale == 1
        wd_st, sc_st = flat_opt.build_masks(stage0, cfg, wd)

        shard = NamedSharding(self.mesh, P(self.axis))
        stage_flat = jax.device_put(stage_flat, shard)
        stage_scales = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), shard),
            stage_vars.get("scale_factors", {}),
        )
        trainer._mol_metric = np.array(
            [k in MOL_METRICS for k in trainer.tracked_metrics]
        )
        zeros_st = jnp.zeros_like(stage_flat)
        stage_opt = flat_opt.FlatOptState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros_st, nu=zeros_st, nu_max=zeros_st,
            wd_mask=jnp.asarray(wd_st), shared_scale=jnp.asarray(sc_st),
        )
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params={"pre": pre_flat, "stage": stage_flat},
            scales={"pre": pre_vars.get("scale_factors", {}),
                    "stage": stage_scales},
            opt_state={"pre": flat_opt.init(pre_flat, wd_pre, sc_pre),
                       "stage": stage_opt},
            ema_params={"pre": jnp.copy(pre_flat),
                        "stage": jnp.copy(stage_flat)},
            metric_acc=jnp.zeros((len(trainer.tracked_metrics), 2), jnp.float32),
        )

    def _variables(self, params, scales):
        pre_vars = {"params": self.pre_unravel(params["pre"])}
        stage_vars = {"params": jax.vmap(self.stage_unravel)(params["stage"])}
        if scales["pre"]:
            pre_vars["scale_factors"] = scales["pre"]
        if scales["stage"]:
            stage_vars["scale_factors"] = scales["stage"]
        return pre_vars, stage_vars

    def merged_variables(self, state, ema: bool = False):
        """Host-side: monolithic {params, scale_factors} for eval/predict/
        checkpoint-export (inverse of split_pp_variables)."""
        params = state.ema_params if ema else state.params
        pre_vars, stage_vars = self._variables(params, state.scales)
        merged = merge_pp_variables(
            {"params": pre_vars["params"]}, {"params": stage_vars["params"]},
            self.cfg.num_blocks, self.S,
        )
        out = {"params": merged["params"]}
        if state.scales["pre"]:
            sc = merge_pp_variables(
                {"scale_factors": state.scales["pre"]},
                {"scale_factors": state.scales["stage"]},
                self.cfg.num_blocks, self.S,
            )
            out["scale_factors"] = sc["scale_factors"]
        return out

    # -- steps --
    def train_step_fn(self):
        if self._train_step is not None:
            return self._train_step
        trainer, tcfg = self.trainer, self.trainer.cfg
        from ..training import flat_opt

        @jax.jit
        def step(state, batches, lr_scale):
            def loss_fn(pre_flat, stage_flat):
                pre_vars, stage_vars = self._variables(
                    {"pre": pre_flat, "stage": stage_flat}, state.scales
                )
                E, F = self._ef(pre_vars, stage_vars, batches)
                fb = {
                    "E": _flatten_micro(batches["E"]),
                    "F": _flatten_micro(batches["F"]),
                    "mol_mask": _flatten_micro(batches["mol_mask"]),
                    "atom_mask": _flatten_micro(batches["atom_mask"]),
                }
                mean_E, var_E, mean_F, var_F = trainer._split_outputs(
                    _flatten_micro(E), _flatten_micro(F)
                )
                return trainer.loss_metrics_from_outputs(
                    mean_E, var_E, mean_F, var_F, fb
                )

            (loss, (metrics, counts)), (g_pre, g_st) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params["pre"], state.params["stage"])

            # global-norm clip across BOTH parts (after shared-grad scaling,
            # matching the single-device optax chain order)
            pre_opt, st_opt = state.opt_state["pre"], state.opt_state["stage"]
            g_pre_s = g_pre * pre_opt.shared_scale
            g_st_s = g_st * st_opt.shared_scale
            gnorm = jnp.sqrt(jnp.sum(g_pre_s * g_pre_s) + jnp.sum(g_st_s * g_st_s))
            clip = jnp.where(
                gnorm < tcfg.grad_clip_max, 1.0, tcfg.grad_clip_max / gnorm
            )
            kw = dict(
                lr_scale=lr_scale,
                schedule=trainer._sched_base,
                learning_rate=tcfg.learning_rate,
                grad_clip_max=tcfg.grad_clip_max,
                ema_decay=tcfg.ema_decay,
                clip_scale=clip,
            )
            p_pre, ema_pre, pre_opt = flat_opt.apply_update(
                g_pre, pre_opt, state.params["pre"],
                state.ema_params["pre"], **kw,
            )
            p_st, ema_st, st_opt = flat_opt.apply_update(
                g_st, st_opt, state.params["stage"],
                state.ema_params["stage"], **kw,
            )
            return (
                state.replace(
                    step=state.step + 1,
                    params={"pre": p_pre, "stage": p_st},
                    opt_state={"pre": pre_opt, "stage": st_opt},
                    ema_params={"pre": ema_pre, "stage": ema_st},
                    metric_acc=trainer.accumulate_metrics(
                        state.metric_acc, metrics, counts
                    ),
                ),
                metrics,
                counts,
            )

        self._train_step = step
        return step

    def train_on_microbatches(self, state, batches, lr_scale):
        """One pp train step over a list of M host batch dicts."""
        stacked = {
            k: jnp.asarray(v) for k, v in stack_microbatches(batches).items()
        }
        state, metrics, _ = self.train_step_fn()(
            state, stacked, jnp.asarray(lr_scale, jnp.float32)
        )
        return state, metrics["loss"]
