"""Training stack: loss, optimizers, EMA, jitted train/eval steps.

optax counterpart of gemnet/training/trainer.py:
- AdamW (amsgrad, eps 1e-7, weight decay) for weights + plain Adam (amsgrad)
  for atom embeddings / Bessel frequencies / biases, selected by parameter
  path exactly like the reference's name matching (trainer.py:115-160);
  weight_decay == 0 collapses to a single Adam (trainer.py:163-178).
- loss = (1-rho_force)·MAE(E) + rho_force·{MAE|RMSE}(F), or Gaussian NLL
  under MVE (trainer.py:325-343, 292-306), masked over padded rows.
- shared-parameter gradient scaling: shared basis MLPs ÷ num_blocks,
  mlp_rbf_out ÷ (num_blocks+1) (trainer.py:250-278).
- clipping: global-norm or adaptive gradient clipping; AGC skips the final
  output layers as the NFNet paper prescribes (the reference's selection at
  trainer.py:195-198 inverts its stated intent — this implementation follows
  the intent and documents the difference).
- EMA shadow params updated per step (trainer.py:360, ema_decay.py:68-93).
- plateau LR decay enters the jitted step as a host-controlled scalar
  multiplier (schedules.PlateauState).

The whole train step — including the energy-gradient force path's double
backward — is one jitted function over static padded shapes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..models.gemnet import GemNet, energy_and_forces
from . import flat_opt

SHARED_INT_LAYERS = ("mlp_rbf3", "mlp_cbf3", "mlp_rbf_h")
SHARED_QUAD_LAYERS = ("mlp_rbf4", "mlp_cbf4", "mlp_sbf4")
MOL_METRICS = frozenset({"loss", "energy_mae", "energy_nll", "energy_var"})

# batch keys the jitted step never reads — skipped at host->device transfer
# (kept in host batches for the dense-formulation ops and diagnostics)
UNUSED_DEVICE_KEYS = frozenset({
    "Kidx3", "Kidx4", "kmax3_static", "kmax4_static", "id4_expand_db",
    "intm_ca_mask", "n_mol", "N",
})


def device_batch(batch):
    """Filter + upload a host batch for the jitted train/eval step."""
    return {
        k: jnp.asarray(v) for k, v in batch.items() if k not in UNUSED_DEVICE_KEYS
    }


class BatchPacker:
    """Packs a padded host batch into ONE contiguous int32 buffer and unpacks
    it inside jit.

    Per-step host->device traffic over 40 separate arrays pays one transfer
    round-trip each (painful over the axon TPU tunnel, noticeable even on
    PCIe hosts); a single buffer pays one. Packing itself is a ~7 MB memcpy
    that runs in the provider's prefetch threads. The layout is frozen on
    first use (shapes are static per PadDims).

    The buffer dtype is int32 (not uint8): 4-byte keys (f32/i32, the bulk of
    the bytes) then unpack as flat slice + same-width bitcast — no tiled
    (n, itemsize) intermediate. A uint8 buffer forced XLA to relayout the
    WHOLE buffer u8[N] -> u8[N/k, k] before the per-key width-changing
    bitcasts (~3.2 ms/step at bench shapes, round-4 trace); now only the
    small int16/bool regions pay that, per key.
    """

    def __init__(self):
        self.layout = None  # list[(key, offset, nbytes, shape, dtype)]
        self.total = 0
        self.version = 0  # bumped on re-freeze (pad-dims growth); consumers
        # of `unpack` must rebuild their jitted functions when stale

    def _freeze(self, batch):
        layout = []
        off = 0
        for k in sorted(batch):
            if k in UNUSED_DEVICE_KEYS:
                continue
            v = batch[k]
            nb = v.nbytes
            layout.append((k, off, nb, v.shape, v.dtype))
            off += nb
            off = (off + 3) // 4 * 4  # 4-byte alignment for bitcasts
        self.layout = layout
        self.total = off

    def pack(self, batch) -> "np.ndarray":
        import numpy as np

        if self.layout is None:
            self._freeze(batch)
        if any(
            batch[k].shape != shape or batch[k].dtype != dtype
            for k, _, _, shape, dtype in self.layout
        ):
            # pad dims grew (rare outlier batch): re-freeze; jitted steps
            # rebuild via the version check and recompile once
            self._freeze(batch)
            self.version += 1
        buf = np.zeros((self.total + 3) // 4, np.int32)
        u8 = buf.view(np.uint8)
        for k, off, nb, shape, dtype in self.layout:
            v = batch[k]
            u8[off : off + nb] = np.ascontiguousarray(v).view(np.uint8).ravel()
        return buf

    def zero_masks(self, row):
        """Copy of a packed row with mol_mask/atom_mask zeroed: a batch that
        contributes NOTHING to any masked num/den metric but is numerically
        safe to run (real in-bounds indices/geometry). Used to pad the last
        dp-eval group to the mesh width without double-counting molecules."""
        import numpy as np

        assert self.layout is not None, "pack a batch first"
        out = np.array(row, copy=True)
        u8 = out.view(np.uint8)
        for k, off, nb, _, _ in self.layout:
            if k in ("mol_mask", "atom_mask"):
                u8[off : off + nb] = 0
        return out

    def unpack(self, packed):
        """jit-side: one int32 device buffer -> batch dict (bitcast slices).

        Every key's byte offset is 4-aligned (pack pads between keys); the
        word slice covers ceil(nb/4) words and trailing bytes are trimmed
        after the bitcast."""
        out = {}
        for k, off, nb, shape, dtype in self.layout:
            assert off % 4 == 0
            nw = (nb + 3) // 4
            raw = jax.lax.dynamic_slice(packed, (off // 4,), (nw,))
            np_dtype = jnp.dtype(dtype)
            if np_dtype.itemsize == 4:
                arr = raw if np_dtype == jnp.int32 else (
                    jax.lax.bitcast_convert_type(raw, np_dtype))
            elif np_dtype == jnp.bool_:
                arr = jax.lax.bitcast_convert_type(
                    raw, jnp.uint8).reshape(-1)[:nb].astype(jnp.bool_)
            else:  # 2-byte ids
                arr = jax.lax.bitcast_convert_type(
                    raw, np_dtype).reshape(-1)[: nb // np_dtype.itemsize]
            out[k] = arr.reshape(shape)
        return out


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    # flat mode (default): `params`/`ema_params` are ONE contiguous fp32
    # vector each and `opt_state` is flat_opt.FlatOptState — the TPU-native
    # layout (see flat_opt.py for the measured 8.0 ms -> 0.05 ms rationale).
    # Tree mode (cfg.agc or flat_optimizer=False): flax param pytrees with an
    # optax state, as in round 1. Trainer.params_tree()/ema_tree() give the
    # structured view either way.
    params: Any
    scales: Any
    opt_state: Any
    ema_params: Any
    # device-side metric accumulators — flat mode: (n_metrics, 2) array of
    # [weighted_sum, weight] rows in Trainer.tracked_metrics order; tree
    # mode: name -> [weighted_sum, weight]. Drained host-side once per
    # evaluation interval so no step ever blocks on a device->host readback
    # (critical over the axon TPU tunnel)
    metric_acc: Any = None


# ------------------------------------------------------------------ optimizer


def _param_label(path: tuple) -> str:
    """'adam' for atom embeddings / frequencies / biases, 'adamw' otherwise
    (reference trainer.py:118-129)."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if any("atom_emb" in str(k) for k in keys):
        return "adam"
    last = str(keys[-1]) if keys else ""
    if "frequencies" in last or "bias" in last:
        return "adam"
    return "adamw"


def scale_shared_grads(model_cfg: ModelConfig) -> optax.GradientTransformation:
    """Divide shared-layer grads by their share count (reference trainer.py:250-278)."""
    shared = set(SHARED_INT_LAYERS)
    if not model_cfg.triplets_only:
        shared |= set(SHARED_QUAD_LAYERS)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(path, g):
            top = str(getattr(path[0], "key", path[0])) if path else ""
            if top in shared:
                return g / model_cfg.num_blocks
            if top == "mlp_rbf_out":
                return g / (model_cfg.num_blocks + 1)
            return g

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def adaptive_gradient_clip(
    clip_factor: float, eps: float = 1e-3, compat_reference: bool = False
) -> optax.GradientTransformation:
    """AGC (reference trainer.py:225-248; NFNets): clip g so that
    ||g||_unit <= clip_factor * max(||p||_unit, eps), per output unit.
    Final output heads (out_energy / out_forces) are left unclipped.

    compat_reference=True reproduces the reference's inverted selection
    (trainer.py:192-198): ONLY the out_energy/out_forces params are clipped
    and everything else passes through — for bit-comparable AGC runs."""

    def unitwise_norm(x):
        if x.ndim <= 1:
            return jnp.linalg.norm(x)
        # flax kernels are (..., out): per-output-unit norm over input dims
        axes = tuple(range(x.ndim - 1))
        return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None, "AGC requires params"

        def clip(path, g, p):
            is_head = any("out_energy" in str(getattr(k, "key", k)) or
                          "out_forces" in str(getattr(k, "key", k)) for k in path)
            if is_head != compat_reference:
                return g
            max_norm = jnp.maximum(unitwise_norm(p), eps) * clip_factor
            g_norm = jnp.maximum(unitwise_norm(g), 1e-6)
            clipped = g * (max_norm / g_norm)
            return jnp.where(g_norm < max_norm, g, clipped)

        return jax.tree_util.tree_map_with_path(clip, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_amsgrad_torch(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7
) -> optax.GradientTransformation:
    """AMSGrad with TORCH semantics (reference trainer.py:131-150 uses
    torch.optim.AdamW/Adam(amsgrad=True)): running max of the RAW second
    moment, bias-corrected at the CURRENT step. optax.scale_by_amsgrad maxes
    the bias-corrected nu_hat instead, which diverges from torch from step 2
    on (caught by tests/test_trajectory_parity.py); flat_opt.apply_update
    mirrors this transformation."""
    from optax._src.transform import ScaleByAmsgradState

    def init_fn(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=z(), nu=z(), nu_max=z()
        )

    def update_fn(updates, state, params=None):
        del params
        t = jax.tree_util.tree_map
        mu = t(lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu)
        nu = t(lambda g, v: b2 * v + (1 - b2) * g * g, updates, state.nu)
        nu_max = t(jnp.maximum, state.nu_max, nu)
        count_inc = state.count + 1
        cf = count_inc.astype(jnp.float32)
        bc1, bc2 = 1 - b1**cf, 1 - b2**cf
        out = t(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return out, ScaleByAmsgradState(
            count=count_inc, mu=mu, nu=nu, nu_max=nu_max
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainConfig, model_cfg: ModelConfig, params) -> optax.GradientTransformation:
    schedule = _make_schedule(cfg)

    def adam_like(weight_decay: float) -> optax.GradientTransformation:
        parts = [
            scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-7),
        ]
        if weight_decay > 0:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*parts)

    clip = (
        adaptive_gradient_clip(
            cfg.grad_clip_max, compat_reference=cfg.agc_compat_reference
        )
        if cfg.agc
        else optax.clip_by_global_norm(cfg.grad_clip_max)
    )

    if cfg.weight_decay > 0:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: _param_label(path), params
        )
        opt = optax.multi_transform(
            {"adamw": adam_like(cfg.weight_decay), "adam": adam_like(0.0)},
            labels,
        )
    else:
        opt = adam_like(0.0)

    return optax.chain(scale_shared_grads(model_cfg), clip, opt)


def _make_schedule(cfg: TrainConfig) -> Callable:
    from .schedules import linear_warmup_exponential_decay

    base = linear_warmup_exponential_decay(
        cfg.warmup_steps, cfg.decay_steps, cfg.decay_rate, cfg.staircase
    )
    return lambda step: cfg.learning_rate * base(step)


# ----------------------------------------------------------------- loss/metrics


def _mae_parts(pred, target, mask):
    """(sum |err|·mask, n_real_elements) — reference get_mae as num/den."""
    m = mask.astype(pred.dtype).reshape((-1,) + (1,) * (pred.ndim - 1))
    feat = pred.size // pred.shape[0]
    return jnp.sum(jnp.abs(pred - target) * m), jnp.sum(m) * feat


def _rmse_parts(pred, target, mask):
    """(sum of per-row L2 norms, n_real_rows) — reference get_rmse as num/den."""
    m = mask.astype(pred.dtype)
    err = pred - target
    norms = jnp.sqrt(jnp.maximum(jnp.sum(err * err, axis=-1), 1e-24))
    return jnp.sum(norms * m), jnp.sum(m)


def _nll_parts(pred_mean, pred_var, target, mask):
    """Gaussian NLL num/den (torch gaussian_nll_loss semantics: var clamped
    at 1e-6, 0.5·(log var + err²/var), mean reduction)."""
    m = mask.astype(pred_mean.dtype).reshape((-1,) + (1,) * (pred_mean.ndim - 1))
    var = jnp.maximum(pred_var, 1e-6)
    nll = 0.5 * (jnp.log(var) + (pred_mean - target) ** 2 / var)
    feat = pred_mean.size // pred_mean.shape[0]
    return jnp.sum(nll * m), jnp.sum(m) * feat


def _ratios(parts, axis_name):
    """Local and global means from (num, den) pairs.

    Under DP (axis_name set) the differentiated loss must use the LOCAL
    numerator over the GLOBAL denominator: the psum transpose re-psums the
    replicated cotangent, so a psum'd numerator inside jax.grad would double-
    count every shard (n_dev×). The per-device gradient of local_num/global_den
    psums (parallel/dp.py) to the exact global-mean gradient. The psum'd
    global mean is returned separately for metric reporting — no gradient
    flows through it (denominators are mask counts, parameter-independent).
    """
    num, den = parts
    if axis_name is None:
        local = num / jnp.maximum(den, 1.0)
        return local, local
    den_global = jax.lax.psum(den, axis_name)
    den_global = jnp.maximum(den_global, 1.0)
    loss_term = num / den_global
    metric = jax.lax.psum(num, axis_name) / den_global
    return loss_term, metric


def masked_mae(pred, target, mask, axis_name=None):
    return _ratios(_mae_parts(pred, target, mask), axis_name)[1]


def masked_rmse(pred, target, mask, axis_name=None):
    return _ratios(_rmse_parts(pred, target, mask), axis_name)[1]


def masked_nll(pred_mean, pred_var, target, mask, axis_name=None):
    return _ratios(_nll_parts(pred_mean, pred_var, target, mask), axis_name)[1]


# ------------------------------------------------------------------- trainer


class Trainer:
    """Builds jitted train/eval steps for a GemNet model + config."""

    def __init__(self, model: GemNet, cfg: TrainConfig):
        self.model = model
        self.cfg = cfg
        self.model_cfg = model.config
        self.mve = cfg.mve
        self.rho_force = float(cfg.rho_force)
        assert 0 <= self.rho_force <= 1
        self.tracked_metrics = (
            ["loss", "energy_mae", "energy_nll", "energy_var",
             "force_mae", "force_rmse", "force_nll", "force_var"]
            if self.mve
            else ["loss", "energy_mae", "force_mae", "force_rmse"]
        )
        self.optimizer: Optional[optax.GradientTransformation] = None
        self._train_step = None
        self._eval_step = None
        self._multi_step = None
        self._step_version = -1
        self._eval_version = -1
        self._multi_version = -1
        self.packer = BatchPacker()
        # flat-vector parameter/optimizer layout (flat_opt.py). AGC needs
        # per-unit tensor structure, so it keeps the optax tree path.
        self.flat = bool(getattr(cfg, "flat_optimizer", True)) and not cfg.agc
        self.unravel = None  # set by init_state in flat mode
        self._mol_metric = None  # bool mask over tracked_metrics, flat mode
        from .schedules import linear_warmup_exponential_decay

        self._sched_base = linear_warmup_exponential_decay(
            cfg.warmup_steps, cfg.decay_steps, cfg.decay_rate, cfg.staircase
        )

    # -- state management --
    def init_state(self, variables) -> TrainState:
        import numpy as np

        params = variables["params"]
        scales = variables.get("scale_factors", {})
        if self.flat:
            flat, self.unravel = flat_opt.ravel_params(params)
            wd, sc = flat_opt.build_masks(
                params, self.model_cfg, self.cfg.weight_decay
            )
            self._mol_metric = np.array(
                [k in MOL_METRICS for k in self.tracked_metrics]
            )
            return TrainState(
                step=jnp.asarray(0, jnp.int32),
                params=flat,
                scales=scales,
                opt_state=flat_opt.init(flat, wd, sc),
                ema_params=jnp.copy(flat),
                metric_acc=jnp.zeros((len(self.tracked_metrics), 2), jnp.float32),
            )
        self.optimizer = make_optimizer(self.cfg, self.model_cfg, params)
        opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            scales=scales,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            metric_acc={
                k: jnp.zeros(2, jnp.float32) for k in self.tracked_metrics
            },
        )

    # -- structured views of (possibly flat) state --
    def params_tree(self, params):
        """Accepts a flat vector, a TrainState, or a tree; returns the tree."""
        if isinstance(params, TrainState):
            params = params.params
        if isinstance(params, jax.Array) or (
            hasattr(params, "ndim") and getattr(params, "ndim", None) == 1
        ):
            assert self.unravel is not None, "call init_state first"
            return self.unravel(params)
        return params

    def ema_tree(self, state: TrainState):
        return self.params_tree(state.ema_params)

    # -- prediction/loss --
    def _split_outputs(self, E, F):
        """Raw model outputs -> (mean_E, var_E, mean_F, var_F); vars None
        unless MVE (reference trainer.py:301-306 softplus split)."""
        if self.mve:
            mean_E = E[:, :1]
            var_E = jax.nn.softplus(E[:, 1:])
            mean_F = F[:, 0, :]
            var_F = jax.nn.softplus(F[:, 1, :])
            return mean_E, var_E, mean_F, var_F
        return E, None, F[:, 0, :], None

    def _predict(self, params, scales, batch, model=None):
        if not isinstance(params, dict) and not hasattr(params, "keys"):
            params = self.params_tree(params)
        variables = {"params": params}
        if scales:
            variables["scale_factors"] = scales
        E, F, _ = energy_and_forces(model or self.model, variables, batch)
        return self._split_outputs(E, F)

    def _loss_and_metrics(self, params, scales, batch, axis_name=None, model=None):
        mean_E, var_E, mean_F, var_F = self._predict(params, scales, batch, model)
        return self.loss_metrics_from_outputs(
            mean_E, var_E, mean_F, var_F, batch, axis_name
        )

    def loss_metrics_from_outputs(
        self, mean_E, var_E, mean_F, var_F, batch, axis_name=None
    ):
        """(loss, (metrics, counts)) from split model outputs + a batch dict
        carrying E/F targets and mol/atom masks. Row dims may be any flattening
        (e.g. pp's microbatch-stacked outputs reshaped to (M*n, ...)) — the
        loss is a masked num/den mean, invariant to the grouping."""
        tE, tF = batch["E"], batch["F"]
        mol_mask, atom_mask = batch["mol_mask"], batch["atom_mask"]
        e_mae_loc, energy_mae = _ratios(_mae_parts(mean_E, tE, mol_mask), axis_name)
        f_mae_loc, force_mae = _ratios(_mae_parts(mean_F, tF, atom_mask), axis_name)
        f_rmse_loc, force_rmse = _ratios(_rmse_parts(mean_F, tF, atom_mask), axis_name)
        if self.mve:
            e_nll_loc, energy_nll = _ratios(
                _nll_parts(mean_E, var_E, tE, mol_mask), axis_name
            )
            f_nll_loc, force_nll = _ratios(
                _nll_parts(mean_F, var_F, tF, atom_mask), axis_name
            )
            loss = (1 - self.rho_force) * e_nll_loc + self.rho_force * f_nll_loc
            # var diagnostics as num/den ratios so they are GLOBAL under an
            # axis_name (a bare local mean would vary per device and break
            # the replicated out_specs of the dp/dp-halo steps)
            mm = mol_mask.astype(var_E.dtype)
            am = atom_mask.astype(var_F.dtype)
            _, energy_var = _ratios(
                (jnp.sum(var_E * mm[:, None]), jnp.sum(mm)), axis_name)
            _, force_var = _ratios(
                (jnp.sum(var_F * am[:, None]), 3 * jnp.sum(am)), axis_name)
            metrics = {
                "loss": (1 - self.rho_force) * energy_nll
                + self.rho_force * force_nll,
                "energy_mae": energy_mae,
                "energy_nll": energy_nll,
                "energy_var": energy_var,
                "force_mae": force_mae,
                "force_rmse": force_rmse,
                "force_nll": force_nll,
                "force_var": force_var,
            }
        else:
            f_loc = f_mae_loc if self.cfg.loss == "mae" else f_rmse_loc
            f_glob = force_mae if self.cfg.loss == "mae" else force_rmse
            loss = (1 - self.rho_force) * e_mae_loc + self.rho_force * f_loc
            metrics = {
                "loss": (1 - self.rho_force) * energy_mae + self.rho_force * f_glob,
                "energy_mae": energy_mae,
                "force_mae": force_mae,
                "force_rmse": force_rmse,
            }
        counts = {
            "n_mol": jnp.sum(mol_mask.astype(jnp.float32)),
            "n_atoms": jnp.sum(atom_mask.astype(jnp.float32)),
        }
        if axis_name is not None:
            counts = jax.tree_util.tree_map(
                lambda c: jax.lax.psum(c, axis_name), counts
            )
        return loss, (metrics, counts)

    # -- optimizer/EMA/metric-accumulator application (shared with the
    # dp/ep parallel steps, which psum/compute grads their own way) --
    def accumulate_metrics(self, acc, metrics, counts):
        if isinstance(acc, dict):  # tree mode
            acc = dict(acc)
            for key, val in metrics.items():
                w = counts["n_mol"] if key in MOL_METRICS else counts["n_atoms"]
                acc[key] = acc[key] + jnp.stack([val * w, w])
            return acc
        vals = jnp.stack([metrics[k] for k in self.tracked_metrics])
        w = jnp.where(
            jnp.asarray(self._mol_metric), counts["n_mol"], counts["n_atoms"]
        )
        return acc + jnp.stack([vals * w, w], axis=1)

    def apply_update(self, state: TrainState, grads, metrics, counts, lr_scale):
        """grads (flat vector or tree, matching the state layout) -> new state
        after optimizer + EMA + device-side metric accumulation."""
        if self.flat:
            params, ema, opt_state = flat_opt.apply_update(
                grads, state.opt_state, state.params, state.ema_params,
                lr_scale,
                schedule=self._sched_base,
                learning_rate=self.cfg.learning_rate,
                grad_clip_max=self.cfg.grad_clip_max,
                ema_decay=self.cfg.ema_decay,
            )
        else:
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state.params, updates)
            ema = jax.tree_util.tree_map(
                lambda s, p: s - (1.0 - self.cfg.ema_decay) * (s - p),
                state.ema_params,
                params,
            )
        return state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            metric_acc=self.accumulate_metrics(state.metric_acc, metrics, counts),
        )

    # -- steps --
    def train_step_fn(self):
        if self._train_step is not None and self._step_version == self.packer.version:
            return self._train_step
        self._train_step = None
        self._step_version = self.packer.version
        assert (self.unravel if self.flat else self.optimizer) is not None, (
            "call init_state first"
        )

        @jax.jit
        def step(state: TrainState, batch, lr_scale):
            if not isinstance(batch, dict):
                batch = self.packer.unpack(batch)
            grad_fn = jax.value_and_grad(
                lambda p: self._loss_and_metrics(p, state.scales, batch), has_aux=True
            )
            (loss, (metrics, counts)), grads = grad_fn(state.params)
            new_state = self.apply_update(state, grads, metrics, counts, lr_scale)
            return new_state, metrics, counts

        self._train_step = step
        return step

    def multi_step_fn(self):
        """K train steps per dispatch: lax.scan over a (K, nbytes) stack of
        packed batches.

        The single-chip step is latency-bound, not FLOP-bound (a 12.8x-larger
        quad space costs +3% wall time; artifacts_r02_profile.md), so the
        fixed per-dispatch cost — host->device transfer, program launch,
        handle plumbing over the tunneled runtime — dominates. Scanning K
        steps inside one jitted program pays it once per K. Numerically
        IDENTICAL to K single steps (tests/test_flat_opt.py): the scan body
        is the same unpack -> loss+grads -> apply_update, and metric_acc
        accumulation already lives in apply_update so device-side metrics
        aggregate across the scanned steps exactly as they do across calls.

        Returns (state, packed (K, n_words) int32, lr_scale) ->
        (state, metrics of the LAST step, counts of the last step).
        """
        if (self._multi_step is not None
                and self._multi_version == self.packer.version):
            return self._multi_step
        self._multi_step = None
        self._multi_version = self.packer.version
        assert (self.unravel if self.flat else self.optimizer) is not None, (
            "call init_state first"
        )

        @jax.jit
        def multi(state: TrainState, packed, lr_scale):
            def body(st, row):
                batch = self.packer.unpack(row)
                grad_fn = jax.value_and_grad(
                    lambda p: self._loss_and_metrics(p, st.scales, batch),
                    has_aux=True,
                )
                (loss, (metrics, counts)), grads = grad_fn(st.params)
                return (
                    self.apply_update(st, grads, metrics, counts, lr_scale),
                    (metrics, counts),
                )

            state, (metrics, counts) = jax.lax.scan(body, state, packed)
            last = jax.tree_util.tree_map(lambda x: x[-1], (metrics, counts))
            return state, last[0], last[1]

        self._multi_step = multi
        return multi

    def train_on_batches(self, state: TrainState, batches, lr_scale):
        """K async train steps in ONE device dispatch (multi_step_fn).
        `batches` is a list of host dicts or pre-packed int32 word buffers of
        identical layout. Returns (state, last-step loss, device async)."""
        import numpy as np

        rows = [
            b if isinstance(b, np.ndarray) else self.packer.pack(b)
            for b in batches
        ]
        packed = jnp.asarray(np.stack(rows))
        state, metrics, _ = self.multi_step_fn()(
            state, packed, jnp.asarray(lr_scale, jnp.float32)
        )
        return state, metrics["loss"]

    def eval_step_fn(self):
        if self._eval_step is not None and self._eval_version == self.packer.version:
            return self._eval_step
        self._eval_step = None
        self._eval_version = self.packer.version

        @jax.jit
        def step(params, scales, batch):
            if not isinstance(batch, dict):
                batch = self.packer.unpack(batch)
            _, (metrics, counts) = self._loss_and_metrics(params, scales, batch)
            return metrics, counts

        self._eval_step = step
        return step

    def predict_fn(self):
        @jax.jit
        def predict(params, scales, batch):
            return self._predict(params, scales, batch)

        return predict

    # -- host-side convenience mirroring the reference API --
    def train_on_batch(self, state: TrainState, batch, lr_scale, metrics=None):
        """One async train step; metrics accumulate on device. Pass a Metrics
        instance to ALSO drain immediately (host sync — slow over the tunnel;
        prefer drain_metrics once per interval). `batch` may be a host dict or
        a pre-packed int32 word buffer (BatchPacker / provider transform)."""
        import numpy as np

        if isinstance(batch, np.ndarray):
            jbatch = jnp.asarray(batch)
        else:
            jbatch = jnp.asarray(self.packer.pack(batch))
        state, step_metrics, counts = self.train_step_fn()(
            state, jbatch, jnp.asarray(lr_scale, jnp.float32)
        )
        if metrics is not None:
            self._update_metrics(metrics, step_metrics, counts)
            return state, float(step_metrics["loss"])
        return state, step_metrics["loss"]

    def drain_metrics(self, state: TrainState, metrics) -> TrainState:
        """Move the device-side accumulators into a host Metrics object and
        reset them (single host sync per evaluation interval). Each key drains
        with its own accumulated sample weight so multi-interval aggregation
        stays sample-weighted (reference metrics.py:66-79)."""
        acc = jax.device_get(state.metric_acc)
        if not isinstance(acc, dict):  # flat mode: (n_metrics, 2) rows
            acc = {k: acc[i] for i, k in enumerate(self.tracked_metrics)}
            zero = jnp.zeros((len(self.tracked_metrics), 2), jnp.float32)
        else:
            zero = {k: jnp.zeros(2, jnp.float32) for k in self.tracked_metrics}
        for key, (wsum, w) in acc.items():
            if w > 0:
                metrics.update_state(float(w), **{key: wsum / w})
        return state.replace(metric_acc=zero)

    def test_on_batch(self, state: TrainState, batch, metrics, use_ema=False):
        import numpy as np

        if isinstance(batch, np.ndarray):
            jbatch = jnp.asarray(batch)
        else:
            jbatch = jnp.asarray(self.packer.pack(batch))
        params = state.ema_params if use_ema else state.params
        step_metrics, counts = self.eval_step_fn()(params, state.scales, jbatch)
        self._update_metrics(metrics, step_metrics, counts)
        return float(step_metrics["loss"])

    def _update_metrics(self, metrics, step_metrics, counts):
        mol_keys = {"loss", "energy_mae", "energy_nll", "energy_var"}
        n_mol = float(counts["n_mol"])
        n_atom = float(counts["n_atoms"])
        metrics.update_state(
            int(n_mol),
            **{k: float(v) for k, v in step_metrics.items() if k in mol_keys},
        )
        metrics.update_state(
            int(n_atom),
            **{k: float(v) for k, v in step_metrics.items() if k not in mol_keys},
        )
