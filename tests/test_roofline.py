"""Sanity checks for the analytic roofline (perf/roofline.py): the kernel
census sees every Pallas call in the compiled train step (fwd, bwd, and the
double-backward's recursive calls), the cost bounds are ordered, and the
below-floor flag fires for impossible measurements. The reference publishes
no perf numbers (BASELINE.md), so this model is the framework's own
ground truth for bench.py's MFU/SOL reporting."""

import numpy as np


def _tiny_trainer(synthetic_npz):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=False, direct_forces=False,
    )
    tcfg = TrainConfig(weight_decay=2e-6, rho_force=0.5)
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0,
                      triplets_only=False)
    p = DataProvider(c, ntrain=16, nval=4, batch_size=4, seed=0,
                     pad_sample_batches=2)
    it = p.get_dataset("train", prefetch_workers=0)
    batch = next(it)
    model = make_model(mcfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jb))
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)
    packed = jnp.asarray(trainer.packer.pack(batch))
    return trainer, state, packed, p.pad_dims


def test_census_and_cost_bounds(synthetic_npz, monkeypatch):
    import jax.numpy as jnp

    import gemnet_pytorch_tpu.ops.pallas.segment_outer as so
    from gemnet_pytorch_tpu.perf.roofline import (
        kernel_census, pallas_costs, speed_of_light, xla_costs,
    )

    trainer, state, packed, dims = _tiny_trainer(synthetic_npz)
    step = trainer.train_step_fn()
    lr = jnp.asarray(1.0)
    # the census is a TRACE artifact: force the pallas path while tracing
    # (tests run on the CPU backend, where 'auto' routes to XLA; on TPU —
    # bench.py — the same census comes out of the auto path)
    orig_o, orig_g = so._outer_sum_pallas, so._gather_contract_pallas
    with monkeypatch.context() as m:
        m.setattr(so, "_use_pallas", lambda impl: True)
        m.setattr(so, "_outer_sum_pallas",
                  lambda *a, **k: orig_o(*a, **{**k, "interpret": True}))
        m.setattr(so, "_gather_contract_pallas",
                  lambda *a, **k: orig_g(*a, **{**k, "interpret": True}))
        census = kernel_census(step, state, packed, lr)
    # the -dE/dR double-backward path must surface BOTH kernel directions,
    # with recursion: >= 2 fwd (fwd + bwd-of-bwd) and >= 2 bwd per space
    kinds = [c["kind"] for c in census]
    assert kinds.count("fwd") >= 2 and kinds.count("bwd") >= 2, kinds
    for c in census:
        assert c["n"] > 0 and c["S"] > 0 and c["M"] > 0
        # gather entries (round 5: the XLA row-gather floor term) carry W=0
        assert c["W"] >= 1 or c["kind"] == "gather"

    costs = pallas_costs(census)
    if "gather" in kinds:
        assert costs["gather_rows"] > 0
    assert 0 < costs["f32_flops_lo"] <= costs["f32_flops_hi"]
    assert 0 < costs["bytes_lo"] <= costs["bytes_hi"]
    # one-hot W-amplification: modeled MXU flops strictly exceed useful flops
    assert costs["useful_flops"] < costs["f32_flops_lo"]

    # tightening with real row counts can only lower the hi bound
    real_rows = {dims.n_triplets: dims.n_triplets // 2,
                 dims.n_quads: dims.n_quads // 2,
                 dims.n_intm: dims.n_intm // 2}
    tight = pallas_costs(census, real_rows)
    assert tight["f32_flops_hi"] <= costs["f32_flops_hi"]
    assert tight["f32_flops_lo"] <= costs["f32_flops_lo"]

    compiled = step.lower(state, packed, lr).compile()
    xla = xla_costs(compiled)
    assert xla["flops"] > 0 and xla["bytes"] > 0

    rl = speed_of_light(xla, costs)
    sol_lo, sol_hi = rl.sol_seconds("lo"), rl.sol_seconds("hi")
    assert 0 < sol_lo <= sol_hi
    # a sane (slower-than-light) measurement
    rep = rl.report(measured_seconds=sol_hi * 10)
    assert not rep["below_floor"]
    assert 0 < rep["mfu_bf16peak"] < 1
    assert 0 < rep["sol_fraction"] <= 1.001
    # an impossible measurement is flagged, not celebrated
    rep2 = rl.report(measured_seconds=sol_lo / 10)
    assert rep2["below_floor"]

    # the floor's memory term is LIVE-BUFFER bytes (a true lower bound),
    # never XLA's 'bytes accessed' accounting (hi-bound only) — r3 weak #4
    from gemnet_pytorch_tpu.perf.roofline import train_step_min_bytes

    mb = train_step_min_bytes(state, packed)
    assert mb > 0
    rl_mb = speed_of_light(xla, costs, min_bytes=mb)
    assert rl_mb.sol_seconds("lo") <= rl_mb.sol_seconds("hi")
    # forcing a huge min_bytes moves the lo floor; accounting bytes don't
    rl_huge = speed_of_light(xla, costs, min_bytes=1e15)
    assert rl_huge.sol_seconds("lo") > rl.sol_seconds("lo")
    rep3 = rl_mb.report(sol_hi * 10)
    assert 0 <= rep3["hbm_util_lo"] <= rep3["hbm_util"]


def test_check_peaks_rejects_impossible_calibrations():
    import pytest

    from gemnet_pytorch_tpu.perf.roofline import (
        V5E_DATASHEET, CalibrationError, check_peaks,
    )

    ok = {"mxu_bf16": 180e12, "mxu_f32_highest": 30e12, "hbm": 700e9}
    check_peaks(ok)

    # round-3 recorded values: 17x/14x datasheet, HIGHEST ~ bf16 — every one
    # must now raise instead of being recorded
    r3 = {"mxu_bf16": 3343e12, "mxu_f32_highest": 3010e12, "hbm": 11712e9}
    with pytest.raises(CalibrationError):
        check_peaks(r3)
    with pytest.raises(CalibrationError):
        check_peaks({**ok, "mxu_bf16": 1.3 * V5E_DATASHEET["mxu_bf16"]})
    with pytest.raises(CalibrationError):
        check_peaks({**ok, "hbm": 1.3 * V5E_DATASHEET["hbm"]})
    with pytest.raises(CalibrationError):
        check_peaks({**ok, "mxu_f32_highest": 0.9 * ok["mxu_bf16"]})


def test_timed_windows_value_fetch_chaining():
    """timed_windows must time the WHOLE chain: a chained jitted op of known
    device cost cannot report (much) less than cost/iter."""
    import time

    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.perf.timing import measure_rtt, timed_windows

    rtt = measure_rtt()
    assert rtt >= 0

    @jax.jit
    def step(x):
        return (x @ x) * (1.0 / 256.0)

    x = jnp.ones((256, 256), jnp.float32)
    box = {"x": x}

    def once():
        box["x"] = step(box["x"])
        return box["x"][0, 0]

    res = timed_windows(once, windows=2, min_window_s=0.05)
    assert res["iters"] >= 10
    assert res["median_s"] > 0
    # cross-check against a plain wall-clock of the same chained work
    n = res["iters"]
    y = x
    t0 = time.perf_counter()
    for _ in range(n):
        y = step(y)
    float(np.asarray(y[0, 0]))
    wall = (time.perf_counter() - t0) / n
    assert res["median_s"] < wall * 10 + 1e-3
    assert res["median_s"] > wall / 10 - 1e-3


def test_trace_readback_machinery(tmp_path):
    """perf/trace.py parses a real jax.profiler trace. The CPU backend has no
    '/device:' planes (device module times are asserted on TPU in
    scripts/tpu_checks.py), so this covers discovery + proto parsing +
    graceful empty summaries."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.perf import trace as T

    @jax.jit
    def step(x):
        return x @ x * 0.01

    x = jnp.ones((128, 128))
    step(x).block_until_ready()
    jax.profiler.start_trace(str(tmp_path))
    y = step(x)
    float(np.asarray(y[0, 0]))
    jax.profiler.stop_trace()

    files = T.find_xspace_files(str(tmp_path))
    assert files, "profiler wrote no .xplane.pb"
    xs = T.load_xspace(files[-1])
    assert len(xs.planes) > 0
    mods = T.module_times(str(tmp_path))
    assert isinstance(mods, dict)
    assert isinstance(T.summarize(str(tmp_path)), str)
