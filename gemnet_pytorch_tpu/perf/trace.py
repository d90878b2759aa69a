"""Read device step time back out of a jax.profiler trace.

`jax.profiler.start_trace(dir)` writes an XSpace protobuf
(`.../plugins/profile/<run>/<host>.xplane.pb`). Rounds 2-3 wrote these traces
(bench.py --profile) but never read them — VERDICT r3 item 1c. This module
parses the XSpace directly and reports per-program device execution time:
the third measurement instrument, independent of both host wall clocks and
the (broken-on-this-runtime) block_until_ready barrier.

The XSpace schema is tiny (planes -> lines -> events with duration_ps); the
generated proto bindings ship inside this image's tensorflow wheel as a
self-contained module (only imports google.protobuf), loaded here from its
file path so `import tensorflow` (heavy, and hostile to a live TPU client)
never runs.

Device planes are named like "/device:TPU:0" ("/device:CPU:0" under the host
profiler); each XLA program execution appears as one event on an
"XLA Modules" line, named after the jitted function (e.g. "jit_step(...)").
`module_times(trace_dir)` aggregates those events per module.
"""

from __future__ import annotations

import glob
import gzip
import os
from dataclasses import dataclass

_XPLANE_CANDIDATES = (
    "tensorflow/tsl/profiler/protobuf/xplane_pb2.py",
    "tsl/profiler/protobuf/xplane_pb2.py",
    "xprof/protobuf/xplane_pb2.py",
    "tensorboard_plugin_profile/protobuf/xplane_pb2.py",
)


def _load_xplane_pb2():
    """Load the generated xplane proto module WITHOUT importing tensorflow."""
    import importlib.util
    import site
    import sys

    if "gemnet_xplane_pb2" in sys.modules:
        return sys.modules["gemnet_xplane_pb2"]
    roots = list(site.getsitepackages()) + [p for p in sys.path if p]
    for root in roots:
        for rel in _XPLANE_CANDIDATES:
            path = os.path.join(root, rel)
            if os.path.exists(path):
                spec = importlib.util.spec_from_file_location(
                    "gemnet_xplane_pb2", path
                )
                mod = importlib.util.module_from_spec(spec)
                sys.modules["gemnet_xplane_pb2"] = mod
                spec.loader.exec_module(mod)
                return mod
    raise ImportError(
        "xplane_pb2.py not found in site-packages; cannot parse profiler "
        "traces (searched %s)" % (_XPLANE_CANDIDATES,)
    )


def find_xspace_files(trace_dir: str) -> list[str]:
    pats = (
        os.path.join(trace_dir, "**", "*.xplane.pb"),
        os.path.join(trace_dir, "**", "*.xplane.pb.gz"),
    )
    files: list[str] = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    return sorted(files, key=os.path.getmtime)


def load_xspace(path: str):
    pb2 = _load_xplane_pb2()
    raw = (
        gzip.open(path, "rb").read()
        if path.endswith(".gz")
        else open(path, "rb").read()
    )
    xs = pb2.XSpace()
    xs.ParseFromString(raw)
    return xs


@dataclass
class ModuleTime:
    name: str
    count: int
    total_ms: float

    @property
    def mean_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


def _device_planes(xs):
    for plane in xs.planes:
        if "/device:" in plane.name and "CUPTI" not in plane.name:
            yield plane


def module_times(trace_dir_or_file: str) -> dict[str, ModuleTime]:
    """Per-XLA-module device execution time from the newest trace.

    Returns {module_name: ModuleTime} summed over all device planes' module
    lines. On TPU each event is one program execution on the chip; mean_ms of
    the train-step module IS the device step time.
    """
    path = trace_dir_or_file
    if os.path.isdir(path):
        files = find_xspace_files(path)
        if not files:
            raise FileNotFoundError(f"no .xplane.pb under {path}")
        path = files[-1]
    xs = load_xspace(path)
    out: dict[str, ModuleTime] = {}
    for plane in _device_planes(xs):
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            lname = (line.name or line.display_name).lower()
            if "module" not in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                mt = out.setdefault(name, ModuleTime(name, 0, 0.0))
                mt.count += 1
                mt.total_ms += ev.duration_ps / 1e9
    return out


def step_device_ms(trace_dir: str, match: str = "step") -> ModuleTime | None:
    """Mean device ms of the module whose name contains `match` (largest
    total if several). None if the trace has no matching module events."""
    mods = module_times(trace_dir)
    hits = [m for n, m in mods.items() if match in n]
    if not hits:
        return None
    return max(hits, key=lambda m: m.total_ms)


def op_times(trace_dir_or_file: str, module_match: str | None = None
             ) -> dict[str, ModuleTime]:
    """Per-XLA-OP device time from the newest trace ({op_name: ModuleTime}).

    Reads the "XLA Ops" lines of the device planes — one event per op
    execution inside the compiled programs (the r4c attribution in
    artifacts_r04_perf.md was read off this line by hand; this makes it a
    tool). `module_match`: not supported per-op by the XSpace schema (ops
    carry no module id on this line) — filter by tracing only the program
    of interest instead."""
    del module_match
    path = trace_dir_or_file
    if os.path.isdir(path):
        files = find_xspace_files(path)
        if not files:
            raise FileNotFoundError(f"no .xplane.pb under {path}")
        path = files[-1]
    xs = load_xspace(path)
    out: dict[str, ModuleTime] = {}
    for plane in _device_planes(xs):
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            lname = (line.name or line.display_name).lower()
            if "ops" not in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                mt = out.setdefault(name, ModuleTime(name, 0, 0.0))
                mt.count += 1
                mt.total_ms += ev.duration_ps / 1e9
    return out


def categorize_op(name: str) -> str:
    """Coarse cost category for an XLA op event (attribution buckets).

    Classifies by the HEAD op name (the `%opname.N =` prefix) plus the
    `= <result> op-kind(` body kind — NOT by substring over the whole event
    string, whose operand list leaks other ops' names (`%copy.5220` as an
    operand made every consumer count as 'copy' pre-round-5)."""
    import re

    head = name.split(" ", 1)[0].lstrip("%").lower()
    # the op KIND appears after the result type: "... = <type> kind(...".
    # Tuple result types carry parens of their own ("(bf16[...], ...)"), so
    # match the first lowercase word immediately followed by "(" — layout
    # annotations like T(8,128) start uppercase/digits and don't match.
    kind = ""
    if " = " in name:
        body = name.split(" = ", 1)[1]
        m = re.search(r"\s([a-z][a-z0-9\-_]*)\(", " " + body)
        if m:
            kind = m.group(1).lower()
    probe = head if any(head.startswith(k) for k in (
        "copy", "fusion", "reshape", "transpose", "bitcast", "slice",
        "dynamic-slice", "convolution", "dot", "while", "all-", "custom-call",
        "concatenate", "ppermute", "collective",
    )) else (kind or head)
    if "custom-call" in probe or "pallas" in probe or "custom-call" in kind:
        return "pallas"
    if probe.startswith("copy"):
        return "copy"
    if any(k in probe for k in ("all-to-all", "all-reduce", "collective",
                                "ppermute", "all-gather", "reduce-scatter")):
        return "collective"
    if "fusion" in probe or "fusion" in head:
        return "fusion"
    if any(k in probe for k in ("reshape", "transpose", "bitcast")):
        return "reshape"
    if "slice" in probe:
        return "slice"
    if "convolution" in probe or probe.startswith("dot"):
        return "dot"
    if any(k in probe for k in ("infeed", "outfeed", "send", "recv")):
        return "io"
    return "other"


def op_category_summary(trace_dir: str, n_execs: int = 1) -> dict[str, float]:
    """{category: ms per execution} over the trace's op events; divide the
    plane totals by `n_execs` program executions to get per-step ms."""
    cats: dict[str, float] = {}
    for name, mt in op_times(trace_dir).items():
        c = categorize_op(name)
        cats[c] = cats.get(c, 0.0) + mt.total_ms
    return {k: v / max(n_execs, 1) for k, v in sorted(
        cats.items(), key=lambda kv: -kv[1])}


def top_ops(trace_dir: str, k: int = 40, n_execs: int = 1) -> str:
    """Human-readable top-k ops by total device time (ms per execution)."""
    mods = op_times(trace_dir)
    lines = []
    for name, mt in sorted(mods.items(), key=lambda kv: -kv[1].total_ms)[:k]:
        lines.append(
            f"{mt.total_ms/max(n_execs,1):8.3f} ms  x{mt.count:<5d} "
            f"[{categorize_op(name):10s}] {name[:110]}"
        )
    return "\n".join(lines)


def summarize(trace_dir: str) -> str:
    lines = []
    for name, mt in sorted(
        module_times(trace_dir).items(), key=lambda kv: -kv[1].total_ms
    ):
        lines.append(
            f"{name}: {mt.count} execs, total {mt.total_ms:.3f} ms, "
            f"mean {mt.mean_ms:.4f} ms"
        )
    return "\n".join(lines) or "(no device module events in trace)"


if __name__ == "__main__":
    import sys

    print(summarize(sys.argv[1]))
