"""ctypes bridge to the native C++ graph builder (native/graphbuild.cpp).

Compiles the shared library lazily on first use (g++ is in the image; there
is no pybind11, so the ABI is plain C structs + malloc'd buffers). Falls back
silently to the numpy builder when the toolchain or compiled library is
unavailable — `gemnet_pytorch_tpu.data.graph.build_graph` consults
`native_available()`.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "native", "graphbuild.cpp")
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "native", "_graphbuild.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


class _GraphResult(ctypes.Structure):
    _fields_ = (
        [(n, ctypes.c_int64) for n in
         ("n_edges", "n_trip", "n_int_edges", "n_intm_ca", "n_intm_db", "n_quads")]
        + [(n, ctypes.POINTER(ctypes.c_int32)) for n in
           ("id_c", "id_a", "id3_expand", "id3_reduce", "kidx3",
            "int_a", "int_b", "intm_ca", "intm_db", "intm_ab_r", "intm_ab_e",
            "q_reduce", "q_expand", "q_cab", "q_abd", "kidx4")]
    )


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / compile error -> numpy fallback
        logging.warning("native graph builder unavailable (%s); using numpy", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.build_graph_native.restype = ctypes.POINTER(_GraphResult)
        lib.build_graph_native.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
        lib.free_graph_native.argtypes = [ctypes.POINTER(_GraphResult)]
        lib.free_graph_native.restype = None
        _lib = lib
    except OSError as e:
        logging.warning("failed to load native graph builder: %s", e)
    return _lib


def native_available() -> bool:
    return _load() is not None


def _arr(ptr, n) -> np.ndarray:
    if n == 0:
        return np.zeros(0, np.int32)
    return np.ctypeslib.as_array(ptr, shape=(n,)).copy()


def build_graph_native(R: np.ndarray, N: np.ndarray, cutoff: float,
                       int_cutoff: float, triplets_only: bool):
    """Returns the raw canonical arrays (same semantics as graph.build_graph);
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    R = np.ascontiguousarray(R, np.float32)
    N = np.ascontiguousarray(N, np.int64)
    res = lib.build_graph_native(
        R.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        N.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(N), float(cutoff), float(int_cutoff), int(triplets_only),
    )
    g = res.contents
    out = dict(
        id_c=_arr(g.id_c, g.n_edges),
        id_a=_arr(g.id_a, g.n_edges),
        id3_expand_ba=_arr(g.id3_expand, g.n_trip),
        id3_reduce_ca=_arr(g.id3_reduce, g.n_trip),
        Kidx3=_arr(g.kidx3, g.n_trip),
        id4_int_a=_arr(g.int_a, g.n_int_edges),
        id4_int_b=_arr(g.int_b, g.n_int_edges),
        id4_reduce_intm_ca=_arr(g.intm_ca, g.n_intm_ca),
        id4_expand_intm_db=_arr(g.intm_db, g.n_intm_db),
        id4_reduce_intm_ab=_arr(g.intm_ab_r, g.n_intm_ca),
        id4_expand_intm_ab=_arr(g.intm_ab_e, g.n_intm_db),
        id4_reduce_ca=_arr(g.q_reduce, g.n_quads),
        id4_expand_db=_arr(g.q_expand, g.n_quads),
        id4_reduce_cab=_arr(g.q_cab, g.n_quads),
        id4_expand_abd=_arr(g.q_abd, g.n_quads),
        Kidx4=_arr(g.kidx4, g.n_quads),
    )
    lib.free_graph_native(res)
    return out
