from .graph import GraphArrays, build_graph, check_invariants, ragged_range, repeat_blocks  # noqa: F401
from .padding import PadDims, pad_batch, estimate_pad_dims  # noqa: F401
from .containers import DataContainer, Molecule  # noqa: F401
from .provider import DataProvider  # noqa: F401
from .synthetic import make_dataset  # noqa: F401
