from .gemnet import GemNet, energy_and_forces, make_model  # noqa: F401
from .scaling import (  # noqa: F401
    load_scales_from_json,
    save_scales_json,
    scale_names_in_creation_order,
)
