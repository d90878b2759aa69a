from .torch_import import import_reference_state_dict, map_reference_name  # noqa: F401
