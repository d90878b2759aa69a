from .torch_import import import_reference_state_dict, map_reference_name  # noqa: F401
from .tf_import import load_tf_checkpoint, tf_variable_names  # noqa: F401
