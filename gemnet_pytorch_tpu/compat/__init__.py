from .torch_import import import_reference_state_dict, map_reference_name  # noqa: F401
from .torch_export import (  # noqa: F401
    export_reference_state_dict,
    save_reference_checkpoint,
)
from .tf_import import (  # noqa: F401
    apply_tf_variables,
    load_tf_checkpoint,
    tf_variable_names,
)
