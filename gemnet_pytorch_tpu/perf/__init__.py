from .roofline import (  # noqa: F401
    kernel_census,
    pallas_costs,
    roofline_report,
    speed_of_light,
    xla_costs,
)
