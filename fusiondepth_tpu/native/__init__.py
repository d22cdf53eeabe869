from fusiondepth_tpu.native.native import (
    available,
    expand_two_channel_native,
    max_pool2_native,
    project_points_native,
)

__all__ = [
    "available",
    "expand_two_channel_native",
    "max_pool2_native",
    "project_points_native",
]
