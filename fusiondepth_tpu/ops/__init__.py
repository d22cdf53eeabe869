from fusiondepth_tpu.ops.depth import disp_to_depth, depth_errors
from fusiondepth_tpu.ops.pose import (
    rot_from_axisangle,
    transformation_from_parameters,
)
from fusiondepth_tpu.ops.geometry import (
    backproject_depth,
    project_3d,
    cat_xy,
    pixel_grid,
)
from fusiondepth_tpu.ops.sampling import grid_sample
from fusiondepth_tpu.ops.ssim import ssim
from fusiondepth_tpu.ops.resize import resize_bilinear, upsample2x_nearest
from fusiondepth_tpu.ops.losses import (
    reprojection_loss,
    smoothness_loss,
    si_loss,
    masked_mean,
)

__all__ = [
    "disp_to_depth",
    "depth_errors",
    "rot_from_axisangle",
    "transformation_from_parameters",
    "backproject_depth",
    "project_3d",
    "cat_xy",
    "pixel_grid",
    "grid_sample",
    "ssim",
    "resize_bilinear",
    "upsample2x_nearest",
    "reprojection_loss",
    "smoothness_loss",
    "si_loss",
    "masked_mean",
]
