from fusiondepth_tpu.models.resnet import ResnetEncoder, RESNET_FEATURE_CHANNELS
from fusiondepth_tpu.models.depth_decoder import DepthDecoder
from fusiondepth_tpu.models.pose import PoseDecoder, PoseCNN

__all__ = [
    "ResnetEncoder",
    "RESNET_FEATURE_CHANNELS",
    "DepthDecoder",
    "PoseDecoder",
    "PoseCNN",
]
