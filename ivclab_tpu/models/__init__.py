from ivclab_tpu.models.intracodec import IntraCodec, IntraCodecAdaptive
from ivclab_tpu.models.predictive import (
    min_entropy_predictor,
    single_pixel_predictor,
    three_pixels_predictor,
)
from ivclab_tpu.models.yuv420 import ict_compression, yuv420compression, pad_image, crop_image
from ivclab_tpu.models.dpcm import PredictiveCodec
from ivclab_tpu.ops.motion import MotionCompensator
from ivclab_tpu.models.videocodec import VideoCodec

__all__ = [
    "IntraCodec", "IntraCodecAdaptive",
    "min_entropy_predictor", "single_pixel_predictor", "three_pixels_predictor",
    "yuv420compression", "ict_compression", "pad_image", "crop_image",
    "PredictiveCodec", "MotionCompensator", "VideoCodec",
]
