from vqgan_tpu.ops.gradnorm import gradnorm
from vqgan_tpu.ops.heatmap import blurriness_heatmap
from vqgan_tpu.ops.normalization import group_norm_fp32
from vqgan_tpu.ops.resize import area_downsample, nearest_upsample_2x, resize_area
from vqgan_tpu.ops.wavelet import wavelet_transform_multi_channel

__all__ = [
    "gradnorm",
    "blurriness_heatmap",
    "group_norm_fp32",
    "area_downsample",
    "nearest_upsample_2x",
    "resize_area",
    "wavelet_transform_multi_channel",
]
