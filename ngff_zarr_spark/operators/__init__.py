from .downsample import (
    bin_shrink,
    nearest,
    mode_downsample,
    mode_downsample_centered,
    label_downsample,
    crop_to_factor,
)
from .gaussian import gaussian_blur, gaussian_downsample, fixed_point_weights
from .slicing import level_pick, roi, timepoint, channel, transpose_dims
from .stats import min_max, chunk_cost

__all__ = [
    "bin_shrink",
    "nearest",
    "mode_downsample",
    "mode_downsample_centered",
    "label_downsample",
    "crop_to_factor",
    "gaussian_blur",
    "gaussian_downsample",
    "fixed_point_weights",
    "level_pick",
    "roi",
    "timepoint",
    "channel",
    "transpose_dims",
    "min_max",
    "chunk_cost",
]
