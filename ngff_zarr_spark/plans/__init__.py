from .planner import (
    pyramid_scale_factors,
    relative_dim_factors,
    update_previous_dim_factors,
    compute_sigma,
    next_scale_metadata,
    propagate_scale_translation,
    next_block_shape,
    aligned_chunks,
)

__all__ = [
    "pyramid_scale_factors",
    "relative_dim_factors",
    "update_previous_dim_factors",
    "compute_sigma",
    "next_scale_metadata",
    "propagate_scale_translation",
    "next_block_shape",
    "aligned_chunks",
]
