"""Pallas TPU kernels: fused MFCC front-end, wavefront DTW (SURVEY.md §2c)."""

from dsp_tpu.kernels.mfcc_pallas import mfcc_frames_pallas, mfcc_pallas
from dsp_tpu.kernels.dtw_pallas import (
    dtw_batch_pallas,
    dtw_from_cost_pallas,
    dtw_pairs_pallas,
    skew_cost,
)

__all__ = [
    "mfcc_frames_pallas", "mfcc_pallas",
    "dtw_batch_pallas", "dtw_from_cost_pallas", "dtw_pairs_pallas", "skew_cost",
]

from dsp_tpu.kernels.dtw_fused import dtw_batch_fused  # noqa: E402

__all__.append("dtw_batch_fused")
