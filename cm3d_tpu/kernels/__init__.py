"""Pallas TPU kernels for the pipeline's hot ops."""

from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas
from cm3d_tpu.kernels.medoid_pallas import (
    medoid_distance_sums_pallas,
    medoid_distance_sums_rows_pallas,
)

__all__ = [
    "compact_rows_pallas",
    "medoid_distance_sums_pallas",
    "medoid_distance_sums_rows_pallas",
]
