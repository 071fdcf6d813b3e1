"""Pallas TPU kernels for the pipeline's hot ops."""

from cm3d_tpu.kernels.medoid_pallas import medoid_distance_sums_pallas

__all__ = ["medoid_distance_sums_pallas"]
