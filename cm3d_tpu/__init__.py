"""cm3d_tpu — TPU-native shelf-supervised 3D pseudo-label generation.

A ground-up JAX/XLA/Pallas rebuild of the CM3D pipeline ("Shelf-Supervised
Cross-Modal Pre-Training for 3D Object Detection", CoRL 2024): open-vocabulary
2D detection + SAM masks, LiDAR 2D->3D lifting, map-prior box orientation,
BEV circle-NMS, detection evaluation, and late fusion — designed TPU-first:

- one geometry/lifting core of pure, fixed-shape JAX functions (the reference
  is three hand-forked per-dataset CUDA/torch scripts);
- dataset frontends (nuScenes / Waymo / KITTI) that normalize everything to a
  canonical `KeyframeBatch`, sharded over a device mesh with `shard_map`;
- Pallas kernels for the hot ops (tiled medoid distance-sums, range-image
  unprojection);
- a C++ runtime for host-side work (COCO RLE codec, Hungarian rotated-IoU
  matching, Waymo detection metrics CLI).

Reference: meharkhurana03/cm3d (mounted read-only at /root/reference).
"""

__version__ = "0.1.0"

from cm3d_tpu import geometry, ops  # noqa: F401
