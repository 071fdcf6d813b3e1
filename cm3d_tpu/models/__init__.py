"""TPU-native (JAX/Flax) inference models for the 2D stage.

The reference runs Detic (SwinB + CenterNet2 + CLIP-embedding classifier)
and SAM ViT-H through torch/CUDA (src/nuscenes/gen_2d_masks_detic.py:30-41,
112,248-252); here the same architectures are implemented in Flax so the 2D
stage compiles to XLA and shards over the device mesh. Weight converters map
the published torch checkpoints into these modules.
"""
