"""Dynamic int8 (w8a8) quantized matmul primitives for the 2D-stage
encoders.

The mask stage's end-to-end floor is the SAM ViT-H image encoder, which is
MXU-bound on its Dense layers (qkv / proj / MLP: ~92% of encode FLOPs; the
reference runs the same model in fp16 CUDA, src/nuscenes/
gen_2d_masks_detic.py:384-398). TPU MXUs run s8 x s8 -> s32 at twice the
bf16 peak (v5e: 394 INT8 TOPS vs 197 bf16 TFLOPS), so an int8 path halves
the compute-bound part of the encode at a small, measured accuracy cost.

Scheme (standard per-channel weight / per-token dynamic activation
symmetric quantization):
  - weights:     int8 per OUTPUT channel, scale = amax(|w|, axis=in) / 127,
                 computed ONCE at load time (`quantize_dense_params`) so the
                 hot path never re-reads float weights;
  - activations: int8 per token (row), scale = amax(|x|, axis=-1) / 127,
                 computed in-graph — two cheap VPU passes that XLA fuses
                 into the producing/consuming elementwise kernels;
  - accumulate in int32 on the MXU, dequantize by (row_scale x col_scale).

No calibration data is needed (dynamic activation scales), which matters
here: real checkpoints are not reachable in this environment, so a static
(calibrated) scheme could not be validated. Accuracy is pinned by
tests/test_quant.py at test scale and measured at production scale by
scripts/ab_sam_int8.py (on-chip A/B vs the bf16 encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_weight(w: jax.Array, axis: int = 0):
    """Symmetric per-output-channel int8 quantization of a dense kernel.

    w: float [in, out] (axis=0 reduces over `in`, i.e. one scale per output
    feature). Returns (w_q int8 [in, out], scale f32 [out]) with
    w ~= w_q * scale.
    """
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=axis), _EPS) / 127.0
    w_q = jnp.round(w / jnp.expand_dims(scale, axis)).astype(jnp.int8)
    return w_q, scale


def quantize_dense_params(p: dict) -> dict:
    """nn.Dense param subtree {kernel[, bias]} -> QuantDense subtree
    {kernel_q, kernel_scale[, bias]} (models/common.py QuantDense).

    A one-time load transform: checkpoints and converters stay float; the
    quantized tree is what gets replicated to devices (half the bytes of
    bf16, a quarter of f32).
    """
    w_q, scale = quantize_weight(p["kernel"])
    out = {"kernel_q": w_q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def is_quantized_tree(params) -> bool:
    """True if the param tree contains QuantDense leaves (a `kernel_q`
    key anywhere) — i.e. it was already transformed by a quantize_*
    helper or loaded from a pre-quantized deployment checkpoint
    (scripts/convert_checkpoints.py --quant_int8)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, _leaf in flat:
        for entry in path:
            if getattr(entry, "key", None) == "kernel_q":
                return True
    return False


def reconcile_quantization(params, transform, want: bool, name: str):
    """Bring a loaded param tree in line with the quant_int8 setting.

    want=True: transform float trees, pass pre-quantized trees through
    (no double-quantization). want=False: float trees pass through, but a
    pre-quantized tree is a hard error — the float module cannot consume
    it and silently mis-keyed apply errors are much harder to diagnose.
    """
    have = is_quantized_tree(params)
    if want:
        return params if have else transform(params)
    if have:
        raise ValueError(
            f"{name} checkpoint is int8-quantized (kernel_q leaves present)"
            " — pass --quant_int8, or convert a float checkpoint"
        )
    return params


def dynamic_int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array | None = None,
    out_dtype=None,
) -> jax.Array:
    """x @ dequant(w_q) with per-row dynamic int8 activation quantization.

    x: float [..., in]; w_q: int8 [in, out]; w_scale: f32 [out].
    The contraction runs s8 x s8 -> s32 (MXU int8 path via
    preferred_element_type); scales/bias apply in f32 and the result casts
    to out_dtype (default: x.dtype).
    """
    if out_dtype is None:
        out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, _EPS) / 127.0
    # |xf / x_scale| <= 127 by construction: no clipping needed
    x_q = jnp.round(xf / x_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
