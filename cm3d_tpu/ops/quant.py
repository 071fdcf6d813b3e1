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

No calibration data is needed for the DEFAULT dynamic scheme, which
matters here: real checkpoints are not reachable in this environment.
Accuracy is pinned by tests/test_quant.py at test scale and measured at
production scale by scripts/ab_sam_int8.py (on-chip A/B vs bf16).

STATIC (calibrated) activation scales are the opt-in deploy mode
(r04 VERDICT stretch item 8, activated on evidence): the per-token
amax reduce costs a measured 13.9% of the int8 chain time at SAM MLP
shapes on-chip (scripts/ab_int8_scales.py, TPU_QUEUE_r04.log).
`static_int8_matmul` replaces the reduce with one calibrated per-tensor
scale (a param leaf, so recalibration never recompiles): run the DYNAMIC
model once over calibration batches with mutable=["intermediates"]
(QuantDense sows its input absmax), then `bake_act_scales` writes the
`act_scale` leaves the static modules consume. Out-of-envelope
activations clip to +-127 — calibrate on deploy-distribution data.
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


def static_int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    act_scale: jax.Array,
    bias: jax.Array | None = None,
    out_dtype=None,
) -> jax.Array:
    """x @ dequant(w_q) with a CALIBRATED per-tensor activation scale.

    Same s8 x s8 -> s32 MXU contraction as dynamic_int8_matmul but the
    per-token amax reduce is gone: `act_scale` is a calibrated scalar
    (bake_act_scales). Activations beyond the calibration envelope clip
    to +-127.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    s = jnp.maximum(act_scale.astype(jnp.float32), _EPS)
    x_q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s * w_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _copy_tree(d):
    return {
        k: _copy_tree(v) if isinstance(v, dict) else v for k, v in d.items()
    }


def bake_act_scales(params: dict, intermediates: dict,
                    margin: float = 1.0) -> dict:
    """Write calibrated ``act_scale`` leaves into a quantized param tree.

    ``intermediates``: the mutable-collection output of one or more
    calibration runs of the DYNAMIC model (QuantDense sows its input
    absmax under its own module path as ``act_absmax``). Every recorded
    absmax becomes ``params[<same path>]["act_scale"] = absmax * margin
    / 127`` — the leaf the static_scale=True module declares. margin > 1
    adds clipping headroom. Returns a new tree (input unmodified).
    """
    import numpy as np

    out = _copy_tree(params)

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "act_absmax":
                    vals = v if isinstance(v, (tuple, list)) else (v,)
                    amax = max(float(np.max(np.asarray(x))) for x in vals)
                    sub = out
                    for p in path:
                        sub = sub[p]
                    sub["act_scale"] = np.float32(
                        max(amax * margin, _EPS) / 127.0
                    )
                else:
                    walk(v, path + [k])

    walk(intermediates, [])
    return out


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
