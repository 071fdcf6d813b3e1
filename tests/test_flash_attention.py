"""Pallas flash attention w/ decomposed rel-pos vs the XLA reference path
(interpreter mode, CPU CI)."""

import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.kernels.flash_attention import flash_attention_relpos
from cm3d_tpu.models.common import add_decomposed_rel_pos

RNG = np.random.default_rng(0)


def _xla_reference(q_scaled, k, v, q_raw, rel_pos_h, rel_pos_w, hw):
    attn = q_scaled @ jnp.swapaxes(k, -2, -1)
    attn = add_decomposed_rel_pos(attn, q_raw, rel_pos_h, rel_pos_w, hw, hw)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return attn @ v.astype(jnp.float32)


def test_flash_matches_xla_path():
    heads, gh, gw, d = 3, 16, 32, 24
    n = gh * gw  # 512, divisible by 128
    scale = d ** -0.5
    q = RNG.standard_normal((heads, n, d)).astype(np.float32)
    k = RNG.standard_normal((heads, n, d)).astype(np.float32)
    v = RNG.standard_normal((heads, n, d)).astype(np.float32)
    rel_pos_h = RNG.standard_normal((2 * gh - 1, d)).astype(np.float32) * 0.2
    rel_pos_w = RNG.standard_normal((2 * gw - 1, d)).astype(np.float32) * 0.2

    ref = _xla_reference(
        jnp.asarray(q) * scale, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q), jnp.asarray(rel_pos_h), jnp.asarray(rel_pos_w),
        (gh, gw),
    )

    from cm3d_tpu.models.common import get_rel_pos

    rh = get_rel_pos(gh, gh, jnp.asarray(rel_pos_h))
    rw = get_rel_pos(gw, gw, jnp.asarray(rel_pos_w))
    r_q = jnp.asarray(q).reshape(heads, gh, gw, d)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh).reshape(heads, n, gh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw).reshape(heads, n, gw)

    out = flash_attention_relpos(
        jnp.asarray(q) * scale, jnp.asarray(k), jnp.asarray(v),
        bias_h, bias_w, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_head_dim_padding():
    """Non-128 head dims are zero-padded; outputs must be unaffected."""
    heads, gh, gw, d = 2, 8, 16, 80
    n = gh * gw
    q = RNG.standard_normal((heads, n, d)).astype(np.float32) * 0.3
    k = RNG.standard_normal((heads, n, d)).astype(np.float32) * 0.3
    v = RNG.standard_normal((heads, n, d)).astype(np.float32)
    bias_h = RNG.standard_normal((heads, n, gh)).astype(np.float32) * 0.1
    bias_w = RNG.standard_normal((heads, n, gw)).astype(np.float32) * 0.1

    out = flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias_h), jnp.asarray(bias_w), interpret=True,
    )
    # dense reference with the bias applied directly
    s = jnp.einsum("hqd,hkd->hqk", q, k)
    bias = (bias_h[:, :, :, None] + bias_w[:, :, None, :]).reshape(heads, n, n)
    p = jax.nn.softmax(s + bias, axis=-1)
    ref = jnp.einsum("hqk,hkd->hqd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sam_encoder_flash_flag_consistency():
    """On CPU the flash flag is inert (backend gate) — encoder must run."""
    from cm3d_tpu.models.sam import SAM_TEST, Sam

    model = Sam(SAM_TEST)
    img = jnp.asarray(
        RNG.standard_normal((SAM_TEST.img_size, SAM_TEST.img_size, 3)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), img, jnp.zeros((1, 4)))["params"]
    emb = model.apply({"params": params}, img[None], method=model.encode_image)
    assert np.isfinite(np.asarray(emb)).all()


def test_flash_qkv_matches_xla_path():
    """The layout-neutral qkv entry point (natural [B,N,3,H,d] operand) must
    match the dense XLA reference including the in-kernel q scaling."""
    from cm3d_tpu.kernels.flash_attention import flash_attention_qkv
    from cm3d_tpu.models.common import get_rel_pos

    b, heads, gh, gw, d = 2, 3, 16, 32, 24
    n = gh * gw
    scale = d ** -0.5
    qkv = RNG.standard_normal((b, n, 3, heads, d)).astype(np.float32)
    rel_pos_h = RNG.standard_normal((2 * gh - 1, d)).astype(np.float32) * 0.2
    rel_pos_w = RNG.standard_normal((2 * gw - 1, d)).astype(np.float32) * 0.2

    rh = get_rel_pos(gh, gh, jnp.asarray(rel_pos_h))
    rw = get_rel_pos(gw, gw, jnp.asarray(rel_pos_w))
    q5 = jnp.asarray(qkv[:, :, 0]).reshape(b, gh, gw, heads, d)
    bias_h = jnp.einsum("bxyhc,xkc->bhxyk", q5, rh).reshape(b, heads, n, gh)
    bias_w = jnp.einsum("bxyhc,ykc->bhxyk", q5, rw).reshape(b, heads, n, gw)

    out = flash_attention_qkv(
        jnp.asarray(qkv), bias_h, bias_w, interpret=True
    )  # [b, n, heads, d]

    # dense reference per (batch, head)
    q = np.moveaxis(qkv[:, :, 0], -2, 1)  # [b, heads, n, d]
    k = np.moveaxis(qkv[:, :, 1], -2, 1)
    v = np.moveaxis(qkv[:, :, 2], -2, 1)
    s = np.einsum("bhqd,bhkd->bhqk", q * scale, k).reshape(
        b, heads, n, gh, gw
    )
    s = s + np.asarray(bias_h).reshape(b, heads, n, gh, 1)
    s = s + np.asarray(bias_w).reshape(b, heads, n, 1, gw)
    s = s.reshape(b, heads, n, n)
    p = jax.nn.softmax(jnp.asarray(s), axis=-1)
    ref = np.einsum("bhqk,bhkd->bqhd", np.asarray(p), v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
