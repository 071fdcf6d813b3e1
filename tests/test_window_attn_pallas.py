"""Fused window-attention kernel vs a straight-line reference of the
unfused Swin path (LayerNorm -> partition -> per-head attention + rel-pos
bias [+ shift mask] -> proj -> unpartition). Interpret mode on the CPU
mesh (every Pallas kernel gets an off-chip test — VERDICT round-2 #8)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cm3d_tpu.kernels.window_attn_pallas import (
    expand_bias_interleaved,
    expand_blockdiag,
    fused_window_attn,
    pick_group,
)

RNG = np.random.default_rng(5)


def _layernorm(x, g, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    return xc / np.sqrt(var + eps) * g + b


def _ref_window_attn(x, g, b, wqkv, bqkv, wproj, bproj, bias_hnn, mask,
                     win, heads):
    """Unfused reference (mirrors models/swin.py _attn_branch_xla
    math, float64-free numpy)."""
    B, Hp, Wp, C = x.shape
    hd = C // heads
    n = win * win
    ln = _layernorm(x, g, b)
    w_ = ln.reshape(B, Hp // win, win, Wp // win, win, C)
    w_ = w_.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, C)  # [B*nW, n, C]
    qkv = w_ @ wqkv + bqkv
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    out = np.zeros_like(w_)
    n_w = (Hp // win) * (Wp // win)
    for bw in range(w_.shape[0]):
        widx = bw % n_w
        for h in range(heads):
            qh = q[bw, :, h * hd:(h + 1) * hd] * hd ** -0.5
            kh = k[bw, :, h * hd:(h + 1) * hd]
            vh = v[bw, :, h * hd:(h + 1) * hd]
            s = qh @ kh.T + bias_hnn[h]
            if mask is not None:
                s = s + mask[widx]
            s = s - s.max(-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(-1, keepdims=True)
            out[bw, :, h * hd:(h + 1) * hd] = p @ vh
    out = out @ wproj + bproj
    out = out.reshape(B, Hp // win, Wp // win, win, win, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)


def _mk(win, G, n_wy, n_gx, C, heads, seed=0):
    rng = np.random.default_rng(seed)
    Hp, Wp = n_wy * win, n_gx * G * win
    x = rng.normal(0, 1, (2, Hp, Wp, C)).astype(np.float32)
    g = rng.normal(1, 0.1, C).astype(np.float32)
    b = rng.normal(0, 0.1, C).astype(np.float32)
    wqkv = (rng.normal(0, 0.05, (C, 3 * C))).astype(np.float32)
    bqkv = rng.normal(0, 0.02, 3 * C).astype(np.float32)
    wproj = (rng.normal(0, 0.05, (C, C))).astype(np.float32)
    bproj = rng.normal(0, 0.02, C).astype(np.float32)
    n = win * win
    bias = rng.normal(0, 0.5, (heads, n, n)).astype(np.float32)
    return x, g, b, wqkv, bqkv, wproj, bproj, bias


@pytest.mark.parametrize("win,G,n_wy,n_gx,C,heads", [
    (4, 2, 2, 2, 32, 4),   # swin-test-like
    (7, 3, 2, 1, 64, 8),   # odd window
    (4, 1, 3, 2, 16, 2),   # single-window groups
])
def test_fused_matches_reference(win, G, n_wy, n_gx, C, heads):
    x, g, b, wqkv, bqkv, wproj, bproj, bias = _mk(win, G, n_wy, n_gx, C,
                                                  heads)
    btil = expand_bias_interleaved(jnp.asarray(bias), win, G)
    out = fused_window_attn(
        jnp.asarray(x), g, b, wqkv, bqkv, wproj, bproj, btil, None,
        win=win, G=G, heads=heads, dtype="float32", interpret=True,
    )
    ref = _ref_window_attn(x, g, b, wqkv, bqkv, wproj, bproj, bias, None,
                           win, heads)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_fused_with_shift_mask():
    from cm3d_tpu.models.swin import _shift_attn_mask

    win, G, n_wy, n_gx, C, heads = 4, 2, 2, 2, 32, 4
    x, g, b, wqkv, bqkv, wproj, bproj, bias = _mk(win, G, n_wy, n_gx, C,
                                                  heads, seed=3)
    Hp, Wp = n_wy * win, n_gx * G * win
    mask = _shift_attn_mask(Hp, Wp, win, win // 2)  # [nW, n, n]
    n_wx = Wp // win
    mask_b = jnp.asarray(mask).reshape(n_wy, n_gx, G, win * win, win * win)
    mtil = expand_blockdiag(mask_b, win)  # [nWy, nGx, T, T]
    btil = expand_bias_interleaved(jnp.asarray(bias), win, G)
    out = fused_window_attn(
        jnp.asarray(x), g, b, wqkv, bqkv, wproj, bproj, btil, mtil,
        win=win, G=G, heads=heads, dtype="float32", interpret=True,
    )
    ref = _ref_window_attn(x, g, b, wqkv, bqkv, wproj, bproj, bias, mask,
                           win, heads)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
    assert n_wx == n_gx * G


def test_vmap_folds_into_grid():
    """vmap over the batched call must fold into the kernel grid (the
    custom_vmap rule) and match per-sample results."""
    win, G, n_wy, n_gx, C, heads = 4, 2, 2, 1, 16, 2
    x, g, b, wqkv, bqkv, wproj, bproj, bias = _mk(win, G, n_wy, n_gx, C,
                                                  heads, seed=9)
    btil = expand_bias_interleaved(jnp.asarray(bias), win, G)

    def run(xb):
        return fused_window_attn(
            xb, g, b, wqkv, bqkv, wproj, bproj, btil, None,
            win=win, G=G, heads=heads, dtype="float32", interpret=True,
        )

    x3 = jnp.stack([jnp.asarray(x), jnp.asarray(x[::-1])])  # [2, B, ...]
    out = jax.vmap(run)(x3)
    ref = _ref_window_attn(x, g, b, wqkv, bqkv, wproj, bproj, bias, None,
                           win, heads)
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1]), ref[::-1], rtol=2e-4,
                               atol=2e-4)


def test_pick_group():
    assert pick_group(6, 49) == 6
    assert pick_group(37, 49) == 10
    assert pick_group(5, 196) == 2
    assert pick_group(1, 10_000) == 1


def _ref_relpos_window_attn(x, g, b, wqkv, bqkv, wproj, bproj, rel_h,
                            rel_w, win, heads):
    """Unfused SAM-windowed reference: LN -> partition -> per-head attn
    with decomposed rel-pos (raw-q bias) -> proj -> unpartition."""
    B, Hp, Wp, C = x.shape
    hd = C // heads
    n = win * win
    ln = _layernorm(x, g, b)
    w_ = ln.reshape(B, Hp // win, win, Wp // win, win, C)
    w_ = w_.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, C)
    qkv = w_ @ wqkv + bqkv
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    # Rh[qr, kr] = rel_h[qr - kr + win - 1]
    idx = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    Rh = rel_h[idx]  # [win, win, hd]
    Rw = rel_w[idx]
    out = np.zeros_like(w_)
    for bw in range(w_.shape[0]):
        for h in range(heads):
            qh = q[bw, :, h * hd:(h + 1) * hd]
            kh = k[bw, :, h * hd:(h + 1) * hd]
            vh = v[bw, :, h * hd:(h + 1) * hd]
            s = (qh * hd ** -0.5) @ kh.T  # [n, n]
            q4 = qh.reshape(win, win, hd)
            bias_h = np.einsum("rcd,rkd->rck", q4, Rh)  # [r, c, kx]
            bias_w = np.einsum("rcd,ckd->rck", q4, Rw)  # [r, c, kc]
            s = s.reshape(win, win, win, win)
            s = s + bias_h[:, :, :, None] + bias_w[:, :, None, :]
            s = s.reshape(n, n)
            s = s - s.max(-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(-1, keepdims=True)
            out[bw, :, h * hd:(h + 1) * hd] = p @ vh
    out = out @ wproj + bproj
    out = out.reshape(B, Hp // win, Wp // win, win, win, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)


@pytest.mark.parametrize("win,G,n_wy,n_gx,C,heads", [
    (4, 2, 2, 2, 32, 4),
    (7, 1, 2, 3, 64, 8),
    (2, 3, 2, 1, 16, 2),
])
def test_fused_relpos_matches_reference(win, G, n_wy, n_gx, C, heads):
    from cm3d_tpu.kernels.window_attn_pallas import fused_window_attn_relpos

    x, g, b, wqkv, bqkv, wproj, bproj, _ = _mk(win, G, n_wy, n_gx, C,
                                               heads, seed=21)
    rng = np.random.default_rng(31)
    hd = C // heads
    rel_h = rng.normal(0, 0.3, (2 * win - 1, hd)).astype(np.float32)
    rel_w = rng.normal(0, 0.3, (2 * win - 1, hd)).astype(np.float32)
    out = fused_window_attn_relpos(
        jnp.asarray(x), g, b, wqkv, bqkv, wproj, bproj, rel_h, rel_w,
        win=win, G=G, heads=heads, dtype="float32", interpret=True,
    )
    ref = _ref_relpos_window_attn(x, g, b, wqkv, bqkv, wproj, bproj,
                                  rel_h, rel_w, win, heads)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)


def test_sam_encoder_fused_full_parity():
    """Full SAM_TEST encoder: fused windowed blocks (interpret) == unfused,
    same param tree, including a non-window-divisible rect grid."""
    import dataclasses as dc

    from cm3d_tpu.models.sam import SAM_TEST, Sam

    cfg = dc.replace(SAM_TEST, window_size=3)  # 4x4 grid -> pads to 6x6
    model = Sam(cfg)
    model_f = Sam(dc.replace(cfg, fused_window_attn="interpret"))
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.normal(0, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(
            np.float32
        )
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x[0]),
                        jnp.zeros((1, 4)))["params"]
    pf = model_f.init(jax.random.PRNGKey(0), jnp.zeros_like(x[0]),
                      jnp.zeros((1, 4)))["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pf)

    ref = model.apply({"params": params}, x, method=model.encode_image)
    got = model_f.apply({"params": params}, x, method=model_f.encode_image)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4
    )


def test_heads_and_vmem_guards():
    """Trace-time guards: a non-divisible head count would leave scratch
    columns UNINITIALIZED (silent corruption on hardware; interpret mode
    zero-fills, so only the guard can catch it), and an over-VMEM tiling
    must fail with actionable advice, not Mosaic's opaque alloc error."""
    import pytest

    x, g, b, wqkv, bqkv, wproj, bproj, bias = _mk(4, 2, 2, 2, 32, 4)
    btil = expand_bias_interleaved(jnp.asarray(bias), 4, 2)
    with pytest.raises(ValueError, match="not divisible by heads"):
        fused_window_attn(
            jnp.asarray(x), g, b, wqkv, bqkv, wproj, bproj, btil, None,
            win=4, G=2, heads=5, dtype="float32", interpret=True,
        )

    from cm3d_tpu.kernels.window_attn_pallas import _check_heads_vmem

    with pytest.raises(ValueError, match="VMEM"):
        # SAM-scale channels with an absurd group: heads*T*T f32 alone
        # blows the 100 MB cap
        _check_heads_vmem("x", 1280, 16, 14, 64, "bfloat16", has_btil=True)
    # production configs pass: SwinB deepest stage and SAM ViT-H windows
    _check_heads_vmem("x", 1024, 32, 7, 10, "bfloat16", has_btil=True)
    _check_heads_vmem("x", 1280, 16, 14, 2, "bfloat16", has_btil=False)
