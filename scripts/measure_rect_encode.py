"""Quantify SamConfig.rect_encode parity: mask-IoU delta square-pad vs
rect encode at production geometry (VERDICT round-2 next #2).

rect_encode skips the zero-padding rows of the 1024x1024 SamPredictor
square (reference gen_2d_masks_detic.py:384-398 pads to square and the
padding tokens participate in global attention). This measures how much
the decoded masks actually move, over several weight seeds and box sets.

Run: python -c "exec(open('scripts/measure_rect_encode.py').read())"
(~4 compiles of the full ViT-H encoder; minutes on the axon chip).
"""

import dataclasses as dc
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.models.sam import SAM_VIT_H, Sam

IMG_H, IMG_W = 576, 1024
N_BOXES = 64


def _upsample_to(logits, out_h, out_w):
    """Bilinear upsample [P, h, w] logits to (out_h, out_w) (align_corners
    False, same as the production postprocess)."""
    p, mh, mw = logits.shape
    ys = (np.arange(out_h) + 0.5) * mh / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * mw / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, mh - 1)
    y1 = np.clip(y0 + 1, 0, mh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, mw - 1)
    x1 = np.clip(x0 + 1, 0, mw - 1)
    wy = np.clip(ys - y0, 0, 1)[None, :, None]
    wx = np.clip(xs - x0, 0, 1)[None, None, :]
    return (
        logits[:, y0][:, :, x0] * (1 - wy) * (1 - wx)
        + logits[:, y0][:, :, x1] * (1 - wy) * wx
        + logits[:, y1][:, :, x0] * wy * (1 - wx)
        + logits[:, y1][:, :, x1] * wy * wx
    )


def _synthetic_image(rng):
    """Blobby image (pure noise has no spatial structure at all)."""
    img = rng.normal(0, 0.3, (IMG_H, IMG_W, 3)).astype(np.float32)
    for _ in range(30):
        cy, cx = rng.integers(0, IMG_H), rng.integers(0, IMG_W)
        ry, rx = rng.integers(20, 90), rng.integers(20, 120)
        col = rng.normal(0, 1.5, 3)
        yy = np.arange(IMG_H)[:, None]
        xx = np.arange(IMG_W)[None, :]
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img[m] += col
    return img


def _make_params(shapes, seed):
    key = jax.random.PRNGKey(seed)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [
            jax.random.normal(k, s.shape, s.dtype) * 0.02
            for k, s in zip(keys, leaves)
        ],
    )


def main(seeds=(0, 1, 2)):
    # one jitted (enc, dec) pair per path, reused across seeds (params are
    # arguments -> no recompiles)
    fns = {}
    for rect in (False, True):
        cfg = dc.replace(SAM_VIT_H, dtype="bfloat16", rect_encode=rect)
        model = Sam(cfg)
        shapes = jax.eval_shape(
            lambda r, m=model: m.init(
                r, jnp.zeros((1024, 1024, 3)), jnp.zeros((1, 4))
            ),
            jax.random.PRNGKey(0),
        )["params"]
        enc = jax.jit(lambda p, xi, m=model: m.apply(
            {"params": p}, xi, method=m.encode_image
        ))
        dec = jax.jit(lambda p, e, b, m=model: m.apply(
            {"params": p}, e, b, method=m.decode_boxes
        )[0])
        fns[rect] = (shapes, enc, dec)

    results = []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        img = _synthetic_image(rng)
        sq = np.zeros((1024, 1024, 3), np.float32)
        sq[:IMG_H] = img
        boxes = np.zeros((N_BOXES, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, IMG_W - 140, N_BOXES)
        boxes[:, 1] = rng.uniform(0, IMG_H - 110, N_BOXES)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(40, 140, N_BOXES)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(30, 110, N_BOXES)
        boxes_j = jnp.asarray(boxes)

        def run(rect):
            shapes, enc, dec = fns[rect]
            params = _make_params(shapes, seed)
            x = jnp.asarray(img[None] if rect else sq[None])
            emb = enc(params, x)
            np.asarray(jnp.sum(emb.astype(jnp.float32)))  # compile+sync
            t0 = time.perf_counter()
            for _ in range(5):
                emb = enc(params, x)
            np.asarray(jnp.sum(emb.astype(jnp.float32)))
            t_enc = (time.perf_counter() - t0) / 5 * 1000
            logits = np.asarray(dec(params, emb[0], boxes_j))
            return np.asarray(emb[0], np.float32), logits, t_enc

        emb_sq, log_sq, t_sq = run(False)
        emb_rc, log_rc, t_rc = run(True)
        # random ViT-H weights give degenerate (constant-sign) mask logits,
        # so thresholded-mask IoU is uninformative; compare the quantities
        # the threshold consumes instead: image-region EMBEDDINGS and the
        # decoded LOGIT field (relative error in units of its own spread).
        gh = IMG_H // 16
        e_sq = emb_sq[:gh]  # image-region rows of the square-pad encoding
        e_rc = emb_rc
        rel = np.linalg.norm(e_rc - e_sq) / np.linalg.norm(e_sq)
        cos = (e_rc * e_sq).sum(-1) / np.maximum(
            np.linalg.norm(e_rc, axis=-1) * np.linalg.norm(e_sq, axis=-1),
            1e-9,
        )
        # logits on a common grid: square's crop vs rect (rect grid is the
        # image region at the same 4x-embed resolution)
        up_sq = _upsample_to(log_sq, 1024, 1024)[:, :IMG_H]
        up_rc = _upsample_to(log_rc, IMG_H, IMG_W)
        spread = np.std(up_sq)
        logit_rel = float(np.sqrt(np.mean((up_rc - up_sq) ** 2)) / spread)
        flips = float(np.mean((up_rc > 0) != (up_sq > 0)))
        iou_masks = None
        m_sq, m_rc = up_sq > 0, up_rc > 0
        union = (m_sq | m_rc).sum((1, 2))
        nz = union > 0
        if nz.any():
            inter = (m_sq & m_rc).sum((1, 2))
            iou_masks = float(
                (inter[nz] / union[nz]).mean()
            )
        results.append({
            "seed": int(seed),
            "emb_rel_err": float(rel),
            "emb_cos_mean": float(cos.mean()),
            "emb_cos_min": float(cos.min()),
            "logit_rms_over_spread": logit_rel,
            "sign_flip_frac": flips,
            "mask_iou_nonempty": iou_masks,
            "n_nonempty": int(nz.sum()),
            "pos_frac_sq": float(m_sq.mean()),
            "enc_ms_square": round(t_sq, 1),
            "enc_ms_rect": round(t_rc, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    agg = {
        "emb_rel_err": float(np.mean([r["emb_rel_err"] for r in results])),
        "emb_cos_min": float(min(r["emb_cos_min"] for r in results)),
        "logit_rms_over_spread": float(
            np.mean([r["logit_rms_over_spread"] for r in results])
        ),
        "sign_flip_frac": float(
            np.mean([r["sign_flip_frac"] for r in results])
        ),
        "enc_ms_square": float(np.mean([r["enc_ms_square"] for r in results])),
        "enc_ms_rect": float(np.mean([r["enc_ms_rect"] for r in results])),
    }
    print("AGGREGATE " + json.dumps(agg), flush=True)
    with open("/tmp/rect_encode_parity.json", "w") as f:
        json.dump({"per_seed": results, "aggregate": agg}, f, indent=2)


main()
