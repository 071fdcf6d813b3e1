"""Checkpoint-converter verification harness.

One command that, pointed at REAL torch checkpoints (the contracts the
reference loads: SAM `sam_vit_h_4b8939.pth` and the Detic
LCOCOI21k_CLIP_SwinB model, gen_2d_masks_detic.py:30-41,112), reports —
BEFORE any pipeline run — exactly where a conversion would go wrong:

1. **Key coverage**: which state-dict keys the converter consumed and which
   it ignored (an ignored weight is a silent accuracy bug).
2. **Tree conformance**: the converted pytree vs the Flax model's own init
   tree — missing leaves, extra leaves, shape mismatches.
3. **Activation stats** (--probe): per-module output mean/std/absmax on a
   fixed seed-0 probe input, dumped as JSON. Run the same probe through the
   torch model with forward hooks and diff the two files; the first
   real-checkpoint run becomes a comparison, not a debugging session.

Usage:
  python -m cm3d_tpu.models.verify_convert --sam sam_vit_h_4b8939.pth \
      [--detic Detic_...pth] [--clip clip_text.pth] [--probe] [--out rpt.json]

Exit code 1 if any tree-conformance problem exists (ignored checkpoint keys
are reported but not fatal — torch checkpoints carry optimizer/EMA extras).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Tuple

import numpy as np


class RecordingDict(dict):
    """Dict that records which keys were read (not just tested)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.reads: set = set()

    def __getitem__(self, k):
        self.reads.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.reads.add(k)
        return super().get(k, default)


def key_coverage(sd: Dict[str, np.ndarray], convert: Callable) -> Tuple[dict, dict]:
    """Run `convert` over a recording view of sd. Returns (params, report)
    with report = {consumed: [...], ignored: [...]}."""
    rec = RecordingDict(sd)
    try:
        params = convert(rec)
    except KeyError as e:
        # the converter demands a key the checkpoint lacks — fatal
        return None, {
            "consumed": len(rec.reads),
            "ignored": sorted(set(sd) - rec.reads),
            "missing_ckpt_key": str(e),
        }
    consumed = sorted(rec.reads)
    ignored = sorted(set(sd) - rec.reads)
    return params, {"consumed": len(consumed), "ignored": ignored}


def _flatten_shapes(tree, prefix=""):
    """Leaf path -> shape tuple (leaves may be arrays or ShapeDtypeStructs)."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_shapes(v, f"{prefix}/{k}" if prefix else k))
    else:
        shape = getattr(tree, "shape", None)
        out[prefix] = tuple(shape) if shape is not None else tuple(
            np.asarray(tree).shape
        )
    return out


def tree_conformance(params: dict, init_params: dict) -> dict:
    """Converted tree vs the model's init tree: missing/extra/mismatched."""
    got = _flatten_shapes(params)
    want = _flatten_shapes(init_params)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = sorted(
        f"{k}: got {got[k]}, want {want[k]}"
        for k in set(got) & set(want)
        if got[k] != want[k]
    )
    return {"missing": missing, "extra": extra, "mismatched": mismatched}


def activation_stats(model, params, *inputs, method=None) -> Dict[str, dict]:
    """Per-module output stats via flax capture_intermediates."""
    import jax

    kwargs = {"method": method} if method else {}
    _, state = model.apply(
        {"params": params}, *inputs, capture_intermediates=True,
        mutable=["intermediates"], **kwargs,
    )

    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "__call__" in node:
                val = node["__call__"][0]
                leaves = [x for x in jax.tree.leaves(val)
                          if hasattr(x, "shape") and x.size]
                if leaves:
                    x = np.asarray(leaves[0], np.float32)
                    out[path] = {
                        "shape": list(x.shape),
                        "mean": float(x.mean()),
                        "std": float(x.std()),
                        "absmax": float(np.abs(x).max()),
                    }
            for k, v in node.items():
                if k != "__call__":
                    walk(v, f"{path}/{k}" if path else k)

    walk(state["intermediates"], "")
    return out


def _base_report(params, cov, init) -> dict:
    if params is None:
        tree = {
            "missing": [f"<conversion failed: {cov['missing_ckpt_key']}>"],
            "extra": [], "mismatched": [],
        }
    else:
        tree = tree_conformance(params, init)
    return {"coverage": cov, "tree": tree}


# ---------------------------------------------------------------------------
# Per-model drivers
# ---------------------------------------------------------------------------

def verify_sam(sd: Dict[str, np.ndarray], probe: bool = False, cfg=None) -> dict:
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.convert_sam import convert_sam_params
    from cm3d_tpu.models.sam import SAM_VIT_H, Sam

    cfg = cfg or SAM_VIT_H
    params, cov = key_coverage(sd, lambda s: convert_sam_params(s, cfg))
    model = Sam(cfg)
    img0 = jnp.zeros((cfg.img_size, cfg.img_size, 3), jnp.float32)
    boxes0 = jnp.zeros((2, 4), jnp.float32)
    init = jax.eval_shape(
        lambda r: model.init(r, img0, boxes0), jax.random.PRNGKey(0)
    )["params"]
    report = _base_report(params, cov, init)
    if probe and params is not None:
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal(img0.shape).astype(np.float32))
        bx = jnp.asarray([[10.0, 20.0, 200.0, 300.0]], jnp.float32)
        report["activations"] = activation_stats(model, params, img, bx)
    return report


def verify_detic(sd: Dict[str, np.ndarray], probe: bool = False, cfg=None) -> dict:
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.convert_detic import convert_detic_params
    from cm3d_tpu.models.detic import DETIC_SWINB, Detic

    cfg = cfg or DETIC_SWINB
    params, cov = key_coverage(sd, lambda s: convert_detic_params(s, cfg))
    model = Detic(cfg)
    img0 = jnp.zeros((256, 256, 3), jnp.float32)
    clf0 = jnp.zeros((cfg.embed_dim, 4), jnp.float32)
    init = jax.eval_shape(
        lambda r: model.init(r, img0, clf0), jax.random.PRNGKey(0)
    )["params"]
    report = _base_report(params, cov, init)
    if probe and params is not None:
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((256, 256, 3)).astype(np.float32))
        clf = jnp.asarray(rng.standard_normal((cfg.embed_dim, 4)).astype(np.float32))
        clf = clf / jnp.linalg.norm(clf, axis=0, keepdims=True)
        report["activations"] = activation_stats(model, params, img, clf)
    return report


def verify_clip(sd: Dict[str, np.ndarray], probe: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.clip_text import (
        CLIP_TEXT_B32, ClipTextEncoder, convert_clip_text_params,
    )

    params, cov = key_coverage(sd, convert_clip_text_params)
    model = ClipTextEncoder(CLIP_TEXT_B32)
    toks0 = jnp.zeros((1, CLIP_TEXT_B32.context_length), jnp.int32)
    init = jax.eval_shape(
        lambda r: model.init(r, toks0), jax.random.PRNGKey(0)
    )["params"]
    report = _base_report(params, cov, init)
    if probe and params is not None:
        rng = np.random.default_rng(0)
        toks = jnp.asarray(
            rng.integers(0, 1000, (1, CLIP_TEXT_B32.context_length)), jnp.int32
        )
        report["activations"] = activation_stats(model, params, toks)
    return report


def verify_zoe(sd: Dict[str, np.ndarray], probe: bool = False, cfg=None) -> dict:
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.zoedepth import (
        ZOE_N, ZoeDepthModel, convert_zoedepth_params,
    )

    cfg = cfg or ZOE_N
    params, cov = key_coverage(
        sd, lambda s: convert_zoedepth_params(s, cfg)
    )
    model = ZoeDepthModel(cfg)
    h, w = cfg.img_hw
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    init = jax.eval_shape(
        lambda r: model.init(r, x0), jax.random.PRNGKey(0)
    )["params"]
    report = _base_report(params, cov, init)
    if probe and params is not None:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
        report["activations"] = activation_stats(model, params, x)
    return report


def verify_gdino(sd: Dict[str, np.ndarray], probe: bool = False,
                 cfg=None) -> dict:
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.gdino import (
        GDINO_SWINT, GroundingDino, convert_gdino_params,
    )

    cfg = cfg or GDINO_SWINT
    params, cov = key_coverage(
        sd, lambda s: convert_gdino_params(s, cfg)
    )
    model = GroundingDino(cfg)
    h, w = cfg.img_hw
    L = cfg.max_text_len
    args = (
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L, L), bool), jnp.ones((1, L), bool),
    )
    init = jax.eval_shape(
        lambda r: model.init(r, *args), jax.random.PRNGKey(0)
    )["params"]
    return _base_report(params, cov, init)


def has_problems(report: dict) -> bool:
    t = report["tree"]
    return bool(t["missing"] or t["extra"] or t["mismatched"])


def main(argv=None) -> int:
    import argparse

    from cm3d_tpu.models.convert_sam import load_torch_state_dict

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sam", default="")
    p.add_argument("--sam_size", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"],
                   help="SAM encoder scale matching --sam")
    p.add_argument("--detic", default="")
    p.add_argument("--clip", default="")
    p.add_argument("--zoe", default="")
    p.add_argument("--gdino", default="")
    p.add_argument("--probe", action="store_true",
                   help="also dump per-module activation stats")
    p.add_argument("--out", default="", help="write the full report JSON here")
    args = p.parse_args(argv)

    import functools

    from cm3d_tpu.models.sam import sam_config_for

    full = {}
    rc = 0
    for name, path, fn in [
        ("sam", args.sam,
         functools.partial(verify_sam, cfg=sam_config_for(args.sam_size))),
        ("detic", args.detic, verify_detic),
        ("clip", args.clip, verify_clip),
        ("zoe", args.zoe, verify_zoe),
        ("gdino", args.gdino, verify_gdino),
    ]:
        if not path:
            continue
        if name == "detic":
            from cm3d_tpu.models.convert_detic import load_detic_checkpoint

            sd = load_detic_checkpoint(path)
        else:
            sd = load_torch_state_dict(path)
        rep = fn(sd, probe=args.probe)
        full[name] = rep
        t = rep["tree"]
        print(f"[{name}] consumed={rep['coverage']['consumed']} "
              f"ignored={len(rep['coverage']['ignored'])} "
              f"missing={len(t['missing'])} extra={len(t['extra'])} "
              f"mismatched={len(t['mismatched'])}")
        for kind in ("missing", "extra", "mismatched"):
            for item in t[kind][:20]:
                print(f"  {kind}: {item}")
        for item in rep["coverage"]["ignored"][:20]:
            print(f"  ignored ckpt key: {item}")
        if has_problems(rep):
            rc = 1
    if args.out:
        with open(args.out, "w") as f:
            json.dump(full, f, indent=1)
        print(f"report -> {args.out}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
