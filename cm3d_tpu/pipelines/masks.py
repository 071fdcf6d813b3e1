"""2D mask-generation pipeline: Detic -> class-wise NMS -> SAM -> artifacts.

The TPU-native counterpart of the reference's src/nuscenes/
gen_2d_masks_detic.py __main__ (:242-513): per camera image, run the
open-vocabulary detector with the custom vocabulary, map detector labels to
canonical classes (map_class), class-wise 2D NMS at IoU 0.75, box-prompt SAM
for instance masks, store masks transposed [W, H] as COCO RLE with
labels/scores/cam_nums JSON.

Model forwards are injected callables so the pipeline runs identically with
real converted checkpoints or tiny fake-weight models (hermetic CI). Static
shapes throughout: detections padded to max_detections, so each model
compiles once per image geometry.
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from typing import Callable, List, Optional, Tuple

import numpy as np

from cm3d_tpu.config import MaskStageConfig
from cm3d_tpu.datasets.artifacts import FrameMasks, MaskArtifactStore
from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES, map_class


@dataclasses.dataclass
class MaskModels:
    """Injected model callables.

    detic(image_hwc_float_bgr) -> (boxes [D,4] xyxy, scores [D],
        class_ids [D] into the vocabulary, valid [D])
    sam_encode(image_hwc_float_rgb) -> embedding
    sam_decode(embedding, boxes [P,4]) -> mask_logits [P, H', W']
    vocabulary: detector vocabulary strings (class_ids index this)
    """

    detic: Callable
    sam_encode: Callable
    sam_decode: Callable
    vocabulary: Tuple[str, ...] = CUSTOM_VOCABULARY_NUSCENES


def classwise_nms_np(boxes, scores, labels, iou_thresh=0.75):
    """Host-side greedy class-wise NMS (reference :348-372 semantics).
    Returns indices kept, in descending score order per class iteration."""
    keep = []
    boxes = np.asarray(boxes, np.float64)
    for cls in sorted(set(labels)):
        idx = [i for i, l in enumerate(labels) if l == cls]
        idx = sorted(idx, key=lambda i: -scores[i])
        alive = set(idx)
        for a, i in enumerate(idx):
            if i not in alive:
                continue
            keep.append(i)
            x1, y1, x2, y2 = boxes[i]
            ai = max(x2 - x1, 0) * max(y2 - y1, 0)
            for j in idx[a + 1 :]:
                if j not in alive:
                    continue
                xx1, yy1 = max(x1, boxes[j][0]), max(y1, boxes[j][1])
                xx2, yy2 = min(x2, boxes[j][2]), min(y2, boxes[j][3])
                inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
                aj = max(boxes[j][2] - boxes[j][0], 0) * max(
                    boxes[j][3] - boxes[j][1], 0
                )
                if union := ai + aj - inter:
                    if inter / union > iou_thresh:
                        alive.discard(j)
    return keep


def generate_frame_masks(
    models: MaskModels,
    images: List[np.ndarray],  # per-camera RGB uint8 (already thumbnailed)
    cfg: MaskStageConfig = MaskStageConfig(),
    mask_wh: Optional[Tuple[int, int]] = None,
) -> FrameMasks:
    """One keyframe: detect + segment on every camera image."""
    all_labels: List[str] = []
    all_scores: List[float] = []
    all_cams: List[int] = []
    all_masks: List[np.ndarray] = []

    for cam_idx, rgb in enumerate(images):
        h, w = rgb.shape[:2]
        bgr = rgb[:, :, ::-1].astype(np.float32)
        boxes, scores, class_ids, valid = models.detic(bgr)
        boxes = np.asarray(boxes)[np.asarray(valid)]
        scores = np.asarray(scores)[np.asarray(valid)]
        class_ids = np.asarray(class_ids)[np.asarray(valid)]
        if len(boxes) == 0:
            continue

        labels = [map_class(models.vocabulary[c].lower()) for c in class_ids]

        if cfg.run_nms:
            kept = classwise_nms_np(boxes, scores, labels, cfg.nms_iou)
            boxes = boxes[kept]
            scores = scores[kept]
            labels = [labels[i] for i in kept]
        if len(boxes) == 0:
            continue

        # clamp to the static cap and pad the box prompts: ONE sam_decode
        # compilation for the whole run instead of one per distinct count
        boxes = boxes[: cfg.max_detections]
        scores = scores[: cfg.max_detections]
        labels = labels[: cfg.max_detections]
        n_boxes = len(boxes)
        emb = models.sam_encode(rgb)
        padded = np.zeros((cfg.max_detections, 4), np.float32)
        padded[:n_boxes] = boxes
        logits = np.asarray(models.sam_decode(emb, padded))[:n_boxes]
        masks = _logits_to_masks(logits, (h, w))

        for i in range(len(boxes)):
            # stored [W, H] like the reference (transpose, :468)
            all_masks.append(masks[i].T.astype(np.uint8))
            all_labels.append(labels[i])
            all_scores.append(float(scores[i]))
            all_cams.append(cam_idx)

    if all_masks:
        wh = all_masks[0].shape
        stacked = np.stack(all_masks)
    else:
        wh = mask_wh or (8, 8)
        stacked = np.zeros((0, wh[0], wh[1]), np.uint8)
    return FrameMasks(all_labels, all_scores, all_cams, stacked)


def _logits_to_masks(logits: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Upsample SAM mask logits to the image size and threshold at 0
    (SamPredictor.postprocess semantics; SAM pads to square, so upsample to
    the longest side and crop)."""
    h, w = hw
    side = max(h, w)
    p, mh, mw = logits.shape
    ys = (np.arange(side) + 0.5) * mh / side - 0.5
    xs = (np.arange(side) + 0.5) * mw / side - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, mh - 1)
    y1 = np.clip(y0 + 1, 0, mh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, mw - 1)
    x1 = np.clip(x0 + 1, 0, mw - 1)
    wy = np.clip(ys - y0, 0, 1)[None, :, None]
    wx = np.clip(xs - x0, 0, 1)[None, None, :]
    up = (
        logits[:, y0][:, :, x0] * (1 - wy) * (1 - wx)
        + logits[:, y0][:, :, x1] * (1 - wy) * wx
        + logits[:, y1][:, :, x0] * wy * (1 - wx)
        + logits[:, y1][:, :, x1] * wy * wx
    )
    return (up[:, :h, :w] > 0).astype(np.uint8)


def run_mask_stage(
    models: MaskModels,
    image_provider: Callable[[str, int], List[np.ndarray]],
    scenes: List[str],
    frames_per_scene: Callable[[str], int],
    out_dir: str,
    cfg: MaskStageConfig = MaskStageConfig(),
    resume: bool = True,
    verbose: bool = True,
) -> None:
    """Drive the mask stage over scenes; writes reference-layout artifacts.

    image_provider(scene, frame) -> list of per-camera RGB uint8 arrays.
    """
    store = MaskArtifactStore(out_dir)
    todo = store.remaining_scenes(scenes) if resume else list(scenes)
    t0 = time.time()
    n_frames = 0
    for scene in todo:
        nf = frames_per_scene(scene)
        for f in range(nf):
            if resume and store.has_frame(scene, f):
                continue
            images = image_provider(scene, f)
            fm = generate_frame_masks(models, images, cfg)
            store.write_frame(scene, f, fm)
            n_frames += 1
        store.mark_scene_complete(scene, nf)
        if verbose:
            print(f"{scene}: {nf} frames done")
    if verbose and n_frames:
        dt = time.time() - t0
        print(f"Took {dt:.1f} seconds for {n_frames} frames "
              f"({n_frames / dt:.2f} frames/sec).")


# ---------------------------------------------------------------------------
# Model builders
# ---------------------------------------------------------------------------

def build_real_models(
    detic_ckpt: str,
    sam_ckpt: str,
    clip_ckpt: str,
    bpe_path: str,
    vocabulary=CUSTOM_VOCABULARY_NUSCENES,
) -> MaskModels:
    """Full-size models from released torch checkpoints, jitted."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.clip_text import (
        SimpleTokenizer, convert_clip_text_params, embed_vocabulary,
    )
    from cm3d_tpu.models.convert_detic import (
        convert_detic_params, load_detic_checkpoint,
    )
    from cm3d_tpu.models.convert_sam import convert_sam_params, load_torch_state_dict
    from cm3d_tpu.models.detic import DETIC_SWINB, Detic, preprocess_bgr
    from cm3d_tpu.models.sam import SAM_VIT_H, Sam, preprocess_image

    detic_params = convert_detic_params(load_detic_checkpoint(detic_ckpt))
    sam_params = convert_sam_params(load_torch_state_dict(sam_ckpt))
    clip_params = convert_clip_text_params(load_torch_state_dict(clip_ckpt))
    tokenizer = SimpleTokenizer.from_file(bpe_path)
    classifier = jnp.asarray(
        embed_vocabulary(clip_params, tokenizer, list(vocabulary))
    )

    detic_model = Detic(DETIC_SWINB)
    sam_model = Sam(SAM_VIT_H)

    @jax.jit
    def detic_fn(img):
        det = detic_model.apply({"params": detic_params}, img, classifier)
        return det.boxes, det.scores, det.classes, det.valid

    @jax.jit
    def sam_encode(img):
        x = jnp.asarray(preprocess_image(np.asarray(img, np.uint8)))
        return sam_model.apply(
            {"params": sam_params}, x[None], method=sam_model.encode_image
        )[0]

    @jax.jit
    def sam_decode(emb, boxes):
        masks, _ = sam_model.apply(
            {"params": sam_params}, emb, jnp.asarray(boxes),
            method=sam_model.decode_boxes,
        )
        return masks

    def detic_wrapped(bgr):
        x = preprocess_bgr(bgr.astype(np.uint8))
        return detic_fn(jnp.asarray(x))

    return MaskModels(detic_wrapped, sam_encode, sam_decode, tuple(vocabulary))


def _nuscenes_provider(args):
    from PIL import Image

    from cm3d_tpu.datasets.nuscenes.tables import CAM_LIST, NuScenesTables

    nusc = NuScenesTables(args.dataroot, args.version)
    scene_names = (
        args.scenes.split(",") if args.scenes
        else [s["name"] for s in nusc.table("scene")]
    )
    samples = {
        n: list(nusc.iter_samples(nusc.scene_by_name(n))) for n in scene_names
    }

    def provider(scene, frame):
        images = []
        for cam in CAM_LIST:
            sd = nusc.get("sample_data", samples[scene][frame]["data"][cam])
            im = Image.open(f"{args.dataroot}/{sd['filename']}").convert("RGB")
            im.thumbnail((args.thumbnail, args.thumbnail))
            images.append(np.asarray(im))
        return images

    return provider, scene_names, lambda s: len(samples[s])


def _kitti_provider(args):
    """Single-camera image_2 variant (reference kitti/gen_2d_masks_detic.py;
    note its run_nms=False "wo_2d_nms" default)."""
    from PIL import Image

    from cm3d_tpu.datasets.kitti.frontend import KittiDataset

    ds = KittiDataset(args.dataroot)
    if args.scenes:
        indices = [int(i) for i in args.scenes.split(",")]
    else:
        indices = list(range(ds.num_samples))

    def provider(scene, frame):
        im = Image.open(ds.get_image_path(indices[frame])).convert("RGB")
        im.thumbnail((args.thumbnail, args.thumbnail))
        return [np.asarray(im)]

    return provider, ["kitti"], lambda s: len(indices)


def _waymo_provider(args):
    """frame-lite variant: per-camera JPEGs stored in the npz (reference
    waymo/gen_2d_masks_detic.py decodes them from the Frame proto)."""
    import io

    from PIL import Image

    from cm3d_tpu.datasets.waymo.frontend import WaymoFrontend
    from cm3d_tpu.datasets.artifacts import MaskArtifactStore

    fe = WaymoFrontend(args.dataroot, MaskArtifactStore("/nonexistent"))
    scene_names = args.scenes.split(",") if args.scenes else fe.scene_names()

    def provider(scene, frame):
        fr = fe.load_frame(fe.frame_files(scene)[frame])
        images = []
        for buf in fr["cam_images_jpeg"]:
            im = Image.open(io.BytesIO(bytes(buf))).convert("RGB")
            im.thumbnail((args.thumbnail, args.thumbnail))
            images.append(np.asarray(im))
        return images

    return provider, scene_names, lambda s: len(fe.frame_files(s))


def main(argv=None):
    """CLI: the three gen_2d_masks_detic.py forks behind one driver."""
    p = argparse.ArgumentParser(description="CM3D-TPU 2D mask generation stage")
    p.add_argument("--dataset", default="nuscenes",
                   choices=["nuscenes", "kitti", "waymo"])
    p.add_argument("--dataroot", required=True,
                   help="nuScenes root / KITTI root / waymo frame-lite root")
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--scenes", default="",
                   help="comma-separated scenes (KITTI: frame indices)")
    p.add_argument("--thumbnail", type=int, default=1024)  # reference :293
    p.add_argument("--run_nms", type=int, default=-1,
                   help="-1 = dataset default (nusc/waymo on, kitti off)")
    p.add_argument("--fake_weights", action="store_true",
                   help="tiny random-weight models (hermetic smoke run)")
    p.add_argument("--detic_ckpt", default="")
    p.add_argument("--sam_ckpt", default="")
    p.add_argument("--clip_ckpt", default="")
    p.add_argument("--bpe_path", default="")
    p.add_argument("--no_resume", action="store_true")
    args = p.parse_args(argv)

    from cm3d_tpu.vocab import CUSTOM_VOCABULARY_NUSCENES, CUSTOM_VOCABULARY_WAYMO

    provider, scene_names, frames_fn = {
        "nuscenes": _nuscenes_provider,
        "kitti": _kitti_provider,
        "waymo": _waymo_provider,
    }[args.dataset](args)

    vocab = (CUSTOM_VOCABULARY_WAYMO if args.dataset == "waymo"
             else CUSTOM_VOCABULARY_NUSCENES)
    if args.fake_weights:
        models = build_fake_models(vocabulary=vocab)
    else:
        models = build_real_models(
            args.detic_ckpt, args.sam_ckpt, args.clip_ckpt, args.bpe_path,
            vocabulary=vocab,
        )

    run_nms = (args.dataset != "kitti") if args.run_nms < 0 else bool(args.run_nms)
    cfg = MaskStageConfig(run_nms=run_nms, thumbnail=args.thumbnail)
    run_mask_stage(
        models, provider, scene_names, frames_fn, args.out_dir, cfg,
        resume=not args.no_resume,
    )


def build_fake_models(seed: int = 0, vocabulary=CUSTOM_VOCABULARY_NUSCENES) -> MaskModels:
    """Tiny random-weight models (hermetic smoke tests / CI)."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.models.detic import DETIC_TEST, Detic
    from cm3d_tpu.models.sam import SAM_TEST, Sam

    rng = np.random.default_rng(seed)
    detic_model = Detic(DETIC_TEST)
    clf = rng.standard_normal((DETIC_TEST.embed_dim, len(vocabulary))).astype(
        np.float32
    )
    clf /= np.linalg.norm(clf, axis=0, keepdims=True)
    clf = jnp.asarray(clf)

    sam_model = Sam(SAM_TEST)

    state = {}

    def detic_fn(bgr):
        x = jnp.asarray(
            (bgr - bgr.mean()) / (bgr.std() + 1e-6), dtype=jnp.float32
        )
        if "detic" not in state:
            state["detic"] = detic_model.init(jax.random.PRNGKey(seed), x, clf)[
                "params"
            ]
        det = detic_model.apply({"params": state["detic"]}, x, clf)
        return det.boxes, det.scores, det.classes, det.valid

    def sam_encode(rgb):
        side = SAM_TEST.img_size
        img = np.zeros((side, side, 3), np.float32)
        h, w = rgb.shape[:2]
        s = side / max(h, w)
        nh, nw = int(h * s), int(w * s)
        img[:nh, :nw] = np.asarray(
            jax.image.resize(jnp.asarray(rgb, jnp.float32), (nh, nw, 3), "bilinear")
        )
        x = jnp.asarray(img / 127.5 - 1.0)
        if "sam" not in state:
            boxes0 = jnp.zeros((1, 4), jnp.float32)
            state["sam"] = sam_model.init(jax.random.PRNGKey(seed + 1), x, boxes0)[
                "params"
            ]
        state["scale"] = s
        return sam_model.apply(
            {"params": state["sam"]}, x[None], method=sam_model.encode_image
        )[0]

    def sam_decode(emb, boxes):
        boxes = jnp.asarray(np.asarray(boxes) * state["scale"], jnp.float32)
        masks, _ = sam_model.apply(
            {"params": state["sam"]}, emb, boxes, method=sam_model.decode_boxes
        )
        return masks

    return MaskModels(detic_fn, sam_encode, sam_decode, tuple(vocabulary))


if __name__ == "__main__":
    main()
