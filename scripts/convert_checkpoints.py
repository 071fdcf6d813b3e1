"""One-time conversion of the released torch checkpoints to orbax trees.

Usage (in an environment with the checkpoint files present):
  python scripts/convert_checkpoints.py \
      --sam sam_vit_h_4b8939.pth --detic Detic_LCOCOI21k_....pth \
      --clip detic_clip_text.pth --out_dir converted/

Afterwards the mask-stage CLI loads them via cm3d_tpu.models.checkpoints.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sam", default="")
    p.add_argument("--sam_size", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"],
                   help="SAM encoder scale matching --sam")
    p.add_argument("--detic", default="")
    p.add_argument("--clip", default="")
    p.add_argument("--zoe", default="")
    p.add_argument("--gdino", default="")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--quant_int8", action="store_true",
                   help="also apply the int8 w8a8 load-time transforms "
                   "and save pre-quantized *_int8 trees (no per-start "
                   "quantize cost; SAM shrinks ~3.7x since its encoder "
                   "Dense layers dominate its params, Detic/GDINO only "
                   "~1.2-1.4x since just their Swin MLPs quantize; CLIP/"
                   "Zoe are never quantized and ignore this flag); load "
                   "with --quant_int8 on the CLIs (the builders detect "
                   "kernel_q leaves and skip re-quantizing)")
    args = p.parse_args()

    from cm3d_tpu.models.checkpoints import save_params

    def save_maybe_quantized(params, base_name, quant_fn):
        """One definition of the *_int8 naming + quantize step."""
        name = base_name
        if args.quant_int8 and quant_fn is not None:
            params = quant_fn(params)
            name += "_int8"
        save_params(params, f"{args.out_dir}/{name}")
        print(f"saved {name}")

    if args.sam:
        from cm3d_tpu.models.convert_sam import (
            convert_sam_params, load_torch_state_dict,
        )
        from cm3d_tpu.models.sam import sam_config_for

        from cm3d_tpu.models.sam import quantize_sam_params

        params = convert_sam_params(
            load_torch_state_dict(args.sam), sam_config_for(args.sam_size)
        )
        save_maybe_quantized(params, f"sam_{args.sam_size}",
                             quantize_sam_params)
    if args.detic:
        from cm3d_tpu.models.convert_detic import (
            convert_detic_params, load_detic_checkpoint,
        )

        from cm3d_tpu.models.detic import quantize_detic_params

        params = convert_detic_params(load_detic_checkpoint(args.detic))
        save_maybe_quantized(params, "detic_swinb", quantize_detic_params)
    if args.clip:
        from cm3d_tpu.models.clip_text import convert_clip_text_params
        from cm3d_tpu.models.convert_sam import load_torch_state_dict

        params = convert_clip_text_params(load_torch_state_dict(args.clip))
        save_maybe_quantized(params, "clip_text", None)
    if args.zoe:
        from cm3d_tpu.models.convert_sam import load_torch_state_dict
        from cm3d_tpu.models.zoedepth import convert_zoedepth_params

        params = convert_zoedepth_params(load_torch_state_dict(args.zoe))
        save_maybe_quantized(params, "zoedepth_n", None)
    if args.gdino:
        from cm3d_tpu.models.convert_sam import load_torch_state_dict
        from cm3d_tpu.models.gdino import GDINO_SWINT, convert_gdino_params

        from cm3d_tpu.models.swin import quantize_swin_backbone

        params = convert_gdino_params(load_torch_state_dict(args.gdino),
                                      GDINO_SWINT)
        save_maybe_quantized(params, "gdino_swint", quantize_swin_backbone)


if __name__ == "__main__":
    main()
