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
                   "(SAM encoder Dense, detector Swin MLPs) and save "
                   "pre-quantized *_int8 trees: ~4x smaller deploy "
                   "artifacts, no per-start quantize cost; load with "
                   "--quant_int8 on the CLIs (the builders detect "
                   "kernel_q leaves and skip re-quantizing)")
    args = p.parse_args()

    from cm3d_tpu.models.checkpoints import save_params

    if args.sam:
        from cm3d_tpu.models.convert_sam import (
            convert_sam_params, load_torch_state_dict,
        )
        from cm3d_tpu.models.sam import sam_config_for

        params = convert_sam_params(
            load_torch_state_dict(args.sam), sam_config_for(args.sam_size)
        )
        name = f"sam_{args.sam_size}"
        if args.quant_int8:
            from cm3d_tpu.models.sam import quantize_sam_params

            params = quantize_sam_params(params)
            name += "_int8"
        save_params(params, f"{args.out_dir}/{name}")
        print(f"saved {name}")
    if args.detic:
        from cm3d_tpu.models.convert_detic import (
            convert_detic_params, load_detic_checkpoint,
        )

        params = convert_detic_params(load_detic_checkpoint(args.detic))
        name = "detic_swinb"
        if args.quant_int8:
            from cm3d_tpu.models.detic import quantize_detic_params

            params = quantize_detic_params(params)
            name += "_int8"
        save_params(params, f"{args.out_dir}/{name}")
        print(f"saved {name}")
    if args.clip:
        from cm3d_tpu.models.clip_text import convert_clip_text_params
        from cm3d_tpu.models.convert_sam import load_torch_state_dict

        params = convert_clip_text_params(load_torch_state_dict(args.clip))
        save_params(params, f"{args.out_dir}/clip_text")
        print("saved clip_text")
    if args.zoe:
        from cm3d_tpu.models.convert_sam import load_torch_state_dict
        from cm3d_tpu.models.zoedepth import convert_zoedepth_params

        params = convert_zoedepth_params(load_torch_state_dict(args.zoe))
        save_params(params, f"{args.out_dir}/zoedepth_n")
        print("saved zoedepth_n")
    if args.gdino:
        from cm3d_tpu.models.convert_sam import load_torch_state_dict
        from cm3d_tpu.models.gdino import GDINO_SWINT, convert_gdino_params

        params = convert_gdino_params(load_torch_state_dict(args.gdino),
                                      GDINO_SWINT)
        name = "gdino_swint"
        if args.quant_int8:
            from cm3d_tpu.models.swin import quantize_swin_backbone

            params = quantize_swin_backbone(params)
            name += "_int8"
        save_params(params, f"{args.out_dir}/{name}")
        print(f"saved {name}")


if __name__ == "__main__":
    main()
