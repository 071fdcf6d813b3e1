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
        save_params(params, f"{args.out_dir}/sam_{args.sam_size}")
        print(f"saved sam_{args.sam_size}")
    if args.detic:
        from cm3d_tpu.models.convert_detic import (
            convert_detic_params, load_detic_checkpoint,
        )

        params = convert_detic_params(load_detic_checkpoint(args.detic))
        save_params(params, f"{args.out_dir}/detic_swinb")
        print("saved detic_swinb")
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
        save_params(params, f"{args.out_dir}/gdino_swint")
        print("saved gdino_swint")


if __name__ == "__main__":
    main()
