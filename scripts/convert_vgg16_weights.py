#!/usr/bin/env python3
"""One-time VGG16 weight conversion: torchvision -> NHWC npz asset.

Run this anywhere torchvision is installed (this image has none and no
network egress), then copy the output to assets/vgg16_features.npz:

    python scripts/convert_vgg16_weights.py --out vgg16_features.npz

The perceptual loss (losses/vgg.py) picks the asset up automatically.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/vgg16_features.npz")
    args = ap.parse_args()

    try:
        import torchvision.models as tvm
    except ImportError:
        print("torchvision is required (run on a machine that has it)",
              file=sys.stderr)
        return 1

    import numpy as np

    from fs_uae_image_enhancer_project_tpu.losses.vgg import (
        convert_torchvision_state_dict,
    )

    vgg = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_FEATURES)
    state = {k: np.asarray(v.detach()) for k, v in vgg.state_dict().items()}
    convert_torchvision_state_dict(state, args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
