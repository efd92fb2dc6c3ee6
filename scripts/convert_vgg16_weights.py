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

    # inline numpy-only conversion: importing losses.vgg would pull in jax,
    # and torch+jax in one process stalls on some machines (CLAUDE.md); this
    # script must also run where only torchvision exists.
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26]
    vgg = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_FEATURES)
    state = {k: np.asarray(v.detach()) for k, v in vgg.state_dict().items()}
    out = {}
    for i in conv_indices:
        w = np.asarray(state[f"features.{i}.weight"], np.float32)
        out[f"features.{i}.weight"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        out[f"features.{i}.bias"] = np.asarray(
            state[f"features.{i}.bias"], np.float32
        )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
