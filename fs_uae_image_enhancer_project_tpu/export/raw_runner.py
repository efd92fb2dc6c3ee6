"""End-to-end smoke runner: raw framebuffer dump -> enhanced PNG.

Counterpart of reference
``convertion_tools/convert_raw_to_png_using_final_model.py``: reads a raw
752x576x4 uint8 RGBA file (an FS-UAE framebuffer capture), runs the deployed
enhance artifact, saves the uint8 RGBA result as PNG — defining the
deployment I/O contract in one small module. The model can come from a
shipped/exported .onnx (executed natively on TPU via the weight importer) or
from a jax.export artifact.
"""
from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

from .. import FRAME_H, FRAME_W


def load_raw_rgba(
    path: str, width: int = FRAME_W, height: int = FRAME_H
) -> np.ndarray:
    """Raw uint8 RGBA dump -> (1, H, W, 4), validating the byte count
    (reference convert_raw_to_png_using_final_model.py:10-37)."""
    data = np.fromfile(path, dtype=np.uint8)
    expected = width * height * 4
    if data.size != expected:
        raise ValueError(
            f"raw file {path} has {data.size} bytes, expected {expected} "
            f"({width}x{height}x4 RGBA)"
        )
    return data.reshape(1, height, width, 4)


def save_rgba_png(frame: np.ndarray, out_path: str) -> None:
    from PIL import Image

    Image.fromarray(frame, mode="RGBA").save(out_path)


def run_inference(
    model_path: str, raw_path: str, out_path: str, verbose: int = 1
) -> np.ndarray:
    """raw RGBA file -> enhance -> RGBA PNG."""
    frame = load_raw_rgba(raw_path)
    if model_path.endswith(".onnx"):
        from .enhance import enhance_from_onnx

        enhance = enhance_from_onnx(model_path, donate=False)
        out = np.asarray(enhance(frame))
    else:
        from .stablehlo import load_enhance

        enhance = load_enhance(model_path)
        out = np.asarray(enhance(frame))
    save_rgba_png(out[0], out_path)
    if verbose:
        print(f"wrote {out_path} ({out.shape[2]}x{out.shape[1]})")
    return out


def main(argv=None) -> int:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import argparse

    ap = argparse.ArgumentParser(description="Raw framebuffer -> enhanced PNG")
    ap.add_argument("--model", required=True, help=".onnx or jax.export artifact")
    ap.add_argument("--raw", required=True, help="raw 752x576x4 RGBA file")
    ap.add_argument("--out", required=True, help="output PNG path")
    args = ap.parse_args(argv)
    run_inference(args.model, args.raw, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
