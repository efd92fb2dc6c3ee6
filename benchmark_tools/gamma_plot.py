#!/usr/bin/env python3
"""Plot exact vs approximate sRGB<->linear transfer curves in fp32/bf16.

Counterpart of reference benchmark_tools/gamma_plot.py — justifies the
``t**2.2`` approximation used across the pipeline, now also showing the bf16
(TPU-native) error envelope instead of the reference's fp16.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from fs_uae_image_enhancer_project_tpu.ops.gamma import (  # noqa: E402
    linear_to_srgb,
    linear_to_srgb_approx,
    linear_to_srgb_poly,
    srgb_to_linear,
    srgb_to_linear_approx,
    srgb_to_linear_poly,
)


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="gamma_curves.png")
    args = ap.parse_args()

    t = np.linspace(0, 1, 1024, dtype=np.float32)
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))

    for ax, (title, exact, approx, poly) in zip(
        axes[0],
        [
            ("sRGB -> linear", srgb_to_linear, srgb_to_linear_approx, srgb_to_linear_poly),
            ("linear -> sRGB", linear_to_srgb, linear_to_srgb_approx, linear_to_srgb_poly),
        ],
    ):
        ax.plot(t, np.asarray(exact(jnp.array(t))), label="exact piecewise")
        ax.plot(t, np.asarray(approx(jnp.array(t))), "--", label="t**2.2 approx")
        ax.plot(t, np.asarray(poly(jnp.array(t))), ":", label="cubic poly")
        ax.set_title(title)
        ax.legend()

    for ax, (title, exact, approx) in zip(
        axes[1],
        [
            ("sRGB->linear abs error", srgb_to_linear, srgb_to_linear_approx),
            ("linear->sRGB abs error", linear_to_srgb, linear_to_srgb_approx),
        ],
    ):
        e32 = np.abs(
            np.asarray(exact(jnp.array(t))) - np.asarray(approx(jnp.array(t)))
        )
        tb = jnp.array(t, jnp.bfloat16)
        eb = np.abs(
            np.asarray(exact(jnp.array(t)))
            - np.asarray(approx(tb)).astype(np.float32)
        )
        ax.semilogy(t, e32 + 1e-9, label="approx err (fp32)")
        ax.semilogy(t, eb + 1e-9, "--", label="approx err (bf16)")
        ax.axhline(1 / 255, color="gray", lw=0.8, label="1/255 (8-bit LSB)")
        ax.set_title(title)
        ax.legend()

    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
