#!/usr/bin/env python3
"""Build this framework's shipped artifacts — the counterpart of the
reference's model/model_*/ directories (.onnx + .onnx.svg + predicted/
sample frames, SURVEY §2 "Shipped artifacts").

For each model with reference weights available, this script:
1. imports the shipped reference ONNX weights,
2. re-exports them through OUR exporter (artifacts/<name>/<name>.onnx),
3. renders the graph SVG,
4. enhances the 8 committed Amiga sample frames with the native jax path
   (artifacts/<name>/predicted/sample*.png),
5. writes a parity report (PSNR vs the reference's committed outputs).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import (  # noqa: E402
    CURRENT_CORPUS_TAG, REF, TRAINED_CKPTS, psnr_u8 as _psnr,
)


def _stamp_weights(report: dict, weights_src: str) -> None:
    """Record corpus provenance for trained weights.

    Checkpoints under ephemeral /root/work are necessarily trained on the
    CURRENT corpus (a VM recycle destroys both together), so a trained
    weights_src gets the current tag. eval_headtohead reads this back to
    choose the honest per-row fairness caveat when it falls back to a
    committed ONNX after a recycle (advisor round-5 finding: the fallback
    previously hard-assumed round-2 provenance)."""
    if weights_src.startswith("trained"):
        report["weights_corpus_tag"] = CURRENT_CORPUS_TAG

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def build_conv_stack_artifacts() -> None:
    """conv3/conv5 family: parity of our deployed jax path against the
    SHIPPED GRAPH itself (executed with the numpy ONNX runner), which is the
    right truth for these models — their deployed graphs differ from
    training semantics (fused relu-before-add, no final sigmoid; see
    export/onnx_import.py doc). Also re-exports each family through OUR
    exporter (deployable .onnx per family) and round-trip-verifies the
    exported graph against the shipped graph."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import enhance_from_onnx
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv_stack_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_any
    from fs_uae_image_enhancer_project_tpu.export.onnx_runner import run_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_svg
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model
    from fs_uae_image_enhancer_project_tpu.models.configs import ConvStackConfig

    for name in ("conv3", "conv3_heavy", "conv5", "conv5_heavy"):
        src = f"{REF}/model_{name}/{name}.onnx"
        if not os.path.exists(src):
            continue
        out_dir = os.path.join(OUT, f"model_{name}")
        os.makedirs(os.path.join(out_dir, "predicted"), exist_ok=True)
        model = load_model(src)
        with open(os.path.join(out_dir, f"{name}.onnx.svg"), "w") as f:
            f.write(render_svg(model.graph, title=f"{name}.onnx"))

        # re-export through our exporter with the shipped graph's semantics
        imp = import_any(src)
        cfg = ConvStackConfig(
            channels=tuple(
                imp.params[f"conv{i + 1}"]["w"].shape[-1]
                for i in range(imp.num_conv_layers)
            ),
            residual_layers=imp.residual_layers,
            final_act="none",
        )
        onnx_out = os.path.join(out_dir, f"{name}.onnx")
        export_conv_stack_onnx(
            imp.params, cfg, onnx_out, fp16=True,
            relu_before_residual_add=imp.relu_before_residual_add,
        )
        ours_graph = load_model(onnx_out)

        enhance = enhance_from_onnx(src, donate=False, compute_dtype=jnp.float32)
        report = {}
        roundtrip = {}
        for i in range(8):
            frame = np.asarray(Image.open(f"{REF}/samples/sample{i}.png"))
            ours = np.asarray(enhance(jnp.asarray(frame[None])))[0]
            Image.fromarray(ours, mode="RGBA").save(
                os.path.join(out_dir, "predicted", f"sample{i}.png")
            )
            truth = run_model(model, {"input_rgba_chunky": frame[None]})[
                "output_rgba_uint8_chunky"
            ][0]
            report[f"sample{i}_psnr_vs_shipped_graph_db"] = _psnr(
                ours[..., :3], truth[..., :3]
            )
            if i in (0, 6):  # exported-graph round trip (numpy runner, slow)
                re_out = run_model(
                    ours_graph, {"input_rgba_chunky": frame[None]}
                )["output_rgba_uint8_chunky"][0]
                roundtrip[f"sample{i}_psnr_exported_vs_shipped_db"] = _psnr(
                    re_out[..., :3], truth[..., :3]
                )
        report["min_psnr_db"] = min(report.values())
        report.update(roundtrip)
        with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(name, json.dumps(report), flush=True)


def _verify_8_samples(name, out_dir, graph, enhance, report):
    """Unified full-frame parity evidence (one schema for ALL families —
    the reference's own evidence bar is 8 predicted frames per model,
    model_*/predicted/): for each committed Amiga sample, run the exported
    graph through the numpy ONNX runner and the native jax path, record
    per-sample exported-vs-native PSNR + min, and ship the native frames
    as predicted/."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.onnx_runner import run_model

    os.makedirs(os.path.join(out_dir, "predicted"), exist_ok=True)
    keys = []
    for i in range(8):
        frame = np.asarray(Image.open(f"{REF}/samples/sample{i}.png"))
        native = np.asarray(enhance(jnp.asarray(frame[None])))[0]
        Image.fromarray(native, mode="RGBA").save(
            os.path.join(out_dir, "predicted", f"sample{i}.png")
        )
        g = run_model(graph, {"input_rgba_chunky": frame[None]})[
            "output_rgba_uint8_chunky"
        ][0]
        key = f"sample{i}_psnr_exported_vs_native_db"
        report[key] = _psnr(g[..., :3], native[..., :3])
        keys.append(key)
        print(f"  {name} sample{i}: {report[key]} dB", flush=True)
    report["min_psnr_db"] = min(report[k] for k in keys)
    return report


def build_pix_shuffle_heavy_artifact() -> None:
    """Heavyweight pix_shuffle: no shipped reference weights exist, so this
    ships this framework's trained weights when available (fresh-init
    fallback), verified by round-tripping the exported graph against the
    native jax path on the 8 committed sample frames."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_pix_shuffle_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_runner import run_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_file
    from fs_uae_image_enhancer_project_tpu.models import get_model

    name = "pix_shuffle_heavy"
    out_dir = os.path.join(OUT, f"model_{name}")
    os.makedirs(out_dir, exist_ok=True)
    m = get_model("pix_shuffle", "heavyweight")
    params, weights_src = _family_params(name, m)

    enhance = make_enhance_fn(
        m.apply, params, crop_left=16, compute_dtype=jnp.float32,
        donate=False,
    )

    # Primary artifact is fp32: the fp16 weight rounding alone capped the
    # exported-vs-native round trip at 59.9 dB (round-2 report), below the
    # >=64 dB family bar. The fp16 variant is kept alongside (deployment
    # size parity with the reference's shipped fp16 artifacts) with its
    # measured figure in the report.
    report = {"weights": weights_src + " — no shipped reference heavy weights"}
    _stamp_weights(report, weights_src)
    onnx_out = os.path.join(out_dir, f"{name}.onnx")
    export_pix_shuffle_onnx(params, m.config, onnx_out, crop_left=16,
                            fp16=False)
    render_file(onnx_out)
    _verify_8_samples(name, out_dir, load_model(onnx_out), enhance, report)

    fp16_out = os.path.join(out_dir, f"{name}_fp16.onnx")
    export_pix_shuffle_onnx(params, m.config, fp16_out, crop_left=16,
                            fp16=True)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
    native = np.asarray(enhance(jnp.asarray(frame)))[0]
    g16 = run_model(load_model(fp16_out), {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"
    ][0]
    report["random_frame_psnr_exported_fp16_vs_native_db"] = _psnr(
        g16[..., :3], native[..., :3]
    )
    report["note"] = (
        "primary graph carries fp32 weights; the fp16 variant's lower "
        "figure is the fp16 weight-rounding floor, not an export defect"
    )
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(name, json.dumps(report), flush=True)


# Trained checkpoints from the round-3 TPU runs (CLAUDE.md "Local assets");
# the builders fall back to fresh-init when absent so the script still runs
# in a bare environment — but never silently downgrade committed trained
# artifacts: the report's "weights" field always states which was used.
def _family_params(name, m):
    """(params, weights_description) — trained checkpoint if available."""
    import jax

    params = m.init(jax.random.key(0))
    ck = TRAINED_CKPTS.get(name)
    if ck and os.path.isdir(ck):
        from fs_uae_image_enhancer_project_tpu.train.trainer import load_params

        try:
            return load_params(ck, params), f"trained ({ck})"
        except Exception as e:  # e.g. TPU-sharded orbax ckpt on a CPU run
            print(f"WARNING: {name}: trained checkpoint {ck} unrestorable "
                  f"({type(e).__name__}: {e}); falling back to fresh-init — "
                  "run this script on the TPU backend to keep the trained "
                  "artifact", file=sys.stderr)
    return params, "fresh-init (no trained checkpoint found)"


def build_conv6_artifact() -> None:
    """conv6 deployment artifact (the reference never shipped the module,
    let alone weights): fp32 graph from the trained checkpoint when
    available, verified by _verify_8_samples (8 full 576x752 frames through
    the numpy runner vs the native jax path — the unified evidence schema;
    budget minutes of runtime on this single-CPU VM)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_conv6_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_file
    from fs_uae_image_enhancer_project_tpu.models import get_model

    name = "conv6"
    out_dir = os.path.join(OUT, f"model_{name}")
    os.makedirs(out_dir, exist_ok=True)
    m = get_model(name)
    params, weights_src = _family_params(name, m)
    onnx_out = os.path.join(out_dir, f"{name}.onnx")
    export_conv6_onnx(params, m.config, onnx_out, fp16=False)
    render_file(onnx_out)

    enhance = make_enhance_fn(m.apply, params, crop_left=0,
                              compute_dtype=jnp.float32, donate=False)
    report = {
        "weights": weights_src + " — reference never shipped the conv6 module",
    }
    _stamp_weights(report, weights_src)
    _verify_8_samples(name, out_dir, load_model(onnx_out), enhance, report)
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(name, json.dumps(report), flush=True)


def build_pix_shuffle_trained_artifact() -> None:
    """Ship THIS framework's trained pix_shuffle weights as a full deploy
    artifact (VERDICT r5 item 2). Unlike artifacts/model_pix_shuffle/ (which
    carries the reference's shipped weights re-exported for parity), this
    directory carries the repo-trained checkpoint that wins the head-to-head
    (artifacts/headtohead_r5*.json: 33.67 vs 31.38 dB sRGB PSNR on the
    held-out pool). Counterpart of the reference's model/model_pix_shuffle/
    (its shipped production weights)."""
    import glob

    import numpy as np

    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_pix_shuffle_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_runner import run_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_file
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.train.trainer import load_params

    name = "pix_shuffle_trained"
    out_dir = os.path.join(OUT, f"model_{name}")
    os.makedirs(out_dir, exist_ok=True)
    m = get_model("pix_shuffle")

    # The committed snapshot (survives VM recycles) is the primary weight
    # source; the ephemeral /root/work long-run checkpoint is the fallback
    # for in-flight runs that haven't been snapshotted yet.
    # numeric epoch sort: lexicographic order would rank epoch100 < epoch73
    # and ship stale weights the first time a second snapshot lands
    def _epoch_num(path: str) -> int:
        import re

        mnum = re.search(r"epoch(\d+)$", path)
        return int(mnum.group(1)) if mnum else -1

    cks = sorted(
        glob.glob(os.path.join(
            OUT, "model_pix_shuffle_trained", "checkpoint_best_epoch*")),
        key=_epoch_num,
    )
    ck = cks[-1] if cks else TRAINED_CKPTS["pix_shuffle_long"]
    if not os.path.isdir(ck):
        print(f"skip {name}: no trained checkpoint at {ck}", file=sys.stderr)
        return
    params = load_params(ck, m.init(jax.random.key(0)))

    enhance = make_enhance_fn(
        m.apply, params, crop_left=16, compute_dtype=jnp.float32,
        donate=False,
    )
    # fp32 primary graph (same rationale as the heavy family: fp16 weight
    # rounding alone would cap the round trip below the >=64 dB bar); fp16
    # variant alongside for deployment-size parity with the reference.
    report = {"weights": f"trained ({ck})"}
    _stamp_weights(report, "trained")
    onnx_out = os.path.join(out_dir, f"{name}.onnx")
    export_pix_shuffle_onnx(params, m.config, onnx_out, crop_left=16,
                            fp16=False)
    render_file(onnx_out)
    _verify_8_samples(name, out_dir, load_model(onnx_out), enhance, report)

    fp16_out = os.path.join(out_dir, f"{name}_fp16.onnx")
    export_pix_shuffle_onnx(params, m.config, fp16_out, crop_left=16,
                            fp16=True)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (1, 576, 752, 4), dtype=np.uint8)
    native = np.asarray(enhance(jnp.asarray(frame)))[0]
    g16 = run_model(load_model(fp16_out), {"input_rgba_chunky": frame})[
        "output_rgba_uint8_chunky"
    ][0]
    report["random_frame_psnr_exported_fp16_vs_native_db"] = _psnr(
        g16[..., :3], native[..., :3]
    )
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(name, json.dumps(report), flush=True)


def build_residual_unet_artifact() -> None:
    """Residual U-Net deployment artifact (fresh-init — the reference has
    no unet export path or artifacts at all; torch2onnx.py covers only the
    conv/pix_shuffle families). fp32 graph, verified by _verify_8_samples
    (8 full 576x752 frames through the numpy runner vs the native jax path
    — the unified evidence schema; full-frame numpy-runner execution of a
    depth-3 unet costs minutes per frame on this single-CPU VM, accepted
    as the price of uniform evidence)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import make_enhance_fn
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_residual_unet_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_proto import load_model
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_file
    from fs_uae_image_enhancer_project_tpu.models import get_model

    name = "residual_unet"
    out_dir = os.path.join(OUT, f"model_{name}")
    os.makedirs(out_dir, exist_ok=True)
    m = get_model(name)
    params, weights_src = _family_params(name, m)
    onnx_out = os.path.join(out_dir, f"{name}.onnx")
    export_residual_unet_onnx(params, m.config, onnx_out, crop_left=16,
                              fp16=False)
    render_file(onnx_out)

    enhance = make_enhance_fn(
        lambda p, x: m.apply(p, x), params, crop_left=16,
        compute_dtype=jnp.float32, donate=False,
    )
    report = {
        "weights": weights_src + " — the reference has no unet artifacts",
    }
    _stamp_weights(report, weights_src)
    _verify_8_samples(name, out_dir, load_model(onnx_out), enhance, report)
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(name, json.dumps(report), flush=True)


def main() -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of builders to run: conv_stack, "
                         "pix_shuffle_heavy, pix_shuffle_trained, "
                         "residual_unet, conv6, pix_shuffle")
    args = ap.parse_args()

    def want(tag: str) -> bool:
        return args.only is None or tag in args.only

    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from fs_uae_image_enhancer_project_tpu.export.enhance import enhance_from_onnx
    from fs_uae_image_enhancer_project_tpu.export.onnx_export import (
        export_pix_shuffle_onnx,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import import_pix_shuffle
    from fs_uae_image_enhancer_project_tpu.export.onnx_svg import render_file
    from fs_uae_image_enhancer_project_tpu.models import get_model

    if not os.path.isdir(REF):
        print("reference tree unavailable; nothing to build", file=sys.stderr)
        return 1

    if want("conv_stack"):
        build_conv_stack_artifacts()
    if want("pix_shuffle_heavy"):
        build_pix_shuffle_heavy_artifact()
    if want("pix_shuffle_trained"):
        build_pix_shuffle_trained_artifact()
    if want("residual_unet"):
        build_residual_unet_artifact()
    if want("conv6"):
        build_conv6_artifact()
    if not want("pix_shuffle"):
        return 0

    name = "pix_shuffle"
    out_dir = os.path.join(OUT, f"model_{name}")
    os.makedirs(os.path.join(out_dir, "predicted"), exist_ok=True)

    src = f"{REF}/model_{name}/{name}.onnx"
    imp = import_pix_shuffle(src)
    m = get_model(name)

    onnx_out = os.path.join(out_dir, f"{name}.onnx")
    export_pix_shuffle_onnx(
        imp.params, m.config, onnx_out, crop_left=imp.crop_left, fp16=True,
        srgb_to_linear_exponent=imp.srgb_to_linear_exponent,
        linear_to_srgb_exponent=imp.linear_to_srgb_exponent,
    )
    render_file(onnx_out)
    print(f"exported {onnx_out} (+ .svg)")

    enhance = enhance_from_onnx(src, donate=False, compute_dtype=jnp.float32)
    report = {}
    for i in range(8):
        frame = np.asarray(Image.open(f"{REF}/samples/sample{i}.png"))
        out = np.asarray(enhance(jnp.asarray(frame[None])))[0]
        Image.fromarray(out, mode="RGBA").save(
            os.path.join(out_dir, "predicted", f"sample{i}.png")
        )
        ref = np.asarray(
            Image.open(f"{REF}/model_{name}/predicted/sample{i}.png").convert("RGB")
        )
        mse = np.mean(
            (out[..., :3].astype(np.float64) - ref.astype(np.float64)) ** 2
        )
        report[f"sample{i}_psnr_db"] = round(
            99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse), 2
        )
    report["min_psnr_db"] = min(v for v in report.values())
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
