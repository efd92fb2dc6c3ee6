"""Head-to-head: reference's shipped pix_shuffle weights vs weights trained
by THIS framework, scored on identical held-out in-domain pairs.

The reference ships pix_shuffle weights trained on its own (unpublished)
corpus (/root/reference/model/model_pix_shuffle/pix_shuffle.onnx,
training_stats_pix_shuffle.csv). This framework's trainer produced a
50-epoch plateau checkpoint on the reproducible lores corpus
(artifacts/training_parity/plateau_full/, scripts/training_parity_study.py)
and a pix_shuffle_heavy checkpoint (artifacts/model_pix_shuffle_heavy/).
This script evaluates all three under ONE protocol — the training-parity
study's val pipeline (same gather, same split_pairs(seed=0) 10% held-out
pool, same deterministic SRDataset draws, same sRGB-PSNR metric) — in one
process on the TPU.

Fairness caveats (also recorded in the output JSON):
- the shipped weights never saw this corpus; the trained rows saw its other
  90%. This measures IN-DOMAIN RETRAINING VALUE (what a user gets by
  retraining on their corpus with this framework), not weight quality on
  the reference's own distribution.
- the held-out pool was the trained rows' early-stopping validation set
  (selection-only; none of its pairs were trained on).

Usage:
    python scripts/eval_headtohead.py --data /root/work/dataset_lores/train \
        [--num_samples 1024] [--out artifacts/headtohead_r4.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ONNX = "/root/reference/model/model_pix_shuffle/pix_shuffle.onnx"


def main(argv=None) -> int:
    from fs_uae_image_enhancer_project_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()  # CLI convention: JAX_PLATFORMS binds
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/work/dataset_lores/train")
    ap.add_argument("--crop_size", type=int, nargs=2, default=[376, 288])
    ap.add_argument("--num_samples", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=8)
    # anchored to the repo (not cwd): the unattended pipeline runs this
    # with an absolute script path from elsewhere
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "headtohead_r4.json"))
    args = ap.parse_args(argv)

    from fs_uae_image_enhancer_project_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax

    from fs_uae_image_enhancer_project_tpu.data import (
        SRDataset, gather_all_samples_from_directory, split_pairs,
    )
    from fs_uae_image_enhancer_project_tpu.export.onnx_import import (
        import_pix_shuffle,
    )
    from fs_uae_image_enhancer_project_tpu.models import get_model
    from fs_uae_image_enhancer_project_tpu.train.trainer import load_params

    crop = tuple(args.crop_size)
    pairs = gather_all_samples_from_directory(args.data, crop, verbose=1)
    if not pairs:
        print("no pairs found", file=sys.stderr)
        return 1
    _, val_pool = split_pairs(pairs, 0.1)  # seed=0: the study's exact split
    print(f"held-out pool: {len(val_pool)} pairs", flush=True)

    from common import vggfree_eval  # the ONE cross-run scoring protocol

    def run_row(model, params, label):
        """Same eval as training_parity_study: both call common.vggfree_eval
        (deterministic val draws seed=1, flips off, vgg-free criterion,
        sRGB PSNR) — shared by construction, not by hand-synchronization."""
        va = SRDataset(val_pool, crop, args.num_samples,
                       batch_size=args.batch_size, flips=False, seed=1,
                       transfer_dtype="uint8")
        t0 = time.perf_counter()
        r = vggfree_eval(model, params, iter(va))
        row = {
            "label": label,
            "pixel_loss_vggfree": r["loss"],
            "srgb_psnr_db": r["srgb_psnr_db"],
            "batches": r["batches"],
            "eval_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []

    # 1. reference shipped weights (its deployed pix_shuffle graph)
    imported = import_pix_shuffle(REF_ONNX)
    base = get_model("pix_shuffle")
    rows.append(run_row(base, imported.params,
                        "reference shipped pix_shuffle.onnx"))

    # 2. this framework's 50-epoch plateau checkpoint (same topology)
    # anchored to the repo root so the script works from any cwd (the
    # unattended chained pipeline runs it with an absolute script path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = os.path.join(repo, "artifacts", "training_parity", "plateau_full",
                      "checkpoint_best_pix_shuffle")
    params = load_params(ck, base.init(jax.random.key(0)))
    rows.append(run_row(base, params,
                        "trained here: pix_shuffle plateau-50"))

    # 2b. the long fresh run (scripts/train_psh_long.py), when present
    from common import TRAINED_CKPTS  # single source for local checkpoints

    ck_l = TRAINED_CKPTS["pix_shuffle_long"]
    if os.path.isdir(ck_l):
        params_l = load_params(ck_l, base.init(jax.random.key(0)))
        rows.append(run_row(base, params_l,
                            "trained here: pix_shuffle fresh run on THIS "
                            "corpus (train_psh_long)"))

    # 3. this framework's pix_shuffle_heavy (larger TPU-friendly variant).
    # The raw orbax checkpoint lives under ephemeral /root/work; when the VM
    # has been recycled the committed ONNX artifact (emitted from that same
    # checkpoint, fp32 primary graph) is the surviving weight record —
    # import it back through the round-trip importer.
    heavy = get_model("pix_shuffle", "heavy")
    ck_h = TRAINED_CKPTS["pix_shuffle_heavy"]
    onnx_h = os.path.join(repo, "artifacts", "model_pix_shuffle_heavy",
                          "pix_shuffle_heavy.onnx")
    if os.path.isdir(ck_h):
        params_h = load_params(ck_h, heavy.init(jax.random.key(0)))
        rows.append(run_row(heavy, params_h,
                            "trained here: pix_shuffle_heavy"))
    elif os.path.exists(onnx_h):
        from fs_uae_image_enhancer_project_tpu.export.onnx_import import (
            import_any,
        )

        params_h = import_any(onnx_h).params
        rows.append(run_row(heavy, params_h,
                            "trained here: pix_shuffle_heavy "
                            "(reimported from committed ONNX)"))
    else:
        print(f"skip heavy row ({ck_h} and {onnx_h} absent)", flush=True)

    report = {
        "date": time.strftime("%Y-%m-%d"),
        "harness": "scripts/eval_headtohead.py",
        "data": args.data,
        "held_out_pairs": len(val_pool),
        "num_samples": args.num_samples,
        "protocol": ("training_parity_study val pipeline: split_pairs(seed=0) "
                     "10% pool, SRDataset(seed=1, flips=False) deterministic "
                     "draws, vgg-free pixel criterion, sRGB PSNR"),
        "caveats": [
            "trained rows were trained on the superseded round-2 corpus "
            "(lost to a VM recycle); NO row — shipped or trained — ever saw "
            "a pair of this regenerated corpus, so the eval is zero-leak "
            "for every row",
            "the regenerated corpus shares the synthesis distribution with "
            "the round-2 training corpus (scripts/make_gt_frames.py scene "
            "families + the 8 reference samples), so trained rows keep a "
            "distribution advantage over the reference's shipped weights "
            "(trained on its own unpublished captures) — this measures "
            "same-distribution retraining value, not weight quality on the "
            "reference's distribution",
        ],
        "corpus_generation": "r4-rebuild (scripts/make_gt_frames.py --split; "
                             "numbers are NOT comparable to evals on the "
                             "round-2 corpus)",
        "rows": rows,
    }
    out = os.path.abspath(args.out)  # bare filenames: dirname('') fails
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
