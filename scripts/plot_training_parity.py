#!/usr/bin/env python3
"""Plot the plateau run's validation curve against the SHAPE of the
reference's committed pix_shuffle history.

The two curves are different metrics on different corpora (the reference's
0.11051 came from pretrained-VGG perceptual loss on its 50k-photo corpus;
ours is the random-VGG fallback on the generated corpus), so the comparable
quantity is the normalized TRAJECTORY: each curve is indexed to its own
epoch-1 value (skill rule: two measures of different scale -> index to a
common base, never dual axes).

Reads the round-5 94-epoch full-criterion curve
(artifacts/model_pix_shuffle_trained/training_stats_pix_shuffle.csv — the
run that superseded plateau_full/ on the regenerated corpus; override with
PARITY_OURS_CSV) and
/root/reference/model/model_pix_shuffle/training_stats_pix_shuffle.csv;
writes artifacts/training_parity/val_curve_comparison.png + the underlying
points as JSON.
"""
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "artifacts", "training_parity")
OURS = os.environ.get("PARITY_OURS_CSV") or os.path.join(
    REPO, "artifacts", "model_pix_shuffle_trained",
    "training_stats_pix_shuffle.csv")
REF = "/root/reference/model/model_pix_shuffle/training_stats_pix_shuffle.csv"

# validated categorical palette, light mode (dataviz reference instance)
BLUE = "#2a78d6"   # slot 1 -> this framework
ORANGE = "#eb6834"  # slot 2 -> reference
INK = "#3d3d3a"
MUTED = "#8a897f"


def read_curve(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    header, rows = rows[0], rows[1:]
    ei = header.index("Epoch")
    vi = [i for i, h in enumerate(header) if "Validation" in h][0]
    # CSV resume can duplicate epochs across stages: keep the LAST write
    # in FILE order (sorting first would keep the largest value instead —
    # the stale pre-resume row whenever the resumed epoch improved)
    dedup = {}
    for r in rows:
        dedup[int(r[ei])] = float(r[vi])
    return sorted(dedup.items())


def main() -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ours = read_curve(OURS)
    ref = read_curve(REF)
    if not ours:
        print("no plateau run data yet", file=sys.stderr)
        return 1

    def indexed(pts):
        base = pts[0][1]
        return [e for e, _ in pts], [v / base for _, v in pts]

    xo, yo = indexed(ours)
    xr, yr = indexed(ref)

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    ax.plot(xr, yr, color=ORANGE, lw=2, label="reference (pretrained VGG, 50k-photo corpus)")
    ax.plot(xo, yo, color=BLUE, lw=2, label="this framework (random-VGG fallback, generated corpus)")
    # selective direct labels: the final point of each curve
    ax.annotate(f"{yr[-1]:.2f}", (xr[-1], yr[-1]), textcoords="offset points",
                xytext=(6, 0), color=INK, fontsize=9)
    ax.annotate(f"{yo[-1]:.2f}", (xo[-1], yo[-1]), textcoords="offset points",
                xytext=(6, 0), color=INK, fontsize=9)
    ax.set_xlabel("epoch", color=INK)
    ax.set_ylabel("validation loss, indexed to epoch 1", color=INK)
    ax.set_title(
        "pix_shuffle validation trajectory — shape comparison\n"
        "(different loss metrics and corpora; curves indexed to their own epoch 1)",
        color=INK, fontsize=11,
    )
    ax.grid(True, color="#e5e4dd", lw=0.8)
    ax.tick_params(colors=MUTED)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.tight_layout()
    out_png = os.path.join(OUT_DIR, "val_curve_comparison.png")
    fig.savefig(out_png)
    with open(os.path.join(OUT_DIR, "val_curve_points.json"), "w") as f:
        json.dump({"ours": ours, "reference": ref}, f, indent=1)
    print(f"wrote {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
