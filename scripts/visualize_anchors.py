#!/usr/bin/env python
"""Anchor-grid visualisation (reference ``utils/basic_anchors.py:60-83``):
scatter the stride-16 grid centres and draw the 9 anchors of a centre cell.
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.config import Config  # noqa: E402
from two_stage_object_detection_tpu.ops.anchors import (  # noqa: E402
    enumerate_shifted_anchor, generate_basic_anchor)


def main(out_path: str = "anchors.png"):
    cfg = Config()
    base = generate_basic_anchor(cfg.anchor_base_size, cfg.anchor_ratios,
                                 cfg.anchor_scales)
    fh, fw = cfg.feat_size
    anchors = enumerate_shifted_anchor(base, cfg.feat_stride, fh, fw)

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_xlim(-300, cfg.input_size[1] + 300)
    ax.set_ylim(-300, cfg.input_size[0] + 300)
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    ax.scatter(cx[::9], cy[::9], s=1)

    centre_cell = (fh // 2) * fw + fw // 2
    for i in range(centre_cell * 9, centre_cell * 9 + 9):
        x1, y1, x2, y2 = anchors[i]
        ax.add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                   color="r", fill=False))
    ax.add_patch(plt.Rectangle((0, 0), cfg.input_size[1], cfg.input_size[0],
                               color="g", fill=False, lw=2))
    ax.set_title(f"{anchors.shape[0]} anchors, stride {cfg.feat_stride}, "
                 f"grid {fh}x{fw}")
    fig.savefig(out_path, dpi=120)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
