#!/usr/bin/env python
"""Top-down trajectory plot vs ground truth — equivalent of the reference's
tools/python_plot.py (reference: tools/python_plot.py:8-29), reading the KITTI-format
trajectory written by examples/main_stereo.py / SlamSystem.save_trajectory_kitti.

Usage:
    python tools/plot_trajectory.py positions.txt [--gt poses/00.txt] [--out traj.png]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trajectory", help="KITTI-format Twc rows (output of main_stereo.py)")
    ap.add_argument("--gt", default=None, help="ground-truth KITTI pose file")
    ap.add_argument("--out", default="trajectory.png")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    est = np.loadtxt(args.trajectory).reshape(-1, 3, 4)
    fig, ax = plt.subplots(figsize=(8, 8))
    # KITTI camera convention: x right, z forward -> top-down is (x, z)
    ax.plot(est[:, 0, 3], est[:, 2, 3], "-", color="#4053d3", lw=1.5, label="estimate")
    if args.gt:
        gt = np.loadtxt(args.gt).reshape(-1, 3, 4)
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "--", color="#555555", lw=1.2, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(frameon=False)
    ax.set_title("trajectory (top-down)")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
