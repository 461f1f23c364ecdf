"""Assemble a renderer run's per-epoch view dumps into ``output.gif``.

The reference results corpus ships an ``output.gif`` per renderer run
showing the learned viewing angles evolving across epochs
(``/root/reference/results/renderer/*/output.gif``; the reference repo has
no generating code — the artifact was assembled out-of-band). This utility
closes that artifact-parity gap over the PNGs our renderer trainer already
writes (``train/renderer_trainer.py::save_rendered_views`` →
``<run>/rendered_views/test_views_epoch_<E>.png``).

Usage:
    python scripts/make_view_gif.py <run_dir> [--fps 2] [--out output.gif]
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def make_gif(run_dir: str, *, fps: float = 2.0, out: str = "output.gif") -> str:
    from PIL import Image

    views_dir = os.path.join(run_dir, "rendered_views")
    pat = re.compile(r"test_views_epoch_(\d+)\.png$")
    frames = sorted(
        (
            (int(m.group(1)), os.path.join(views_dir, f))
            for f in os.listdir(views_dir)
            if (m := pat.search(f))
        ),
    )
    if not frames:
        raise FileNotFoundError(f"no test_views_epoch_*.png under {views_dir}")
    images = [Image.open(p).convert("P") for _, p in frames]
    path = os.path.join(run_dir, out)
    images[0].save(
        path,
        save_all=True,
        append_images=images[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--fps", type=float, default=2.0)
    ap.add_argument("--out", default="output.gif")
    args = ap.parse_args()
    path = make_gif(args.run_dir, fps=args.fps, out=args.out)
    print(path)


if __name__ == "__main__":
    sys.exit(main())
