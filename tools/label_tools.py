#!/usr/bin/env python
"""Label utilities: RGB color-coded masks → trainId maps, class listings.

Covers the reference's label-prep script family: tools/rbg_conver_to_lb.py,
tools/mapi_rgb_conver_to_lb.py, tools/json_to_color_lb.py,
tools/get_label_name.py.

  python tools/label_tools.py names --spec cityscapes
  python tools/label_tools.py rgb2id --spec camvid --in dir/ --out outdir/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def cmd_names(args):
    from mds_tpu.data.labels import get_spec

    spec = get_spec(args.spec)
    for i, n in enumerate(spec.class_names):
        print(f"{i:3d}  {n}")


def rgb_to_id_lut(palette: np.ndarray, n_cats: int):
    """Map each palette color to its trainId via a dict of packed RGB keys."""
    keys = (
        palette[:n_cats, 0].astype(np.int64) * 65536
        + palette[:n_cats, 1].astype(np.int64) * 256
        + palette[:n_cats, 2].astype(np.int64)
    )
    return {int(k): i for i, k in enumerate(keys)}


def cmd_rgb2id(args):
    from PIL import Image

    from mds_tpu.data.labels import get_spec

    spec = get_spec(args.spec)
    lut = rgb_to_id_lut(spec.palette, spec.n_cats)
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(getattr(args, "in"))):
        if not f.lower().endswith((".png", ".bmp")):
            continue
        rgb = np.asarray(
            Image.open(os.path.join(getattr(args, "in"), f)).convert("RGB"),
            np.int64,
        )
        packed = rgb[..., 0] * 65536 + rgb[..., 1] * 256 + rgb[..., 2]
        out = np.full(packed.shape, 255, np.uint8)
        for k, i in lut.items():
            out[packed == k] = i
        Image.fromarray(out).save(os.path.join(args.out, f))
        n += 1
    print(f"converted {n} masks")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("names")
    p.add_argument("--spec", required=True)
    p.set_defaults(fn=cmd_names)
    p = sub.add_parser("rgb2id")
    p.add_argument("--spec", required=True)
    p.add_argument("--in", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_rgb2id)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
