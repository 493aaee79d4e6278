#!/usr/bin/env python
"""Generate `im_path,lb_path` annotation files by scanning dataset roots.

Reference: tools/gen_annos.py — walks the dataset layout and writes the
train/val .txt files consumed by the readers (lib/base_dataset.py:66-75).

  python tools/gen_annos.py --im-dir leftImg8bit/train --lb-dir gtFine/train \
      --im-suffix _leftImg8bit.png --lb-suffix _gtFine_labelIds.png \
      --root ./datasets/cityscapes --out datasets/Cityscapes/train.txt
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="dataset root (paths relative to it)")
    ap.add_argument("--im-dir", required=True)
    ap.add_argument("--lb-dir", required=True)
    ap.add_argument("--im-suffix", default=".png")
    ap.add_argument("--lb-suffix", default=".png")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    pairs = []
    im_root = os.path.join(args.root, args.im_dir)
    for dirpath, _, files in os.walk(im_root):
        for f in sorted(files):
            if not f.endswith(args.im_suffix):
                continue
            rel_dir = os.path.relpath(dirpath, im_root)
            stem = f[: -len(args.im_suffix)]
            lb_rel = os.path.join(args.lb_dir, rel_dir, stem + args.lb_suffix)
            if not os.path.exists(os.path.join(args.root, lb_rel)):
                print(f"skip (no label): {f}", file=sys.stderr)
                continue
            im_rel = os.path.join(args.im_dir, rel_dir, f)
            pairs.append(f"{os.path.normpath(im_rel)},{os.path.normpath(lb_rel)}")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(pairs) + "\n")
    print(f"wrote {len(pairs)} pairs to {args.out}")


if __name__ == "__main__":
    main()
