#!/usr/bin/env python
"""Single-image inference demo (reference: tools/demo.py — E2EModel wraps
normalize into the graph :646-710, palette rendering :767-773).

  python tools/demo.py --config cfg.json [--ckpt dir] --img in.png --out res.png
      [--dataset 0] [--size 768 768]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--img", required=True)
    ap.add_argument("--out", default="res.png")
    ap.add_argument("--dataset", type=int, default=0)
    ap.add_argument("--size", type=int, nargs=2, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from mds_tpu.config import Configer
    from mds_tpu.data.labels import get_spec
    from mds_tpu.data.transforms import resize_image
    from mds_tpu.engine.trainer import Trainer

    configer = Configer(config_file=args.config)
    trainer = Trainer(configer, compute_dtype=jnp.bfloat16)
    if args.ckpt:
        trainer.ckpt.directory = os.path.abspath(args.ckpt)
        trainer.restore_if_available()
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }

    im = np.asarray(Image.open(args.img).convert("RGB"))
    if args.size:
        im = resize_image(im, tuple(args.size))
    # the label map comes back at this size: --size if given, else original
    target_hw = tuple(args.size) if args.size else im.shape[:2]
    # round to /32 — BiSeNetV2's BGA merges the 1/8 detail and ×4-upsampled
    # 1/32 segment paths, so other sizes shape-mismatch (the reference
    # rounds eval sizes the same way, evaluate.py get_round_size :43)
    rh, rw = (max(32, (d // 32) * 32) for d in im.shape[:2])
    if (rh, rw) != im.shape[:2]:
        im = resize_image(im, (rh, rw))
    spec_name = configer.dataset_cfg(args.dataset).get("spec")
    spec = get_spec(spec_name) if spec_name else None
    mean = spec.mean if spec else np.zeros(3, np.float32)
    std = spec.std if spec else np.ones(3, np.float32)

    model = trainer.model
    x = jnp.asarray(im, jnp.float32)[None] / 255.0
    x = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
    pred = np.asarray(
        model.apply(variables, x, dataset=args.dataset, method=model.pred)
    )[0]
    if pred.shape != tuple(target_hw):
        # nearest-resize the label map back to the requested frame size
        pred = np.asarray(
            Image.fromarray(pred.astype(np.uint8)).resize(
                (target_hw[1], target_hw[0]), Image.NEAREST
            )
        )

    if spec is not None:
        palette = spec.palette
    else:
        palette = np.random.default_rng(123).integers(0, 256, (256, 3), np.uint8)
    color = palette[np.clip(pred, 0, 255)]
    Image.fromarray(color.astype(np.uint8)).save(args.out)
    print(f"wrote {args.out} (pred classes: {sorted(set(pred.ravel().tolist()))[:20]})")


if __name__ == "__main__":
    main()
