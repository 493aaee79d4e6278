#!/usr/bin/env python
"""Streaming video/frame-sequence inference demo.

Reference: tools/demo_video.py — cv2.VideoCapture frames → batched inference
→ palette frames, with producer/consumer queues. This environment has no
video codecs, so the stream is a directory of image frames (or a .npy stack);
the pipeline shape is the same: a decode thread feeds fixed-size batches, the
device runs one jitted graph, a writer thread drains colorized frames.

  python tools/demo_video.py --config cfg.json --frames dir/ --out outdir/
      [--batch 4] [--size 768 768]
"""

import argparse
import os
import queue
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--frames", required=True, help="directory of frames or .npy")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dataset", type=int, default=0)
    ap.add_argument("--size", type=int, nargs=2, default=[768, 768])
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
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    model = trainer.model
    spec_name = configer.dataset_cfg(args.dataset).get("spec")
    spec = get_spec(spec_name) if spec_name else None
    mean = spec.mean if spec else np.zeros(3, np.float32)
    std = spec.std if spec else np.ones(3, np.float32)
    palette = spec.palette if spec else np.random.default_rng(123).integers(
        0, 256, (256, 3), np.uint8
    )

    h, w = args.size
    os.makedirs(args.out, exist_ok=True)

    if args.frames.endswith(".npy"):
        frames = [(f"frame_{i:06d}.png", f) for i, f in enumerate(np.load(args.frames))]
    else:
        names = sorted(
            f for f in os.listdir(args.frames)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        frames = [(n, None) for n in names]

    in_q: "queue.Queue" = queue.Queue(maxsize=4)
    out_q: "queue.Queue" = queue.Queue(maxsize=4)

    def decode():
        batch, metas = [], []
        for name, arr in frames:
            if arr is None:
                arr = np.asarray(
                    Image.open(os.path.join(args.frames, name)).convert("RGB")
                )
            batch.append(resize_image(arr, (h, w)))
            metas.append(name)
            if len(batch) == args.batch:
                in_q.put((np.stack(batch), metas))
                batch, metas = [], []
        if batch:  # pad the tail to the fixed batch size
            while len(batch) < args.batch:
                batch.append(batch[-1])
            in_q.put((np.stack(batch), metas))
        in_q.put(None)

    def write():
        while True:
            item = out_q.get()
            if item is None:
                break
            preds, metas = item
            for p, name in zip(preds, metas):
                Image.fromarray(palette[np.clip(p, 0, 255)]).save(
                    os.path.join(args.out, name)
                )

    import jax

    @jax.jit
    def infer(v, im_u8):
        x = im_u8.astype(jnp.float32) / 255.0
        x = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
        return model.apply(v, x, dataset=args.dataset, method=model.pred)

    t_dec = threading.Thread(target=decode, daemon=True)
    t_wr = threading.Thread(target=write, daemon=True)
    t_dec.start()
    t_wr.start()
    n = 0
    while True:
        item = in_q.get()
        if item is None:
            break
        ims, metas = item
        preds = np.asarray(infer(variables, jnp.asarray(ims)))
        out_q.put((preds[: len(metas)], metas))
        n += len(metas)
    out_q.put(None)
    t_wr.join()
    print(f"processed {n} frames → {args.out}")


if __name__ == "__main__":
    main()
