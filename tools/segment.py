#!/usr/bin/env python
"""Deploy CLI with the reference TensorRT runner's shape: compile | run | test.

Reference: tensorrt/segment.cpp:54-189 —
  segment compile <onnx> <engine> [--fp16]   → parse + build + serialize
  segment run <engine> <in.jpg> <out.png>    → infer one image
  segment test <engine>                      → FPS benchmark
Here the "engine" is a serialized StableHLO export (mds_tpu.deploy.export);
compilation happens at load via jax/PJRT for whatever backend is attached
(TPU on device, CPU elsewhere — covering the ncnn/OpenVINO CPU roles too).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cmd_compile(args):
    import jax.numpy as jnp
    import numpy as np

    from mds_tpu.config import Configer
    from mds_tpu.data.labels import get_spec
    from mds_tpu.deploy.export import export_model, save_exported
    from mds_tpu.engine.trainer import Trainer

    configer = Configer(config_file=args.config)
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    if args.fp16:
        # deploy graphs get the Pallas stem kernels + folded eval-BN/ReLU
        # (93.7 → 123.6 FPS on v5e; see ops/pallas/stem.py)
        from mds_tpu.models.layers import set_stem_impl

        set_stem_impl("pallas")
    trainer = Trainer(configer, compute_dtype=dtype)
    if args.ckpt:
        trainer.ckpt.directory = os.path.abspath(args.ckpt)
        trainer.restore_if_available()
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    spec_name = configer.dataset_cfg(0).get("spec")
    spec = get_spec(spec_name) if spec_name else None
    blob = export_model(
        trainer.model, variables, tuple(args.size),
        mean=spec.mean if spec else None, std=spec.std if spec else None,
    )
    save_exported(blob, args.engine)
    print(f"wrote {args.engine} ({len(blob) / 1e6:.1f} MB)")


def cmd_run(args):
    import numpy as np
    from PIL import Image

    from mds_tpu.deploy.export import load_exported_obj

    exported = load_exported_obj(args.engine)
    call = exported.call
    im = np.asarray(Image.open(args.img).convert("RGB"))
    h, w = im.shape[:2]
    # the engine is compiled at a FIXED input size (reference fixes the
    # export size too) — resize in, nearest-resize the label map back out
    eh, ew = exported.in_avals[0].shape[1:3]
    if (h, w) != (eh, ew):
        im_in = np.asarray(
            Image.fromarray(im).resize((ew, eh), Image.BILINEAR)
        )
    else:
        im_in = im
    out = np.asarray(call(im_in[None].astype(np.uint8)))[0]
    if out.shape != (h, w):
        out = np.asarray(
            Image.fromarray(out.astype(np.uint8)).resize((w, h), Image.NEAREST)
        )
    palette = np.random.default_rng(123).integers(0, 256, (256, 3), np.uint8)
    Image.fromarray(palette[np.clip(out, 0, 255)]).save(args.out)
    print(f"wrote {args.out}")


def cmd_test(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mds_tpu.deploy.export import load_exported_obj

    exported = load_exported_obj(args.engine)
    call = exported.call
    shape = exported.in_avals[0].shape
    im = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, shape), jnp.uint8
    )
    out = call(im)
    jax.block_until_ready(out)
    n = args.iters
    t0 = time.perf_counter()
    outs = [call(im) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{n / dt:.2f} FPS ({dt / n * 1000:.2f} ms/img) at {shape}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compile")
    c.add_argument("--config", required=True)
    c.add_argument("--ckpt", default=None)
    c.add_argument("--engine", required=True)
    c.add_argument("--size", type=int, nargs=2, default=[1024, 2048])
    c.add_argument("--fp16", action="store_true")
    c.set_defaults(fn=cmd_compile)
    r = sub.add_parser("run")
    r.add_argument("engine")
    r.add_argument("img")
    r.add_argument("out")
    r.set_defaults(fn=cmd_run)
    t = sub.add_parser("test")
    t.add_argument("engine")
    t.add_argument("--iters", type=int, default=100)
    t.set_defaults(fn=cmd_test)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
