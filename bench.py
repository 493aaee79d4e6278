"""Headline benchmark: BiSeNetV2 1024×2048 bf16 end-to-end inference FPS.

Mirrors the reference's deploy benchmark (tensorrt/trt_dep.cpp
test_fps_with_engine; README.md:10 — BiSeNetV2 59 FPS fp16 on a Tesla T4 at
1024×2048, bs=1). Ours measures the full exported graph: uint8-scale input →
normalize → BiSeNetV2 → argmax label map, jitted in bf16 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = FPS / 59 (reference T4 fp16 FPS; BASELINE.md). Two secondary
metrics ride along in the same line under "extra_metrics" so they are
driver-tracked without breaking the one-line contract:

  * bisenetv2_train_imgs_per_sec (VERDICT r2 next #7) — the full jitted
    train step (normalize → fwd → OHEM main+4 aux → grad → SGD → BN update)
    at bs16 512×1024 bf16, the reference recipe's global batch
    (configs/bisenetv2_city.py; hot loop tools/train_amp.py:218-291);
    vs_baseline pinned to the 97.8 img/s measured in r2 (PARITY.md).
  * bisenetv1_1024x2048_bf16_inference_fps — the reference's OTHER headline
    deploy number (README.md:9 — 68 FPS fp16 T4); same methodology as the
    headline.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

T4_V2_FP16_FPS = 59.0  # reference README.md:10
T4_V1_FP16_FPS = 68.0  # reference README.md:9
R2_TRAIN_IMGS_PER_SEC = 97.8  # r2 measured value (PARITY.md) — regression pin
# r4 pre-optimization flagship measurements (tools/bench_flagship_train.py,
# 3-dataset recipe 768×768 bs12) — regression pins; see README perf table
R4_FLAGSHIP_BASE = {
    "flagship_seg_imgs_per_sec": 53.73,  # measured 2026-08-19 pre-fold
    "flagship_gnn_steps_per_sec": 6.44,
    # r5 first-execution pin (2026-08-21): the 7-dataset recipe's SEG stage
    # at full size (remat + loss-checkpoint memory fixes made it fit HBM)
    "flagship7_seg_imgs_per_sec": 53.7,
}


def _median3(run_once) -> tuple:
    """Pinned methodology (since r2): warmup, then 3 chained-loop runs;
    report the MEDIAN and every run so tunnel jitter is visible. Two
    warmups since r5: the first dispatch after a large compile burst
    measured 30-40% slow with high variance (r5 full-bench headline read
    88-118 FPS while the isolated bench read a stable 155-157)."""
    run_once(0)  # compile + warmup
    run_once(0)  # second warmup: absorb post-compile transients
    runs = []
    for rep in range(3):
        t0 = time.perf_counter()
        n = run_once(rep + 1)
        runs.append(n / (time.perf_counter() - t0))
    return sorted(runs)[1], [round(r, 2) for r in runs]


def bench_v2_infer():
    """1024×2048 bs1 bf16 deploy graph FPS (the headline)."""
    from mds_tpu.models.bisenetv2 import BiSeNetV2
    from mds_tpu.models.layers import set_detail_fuse, set_stem_impl

    # Pallas stem kernel: the two full-res RGB stem convs cost 3.6 ms of a
    # 9.0 ms graph under XLA's emitter (profiled 2026-08-16); the kernel is
    # bit-exact vs the plain conv (err 0.0 on chip). In eval graphs the BN
    # and ReLU are folded into the kernel (bf16 out) — together 93.7 (r1)
    # → 121.9 FPS.
    set_stem_impl("pallas")
    # Deploy cross-layer fusions (ops/pallas/stem.py):
    #  * detail_s1s2_fused — detail S1_1+S1_2+S2_1 as one kernel; the S1
    #    activations (134 MB of HBM in the unfused graph) never leave VMEM;
    #    stage-B/C taps PAIRED to K=128 MXU dots;
    #  * stemblock_fused — the whole segment-branch StemBlock (stem conv →
    #    left 1×1 → left 3×3 s2 ‖ maxpool → concat → fuse conv) as ONE
    #    kernel; the 8/16/32-channel ops that lane-starve XLA all stay in
    #    VMEM (≈1.6 ms of conv+maxpool+layout copies → in-kernel);
    #  * both consume ONE shared input-tile stack (XLA CSE merges the
    #    preps). Together: 121.6 → 153 FPS (2026-08-17).
    set_detail_fuse(True)
    # NOT enabled: set_pred_impl("fused") (ops/pallas/upsample_argmax.py).
    # Measured 2026-08-17 standalone at (1,128,256,19)->x8: XLA resize+argmax
    # 0.755 ms vs fused kernel 0.766 ms (and a matmul-resize XLA variant
    # 1.148 ms) — the tail is VPU-argmax-bound, not HBM-bound, so the fusion
    # does not pay; in-graph it also forces extra layout copies (89.6 FPS
    # end-to-end vs 121.7). Kept as a documented negative result + for
    # backends with slower resize lowerings.
    try:
        fps, runs = _bench_pred_loop(
            BiSeNetV2(n_classes=(19,), n_bn=1, aux=False, dtype=jnp.bfloat16)
        )
    finally:
        set_detail_fuse(False)
        set_stem_impl("plain")
    return fps, runs


def bench_v1_infer():
    """BiSeNetV1 1024×2048 bs1 bf16 FPS (reference README.md:9: 68 fp16 T4).

    Pallas 7×7 stem kernel with folded bn1 (ops/pallas/stem.py
    stem7_conv_bn_relu_s2): XLA's lowering of the C=3 conv1 cost ~2.7 ms +
    ~2.4 ms of layout copies of an 11.45 ms graph (profiled v5e 2026-08-18).
    """
    from mds_tpu.models.bisenetv1 import BiSeNetV1
    from mds_tpu.models.layers import set_stem_impl

    set_stem_impl("pallas")
    try:
        fps, runs = _bench_pred_loop(
            BiSeNetV1(n_classes=(19,), aux=False, dtype=jnp.bfloat16)
        )
    finally:
        set_stem_impl("plain")
    return fps, runs


def _bench_pred_loop(model, H=1024, W=2048, n_iters=30):
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init({"params": k}, [x0], train=False)
    )(jax.random.PRNGKey(0))

    mean = jnp.asarray([0.3257, 0.3690, 0.3223], jnp.float32)
    std = jnp.asarray([0.2112, 0.2148, 0.2115], jnp.float32)

    def pred(v, im_u8):
        x = im_u8.astype(jnp.float32) / 255.0
        x = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
        return model.apply(v, x, dataset=0, method=model.pred)

    im = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, H, W, 3)), jnp.uint8
    )

    # Honest device-side timing for this remote-tunnel backend: N iterations
    # chained on-device inside one dispatch (each step's input depends on the
    # previous prediction), and the result is FETCHED to host (float()) —
    # block_until_ready alone does not actually wait on this backend, and
    # repeated identical dispatches can be served from a content-hash cache.
    @jax.jit
    def pred_loop(v, im, seed):
        def body(i, carry):
            p = pred(v, im + carry)
            return (p.sum() % 2).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n_iters, body, seed)

    def run_once(rep):
        float(pred_loop(variables, im, jnp.uint8(rep)))
        return n_iters

    return _median3(run_once)


def bench_train(fused_up_loss: bool = False, quiet: bool = False):
    """bs16 512×1024 bf16 train-step throughput, chained on device."""
    from mds_tpu.engine.lr_schedule import warmup_poly_lr
    from mds_tpu.engine.optim import sgd_param_groups
    from mds_tpu.engine.train_step import init_train_state, make_seg_train_step
    from mds_tpu.models.bisenetv2 import BiSeNetV2
    from mds_tpu.models.layers import auto_dropout_impl, set_dropout_impl

    # HW-PRNG dropout masks (the production Trainer default on TPU):
    # 102.1 → 103.1 img/s (2026-08-18)
    set_dropout_impl(auto_dropout_impl())

    B, H, W = 16, 512, 1024
    model = BiSeNetV2(n_classes=(19,), n_bn=1, dtype=jnp.bfloat16)
    tx = sgd_param_groups(warmup_poly_lr(5e-3, 0.9, 1000, warmup_iter=10))
    state = init_train_state(
        model, tx, [np.zeros((1, H, W, 3), np.float32)]
    )
    step = make_seg_train_step(
        model, tx,
        [np.asarray([0.3257, 0.3690, 0.3223], np.float32)],
        [np.asarray([0.2112, 0.2148, 0.2115], np.float32)],
        compute_dtype=jnp.bfloat16,
        donate=False,  # the timing loop reuses the input state
        fused_up_loss=fused_up_loss,
    )
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.uint8)
    lb8 = rng.integers(0, 19, (B, H // 8, W // 8))
    lb = jnp.asarray(np.repeat(np.repeat(lb8, 8, 1), 8, 2), jnp.uint8)
    key = jax.random.PRNGKey(0)

    n_iters = 8

    @jax.jit
    def train_loop(state, im, lb):
        def body(i, st):
            st, _ = step(st, [im], [lb], jax.random.fold_in(key, i))
            return st

        return jax.lax.fori_loop(0, n_iters, body, state)

    def fetch(st):  # force a real device→host read (tunnel-honest timing)
        return float(jax.tree_util.tree_leaves(st.params)[0].reshape(-1)[0])

    def run_once(rep):
        fetch(train_loop(state, im, lb))
        return n_iters * B

    try:
        ips, runs = _median3(run_once)
    finally:
        set_dropout_impl("threefry")
    if quiet:
        return ips
    return ips, runs


def check_hw_dropout():
    """Assert the hardware-PRNG Pallas dropout kernel's numerics ON THE REAL
    CHIP every round (VERDICT r3 next #10 — the pytest battery skips it off
    TPU): mask rate, unbiased scale, fixed-seed determinism, and the
    backward's mask-regeneration identity."""
    from mds_tpu.ops.pallas.dropout import dropout_u8_pallas

    if jax.devices()[0].platform not in ("tpu", "axon"):
        return "skipped (no TPU)"
    rate = 0.1
    seed = jnp.asarray([3, 1], jnp.int32)
    x = jnp.ones((512, 2048), jnp.bfloat16)
    y = dropout_u8_pallas(x, seed, rate)
    kept = float(jnp.count_nonzero(y)) / x.size
    assert abs(kept - (1 - rate)) < 0.01, f"mask rate off: kept={kept}"
    mean = float(jnp.mean(y.astype(jnp.float32)))
    assert abs(mean - 1.0) < 0.02, f"scale biased: mean={mean}"
    y2 = dropout_u8_pallas(x, seed, rate)
    assert bool(jnp.all(y == y2)), "fixed seed not deterministic"
    g = jax.grad(lambda v: dropout_u8_pallas(v, seed, rate).sum())(x)
    same = bool(jnp.all((g != 0) == (y != 0)))
    assert same, "backward mask differs from forward"
    return "ok"


def check_hw_kernels():
    """Assert the money kernels' numerics ON THE REAL CHIP every round
    (VERDICT r4 next #7): the headline FPS rides on the Pallas stem /
    fused-StemBlock / detail-fusion kernels (BiSeNetV2) and the 7×7 stem
    kernel (BiSeNetV1), whose pytest parity runs CPU-interpret only. Runs
    each deploy graph fused and plain on one random frame and checks
    logits (relative max-abs-diff, bf16 budget) + argmax agreement."""
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return "skipped (no TPU)"
    from mds_tpu.models.bisenetv1 import BiSeNetV1
    from mds_tpu.models.bisenetv2 import BiSeNetV2
    from mds_tpu.models.layers import set_detail_fuse, set_stem_impl

    H, W = 512, 1024
    mean = jnp.asarray([0.3257, 0.3690, 0.3223], jnp.float32)
    std = jnp.asarray([0.2112, 0.2148, 0.2115], jnp.float32)
    im = jnp.asarray(
        np.random.default_rng(7).integers(0, 256, (1, H, W, 3)), jnp.uint8
    )

    def logits_fn(model):
        def fn(v, im_u8):
            x = im_u8.astype(jnp.float32) / 255.0
            x = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
            return model.apply(v, x, dataset=0, method=model.eval_logits)

        return fn

    for name, model in (
        ("v2", BiSeNetV2(n_classes=(19,), n_bn=1, aux=False,
                         dtype=jnp.bfloat16)),
        ("v1", BiSeNetV1(n_classes=(19,), aux=False, dtype=jnp.bfloat16)),
    ):
        x0 = jnp.zeros((1, H, W, 3), jnp.float32)
        variables = jax.jit(
            lambda k, m=model: m.init({"params": k}, [x0], train=False)
        )(jax.random.PRNGKey(0))
        fn = logits_fn(model)
        plain = np.asarray(jax.jit(fn)(variables, im), np.float32)
        set_stem_impl("pallas")
        if name == "v2":
            set_detail_fuse(True)
        try:
            fused = np.asarray(
                jax.jit(lambda v, i: fn(v, i))(variables, im), np.float32
            )
        finally:
            set_detail_fuse(False)
            set_stem_impl("plain")
        rel = np.abs(fused - plain).max() / max(np.abs(plain).max(), 1.0)
        agree = float(
            (fused.argmax(-1) == plain.argmax(-1)).mean()
        )
        assert rel < 2e-2, f"{name}: rel max diff {rel}"
        assert agree > 0.995, f"{name}: argmax agreement {agree}"
    return "ok"


def bench_flagship():
    """Flagship (snp_rn18+BGNN) SEG-stage train throughput + GNN step rate
    (VERDICT r3 next #2 — driver-tracked every round). Reuses the focused
    tool's harness on the shipped 3-dataset recipe."""
    sys.path.insert(0, "tools")
    import importlib

    mod = importlib.import_module("bench_flagship_train")
    return mod.run(iters=6)


def bench_flagship_7ds():
    """The REFERENCE flagship recipe at full size (VERDICT r4 missing #2 /
    weak #6): 7 datasets, global batch 28, 448 source classes, M=358,
    7-way remap + aux losses — SEG stage only (the GNN stage is identical
    in kind to the 3-dataset one already tracked)."""
    sys.path.insert(0, "tools")
    import importlib

    mod = importlib.import_module("bench_flagship_train")
    return mod.run(config="configs/ltbgnn_7_datasets_snp.json", iters=3,
                   seg_only=True, metric_prefix="flagship7")


def main():
    fps, runs = bench_v2_infer()
    record = {
        "metric": "bisenetv2_1024x2048_bf16_inference_fps",
        "value": round(fps, 2),
        "unit": "fps/chip",
        "vs_baseline": round(fps / T4_V2_FP16_FPS, 3),
        "runs": runs,
    }
    global _HEADLINE
    _HEADLINE = record
    # Secondary metrics: release the headline section's live arrays and
    # compiled executables first. MEASURED (v5e, 2026-08-17): bench_train run
    # after the inference bench in the same process reads 88.6 img/s, but
    # 94.9 isolated (same commit, same day) — the live 1024×2048 graph's
    # buffers/executables cost the train step ~7%.
    extras = []
    for name, fn, base in (
        ("bisenetv1_1024x2048_bf16_inference_fps", bench_v1_infer,
         T4_V1_FP16_FPS),
        ("bisenetv2_train_imgs_per_sec", bench_train, R2_TRAIN_IMGS_PER_SEC),
    ):
        jax.clear_caches()
        try:
            value, vruns = fn()
        except Exception as e:  # a secondary must not cost the headline
            print(f"# {name} failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
            continue
        extras.append({
            "metric": name,
            "value": round(value, 2),
            "unit": "imgs/s/chip" if "train" in name else "fps/chip",
            "vs_baseline": round(value / base, 3),
            "runs": vruns,
        })
    # flagship (snp_rn18 + BGNN) stage steps — the centerpiece workload
    # (VERDICT r3 next #2); vs_baseline pinned to the r4 pre-optimization
    # measurement so regressions are visible
    jax.clear_caches()
    try:
        for rec in bench_flagship():
            base = R4_FLAGSHIP_BASE.get(rec["metric"])
            if base:
                rec["vs_baseline"] = round(rec["value"] / base, 3)
            extras.append(rec)
    except Exception as e:
        print(f"# flagship bench failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    jax.clear_caches()
    try:
        for rec in bench_flagship_7ds():
            base = R4_FLAGSHIP_BASE.get(rec["metric"])
            if base:
                rec["vs_baseline"] = round(rec["value"] / base, 3)
            extras.append(rec)
    except Exception as e:
        print(f"# 7-ds flagship bench failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    try:
        record["hw_dropout_check"] = check_hw_dropout()
    except Exception as e:
        record["hw_dropout_check"] = f"FAILED: {e}"
    jax.clear_caches()
    try:
        record["hw_kernel_check"] = check_hw_kernels()
    except Exception as e:
        record["hw_kernel_check"] = f"FAILED: {e}"
    record["extra_metrics"] = extras
    print(json.dumps(record))


_HEADLINE = None


def _main_with_retry():
    """One retry for the whole bench: a transient tunnel error must not
    leave the driver's BENCH record empty. Never reruns after the headline
    was measured (no duplicate JSON lines) — if a later stage fails with a
    headline in hand, print what we have."""
    try:
        main()
    except Exception as e:
        if _HEADLINE is not None:
            _HEADLINE.setdefault("extra_metrics", [])
            print(json.dumps(_HEADLINE))
            return
        print(f"# bench failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        jax.clear_caches()
        main()


if __name__ == "__main__":
    _main_with_retry()
