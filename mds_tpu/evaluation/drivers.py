"""Evaluation + label-usage-audit drivers (what the eval CLI runs).

Reference: evaluate.py — main (:1602-1657) builds the net from the config's
model_factory name, loads a checkpoint, and dispatches to an eval_model_*
driver; find_unuse_label (:1688-1786) and eval_find_use_and_unuse_label
(:1788-1931) audit which unified-label slots each dataset actually uses;
Find_label_relation (:1658-1686) builds pairwise label-relation matrices.

TPU-native shape: the model + variables come from the SAME trainer classes
the train CLI uses (so any checkpoint the train CLI writes is evaluable),
and every per-image hot path is one jitted graph (see evaluator.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.evaluation.evaluator import (
    confusion_hist,
    eval_model,
    resize_bilinear_ac,
)


def build_eval_bundle(configer, ckpt: Optional[str] = None,
                      work_dir: str = "./res", compute_dtype=jnp.bfloat16):
    """(model, variables, info) ready for `eval_model`.

    Picks the restore strategy matching the checkpoint layout the train CLI
    writes for this config's `train.mode` (reference: evaluate.py:1615-1620
    builds from model_factory + torch.load):

      * alternate/gnn/clip (the GNN-era flagship) → AlternatingTrainer
        checkpoint: seg state + buffers (+ gnn state, unused here);
      * contrast → ContrastTrainer checkpoint (also exposes the memory-bank
        class means as `info['prototypes']` for `--mode emb`);
      * anything else → the plain Trainer checkpoint (params + batch_stats
        + buffers extras).
    """
    mode = configer.get("train", "mode", default=None)
    info: Dict = {}
    if mode in ("alternate", "gnn", "clip"):
        from mds_tpu.engine.gnn_trainer import AlternatingTrainer

        tr = AlternatingTrainer(configer, compute_dtype=compute_dtype)
        if ckpt:
            tr.restore(ckpt)
        variables = {
            "params": tr.seg_state.params,
            "batch_stats": tr.seg_state.batch_stats,
            "buffers": tr.seg_buffers,
        }
        return tr.seg_model, variables, info
    if mode == "contrast":
        from mds_tpu.engine.contrast_trainer import ContrastTrainer

        tr = ContrastTrainer(configer, work_dir=work_dir,
                             compute_dtype=compute_dtype)
        if ckpt:
            import os

            tr.ckpt.directory = os.path.abspath(ckpt)
        if tr.ckpt.latest_step() is not None:
            tr.restore()
        variables = {
            "params": tr.state.params,
            "batch_stats": tr.state.batch_stats,
        }
        # (U, mem, D) bank → (U, 1, D) class-mean prototypes for emb mode
        feats = np.asarray(tr.bank.feats, np.float32)
        info["prototypes"] = feats.mean(axis=1, keepdims=True)
        return tr.model, variables, info
    from mds_tpu.engine.trainer import Trainer

    tr = Trainer(configer, work_dir=work_dir, compute_dtype=compute_dtype)
    if ckpt:
        import os

        tr.ckpt.directory = os.path.abspath(ckpt)
    if tr.ckpt.latest_step() is not None:
        tr.restore_if_available()
    return tr.model, tr.variables(), info


def recompute_bn_stats(configer, model, variables, n_batches: int,
                       compute_dtype=jnp.bfloat16) -> dict:
    """Precise-BN (reference lib/precise_bn.py:88 update_bn_stats +
    train_bn.py, ablated in CamVidPreciseBN.md): replace the EMA BN running
    stats with the TRUE average of per-batch moments, computed with frozen
    weights over `n_batches` training batches of every dataset. Returns a
    new variables dict with refreshed `batch_stats`."""
    from mds_tpu.data.loader import get_data_loader
    from mds_tpu.engine.precise_bn import update_bn_stats
    from mds_tpu.engine.train_step import normalize_images
    from mds_tpu.engine.trainer import dataset_stats

    loader = get_data_loader(
        configer, "train", rank=jax.process_index(), world=jax.process_count()
    )
    means, stds = dataset_stats(configer)
    means = [jnp.asarray(m) for m in means]
    stds = [jnp.asarray(s) for s in stds]
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def fwd(variables, ims):
        xs = normalize_images(ims, means, stds, dtype=compute_dtype)
        _, mut = model.apply(
            variables, xs, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return mut["batch_stats"]

    def apply_train_fn(variables, batch):
        return fwd(variables, [jnp.asarray(x) for x in batch["ims"]])

    def batches():
        it = iter(loader)
        for _ in range(n_batches):
            yield next(it)

    return update_bn_stats(
        apply_train_fn, variables, batches(), max_batches=n_batches
    )


def run_evaluation(configer, mode: str = "ss", ckpt: Optional[str] = None,
                   work_dir: str = "./res", compute_dtype=jnp.bfloat16,
                   loaders=None, precise_bn: int = 0) -> List[float]:
    """Config → per-dataset mIoU list for any eval mode (the eval CLI body).
    precise_bn > 0 recomputes the BN running stats over that many train
    batches before evaluating (train_bn.py workflow)."""
    from mds_tpu.data.loader import get_data_loader

    model, variables, info = build_eval_bundle(
        configer, ckpt=ckpt, work_dir=work_dir, compute_dtype=compute_dtype
    )
    if precise_bn > 0:
        variables = recompute_bn_stats(
            configer, model, variables, precise_bn, compute_dtype=compute_dtype
        )
    if loaders is None:
        # dsg evaluates the stage-2 TRAIN annotation lists (reference
        # evaluate.py:1267: get_data_loader(aux_mode='train', stage=2))
        loaders = get_data_loader(
            configer, "eval", rank=jax.process_index(),
            world=jax.process_count(),
            stage=2 if mode == "dsg" else None,
        )
    method_kwargs = (
        {"prototypes": info["prototypes"]} if mode == "emb" and "prototypes" in info
        else None
    )
    return eval_model(
        configer, model, variables, loaders, mode=mode,
        method_kwargs=method_kwargs,
    )


# --------------------------------------------------------------------------
# find-unuse audit (reference: evaluate.py:1688-1931) — which unified slots
# does each dataset-class actually predict on its own data?
# --------------------------------------------------------------------------

def _unified_hist(model, variables, loader, n_cats: int, M: int,
                  dataset_id: int, mean, std, ignore: int = 255) -> np.ndarray:
    """(n_cats, M) counts of label class × argmax unified slot
    (evaluate.py:1712-1744: einsum(feat, unify_prototype) → argmax → bincount).
    One jitted graph per image shape; the hist accumulates on device."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    jit_cache = {}

    def make_fn(shape):
        def run(im, lb):
            x = (im / 255.0 - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
            logits = model.apply(
                variables, x, dataset=dataset_id, method=model.uni_eval_logits
            )
            logits = resize_bilinear_ac(logits, lb.shape[1:3])
            preds = jnp.argmax(logits, axis=-1)
            return confusion_hist(lb, preds, n_cats, ignore, n_pred=M)

        return jax.jit(run)

    hist = np.zeros((n_cats, M), np.int64)
    for batch in loader:
        im = jnp.asarray(np.asarray(batch["im"]), jnp.float32)
        lb = jnp.asarray(np.asarray(batch["lb"]), jnp.int32)
        key = (im.shape, lb.shape)
        if key not in jit_cache:
            jit_cache[key] = make_fn(key)
        hist += np.asarray(jit_cache[key](im, lb), np.int64)
    return hist


def _slot_buckets(bi_graph: np.ndarray) -> Dict[int, List[int]]:
    """unified-slot → owning dataset-class buckets via the graph's column
    argmax (evaluate.py:1746-1764)."""
    bi_graph = np.asarray(bi_graph)
    n_cat = bi_graph.shape[0]
    max_value = bi_graph.max(axis=0)
    max_index = bi_graph.argmax(axis=0)
    buckets: Dict[int, List[int]] = {}
    for slot, cls in enumerate(max_index):
        if max_value[slot] == 0:
            continue
        buckets.setdefault(int(cls), []).append(slot)
    for cls in range(n_cat):
        buckets.setdefault(cls, [])
    return buckets


def find_unuse_label(configer, model, variables, loader, n_classes: int,
                     dataset_id: int, mean=None, std=None) -> Dict[int, List[int]]:
    """Per-dataset-class list of unified slots the model ACTUALLY uses
    (evaluate.py:1688-1786): slots owned by the class via the bipartite
    graph, kept when they take >10% of the class's predicted mass."""
    M = int(variables["buffers"][f"bi_graph_{dataset_id}"].shape[1])
    mean = np.zeros(3, np.float32) if mean is None else mean
    std = np.ones(3, np.float32) if std is None else std
    hist = _unified_hist(
        model, variables, loader, n_classes, M, dataset_id, mean, std
    )
    bi_graph = np.asarray(variables["buffers"][f"bi_graph_{dataset_id}"])
    buckets = _slot_buckets(bi_graph)
    out: Dict[int, List[int]] = {}
    for cls, slots in buckets.items():
        total = sum(int(hist[cls][s]) for s in slots)
        if total == 0:
            out[cls] = list(slots)
            continue
        out[cls] = [s for s in slots if hist[cls][s] / total > 0.1]
    return out


def eval_find_use_and_unuse_label(configer, model, variables, loaders,
                                  means=None, stds=None):
    """Use/unuse bipartite audit over every dataset
    (evaluate.py:1788-1931): returns (heads, mious, target_bipart) where
    target_bipart[i] is (n_cats_i, M) filled with loss.ignore_index, forced
    to 0 for slots a class barely uses (rate<0.1 either way) and to 1 for
    dominant slots (rate>0.5) — the supervision target of the `_find_unuse`
    trainer variant."""
    n = configer.n_datasets
    ignore_index = int(configer.get("loss", "ignore_index", default=255))
    target_bipart: List[np.ndarray] = []
    for i in range(n):
        n_cats = configer.n_cats(i)
        bi_graph = np.asarray(variables["buffers"][f"bi_graph_{i}"])
        M = bi_graph.shape[1]
        mean = (means[i] if means is not None else np.zeros(3, np.float32))
        std = (stds[i] if stds is not None else np.ones(3, np.float32))
        hist = _unified_hist(
            model, variables, loaders[i], n_cats, M, i, mean, std
        )
        buckets = _slot_buckets(bi_graph)
        bipart = np.full_like(bi_graph, float(ignore_index), dtype=np.float32)
        col_sums = hist.sum(axis=0)
        for cls, slots in buckets.items():
            total = sum(int(hist[cls][s]) for s in slots)
            if total == 0:
                continue
            for s in slots:
                rate = hist[cls][s] / total
                col_share = hist[cls][s] / col_sums[s] if col_sums[s] else 0.0
                if rate < 0.1 or col_share < 0.1:
                    bipart[cls][s] = 0.0
                elif rate > 0.5:
                    bipart[cls][s] = 1.0
        target_bipart.append(bipart)
    return ["single_scale"], [], target_bipart


def find_label_relation(configer, datasets_remaps) -> List[np.ndarray]:
    """Pairwise label-relation matrices (evaluate.py:1658-1686
    Find_label_relation): for each dataset pair (i, j) a boolean
    (|map_i|+|map_j|)² matrix linking each of i's classes to the j-class its
    remap points at, and vice versa."""
    n = configer.n_datasets
    out: List[np.ndarray] = []
    for i in range(n):
        for j in range(i + 1, n):
            this_map = datasets_remaps[i][j]
            other_map = datasets_remaps[j][i]
            size = len(this_map) + len(other_map)
            rel = np.zeros((size, size), bool)
            for idx, val in enumerate(this_map):
                rel[idx][len(this_map) + int(val)] = True
            for idx, val in enumerate(other_map):
                rel[len(this_map) + idx][int(val)] = True
            out.append(rel)
    return out
