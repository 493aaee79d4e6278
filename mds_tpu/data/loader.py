"""Multi-dataset batch loader with threaded prefetch.

Replaces the reference's stack of per-dataset torch DataLoaders + DALI +
CVCUDA prefetch rings (lib/get_dataloader.py:83-190, lib/cvCudaDataLoader.py)
with one host-side pipeline: per-dataset readers + infinite sharded index
streams + a thread pool decoding/augmenting samples + a bounded prefetch
queue of ready device-shaped batches.

Batch layout (jit-static): sub-batches are concatenated in dataset order with
per-dataset sizes fixed by config, exactly like the reference's concatenated
ims/lbs + `dataset_lbs` id vector (tools/train_ltbgnn_all_datasets_snp.py:711-747).
This keeps every shape static under jit.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from mds_tpu.data.sampler import InfiniteStream


class TrainBatch(dict):
    """dict with attribute access.

    Multi-dataset train batches carry per-dataset lists:
      ims: [(b_i,H,W,3) u8] and lbs: [(b_i,H,W) u8], one entry per dataset —
    the TPU-native layout (each array independently batch-sharded; see
    mds_tpu.models.layers). `im`/`lb`/`dataset_ids` hold the stacked views
    for consumers that want the reference's concatenated layout
    (tools/train_ltbgnn_all_datasets_snp.py:711-747).
    """

    __getattr__ = dict.__getitem__


class MultiDatasetTrainLoader:
    """Yields stacked multi-dataset batches forever.

    datasets: list of readers with `.read(idx, rng) -> dict(im, lb)`.
    batch_sizes: per-dataset per-process sub-batch sizes (config `ims_per_gpu`).
    All readers must produce crops of the same HxW (the reference requires the
    same `cropsize` for all datasets too).
    """

    def __init__(
        self,
        datasets: Sequence,
        batch_sizes: Sequence[int],
        rank: int = 0,
        world: int = 1,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 4,
        drop_all_ignore: bool = True,
        max_resample: int = 4,
    ):
        assert len(datasets) == len(batch_sizes)
        self.datasets = list(datasets)
        self.batch_sizes = list(batch_sizes)
        self.n_datasets = len(datasets)
        self.streams = [
            InfiniteStream(len(ds), num_replicas=world, rank=rank, seed=seed + 97 * i)
            for i, ds in enumerate(self.datasets)
        ]
        self.rng = np.random.default_rng(seed * 7919 + rank)
        self.pool = ThreadPoolExecutor(max_workers=num_threads)
        self.drop_all_ignore = drop_all_ignore
        self.max_resample = max_resample
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._producer.start()

    # -- sample acquisition -------------------------------------------------
    def _one(self, ds_idx: int, seed: int) -> dict:
        """Decode+augment one sample in a pool thread. The augmentation rng
        is derived from `seed` (drawn by the producer thread) — a fresh
        Generator per task, because np.random.Generator is documented
        NOT thread-safe and was previously shared across all workers."""
        ds = self.datasets[ds_idx]
        # the reference skips batches whose labels are all-ignore
        # (tools/train_ltbgnn_all_datasets_snp.py:714-728); we resample the
        # sample instead, which never wastes a step.
        child = np.random.default_rng(seed)
        for _ in range(self.max_resample):
            idx = next(self.streams[ds_idx])
            s = ds.read(idx, child)
            if not self.drop_all_ignore or (s["lb"] != 255).any():
                return s
        return s  # give up after max_resample; loss masks ignore anyway

    def _assemble(self) -> TrainBatch:
        futs = []
        for i, bs in enumerate(self.batch_sizes):
            # seeds drawn here, on the single producer thread, so self.rng
            # is never touched concurrently
            seeds = self.rng.integers(2**63, size=bs)
            futs.append(
                [self.pool.submit(self._one, i, int(s)) for s in seeds]
            )
        ims = [np.stack([f.result()["im"] for f in fs]) for fs in futs]
        lbs_list = []
        for i, fs in enumerate(futs):
            lbs_list.append(np.stack([f.result()["lb"] for f in fs]))
        ids = np.concatenate(
            [np.full(bs, i, np.int32) for i, bs in enumerate(self.batch_sizes)]
        )
        return TrainBatch(
            ims=ims,
            lbs=lbs_list,
            im=np.concatenate(ims, axis=0),
            lb=np.concatenate(lbs_list, axis=0),
            dataset_ids=ids,
        )

    def _produce(self):
        try:
            while not self._stop.is_set():
                batch = self._assemble()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except RuntimeError:
            # pool shut down mid-assemble by close() — clean exit
            if not self._stop.is_set():
                raise

    # -- iteration ------------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self) -> TrainBatch:
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        # let the producer finish its in-flight _assemble before the pool
        # goes away (it re-checks _stop right after), so no submit races a
        # shut-down executor
        self._producer.join(timeout=10.0)
        self.pool.shutdown(wait=False)


class EvalLoader:
    """Sequential rank-sharded eval iteration (reference uses
    DistributedSampler for eval, lib/get_dataloader.py:141). Yields single
    samples (eval images are variable-size; batching happens per-scale in the
    evaluator). Decode runs on a background thread (bounded queue) so the
    host decodes image N+1 while the device evaluates image N."""

    def __init__(self, dataset, rank: int = 0, world: int = 1,
                 batch_size: int = 1, prefetch: int = 2):
        self.dataset = dataset
        self.indices = list(range(rank, len(dataset), world))
        self.batch_size = batch_size
        self.prefetch = max(int(prefetch), 1)

    def __len__(self):
        return len(self.indices)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def produce():
            rng = np.random.default_rng(0)
            batch: List[dict] = []
            for idx in self.indices:
                batch.append(self.dataset.read(idx, rng))
                if len(batch) == self.batch_size:
                    q.put(self._stack(batch))
                    batch = []
            if batch:
                q.put(self._stack(batch))
            q.put(None)

        # daemon: an abandoned iterator leaves the producer parked on the
        # bounded put with at most `prefetch` decoded batches in memory
        threading.Thread(target=produce, daemon=True).start()
        while True:
            b = q.get()
            if b is None:
                return
            yield b

    @staticmethod
    def _stack(batch: List[dict]) -> TrainBatch:
        return TrainBatch(
            im=np.stack([s["im"] for s in batch]),
            lb=np.stack([s["lb"] for s in batch]),
            dataset_ids=np.zeros(len(batch), np.int32),
        )


def get_data_loader(configer, mode: str = "train", rank: int = 0, world: int = 1,
                    stage: Optional[int] = None, batch_multiplier: int = 1):
    """Config-driven loader factory (reference: lib/get_dataloader.py:83-190).

    For mode='train' returns one MultiDatasetTrainLoader over all datasets;
    for mode='eval' returns a list of per-dataset EvalLoaders.
    `batch_multiplier` scales each dataset's `ims_per_gpu` (the reference's
    per-GPU batch) by the number of local devices this process feeds.
    """
    import mds_tpu.data.base  # noqa: F401 — populate the DATASETS registry
    from mds_tpu.data.transforms import TransformationTrain, TransformationVal
    from mds_tpu.registry import DATASETS

    n = configer.n_datasets
    datasets, batch_sizes = [], []
    scales = configer.get("train", "scales", default=[0.5, 1.0])
    cropsize = configer.get("train", "cropsize", default=[512, 512])
    min_side = configer.get("train", "min_side", default=1080)
    # the fused native augment (cpp/mdspre.cpp — the DALI fused-pipeline
    # role) when built; per-call numpy fallback inside. Opt out with
    # train.native_pipeline=false.
    use_native = mode == "train" and bool(
        configer.get("train", "native_pipeline", default=True)
    )
    for i in range(n):
        dcfg = configer.dataset_cfg(i)
        reader_cls = DATASETS[dcfg["data_reader"]]
        # `stage` selects the curriculum TRAIN ann lists (get_dataloader.py:93)
        # in EITHER mode: the dsg eval protocol reads the stage-2 train anns
        # with eval transforms (reference evaluate.py:1267
        # get_data_loader(aux_mode='train', stage=2) feeding MscEvalV0_Contrast)
        ann_key = (
            "train_im_anns" if (mode == "train" or stage is not None)
            else "val_im_anns"
        )
        ann = dcfg.get(ann_key)
        if stage is not None and ann:
            ann = ann.replace(".txt", f"_{stage}.txt")
        kwargs = dict(dcfg.get("reader_kwargs", {}))
        if mode != "train":
            trans = TransformationVal()
        elif use_native:
            from mds_tpu.data.fast_transforms import NativeTransformationTrain

            trans = NativeTransformationTrain(
                scales, cropsize, min_side=min_side
            )
        else:
            trans = TransformationTrain(scales, cropsize, min_side=min_side)
        ds = reader_cls(
            dcfg.get("im_root"), ann, trans_func=trans, mode=mode, **kwargs
        )
        if use_native and hasattr(ds, "lb_map"):
            # fuse this dataset's id→trainId LUT into the native pass (the
            # reader then hands over raw label ids — see AnnFileDataset.read)
            trans.set_label_lut(ds.lb_map)
        datasets.append(ds)
        batch_sizes.append(int(dcfg.get("ims_per_gpu", 1)) * batch_multiplier)
    if mode == "train":
        return MultiDatasetTrainLoader(
            datasets,
            batch_sizes,
            rank=rank,
            world=world,
            seed=int(configer.get("seed", default=0) or 0),
            num_threads=int(configer.get("train", "num_workers", default=8)),
        )
    return [EvalLoader(ds, rank=rank, world=world) for ds in datasets]
