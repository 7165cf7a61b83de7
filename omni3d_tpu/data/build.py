"""Samplers and batch loaders (host side, numpy).

Re-implementation of the reference loader construction
(cubercnn/data/build.py:47-230) with the four sampling modes:
  * TrainingSampler (infinite shuffled stream),
  * RepeatFactorTrainingSampler with LVIS-style per-category repeat factors
    (build.py:129-174),
  * dataset-balancing weights (build.py:68-91),
  * both combined (build.py:109-115).

Loaders yield padded static-shape batches (see mapper.collate_batch) and are
sharded per process for multi-host SPMD: each host feeds its local slice of
the global batch (replacing detectron2's per-rank TrainingSampler sharding).
"""
from __future__ import annotations

import itertools
import math
from collections import defaultdict

import numpy as np

from .datasets import get_dataset
from .mapper import DatasetMapper3D, collate_batch


def get_detection_dataset_dicts(names, filter_empty: bool = True):
    """reference build.py:26-44."""
    if isinstance(names, str):
        names = [names]
    dicts = [get_dataset(n) for n in names]
    for n, d in zip(names, dicts):
        assert len(d), f"Dataset '{n}' is empty!"
    records = list(itertools.chain.from_iterable(dicts))
    if filter_empty and "annotations" in records[0]:
        records = [
            r for r in records
            if any(a.get("category_id", -1) >= 0 for a in r["annotations"])
        ]
    assert records, f"No valid data found in {names}"
    return records


def repeat_factors_from_category_frequency(records, repeat_thresh: float) -> np.ndarray:
    """LVIS repeat factors r(I) = max_c sqrt(t / f(c)) (build.py:129-174)."""
    freq = defaultdict(int)
    for r in records:
        for cat in {a["category_id"] for a in r["annotations"]}:
            if cat >= 0:
                freq[cat] += 1
    n = len(records)
    rep = {c: max(1.0, math.sqrt(repeat_thresh / (v / n))) for c, v in freq.items()}
    out = []
    for r in records:
        cats = {a["category_id"] for a in r["annotations"] if a["category_id"] >= 0}
        out.append(max((rep[c] for c in cats), default=1.0))
    return np.asarray(out, np.float64)


def dataset_balance_weights(records, dataset_id_to_src: dict) -> np.ndarray:
    """Per-image weights equalizing dataset sources (build.py:68-91)."""
    src_to_int = {v: i for i, v in enumerate(sorted(set(dataset_id_to_src.values())))}
    ids = np.asarray([src_to_int[dataset_id_to_src[r["dataset_id"]]] for r in records])
    uniq = np.unique(ids)
    if len(uniq) == 1:
        return np.ones(len(records))
    counts = np.bincount(ids)
    weights = np.array([1 - counts[i] / counts.sum() for i in uniq], np.float64)
    weights = weights / weights.min()
    out = np.zeros(len(records))
    for i, w in zip(uniq, weights):
        out[ids == i] = w
    return out


class TrainingSampler:
    """Infinite shuffled index stream (detectron2 TrainingSampler)."""

    def __init__(self, size: int, seed: int = 0, shuffle: bool = True):
        self.size = size
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle

    def __iter__(self):
        while True:
            idx = np.arange(self.size)
            if self.shuffle:
                self.rng.shuffle(idx)
            yield from idx


class RepeatFactorTrainingSampler:
    """Infinite stream with per-image fractional repeat factors (stochastic
    rounding per epoch, detectron2 semantics)."""

    def __init__(self, repeat_factors: np.ndarray, seed: int = 0):
        self.factors = np.asarray(repeat_factors, np.float64)
        self.int_part = np.floor(self.factors).astype(np.int64)
        self.frac_part = self.factors - self.int_part
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            rands = self.rng.random(len(self.factors))
            reps = self.int_part + (rands < self.frac_part)
            idx = np.repeat(np.arange(len(self.factors)), reps)
            self.rng.shuffle(idx)
            yield from idx


def build_train_sampler(cfg, records, dataset_id_to_src=None, seed: int = 0):
    """The 4 sampling modes (reference build.py:93-117)."""
    name = cfg.DATALOADER.SAMPLER_TRAIN
    balance = cfg.DATALOADER.BALANCE_DATASETS
    if balance:
        assert dataset_id_to_src is not None, "Need dataset sources."
        weights = dataset_balance_weights(records, dataset_id_to_src)
    if name == "TrainingSampler" and not balance:
        return TrainingSampler(len(records), seed)
    if name == "TrainingSampler" and balance:
        return RepeatFactorTrainingSampler(weights, seed)
    if name == "RepeatFactorTrainingSampler" and not balance:
        return RepeatFactorTrainingSampler(
            repeat_factors_from_category_frequency(records, cfg.DATALOADER.REPEAT_THRESHOLD),
            seed,
        )
    if name == "RepeatFactorTrainingSampler" and balance:
        rf = repeat_factors_from_category_frequency(records, cfg.DATALOADER.REPEAT_THRESHOLD)
        rf = rf * weights
        rf = rf / rf.min()
        return RepeatFactorTrainingSampler(rf, seed)
    raise ValueError(f"Unknown training sampler: {name}")


def build_detection_train_loader(cfg, records=None, dataset_id_to_src=None,
                                 process_index: int = 0, process_count: int = 1,
                                 seed: int = 0):
    """Generator of padded train batches (local slice of the global batch).

    Aspect-ratio grouping is subsumed by shape bucketing in collate_batch.
    """
    if records is None:
        records = get_detection_dataset_dicts(
            cfg.DATASETS.TRAIN, cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
        )
    sampler = build_train_sampler(cfg, records, dataset_id_to_src, seed)
    mapper = DatasetMapper3D(cfg, is_train=True,
                             rng=np.random.default_rng(seed + 1 + process_index))
    local_bs = cfg.SOLVER.IMS_PER_BATCH // process_count
    max_gt = cfg.TPU.MAX_GT_BOXES

    def gen():
        it = iter(sampler)
        while True:
            samples = []
            # round-robin shard: this process takes every process_count-th
            for _ in range(local_bs):
                for _ in range(process_index):
                    next(it)
                samples.append(mapper(records[next(it)]))
                for _ in range(process_count - process_index - 1):
                    next(it)
            yield collate_batch(samples, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD, max_gt)

    return gen()


def build_detection_test_loader(cfg, dataset_name, records=None, batch_size: int = 1,
                                process_index: int = 0, process_count: int = 1):
    """Finite generator of (batch, records) for evaluation, rank-sharded like
    detectron2 InferenceSampler (reference build.py:211-230; batch=1 default).
    """
    if records is None:
        records = get_detection_dataset_dicts([dataset_name], filter_empty=False)
    mapper = DatasetMapper3D(cfg, is_train=False)
    shard = records[process_index::process_count]

    def gen():
        for i in range(0, len(shard), batch_size):
            chunk = shard[i:i + batch_size]
            samples = [mapper(r) for r in chunk]
            yield collate_batch(samples, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD), chunk

    return gen(), len(shard)
