"""Host data loader: sharded, shuffled, threaded, prefetching.

Replaces the reference's torch DataLoader + DistributedSampler
(`main.py:316-370`): per-host index sharding (`shard_index/num_shards` —
`jax.process_index()` at call sites), per-epoch seeded shuffling, a thread
pool for decode+augment (PIL/cv2 release the GIL), and a small prefetch
queue so host work overlaps device steps.

Eval batches are grouped by image shape so variable-aspect datasets
(SegTrackv2/FBMS) produce a handful of static shapes instead of one
recompile per sequence.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_STACK_KEYS = ("imgs", "gt_fw_flows", "gt_bw_flows", "pl_masks", "ann")
_LIST_KEYS = ("seq_names", "paths", "frame_ind_start")


def _collate(samples: list[dict]) -> dict:
    batch: dict = {}
    for key in _STACK_KEYS:
        if key in samples[0]:
            batch[key] = np.stack([s[key] for s in samples])
    batch["seq_ids"] = np.array([s["seq_ids"] for s in samples], np.int32)
    for key in _LIST_KEYS:
        if key in samples[0]:
            batch[key] = [s[key] for s in samples]
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        transform,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        num_workers: int = 8,
        shard_index: int = 0,
        num_shards: int = 1,
        drop_last: bool | None = None,
        group_by_shape: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.drop_last = shuffle if drop_last is None else drop_last
        self.group_by_shape = group_by_shape
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    # -- index plan ------------------------------------------------------
    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
            # Equal per-shard length (wrap-pad like DistributedSampler).
            per_shard = -(-n // self.num_shards)
            padded = np.concatenate([order, order[: per_shard * self.num_shards - n]])
            mine = padded[self.shard_index :: self.num_shards]
            # Wrap-pad to a whole number of batches: static batch shapes are
            # required under jit (torch instead emits a smaller last batch).
            remainder = len(mine) % self.batch_size
            if remainder:
                mine = np.concatenate([mine, mine[: self.batch_size - remainder]])
            return mine
        return np.arange(n)[self.shard_index :: self.num_shards]

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # -- iteration ---------------------------------------------------------
    def _load_one(self, index: int) -> dict:
        sample = self.dataset[int(index)]
        rng = np.random.default_rng((self.seed, self.epoch, int(index)))
        return self.transform(sample, rng)

    def _batches_of_indices(self):
        indices = self._epoch_indices()
        if not self.group_by_shape:
            end = len(indices) - (len(indices) % self.batch_size) if self.drop_last else len(indices)
            for i in range(0, end, self.batch_size):
                yield indices[i : i + self.batch_size]
            return
        # Shape-grouped (eval): bucket consecutive samples by image shape.
        buckets: dict[tuple, list[int]] = {}
        probe_cache: dict[str, tuple] = {}
        for idx in indices:
            # Shape after keep-ratio resize depends only on the source size;
            # probing the first frame's header is cheap via PIL lazy open.
            shape = self._probe_shape(int(idx), probe_cache)
            bucket = buckets.setdefault(shape, [])
            bucket.append(int(idx))
            if len(bucket) == self.batch_size:
                yield np.array(bucket)
                bucket.clear()
        for bucket in buckets.values():
            if bucket:
                yield np.array(bucket)

    def _probe_shape(self, index: int, cache: dict) -> tuple:
        from PIL import Image

        seq_idx = int(np.digitize(index, self.dataset.len_cumsum)) - 1
        path = self.dataset.seq_paths[seq_idx][0]
        key = path.rsplit("/", 2)[0] + "/" + self.dataset.seq_names[seq_idx]
        if key not in cache:
            with Image.open(path) as im:
                cache[key] = im.size  # (W, H)
        return cache[key]

    def __iter__(self):
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                # workers: 0 (reference semantics: load in the main process)
                # still needs one pool thread here.
                with ThreadPoolExecutor(max_workers=max(1, self.num_workers)) as pool:
                    for batch_idx in self._batches_of_indices():
                        samples = list(pool.map(self._load_one, batch_idx))
                        out_q.put(_collate(samples))
            except BaseException as exc:  # propagate into the consumer
                out_q.put(exc)
                return
            out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
