"""Torch-free dataset/loader runtime.

Replaces ``torch.utils.data.DataLoader`` (``/root/reference/datasets/__init__.py:33,44``)
with a lightweight thread-pool prefetcher: cv2/numpy release the GIL on the
decode/resize hot path, so worker threads overlap host IO with device compute
without process-spawn overhead.  Deterministic order; bounded prefetch queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


class Dataset:
    """Minimal map-style dataset protocol."""

    def __len__(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, index: int) -> Any:  # pragma: no cover - interface
        raise NotImplementedError


def _collate(samples: Sequence[Any]) -> Any:
    first = samples[0]
    if isinstance(first, np.ndarray):
        return np.stack(samples, 0)
    if isinstance(first, dict):
        return {k: _collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(_collate([s[i] for s in samples])
                           for i in range(len(first)))
    if isinstance(first, (int, float, np.floating, np.integer)):
        return np.asarray(samples)
    return list(samples)


class DataLoader:
    """Threaded prefetching loader.

    batch_size=None yields raw samples (the test loaders use batch 1 /
    un-batched); otherwise samples are collated by stacking.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 8,
        process_shard: Optional[tuple] = None,
    ):
        """``process_shard=(process_id, process_count)``: multi-host data
        sharding — every process sees the same (seed-deterministic) global
        batch order but loads only its ``batch_size/process_count`` slice of
        each batch (host-local sharded loading)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.process_shard = process_shard
        if process_shard is not None and batch_size is not None:
            pid, pc = process_shard
            if batch_size % pc != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"process_count {pc}")
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.batch_size is None:
            return n
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        if self.batch_size is None:
            return [[int(i)] for i in order]
        batches = [
            order[i : i + self.batch_size].tolist()
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.process_shard is not None:
            pid, pc = self.process_shard
            batches = [b[pid::pc] for b in batches]
        return batches

    def __iter__(self) -> Iterator[Any]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers == 0:
            for b in batches:
                samples = [self.dataset[i] for i in b]
                yield samples[0] if self.batch_size is None else _collate(samples)
            return
        yield from self._threaded_iter(batches)

    def _threaded_iter(self, batches: List[List[int]]) -> Iterator[Any]:
        results: Dict[int, Any] = {}
        lock = threading.Lock()
        done = threading.Event()
        task_q: "queue.Queue" = queue.Queue()
        for pos, b in enumerate(batches):
            task_q.put((pos, b))
        errors: List[BaseException] = []
        sem = threading.Semaphore(self.prefetch)

        def worker():
            while not done.is_set():
                try:
                    pos, b = task_q.get_nowait()
                except queue.Empty:
                    return
                sem.acquire()
                try:
                    samples = [self.dataset[i] for i in b]
                    out = samples[0] if self.batch_size is None else _collate(samples)
                    with lock:
                        results[pos] = out
                except BaseException as e:  # propagate to consumer
                    with lock:
                        errors.append(e)
                    done.set()
                    return

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for pos in range(len(batches)):
                while True:
                    with lock:
                        if errors:
                            raise errors[0]
                        if pos in results:
                            out = results.pop(pos)
                            break
                    if done.is_set() and pos not in results:
                        with lock:
                            if errors:
                                raise errors[0]
                    threading.Event().wait(0.002)
                sem.release()
                yield out
        finally:
            done.set()
            for t in threads:
                t.join(timeout=1.0)
