"""Batched, prefetching data loader.

TPU replacement for the reference's torch DataLoader + timm PrefetchLoader
stack (main.py:291-306, datasets.py:144-184): worker threads decode and
augment (PIL releases the GIL in its C codecs), batches are assembled as
uint8 HWC numpy arrays — 4x smaller host->HBM transfers than float32; the
normalization runs on device — and a bounded queue keeps a configurable
number of batches in flight ahead of the step loop (double buffering).

``drop_last`` semantics match the torch train loader; eval keeps the tail.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Tuple

import numpy as np

from .datasets import VisionDataset


class DataLoader:
    def __init__(self, dataset: VisionDataset, sampler: Iterable[int],
                 batch_size: int, num_workers: int = 4, drop_last: bool = True,
                 prefetch_batches: int = 2, seed: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)  # type: ignore[arg-type]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        indices = list(iter(self.sampler))
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        job_q: "queue.Queue" = queue.Queue()
        results = {}
        results_ready = threading.Condition()

        for i, b in enumerate(batches):
            job_q.put((i, b))
        stop = threading.Event()

        # workers park when this many finished batches are waiting, so a
        # slow consumer cannot make the results dict grow into the epoch
        backlog_limit = self.prefetch_batches + self.num_workers
        backlog_free = threading.Condition()

        def worker(worker_id: int):
            rng = np.random.default_rng(
                (self.seed, self.epoch, worker_id))
            while not stop.is_set():
                with backlog_free:
                    while (len(results) >= backlog_limit
                           and not stop.is_set()):
                        backlog_free.wait(timeout=0.1)
                try:
                    bi, batch_indices = job_q.get_nowait()
                except queue.Empty:
                    return
                images, labels = [], []
                for idx in batch_indices:
                    img, label = self.dataset.load(idx, rng)
                    images.append(img)
                    labels.append(label)
                item = (np.stack(images), np.asarray(labels, np.int32))
                with results_ready:
                    results[bi] = item
                    results_ready.notify_all()

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()

        def emitter():
            next_bi = 0
            try:
                while next_bi < len(batches) and not stop.is_set():
                    with results_ready:
                        while next_bi not in results and not stop.is_set():
                            results_ready.wait(timeout=0.1)
                        item = results.pop(next_bi, None)
                    if item is None:
                        return  # stopped before the batch arrived
                    with backlog_free:
                        backlog_free.notify_all()
                    # blocking put happens OUTSIDE the lock so workers can
                    # keep posting results while the consumer is slow
                    out_q.put(item)
                    next_bi += 1
            finally:
                out_q.put(None)

        emit_thread = threading.Thread(target=emitter, daemon=True)
        emit_thread.start()

        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so worker threads can exit
            while not job_q.empty():
                try:
                    job_q.get_nowait()
                except queue.Empty:
                    break


def normalize_images(images, mean, std):
    """Device-side uint8 -> normalized float conversion (see train engine)."""
    import jax.numpy as jnp

    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
    return (x - mean) / std
