"""Host-side batch loader with background prefetch and process-pool workers.

The TPU-native replacement for torch DataLoader + DistributedSampler
(tools/builder.py:14-31): numpy collation on the host, per-process sharding of the
sample index space (process i takes every jax.process_count()-th index, the analog
of DistributedSampler), drop_last for train, and a double-buffered background
thread so host IO overlaps device compute. With ``num_workers > 0`` batches are
assembled by a persistent fork-based process pool (the torch num_workers analog)
— needed to keep a real chip fed: one thread reading 42k .npy files/epoch plus
per-cloud permutation+normalize cannot sustain ~2k clouds/sec. Batches come out
as stacked numpy arrays ready for device_put/sharding by the train loop.
"""
from __future__ import annotations

import queue
import threading
from collections import deque
from typing import Any, Callable, Iterator, List, Optional

import numpy as np

# process-pool worker state: the dataset is shipped once per worker via the
# pool initializer (fork context, so this is cheap page-shared memory)
_WORKER_DS = None


def _init_worker(dataset, seed_counter, base_seed):
    """Reseed per worker (the torch worker_init_fn analog): forked workers
    would otherwise inherit IDENTICAL RNG state — every dataset-held
    numpy Generator and the global np.random would replay the same
    subsample/permutation draws in every worker."""
    global _WORKER_DS
    _WORKER_DS = dataset
    with seed_counter.get_lock():
        worker_id = seed_counter.value
        seed_counter.value += 1
    seed = (int(base_seed) + worker_id * 1_000_003) % (2 ** 31)
    np.random.seed(seed)
    rng = np.random.default_rng(seed)
    for attr in ("rng",):
        if hasattr(dataset, attr):
            setattr(dataset, attr, rng)


def _fetch_chunk(chunk):
    if hasattr(_WORKER_DS, "get_batch"):
        return _WORKER_DS.get_batch(chunk)
    return default_collate([_WORKER_DS[int(i)] for i in chunk])


def default_collate(samples: List[Any]):
    """Stack leaves of (taxonomy, model_id, data) samples."""
    first = samples[0]
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (int, np.integer)):
        return np.asarray(samples, dtype=np.int32)
    if isinstance(first, float):
        return np.asarray(samples, dtype=np.float32)
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate([s[i] for s in samples])
                           for i in range(len(first)))
    return list(samples)


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_replicas: int = 1, rank: int = 0,
                 prefetch: int = 2, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_replicas = num_replicas
        self.rank = rank
        self.prefetch = prefetch
        self.num_workers = int(num_workers)
        self.epoch = 0
        self._start_batch = 0  # mid-epoch resume cursor (preemption)
        self._pool = None

    def _ensure_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            # fork: workers inherit the dataset's file lists/caches without
            # re-importing jax (spawn would re-open the TPU client in every
            # worker); workers execute only numpy code
            ctx = mp.get_context("fork")
            counter = ctx.Value("i", 0)
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_init_worker,
                initargs=(self.dataset, counter,
                          self.seed + 7919 * (self.rank + 1)))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int, start_batch: int = 0):
        """``start_batch`` skips the first k batches of this epoch — mid-epoch
        resume after a preemption checkpoint. The index order is a pure
        function of (seed, epoch), so the skipped prefix is exactly the set of
        batches the interrupted run already consumed. __len__ is unaffected
        (steps-per-epoch schedules stay epoch-global)."""
        self.epoch = epoch
        self._start_batch = int(start_batch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.num_replicas > 1:
            # pad so every replica sees the same number of samples
            pad = (-len(idx)) % self.num_replicas
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.rank::self.num_replicas]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator:
        idx = self._indices()
        nb = len(self)
        # datasets may expose a vectorized get_batch(indices) fast path
        # (one batched subsample/normalize instead of B Python passes);
        # it must return exactly what default_collate over items would
        fast = getattr(self.dataset, "get_batch", None)
        for b in range(self._start_batch, nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if fast is not None:
                yield fast(chunk)
            else:
                yield default_collate([self.dataset[int(i)] for i in chunk])

    def _batches_mp(self) -> Iterator:
        """Ordered batches from the worker pool, windowed so at most
        ~2x num_workers batches are in flight (bounds host memory)."""
        idx = self._indices()
        nb = len(self)
        chunks = (idx[b * self.batch_size:(b + 1) * self.batch_size]
                  for b in range(self._start_batch, nb))
        pool = self._ensure_pool()
        window = 2 * self.num_workers + self.prefetch
        pending: deque = deque()
        try:
            for chunk in chunks:
                pending.append(pool.submit(_fetch_chunk, chunk))
                if len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()

    def __iter__(self) -> Iterator:
        if self.num_workers > 0:
            yield from self._batches_mp()
            return
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            except Exception as e:  # pragma: no cover
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
