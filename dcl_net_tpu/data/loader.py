"""Host-side batch loaders with background prefetch.

Replaces torch DataLoader + collate (reference tools/train_YCBV_stage1.py:
262-271): a worker pool maps dataset.__getitem__, samples are stacked into
fixed-shape PoseBatches (schema.make_batch), and batches are prefetched so
host IO overlaps device compute. No torch dependency.

Workers are threads by default (zero-copy, fine for synthetic/in-memory
datasets and for IO that releases the GIL) or PROCESSES
(worker_type="process"), matching the reference's 10 DataLoader worker
processes for real PNG/.mat decoding where the Python-side preprocessing
holds the GIL (reference configs/config_YCBV_bs32.yaml workers,
tools/train_YCBV_stage1.py:262-271). Process workers fork once per pool and
receive the dataset through the initializer, so per-item dispatch pickles
only indices and results.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

from dcl_net_tpu.data.schema import make_batch

_WORKER_DATASET = None


def _init_worker(dataset, seed_counter=None, base_seed=0) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    if seed_counter is not None:
        # distinct per-worker RNG streams (like torch DataLoader's worker
        # seeding): forkserver workers otherwise all inherit the SAME
        # np.random/random state from the server process, producing
        # identical augmentation draws in every worker. SeedSequence
        # spreads (base_seed, worker_id) through a hash so worker streams
        # don't collide with each other, with adjacent base seeds, or with
        # BatchLoader's small-int-seeded shuffle RandomStates.
        import random

        with seed_counter.get_lock():
            worker_id = seed_counter.value
            seed_counter.value += 1
        seed = int(
            np.random.SeedSequence((int(base_seed), worker_id)).generate_state(1)[0]
        )
        np.random.seed(seed)
        random.seed(seed)


def _worker_get(i):
    return _WORKER_DATASET[int(i)]


def _worker_ping():
    import os

    return os.getpid()


class _ProcessPool:
    """Thin ThreadPoolExecutor-shaped wrapper over multiprocessing.Pool so
    the loaders can swap worker types without restructuring.

    Uses the FORKSERVER start method: workers fork from a clean helper
    process instead of this one — by loader time the parent is
    multithreaded (JAX/TPU client, prefetch threads), and fork() from a
    threaded parent can deadlock children on inherited locks. The dataset
    is pickled once per worker via the initializer; per-item dispatch
    moves only indices and results.

    The pool is PERSISTENT: context-manager exit leaves it alive (one
    spawn per loader, reused across epochs — respawning per epoch cost
    ~4-5 s/epoch in the real-file train smoke); call close() / drop the
    owning loader to tear it down.
    """

    def __init__(self, num_workers: int, dataset, base_seed: int = 0,
                 start_timeout: float = 180.0):
        import multiprocessing as mp

        ctx = mp.get_context("forkserver")
        counter = ctx.Value("i", 0)  # hands out worker ids for RNG seeding
        self._pool = ctx.Pool(
            num_workers, initializer=_init_worker,
            initargs=(dataset, counter, base_seed),
        )
        self._num_workers = num_workers
        # fail fast if workers cannot start: forkserver re-imports __main__
        # in each worker, so a non-file main module (stdin/notebook) kills
        # every worker at spawn and the first map() would hang FOREVER —
        # surface that as an error instead
        try:
            self._pool.apply_async(_worker_ping).get(start_timeout)
        except mp.TimeoutError:
            self._pool.terminate()
            self._pool.join()
            raise RuntimeError(
                f"process workers failed to start within {start_timeout:.0f}s."
                " Common causes: __main__ is not a real file"
                " (stdin/notebook/REPL — forkserver re-imports it, so such"
                " workers die at spawn; use worker_type='thread'), or the"
                " dataset's initializer pickle is genuinely slower than the"
                " timeout (pass a larger start_timeout)"
            ) from None

    def map(self, _fn, indices):
        idx = [int(i) for i in indices]
        chunk = max(1, len(idx) // (self._num_workers * 2))
        return self._pool.map(_worker_get, idx, chunk)

    def submit(self, _fn, i):
        ar = self._pool.apply_async(_worker_get, (int(i),))

        class _Fut:  # .result() like concurrent.futures
            def result(self, timeout=None):
                return ar.get(timeout)

        return _Fut()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False  # persistent: survives the per-epoch `with` block

    def close(self):
        self._pool.terminate()
        self._pool.join()


class _PoolOwner:
    """Mixin: lazy persistent process pool / per-epoch thread pool."""

    def _make_pool(self):
        if self.worker_type == "thread":
            return ThreadPoolExecutor(max_workers=self.num_workers)
        if self.worker_type == "process":
            if getattr(self, "_proc_pool", None) is None:
                self._proc_pool = _ProcessPool(
                    self.num_workers, self.dataset,
                    base_seed=getattr(self, "seed", 0),
                )
            return self._proc_pool
        raise ValueError(
            f"worker_type must be 'thread' or 'process', got {self.worker_type!r}"
        )

    def close(self):
        pool = getattr(self, "_proc_pool", None)
        if pool is not None:
            pool.close()
            self._proc_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class BatchLoader(_PoolOwner):
    """Shuffling, dropping-last batch iterator over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 4,
        to_jax: bool = True,
        worker_type: str = "thread",
        process_id: int = 0,
        process_count: int = 1,
        collate=None,
        batch_transform=None,
        samples_per_item: int = 1,
    ):
        """samples_per_item: number of samples each dataset __getitem__
        returns (as a list) — e.g. YCBVTrainDataset's raw-mode
        samples_per_frame, which amortizes the per-frame PNG decode over
        several instance draws. Each batch then pulls
        batch_size/samples_per_item dataset indices and flattens.

        collate(samples, pad_to) -> batch (default schema.make_batch's
        PoseBatch; device-preprocess raw mode passes
        device_preprocess.make_raw_batch). batch_transform(batch_dict) ->
        batch_dict runs in the PRODUCER thread after collate — the
        DevicePreprocessor hook dispatches its jitted graph there, so
        device preprocessing overlaps the train step like any prefetch.

        batch_size is the GLOBAL batch size. In a multi-host run
        (process_count > 1) every host constructs the same seeded shuffle and
        loads only ITS contiguous block of each global batch —
        batch_size/process_count samples — which parallel/mesh.py's
        shard_batch assembles into the global sharded array. Iteration
        length, epoch boundaries, and mid-epoch resume counts are identical
        on every host by construction (shared seed+epoch)."""
        if batch_size % max(process_count, 1):
            raise ValueError(
                f"global batch size {batch_size} is not divisible by "
                f"process_count {process_count}"
            )
        self.samples_per_item = max(int(samples_per_item), 1)
        if process_count > 1 and not drop_last:
            # a trailing partial global batch splits UNEVENLY across the
            # per-process contiguous blocks: a higher-rank process can get an
            # EMPTY index slice, crash in collate, and desynchronize the
            # hosts mid-collective. Refuse up front unless the epoch divides
            # evenly (in which case drop_last is a no-op anyway).
            items = batch_size // self.samples_per_item
            if len(dataset) % items:
                raise ValueError(
                    f"multi-host loading (process_count={process_count}) "
                    f"requires drop_last=True when the dataset length "
                    f"({len(dataset)}) is not a multiple of the global "
                    f"batch ({items} items): the trailing partial batch "
                    "would leave some process with an empty block"
                )
        if (batch_size // max(process_count, 1)) % self.samples_per_item:
            raise ValueError(
                f"per-process batch {batch_size // max(process_count, 1)} "
                f"is not divisible by samples_per_item {samples_per_item}"
            )
        self.process_id = int(process_id)
        self.process_count = max(int(process_count), 1)
        self.collate = collate
        self.batch_transform = batch_transform
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.worker_type = worker_type
        self.seed = seed
        self.prefetch = prefetch
        self.to_jax = to_jax
        self.epoch = 0
        # mid-epoch resume: next iteration skips this many leading batches
        # (the shuffle is seeded by seed+epoch, so the skipped SAMPLE
        # INDICES are exactly the consumed ones); reset to 0 after one use.
        # Augmentation draws come from per-worker RNG streams whose
        # index->worker assignment is scheduling-dependent, so replayed
        # samples are index-identical but not draw-identical — the same
        # contract as torch's DataLoader with num_workers>0.
        self.skip_next = 0

    def __len__(self) -> int:
        n = len(self.dataset)  # dataset items; each yields samples_per_item
        items = self.batch_size // self.samples_per_item
        if self.drop_last:
            return n // items
        return (n + items - 1) // items

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator:
        idx = self._indices()
        nb = len(self)
        # multi-host: this process decodes only its block of each global
        # batch (rows [pid*local_bs, (pid+1)*local_bs) of batch i) — the
        # global batch composition is identical to a single-process run.
        # With samples_per_item > 1 the unit is dataset ITEMS (each worth
        # samples_per_item samples).
        local_bs = self.batch_size // self.process_count
        items = self.batch_size // self.samples_per_item
        local_items = local_bs // self.samples_per_item
        lo = self.process_id * local_items
        batches = [
            idx[i * items + lo : i * items + lo + local_items]
            for i in range(nb)
        ]
        if self.skip_next:
            batches = batches[self.skip_next :]
            self.skip_next = 0
        self.epoch += 1

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that honors `stop`: an abandoned iterator (e.g. a
            # next(iter(loader)) peek) would otherwise leave this thread
            # blocked forever on a full queue, pinning the pool + batches
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with self._make_pool() as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        if self.samples_per_item > 1:
                            # each item is a LIST of samples (e.g. several
                            # instance draws of one decoded frame)
                            samples = [s for item in samples for s in item]
                        # all-invalid batches are yielded too (valid=0 rows
                        # -> zero-weight step): dropping them would
                        # desynchronize the consumed-batch count that
                        # mid-epoch resume replays
                        if self.collate is not None:
                            d = self.collate(samples, pad_to=local_bs)
                        else:
                            d = make_batch(samples, pad_to=local_bs).to_dict()
                        if self.batch_transform is not None:
                            d = self.batch_transform(d)
                        elif self.to_jax:
                            import jax.numpy as jnp

                            d = {
                                k: (
                                    {k2: jnp.asarray(v2) for k2, v2 in v.items()}
                                    if isinstance(v, dict) else jnp.asarray(v)
                                )
                                for k, v in d.items()
                            }
                        if not _put(d):
                            return
                _put(None)
            except BaseException as exc:  # surface in the consumer, don't
                _put(exc)                 # die silently and deadlock get()

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class EvalFrameLoader(_PoolOwner):
    """Flatten frame-style eval datasets (YCBV test) into fixed-size padded
    instance batches. Lost detections are carried to the evaluator as
    valid=0 rows with correct labels."""

    def __init__(self, dataset, batch_size: int = 16, num_workers: int = 8,
                 to_jax: bool = True, worker_type: str = "thread",
                 collate=None, batch_transform=None):
        # to_jax kept for BatchLoader signature parity; batches are emitted
        # as numpy either way (jit converts on dispatch).
        # collate/batch_transform mirror BatchLoader: the device-preprocess
        # eval path passes make_raw_batch + DevicePreprocessor(
        # eval_keep_clamp=True, augment=False).
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.to_jax = to_jax
        self.worker_type = worker_type
        self.collate = collate
        self.batch_transform = batch_transform

    def __iter__(self):
        pending: List[dict] = []

        def emit(force=False):
            while len(pending) >= self.batch_size or (force and pending):
                chunk = pending[: self.batch_size]
                del pending[: self.batch_size]
                if self.collate is not None:
                    d = self.collate(chunk, pad_to=self.batch_size)
                else:
                    d = make_batch(chunk, pad_to=self.batch_size).to_dict()
                if self.batch_transform is not None:
                    d = self.batch_transform(d)
                yield d

        def frames():
            # bounded look-ahead: submitting the WHOLE dataset to the pool
            # up front would buffer every preprocessed frame ahead of the
            # (device-paced) consumer — multi-GB of clouds in RAM
            from collections import deque

            window = max(2 * self.num_workers, 4)
            with self._make_pool() as pool:
                futs = deque()
                for i in range(len(self.dataset)):
                    futs.append(pool.submit(self.dataset.__getitem__, i))
                    if len(futs) >= window:
                        yield futs.popleft().result()
                while futs:
                    yield futs.popleft().result()

        for frame in frames():
            for s in frame["samples"]:
                pending.append(s)
            for lost in frame["lost"]:
                # lost detection: no input; valid=0 row scoring as inf
                row = dict(self.dataset_invalid_template())
                row.update(
                    rot_gt=lost["rot_gt"], trans_gt=lost["trans_gt"],
                    obj_idx=np.int32(lost["obj_idx"]), valid=0.0,
                )
                pending.append(row)
            yield from emit()
        yield from emit(force=True)

    def dataset_invalid_template(self):
        if hasattr(self.dataset, "invalid_row"):
            return self.dataset.invalid_row()
        n, m = self.dataset.n_inp, self.dataset.n_tmp
        return {
            "inp_feats": np.zeros((n, 7), np.float32),
            "inp_voxel_idx": np.zeros((n, 3), np.int32),
            "tmp_feats": np.zeros((m, 7), np.float32),
            "tmp_voxel_idx": np.zeros((m, 3), np.int32),
            "rot_gt": np.zeros((3, 3), np.float32),
            "trans_gt": np.zeros(3, np.float32),
            "obj_idx": np.int32(0),
            "sym_flag": np.float32(0.0),
            "valid": 0.0,
        }
