"""Batching pipeline: fixed-shape collate + threaded prefetching loader.

Parity target: the reference's DataLoader + ``prepare_data`` collate
(datasets.py:28-81, wired at main.py:176-182).  The reference sorts each
batch by caption length (descending) and returns both sort permutations so
the trainer can unsort for the contrastive loss (trainer.py:409-415) — a
holdover from packed-RNN ergonomics.  All attention here is mask-based, so
batches stay in dataset order, permutations disappear, and every array in the
batch has a static shape (required for a single jitted train step).

The loader itself is a thread-pool prefetcher: PIL decode + augmentation run
on host worker threads while the TPU consumes the previous batch (the
reference uses torch DataLoader worker *processes*; threads suffice here
since PIL/numpy release the GIL for the heavy ops).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from t2igan.data.tokenizer import ClipTokenizer


@dataclass
class Batch:
    """One fixed-shape training batch (two caption views per image)."""

    images: List[np.ndarray]            # per-branch [B, s, s, 3] float32
    input_ids: np.ndarray               # [B, W] int32, view 1
    attention_mask: np.ndarray          # [B, W] int32
    input_ids_2: np.ndarray             # [B, W] int32, view 2
    attention_mask_2: np.ndarray        # [B, W]
    class_ids: np.ndarray               # [B] int32
    keys: List[str]


def collate(records, tokenizer: ClipTokenizer, words_num: int) -> Batch:
    """Tokenize both caption views and stack the pyramid — the mask-based
    equivalent of ``prepare_data`` (datasets.py:28-81)."""
    n_branches = len(records[0].images)
    images = [np.stack([r.images[b] for r in records]).astype(np.float32)
              for b in range(n_branches)]
    caps1 = tokenizer([r.caption for r in records], max_length=words_num)
    caps2 = tokenizer([r.caption_2 for r in records], max_length=words_num)
    return Batch(
        images=images,
        input_ids=caps1["input_ids"],
        attention_mask=caps1["attention_mask"],
        input_ids_2=caps2["input_ids"],
        attention_mask_2=caps2["attention_mask"],
        class_ids=np.asarray([r.class_id for r in records], np.int32),
        keys=[r.key for r in records],
    )


def prefetch_to_device(batch_iter, put_fn, depth: int = 2):
    """Overlap host->device transfer with compute: keep ``depth`` batches
    already device-put ahead of the consumer.

    ``put_fn`` maps a host :class:`Batch` to device arrays (e.g. the
    trainer's ``_device_batch``).  The TPU analogue of torch DataLoader's
    pinned-memory prefetch.
    """
    import collections

    queue = collections.deque()
    it = iter(batch_iter)
    try:
        for _ in range(depth):
            queue.append(put_fn(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put_fn(next(it)))
        except StopIteration:
            pass
        yield out


class DataLoader:
    """Shuffling, drop-last, prefetching batch iterator."""

    def __init__(self, dataset, tokenizer: ClipTokenizer, batch_size: int,
                 words_num: int, shuffle: bool = True, drop_last: bool = True,
                 num_workers: int = 2, prefetch: int = 2, seed: int = 0,
                 host_index: Optional[int] = None,
                 host_count: Optional[int] = None,
                 engine: str = "auto"):
        """``host_index``/``host_count`` shard the dataset across hosts for
        multi-host training (each host feeds its local devices its slice of
        the global batch); default to the jax process topology.  Shuffles
        use the same seed on every host, so the global epoch order is a
        consistent permutation.

        ``engine`` selects the batch-production backend: ``"thread"`` is the
        Python thread pool above; ``"native"`` requires the C++ async
        executor (native file read + JPEG/PNG decode + transform off the
        Python thread, t2igan/native/image_exec.cc); ``"auto"`` uses the
        executor when it is buildable AND the dataset exposes sample plans
        (``plan_record``), else falls back to threads."""
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.words_num = words_num
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        if engine not in ("auto", "thread", "native"):
            raise ValueError(f"unknown loader engine {engine!r}")
        self.engine = engine
        self._exec = None  # cached AsyncExecutor, reused across epochs
        if host_index is None or host_count is None:
            try:
                import jax
                host_index = jax.process_index()
                host_count = jax.process_count()
            except Exception:
                host_index, host_count = 0, 1
        self.host_index = host_index
        self.host_count = host_count

    def _host_slice(self, idx: np.ndarray) -> np.ndarray:
        if self.host_count <= 1:
            return idx
        per = len(idx) // self.host_count
        start = self.host_index * per
        return idx[start:start + per]

    def __len__(self):
        n = len(self._host_slice(np.arange(len(self.dataset))))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        idx = self._host_slice(idx)
        n = len(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            yield idx[s:s + self.batch_size]

    def peek(self) -> Optional[Batch]:
        """A deterministic probe batch that does NOT consume loader state.

        Snapshot/figure helpers previously did ``next(iter(loader))``, which
        bumps the epoch counter and shifts every subsequent shuffle — runs
        stopped being reproducible across snapshot intervals.  ``peek``
        collates the first ``batch_size`` records in dataset order through
        an rng-free path (``deterministic_record``: fixed caption choice,
        center crop, no flip) where the dataset provides one, so neither
        the loader's epoch counter NOR the dataset's shared rng is
        perturbed: fixed across calls, epochs and snapshot cadence.
        """
        n = min(self.batch_size, len(self.dataset))
        if n == 0:
            return None
        fetch = getattr(self.dataset, "deterministic_record", None)
        if fetch is None:
            fetch = self.dataset.__getitem__
        records = [fetch(i) for i in range(n)]
        return collate(records, self.tokenizer, self.words_num)

    def _native_usable(self) -> bool:
        if self.engine == "thread":
            return False
        if not hasattr(self.dataset, "plan_record"):
            if self.engine == "native":
                raise RuntimeError(
                    "engine='native' needs a dataset with plan_record() "
                    f"(got {type(self.dataset).__name__})")
            return False
        from t2igan import native

        ok = native.exec_available()
        if not ok and self.engine == "native":
            raise RuntimeError("engine='native': the C++ executor library "
                               "could not be built (needs g++ + libjpeg/"
                               "libpng)")
        return ok

    def _get_exec(self):
        """The slot buffers are large (3 pyramid branches x batch x slots),
        so one executor is created lazily and reused across epochs."""
        from t2igan import native

        if self._exec is None:
            ds = self.dataset
            self._exec = native.AsyncExecutor(
                branch_sizes=list(ds.sizes), scale_size=ds.transform.scale,
                crop=ds.transform.imsize, max_batch=self.batch_size,
                n_threads=self.num_workers, n_slots=self.prefetch + 1)
        return self._exec

    def close(self):
        """Release the cached native executor (threads + slot buffers)."""
        if self._exec is not None:
            self._exec.close()
            self._exec = None

    def _iter_native(self, batches) -> Iterator[Batch]:
        """Batch production through the C++ async executor: submit plans for
        ``prefetch + 1`` batches ahead, block only on the oldest, rebuild
        failed samples (exotic formats) through the PIL fallback."""
        ds = self.dataset
        ex = self._get_exec()
        try:
            pending = {}
            it = iter(batches)
            next_id = 0

            def submit_one():
                nonlocal next_id
                idxs = next(it)  # raises StopIteration when drained
                plans = [ds.plan_record(int(i)) for i in idxs]
                uv = np.asarray([[p.u, p.v] for p in plans], np.float32)
                ex.submit(next_id, [p.path for p in plans],
                          [p.bbox for p in plans], uv,
                          [p.flip for p in plans])
                # tokenize at submit time so the host BPE overlaps the
                # native decode instead of sitting on the wait path
                caps1 = self.tokenizer([p.caption for p in plans],
                                       max_length=self.words_num)
                caps2 = self.tokenizer([p.caption_2 for p in plans],
                                       max_length=self.words_num)
                pending[next_id] = (plans, caps1, caps2)
                next_id += 1

            for _ in range(self.prefetch + 1):
                try:
                    submit_one()
                except StopIteration:
                    break
            while pending:
                bid, branches, errs = ex.wait()
                plans, caps1, caps2 = pending.pop(bid)
                images = [np.array(b) for b in branches]  # copy out of slot
                ex.release(bid)
                try:
                    submit_one()
                except StopIteration:
                    pass
                for i in np.nonzero(errs)[0]:
                    fb = ds.exec_fallback(plans[int(i)])
                    for b in range(len(images)):
                        images[b][int(i)] = fb[b]
                yield Batch(
                    images=images,
                    input_ids=caps1["input_ids"],
                    attention_mask=caps1["attention_mask"],
                    input_ids_2=caps2["input_ids"],
                    attention_mask_2=caps2["attention_mask"],
                    class_ids=np.asarray([p.class_id for p in plans],
                                         np.int32),
                    keys=[p.key for p in plans],
                )
        finally:
            # Drain anything still in flight (e.g. the consumer broke out
            # mid-epoch) so the reused executor starts the next epoch clean.
            while pending:
                bid, _, _ = ex.wait()
                pending.pop(bid, None)
                ex.release(bid)

    def __iter__(self) -> Iterator[Batch]:
        from concurrent.futures import ThreadPoolExecutor

        self.epoch += 1
        batches = list(self._index_batches())
        if not batches:
            return iter(())
        if self._native_usable():
            return self._iter_native(batches)

        def make(batch_idx):
            records = [self.dataset[int(i)] for i in batch_idx]
            return collate(records, self.tokenizer, self.words_num)

        def gen():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = []
                it = iter(batches)
                for _ in range(self.prefetch + 1):
                    try:
                        futures.append(pool.submit(make, next(it)))
                    except StopIteration:
                        break
                while futures:
                    batch = futures.pop(0).result()
                    try:
                        futures.append(pool.submit(make, next(it)))
                    except StopIteration:
                        pass
                    yield batch

        return gen()
