"""Host-side batch loader with background prefetch.

Replaces the reference's torch DataLoader(num_workers=4, pin_memory) +
DistributedSampler stack (rotinas.py:593-605, 588-600) with a thread-pool
loader tuned for the TPU ingestion pattern:

  - workers decode/resize on the host while the device computes;
  - batches are uint8 NHWC (4× less host→device traffic than float32);
  - `shard_for_host` slices the index space per JAX process, replacing
    DistributedSampler for multi-host SPMD (each host feeds its local
    devices; GSPMD sees one global array via device_put on a sharding);
  - epoch seeding reshuffles like sampler.set_epoch (rotinas.py:680-681).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def shard_for_host(
    indices: np.ndarray,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """Contiguous per-host shard of the (shuffled) index space."""
    if process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    per = len(indices) // process_count
    if per == 0:
        # Silently giving every host the full index set would duplicate
        # each example process_count× — fail loudly instead.
        raise ValueError(
            f"shard_for_host: {len(indices)} example(s) cannot be sharded "
            f"over {process_count} hosts (need at least one per host). "
            f"For tiny eval/val splits, enlarge the split or evaluate on "
            f"fewer hosts (e.g. a single-process eval job)")
    return indices[process_index * per : (process_index + 1) * per]


class BatchLoader:
    """Iterates dict batches {input: (B,H,W,3) u8, gt: ..., name: list}.

    drop_last=True keeps shapes static across steps — one compiled program,
    no retrace (XLA requirement the torch loader doesn't have).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        shard_hosts: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_hosts = shard_hosts
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed shuffling per epoch (the DistributedSampler.set_epoch
        role, rotinas.py:680-681)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        if self.shard_hosts:
            idx = shard_for_host(idx)
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _assemble(self, pool: ThreadPoolExecutor, batch_idx: np.ndarray) -> dict:
        get_batch = getattr(self.dataset, "get_batch", None)
        if get_batch is not None:
            out = get_batch(batch_idx)
            if out is not None:  # fused native decode+resize path
                return out
        items = list(pool.map(self.dataset.__getitem__, batch_idx))
        out: dict = {}
        for key, v0 in items[0].items():
            vals = [it[key] for it in items]
            if isinstance(v0, (np.ndarray, int, float, np.integer, np.floating)):
                out[key] = np.stack([np.asarray(v) for v in vals])
            else:
                out[key] = vals  # e.g. filename strings
        return out

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        if nb == 0:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    lo = b * self.batch_size
                    batch_idx = idx[lo : lo + self.batch_size]
                    q.put(self._assemble(pool, batch_idx))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class DeviceBatchLoader:
    """BatchLoader-compatible iterator whose corpus is device-resident.

    The whole dataset is staged to the device ONCE at construction
    (uint8, so a 512-pair 256² corpus is ~200 MB of HBM — small next to
    16 GB); every epoch's batches are then gathered on device by a jitted
    ``take`` over a tiny per-batch index array. Two reasons:

      - TPU-idiomatic ingestion: re-streaming an in-memory corpus over
        PCIe/the tunnel every epoch spends host↔device bandwidth to move
        bytes the device already has; gathers ride HBM bandwidth instead.
      - The experimental `axon` PJRT plugin leaks host RAM proportional
        to every H2D transfer (measured ~6 MB per 6.3 MB `device_put`),
        which OOM-kills multi-hour 256² runs near 22k steps; with the
        corpus resident, per-step traffic is a ~64-byte index vector.

    Batch composition is bit-identical to ``BatchLoader`` for the same
    ``(seed, epoch, batch_size, drop_last)``: the identical
    ``RandomState(seed + epoch)`` shuffle over the identical index space.
    Multi-host sharding is not supported (each host would need its own
    resident shard); construction fails loudly rather than duplicating
    the corpus per process. Replaces the host path of the reference's
    DataLoader (rotinas.py:593-605) for corpora that fit in HBM.
    """

    device_resident = True

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        sharding=None,
        keys: tuple = ("input", "gt"),
    ):
        import jax
        import jax.numpy as jnp

        if jax.process_count() > 1:
            raise NotImplementedError(
                "DeviceBatchLoader is single-process; use BatchLoader with "
                "shard_hosts=True for multi-host input")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.n = len(dataset)
        host: dict = {k: [] for k in keys}
        self.names: list = []
        for i in range(self.n):
            item = dataset[i]
            for k in keys:
                host[k].append(np.asarray(item[k]))
            self.names.append(item.get("name"))
        corpus = {k: np.stack(v) for k, v in host.items()}
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # Corpus replicated over the mesh; the gather's output lands
            # directly on the batch sharding (no host round-trip).
            rep = NamedSharding(sharding.mesh, PartitionSpec())
            self.corpus = {k: jax.device_put(v, rep)
                           for k, v in corpus.items()}
        else:
            self.corpus = {k: jax.device_put(v) for k, v in corpus.items()}

        def _take(corpus, idx):
            return {k: jnp.take(v, idx, axis=0) for k, v in corpus.items()}

        self._gather = jax.jit(
            _take, **({"out_shardings": sharding} if sharding else {}))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def __len__(self) -> int:
        return (self.n // self.batch_size if self.drop_last
                else -(-self.n // self.batch_size))

    def __iter__(self) -> Iterator[dict]:
        import jax.numpy as jnp

        idx = self._indices()
        for b in range(len(self)):
            batch_idx = idx[b * self.batch_size:(b + 1) * self.batch_size]
            out = dict(self._gather(self.corpus,
                                    jnp.asarray(batch_idx, jnp.int32)))
            out["name"] = [self.names[i] for i in batch_idx]
            yield out


def device_prefetch(iterator: Iterator[dict], sharding=None,
                    depth: int = 2) -> Iterator[dict]:
    """Overlap host→device transfer with device compute.

    Eagerly device_puts up to `depth` upcoming batches (uint8, so the
    copies are 1 byte/px) while the current step runs — the role of the
    reference's pin_memory+non_blocking DataLoader transfers
    (rotinas.py:593-605), TPU-style. `sharding` places batches straight
    onto the mesh (parallel.batch_sharding) so no host-side reshard
    happens later.
    """
    import collections

    import jax

    def put(batch: dict) -> dict:
        return {
            k: (jax.device_put(v, sharding) if hasattr(v, "shape") else v)
            for k, v in batch.items()
        }

    buf: collections.deque = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def interleave(*loaders: BatchLoader) -> Iterator[dict]:
    """Round-robin over several loaders until all are exhausted — the
    reference's multi-dataloader interleaving (rotinas.py:487-519), used to
    mix underwater and atmospheric batches within an epoch."""
    iters = [iter(l) for l in loaders]
    alive = [True] * len(iters)
    while any(alive):
        for i, it in enumerate(iters):
            if not alive[i]:
                continue
            try:
                yield next(it)
            except StopIteration:
                alive[i] = False
