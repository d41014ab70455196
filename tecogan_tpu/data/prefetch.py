"""Background host->device prefetch.

The reference parsed ``--queue_thread`` but never wired it into its
DataLoader (main.py:73,227 — 0 workers).  Here the flag is real twice
over: ``TrainDataset.batches(workers=N)`` decodes/augments each batch's
clips on an N-thread pool (data/scenes.py), this module runs the whole
producer ahead of the training step behind a bounded queue, and a
double-buffered ``jax.device_put`` pipeline keeps the TPU fed while the
host prepares the next batch (SURVEY.md §2.2 async-data-loading row).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


_SENTINEL = object()


def threaded_batches(batch_iter: Iterator, depth: int = 2) -> Iterator:
    """Run ``batch_iter`` in a daemon thread, buffering ``depth`` batches."""
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    err: list = []

    def worker():
        try:
            for item in batch_iter:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def device_prefetch(batch_iter: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Transfer batches to device ``size`` steps ahead of consumption.

    With a NamedSharding the transfer also shards the batch over the mesh
    (per-host feeding for the DP config).
    """
    buf = []

    def put(item):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), item)
        return jax.tree.map(jax.device_put, item)

    it = iter(batch_iter)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for item in it:
        nxt = put(item)
        yield buf.pop(0)
        buf.append(nxt)
    while buf:
        yield buf.pop(0)


def make_input_pipeline(
    batch_iter: Iterator, queue_threads: int = 8, prefetch: int = 2, sharding=None
) -> Iterator:
    """Compose host-side threading with device prefetch (the TPU-native
    answer to the reference's dead --queue_thread flag)."""
    it = batch_iter
    if queue_threads > 0:
        it = threaded_batches(it, depth=max(prefetch, 1))
    if prefetch > 0:
        it = device_prefetch(it, size=prefetch, sharding=sharding)
    return it
