"""Host→device prefetching iterator (double buffering).

The reference keeps the device fed with DataLoader worker processes +
Lightning's implicit H2D copies; the TPU-native equivalent (SURVEY.md
§2.8 "tf.data/grain-style prefetch to device") uploads batch N+1 on a
background thread while the train step consumes batch N, so the device
never waits on the host on production hardware.

.. warning:: on the tunneled dev backend, dispatch/transfer overlap
   collapses the link ~20x (docs/ENGINEERING_NOTES.md) — leave prefetch
   disabled there (``prefetch_batches: 0``, the default in the finetune
   CLI). On directly-attached TPUs it hides the entire upload latency.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np


class _End:
    pass


class _Err:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(
    iterator: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    mesh: Optional[Any] = None,
) -> Iterator[Dict[str, Any]]:
    """Wrap a host-batch iterator so batches arrive device-resident.

    ``size`` bounds the number of batches in flight (2 = classic double
    buffering). With ``mesh`` the batch is sharded over the data axis
    (`core.mesh.shard_batch`); otherwise `jax.device_put` to the default
    device. Exceptions raised by the source iterator (or by the uploads)
    re-raise at the consumer's ``next()`` call, and the producer thread
    is a daemon so an abandoned consumer cannot hang interpreter exit.
    """
    import jax

    from avsl_tpu.core.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    stop = threading.Event()

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def enqueue(item) -> bool:
        # bounded put that notices an abandoned consumer (generator
        # closed / epoch ended mid-stream) instead of parking forever
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not enqueue(put(batch)):
                    return
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            enqueue(_Err(e))
            return
        enqueue(_End())

    threading.Thread(target=producer, daemon=True).start()

    try:
        while True:
            item = q.get()
            if isinstance(item, _End):
                return
            if isinstance(item, _Err):
                raise item.exc
            yield item
    finally:
        stop.set()  # consumer done or closed: release the producer
