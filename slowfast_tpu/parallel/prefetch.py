"""Host->device transfer / compute overlap.

The reference overlaps H2D copies with compute via pinned memory +
``non_blocking=True`` CUDA copies behind DataLoader workers
(reference tools/train_net.py:79-98). The TPU-native equivalent: a
background thread stages (device_put + shard) batch N+1 while the jitted
step for batch N runs, feeding the training loop a bounded queue of
device-resident batches. Works regardless of whether device_put blocks
the calling thread (it does through the tunneled-runtime transport) —
the block lands on the staging thread, not the dispatch thread.
"""

import queue
import threading


class DevicePrefetcher:
    """Iterate ``stage_fn(item)`` for items of ``host_iter``, with staging
    running ``depth`` items ahead on a background thread.

    ``stage_fn`` should move the host batch to device (jnp.asarray /
    shard_batch) and return the device-resident result. Exceptions from
    either the host iterator or staging propagate to the consumer.
    """

    def __init__(self, host_iter, stage_fn, depth=2):
        self._iter = host_iter
        self._stage = stage_fn
        self._depth = max(int(depth), 1)

    def __iter__(self):
        q = queue.Queue(maxsize=self._depth)
        stop = object()
        closed = threading.Event()

        def put(item):
            # Bounded put that gives up once the consumer is gone, so an
            # early break/exception in the consumer doesn't strand this
            # thread holding device-resident batches.
            while not closed.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for item in self._iter:
                    if not put(self._stage(item)):
                        return
            except BaseException as e:  # noqa: BLE001 — surfaced below
                put(e)
            finally:
                put(stop)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            closed.set()
            # Drop staged batches so their device buffers free promptly.
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
