"""Host-side prefetch pipeline: decode/resize frames ahead of the device.

The reference overlaps data loading with compute by running the tracker in a
separate OS process from the dataloader-driven main loop. Single-process
TPU equivalent: a small thread pool reads + undistorts + resizes + normalizes
upcoming frames and places them on device while the current frame's jitted
step is in flight (JAX dispatch is async, so the host thread is free).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple



class PrefetchLoader:
    """Iterates (timestamp, device_image) with ``depth`` frames in flight.

    ``dataset``: indexable returning (timestamp, rgb float [0,1]);
    ``preprocess``: host fn mapping the raw rgb -> the (1, H, W, 3)
    normalized array to upload.
    """

    def __init__(self, dataset, preprocess, depth: int = 2, max_frames: Optional[int] = None):
        self.dataset = dataset
        self.preprocess = preprocess
        self.depth = max(1, depth)
        self.n = len(dataset) if max_frames is None else min(max_frames, len(dataset))
        self._q: queue.Queue = queue.Queue(maxsize=self.depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)

    def _worker(self):
        import jax.numpy as jnp

        for i in range(self.n):
            if self._stop.is_set():
                break
            try:
                ts, img = self.dataset[i]
                arr = self.preprocess(img)
                dev = jnp.asarray(arr)  # upload from the prefetch thread
                self._q.put((i, ts, dev, None))
            except Exception as e:  # propagate to the consumer
                self._q.put((i, None, None, e))
                break
        self._q.put(None)  # sentinel

    def __iter__(self) -> Iterator[Tuple[float, object]]:
        self._thread.start()
        try:
            while True:
                item = self._q.get()
                if item is None:
                    break
                i, ts, dev, err = item
                if err is not None:
                    raise err
                yield ts, dev
        finally:
            self._stop.set()

    def close(self):
        self._stop.set()
