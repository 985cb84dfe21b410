"""Threaded prefetching batch loader.

Replaces torch's DataLoader + the reference's CustomDataParallel scatter
(``train.py:149-162,399-437``): worker threads decode/augment images (cv2 and
numpy release the GIL), batches are padded to fixed shapes
(``data.coco.pad_batch``) and queued so the accelerator never waits on the
host.  On TPU the whole padded batch is later `device_put` with a
batch-sharded layout — there is no per-device scatter step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from yolact_tpu.data.coco import COCODetection, pack_batch_masks, pad_batch


class BatchLoader:
    def __init__(self, dataset: COCODetection, batch_size: int,
                 max_gt: int = 100, shuffle: bool = True,
                 num_workers: int = 2, prefetch: int = 4, seed: int = 0,
                 drop_last: bool = True, pack_masks: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.pack_masks = pack_masks
        self._stop = threading.Event()
        self._batch_queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._index_queue: "queue.Queue" = queue.Queue()
        self._threads = []
        self._started = False

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _worker(self):
        while not self._stop.is_set():
            try:
                idxs = self._index_queue.get(timeout=0.25)
            except queue.Empty:
                continue
            items = [self.dataset.pull_item(i) for i in idxs]
            imgs = [it[0] for it in items]
            targets = [it[1] for it in items]
            masks = [it[2] for it in items]
            crowds = [it[5] for it in items]
            batch = pad_batch(imgs, targets, masks, crowds, self.max_gt)
            if self.pack_masks:
                batch = pack_batch_masks(batch)
            while not self._stop.is_set():
                try:
                    self._batch_queue.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def _feeder(self):
        while not self._stop.is_set():
            order = np.arange(len(self.dataset))
            if self.shuffle:
                self.rng.shuffle(order)
            nb = len(self)
            for b in range(nb):
                if self._stop.is_set():
                    return
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                if len(idxs) < self.batch_size:
                    # wrap around so shapes stay static
                    idxs = np.concatenate(
                        [idxs, order[:self.batch_size - len(idxs)]])
                while not self._stop.is_set():
                    try:
                        self._index_queue.put(list(idxs), timeout=0.25)
                        break
                    except queue.Full:
                        continue

    def start(self):
        if self._started:
            return
        self._started = True
        t = threading.Thread(target=self._feeder, daemon=True)
        t.start()
        self._threads.append(t)
        for _ in range(self.num_workers):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def __iter__(self) -> Iterator[dict]:
        self.start()
        while not self._stop.is_set():
            yield self._batch_queue.get()

    def next_batch(self) -> dict:
        self.start()
        return self._batch_queue.get()

    def stop(self):
        self._stop.set()
