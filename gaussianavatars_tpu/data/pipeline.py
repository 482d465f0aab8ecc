"""Host image pipeline: decode → composite → resize → prefetch to device.

Replaces the reference's `CameraDataset` + torch `DataLoader(num_workers=8)`
(`scene/__init__.py:31-67`, `train.py:116-124`). The reference forks worker
*processes* because of the GIL around torch CPU tensors; here decoding is
PIL/numpy (releases the GIL) so a small thread pool + a bounded queue of
device-resident batches keeps the TPU fed without process boundaries:

    sampler (shuffled epochs) → ThreadPool decode → queue[device arrays]

`load_view` matches `CameraDataset.__getitem__` semantics: RGBA images are
alpha-composited onto the record's background color, resized to the Camera's
resolution, float32 in [0,1], HWC.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .cameras import Camera
from .readers import CameraRecord


def decode_image(path: str, bg: np.ndarray, width: int, height: int) -> np.ndarray:
    """Decode one image to float32 [H, W, 3] in [0,1], compositing alpha
    onto `bg` (`scene/__init__.py:44-63`).

    Uses the native decoder (libpng/libjpeg, `native/gsavatars_native.cpp`)
    when available; PIL otherwise. Disable with GSAVATARS_NO_NATIVE=1."""
    from .. import native

    out = native.decode_image(path, width, height, bg)
    if out is not None:
        return out
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True  # reference `scene/__init__.py:28`
    with Image.open(path) as im:
        if im.size != (width, height):
            # BILINEAR matches the native decoder's resampling exactly — the
            # two paths must yield the same ground truth or training/eval
            # numbers silently depend on whether the .so compiled.
            im = im.resize((width, height), Image.BILINEAR)
        arr = np.asarray(im.convert("RGBA"), np.float32) / 255.0
    rgb = arr[..., :3]
    a = arr[..., 3:4]
    return rgb * a + np.asarray(bg, np.float32) * (1.0 - a)


def load_view(rec: CameraRecord, cam: Camera) -> np.ndarray:
    return decode_image(rec.image_path, rec.bg, cam.width, cam.height)


def gt_to_float(x):
    """uint8 [0,255] → float32 [0,1]; float passes through unchanged.

    THE one conversion used by every ground-truth path (device cache `get`,
    the in-scan gather, the sharded step). It must be a multiply by this
    exact constant everywhere: a true divide can be rewritten differently by
    XLA depending on fusion context, and a 1-ulp difference between two
    otherwise-identical training paths is amplified by Adam (eps=1e-15)
    into sign-flipped updates, breaking scan↔single-step equivalence."""
    import jax.numpy as jnp

    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
        return jnp.asarray(x).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return x


class EpochSampler:
    """Shuffled epoch order over view indices (DataLoader(shuffle=True)
    with batch 1, `train.py:116-124`)."""

    def __init__(self, n: int, seed: int = 0, shuffle: bool = True):
        self.n = n
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle

    def __iter__(self) -> Iterator[int]:
        while True:
            order = self.rng.permutation(self.n) if self.shuffle else np.arange(self.n)
            yield from order.tolist()


class Prefetcher:
    """Background decode + transfer. `next()` returns (view_index, gt_array).

    `batch` > 1 stacks consecutive sampled views (for the data-parallel
    sharded step); arrays are delivered as jax device arrays when jax is
    importable, else numpy.
    """

    def __init__(
        self,
        records: Sequence[CameraRecord],
        cameras: Sequence[Camera],
        seed: int = 0,
        depth: int = 4,
        workers: int = 4,
        batch: int = 1,
        shuffle: bool = True,
        device_put: bool = True,
        indices: Optional[Sequence[int]] = None,
    ):
        assert len(records) == len(cameras)
        self.records = list(records)
        self.cameras = list(cameras)
        idx = list(indices) if indices is not None else list(range(len(records)))
        self._sampler = iter(EpochSampler(len(idx), seed, shuffle))
        self._index_map = idx
        self.batch = batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._device_put = device_put
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(workers)
        ]
        self._lock = threading.Lock()
        self._seq = 0          # ticket dispenser so output order == sample order
        self._emit = 0
        self._emit_cv = threading.Condition()
        for t in self._threads:
            t.start()

    def _sample_ticket(self) -> Tuple[int, List[int]]:
        with self._lock:
            ticket = self._seq
            self._seq += 1
            views = [self._index_map[next(self._sampler)] for _ in range(self.batch)]
        return ticket, views

    def _worker(self):
        while not self._stop.is_set():
            ticket, views = self._sample_ticket()
            try:
                gts = [load_view(self.records[v], self.cameras[v]) for v in views]
                item = (views, np.stack(gts, 0))
            except Exception as e:  # surface decode errors to the consumer
                item = e
            # Preserve sampler order across threads: wait for our turn, then
            # put *outside* the condition lock (a full queue must never block
            # close(), which needs the lock to wake waiters).
            with self._emit_cv:
                while self._emit != ticket and not self._stop.is_set():
                    self._emit_cv.wait(0.1)
            if self._stop.is_set():
                return
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            with self._emit_cv:
                self._emit += 1
                self._emit_cv.notify_all()

    def next(self) -> Tuple[List[int], object]:
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        views, gt = item
        if self._device_put:
            import jax

            gt = jax.device_put(gt)
        return views, gt

    def close(self):
        self._stop.set()
        with self._emit_cv:
            self._emit_cv.notify_all()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
