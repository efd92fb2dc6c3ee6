"""Sample gathering and the training data pipeline.

Counterpart of reference ``model/srdataset.py``:

- :func:`gather_all_samples_from_directory` walks the generator output tree,
  parses filenames, groups by crop location, validates target sizes, and
  pairs every (style-filtered) styled file with its target
  (srdataset.py:141-244).
- :class:`SRDataset` draws uniform random pairs, applies synchronized H/V
  flips and converts sRGB->linear via ``t**2.2`` (srdataset.py:250-340):
  the dataset length is a *declared* ``num_samples`` decoupled from the pool.

TPU-native input pipeline: instead of torch DataLoader worker processes, a
thread pool decodes PNGs into pinned numpy batches while a background
prefetcher keeps ``prefetch`` batches in flight to device memory — the
host->HBM analogue of pin_memory+non_blocking (train.py:449).
"""
from __future__ import annotations

import os
import queue
import threading
import warnings
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Set, Tuple

import numpy as np

from .codec import parse_generated_filename

Pair = Tuple[str, str]


def gather_all_samples_from_directory(
    directory_path: str,
    expected_crop_size: Tuple[int, int],
    styles_to_include: Optional[Set[str]] = None,
    verbose: int = 1,
) -> List[Pair]:
    """Collect all (styled_path, target_path) pairs under a generator split.

    Grouping key: (subdirectory relpath, crop_x, crop_y, s<scale>, r<rot>)
    (srdataset.py:177-183 uses the basename; relpath additionally keeps
    same-named scene dirs in different subtrees apart). Styled files whose style_name contains any of
    ``styles_to_include`` substrings pass the filter (srdataset.py:209-213).
    Target image sizes are validated against ``expected_crop_size`` (W, H).
    """
    if not os.path.isdir(directory_path):
        raise FileNotFoundError(f"Data directory not found: {directory_path}")

    from PIL import Image

    grouped: Dict[tuple, List[dict]] = defaultdict(list)
    root_abs = os.path.abspath(directory_path)
    for root, _dirs, files in os.walk(directory_path):
        if os.path.abspath(root) == root_abs:
            continue  # files live in per-image subdirectories
        # relative path, not basename: two same-named scene dirs in
        # different subtrees (e.g. train/sceneA and val/sceneA when pointed
        # at a common root) must NOT merge into one group — that would pair
        # styled files with the other location's target. For the standard
        # one-level split layout relpath == basename, so existing corpora
        # and the committed split draws are unchanged.
        dirname = os.path.relpath(root, root_abs)
        for filename in files:
            info = parse_generated_filename(filename)
            if info is None:
                continue
            info["full_path"] = os.path.join(root, filename)
            key = (
                dirname,
                info["crop_x"],
                info["crop_y"],
                info["scale_part"],
                info["rot_part"],
            )
            grouped[key].append(info)

    pairs: List[Pair] = []
    for _key, infos in grouped.items():
        target = next((i for i in infos if i["type"] == "target"), None)
        if target is None:
            continue
        styled = [
            i
            for i in infos
            if i["type"] == "style"
            and (
                styles_to_include is None
                or any(s in i["style_name"] for s in styles_to_include)
            )
        ]
        if not styled:
            continue
        try:
            with Image.open(target["full_path"]) as img:
                if img.size != tuple(expected_crop_size):
                    if verbose >= 1:
                        warnings.warn(
                            f"Target {target['full_path']} has size {img.size}, "
                            f"expected {expected_crop_size}. Skipping location."
                        )
                    continue
        except Exception as e:  # unreadable target: skip the whole location
            if verbose >= 1:
                warnings.warn(f"Could not read target {target['full_path']}: {e}")
            continue
        for s in styled:
            pairs.append((s["full_path"], target["full_path"]))

    if verbose >= 1:
        print(f"Gathered {len(pairs)} sample pairs from {directory_path}")
    return pairs


def split_pairs(
    pairs: Sequence[Pair], val_ratio: float, seed: int = 0
) -> Tuple[List[Pair], List[Pair]]:
    """Shuffle + ratio split with the reference's 1-sample guards
    (train.py:384-416)."""
    pairs = list(pairs)
    rng = np.random.default_rng(seed)
    rng.shuffle(pairs)
    n = len(pairs)
    val_ratio = min(max(val_ratio, 0.0), 1.0)
    n_val = int(n * val_ratio)
    n_train = n - n_val
    if n > 0:
        if n_train == 0:
            n_train, n_val = 1, n - 1
        if n_val == 0 and val_ratio > 0 and n > 1:
            n_val, n_train = 1, n - 1
    return pairs[:n_train], pairs[n_train : n_train + n_val]


def _load_pair(
    pair: Pair, linear: bool, hflip: bool, vflip: bool, as_uint8: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    from PIL import Image

    out = []
    for path in pair:
        with Image.open(path) as img:
            arr = np.asarray(img.convert("RGB"))
        if hflip:
            arr = arr[:, ::-1]
        if vflip:
            arr = arr[::-1]
        if as_uint8:
            # raw bytes; /255 + gamma run on-device (batch_transform below)
            out.append(np.ascontiguousarray(arr))
            continue
        arr = arr.astype(np.float32) / 255.0
        if linear:
            arr = arr**2.2  # sRGB -> linear approx (srdataset.py:337-338)
        out.append(np.ascontiguousarray(arr))
    return out[0], out[1]


class SRDataset:
    """Random-draw pair dataset with synchronized flips (srdataset.py:250-340).

    Iterating yields ``num_samples // batch_size`` batches of
    (lr, hr) NHWC float32 arrays per epoch; draws are uniform over the pool
    regardless of the declared epoch size, and load errors retry with a fresh
    draw (srdataset.py:316-321).
    """

    def __init__(
        self,
        sample_pairs_list: Sequence[Pair],
        expected_crop_size: Tuple[int, int],
        num_samples: int,
        *,
        batch_size: int = 1,
        seed: int = 0,
        linear: bool = True,
        flips: bool = True,
        num_workers: int = 4,
        transfer_dtype: str = "float32",
    ):
        if transfer_dtype not in ("float32", "uint8"):
            raise ValueError(f"transfer_dtype must be float32|uint8, got "
                             f"{transfer_dtype!r}")
        self.pool: List[Pair] = list(sample_pairs_list)
        if not self.pool:
            warnings.warn("SRDataset initialized with an empty sample pool.")
        self.crop_w, self.crop_h = expected_crop_size
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.linear = linear
        self.flips = flips
        self.num_workers = num_workers
        # "uint8": batches stay raw bytes (4x less host->device transfer —
        # the HBM-bandwidth rule: move bytes, not floats); consume with
        # batch_transform on device. Draw/flip RNG streams are identical in
        # both modes.
        self.transfer_dtype = transfer_dtype
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.num_samples // self.batch_size

    def _plan_draw(self) -> Tuple[int, bool, bool]:
        """One RNG decision (index + flips); called single-threaded."""
        idx = int(self._rng.integers(0, len(self.pool)))
        hflip = self.flips and bool(self._rng.random() < 0.5)
        vflip = self.flips and bool(self._rng.random() < 0.5)
        return idx, hflip, vflip

    def _load_planned(self, plan: Tuple[int, bool, bool]):
        idx, hflip, vflip = plan
        as_u8 = self.transfer_dtype == "uint8"
        want = (self.crop_h, self.crop_w, 3)
        for _attempt in range(10):
            try:
                lr, hr = _load_pair(self.pool[idx], self.linear, hflip, vflip,
                                    as_uint8=as_u8)
                # the gatherer size-checks targets only; a wrong-size STYLED
                # file (partial write, generator glitch) must hit the retry
                # path here, not blow up np.stack mid-epoch
                if lr.shape != want or hr.shape != want:
                    raise ValueError(
                        f"pair shape {lr.shape}/{hr.shape}, expected {want}"
                    )
                return lr, hr
            except Exception as e:  # retry with a deterministic fallback draw
                warnings.warn(f"Error loading {self.pool[idx]}: {e}. Retrying.")
                idx = (idx + 1) % len(self.pool)
        raise RuntimeError("10 consecutive sample load failures")

    def _draw(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._load_planned(self._plan_draw())

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if not self.pool:
            raise IndexError("SRDataset pool is empty. Cannot draw samples.")
        n_batches = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            for _ in range(n_batches):
                # draw all decisions single-threaded first: numpy Generators
                # are not thread-safe and interleaved draws would make the
                # seeded stream depend on thread scheduling
                plans = [self._plan_draw() for _ in range(self.batch_size)]
                items = list(ex.map(self._load_planned, plans))
                lr = np.stack([a for a, _ in items])
                hr = np.stack([b for _, b in items])
                yield lr, hr


def batch_transform(linear: bool):
    """On-device counterpart of the float32 loader path for uint8-transfer
    batches: uint8 -> [0,1] fp32 (+ sRGB->linear approx). Trace-time no-op
    for float inputs, so callers can apply it unconditionally."""
    import jax.numpy as jnp

    def apply(x):
        if x.dtype != jnp.uint8:
            return x
        x = x.astype(jnp.float32) / 255.0
        return x**2.2 if linear else x

    return apply


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with a background to-device prefetch queue.

    The TPU-native replacement for pinned-memory DataLoader transfer overlap:
    ``size`` batches are kept in flight (jax.device_put is async) while the
    train step consumes the current one.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()
    error: list = []
    stop = threading.Event()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def q_put(item) -> bool:
        """Bounded put that gives up when the consumer is gone — a producer
        blocked forever on a full queue would pin size+1 device-committed
        batches (HBM + ~1 GB host RSS per GB through the tunnel) and the
        SRDataset thread pool for the process lifetime."""
        while not stop.is_set():
            try:
                q.put(item, timeout=1.0)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not q_put(put(batch)):
                    return  # consumer abandoned the generator
        except BaseException as e:  # surface in the consumer, don't truncate
            error.append(e)
        finally:
            q_put(END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is END:
                if error:
                    raise error[0]
                break
            yield item
    finally:
        # early exit (exception in the train loop, generator GC'd):
        # unblock and retire the producer, drop any in-flight batches
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=30)
