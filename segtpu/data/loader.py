"""Device-resident dataset + batch loader.

Replaces the reference's ``CellSegmentationDataset``/``DataLoader`` pair
(dataset.py:17-66, 121-138) with a TPU-native design: the *entire* dataset
lives in HBM as stacked (N, S, S, 1) float32 arrays (a few MB at the
reference's scales), built once via the fused preprocessing graph. Batching
is a device-side permutation + reshape so a whole training epoch can run as
one ``lax.scan`` with zero host↔device traffic (vs the reference's
per-batch ``.to(device)`` / ``.item()`` syncs, train.py:38-60).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.data.preprocess import load_canonical, normalize_canonical, scale_canonical


class CellSegmentationDataset:
    """Path-holding dataset with microscopy normalization (dataset.py:17-66).

    ``materialize()`` produces the device-resident arrays; ``__getitem__``
    gives per-sample access for visualization/debugging parity."""

    def __init__(self, image_paths: Sequence[str], mask_paths: Sequence[str],
                 img_size: Tuple[int, int] = (256, 256), normalize: bool = True,
                 canonical: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        self.image_paths = list(image_paths)
        self.mask_paths = list(mask_paths)
        self.img_size = tuple(img_size)
        self.normalize = normalize
        self._canonical = canonical  # optional pre-resized uint8 (imgs, masks)
        self._arrays: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    def __len__(self) -> int:
        return len(self.image_paths) if self._canonical is None \
            else self._canonical[0].shape[0]

    def materialize(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Decode/resize/normalize everything → device arrays
        (images (N,S,S,1) f32 in [0,1], masks (N,S,S,1) f32 binary)."""
        if self._arrays is None:
            if self._canonical is not None:
                ci, cm = self._canonical
            else:
                ci, cm = load_canonical(self.image_paths, self.mask_paths,
                                        self.img_size)
            ci = jnp.asarray(ci)
            imgs = normalize_canonical(ci) if self.normalize else scale_canonical(ci)
            masks = (jnp.asarray(cm) > 0).astype(jnp.float32)[..., None]
            self._arrays = (imgs, masks)
        return self._arrays

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        imgs, masks = self.materialize()
        return np.asarray(imgs[idx]), np.asarray(masks[idx])


class DeviceDataLoader:
    """Batch iterator over device-resident arrays.

    - ``images``/``masks``: (N, S, S, 1) float32 device arrays.
    - ``batches(key)``: device-side shuffled split into
      (full_batches (nf, B, ...), remainder (R, ...) or None) for scan-based
      epochs.
    - ``__iter__``: host-facing numpy batch iteration (reference DataLoader
      parity for visualization code, visualize.py:22).
    """

    def __init__(self, dataset: CellSegmentationDataset, batch_size: int = 2,
                 shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._epoch = 0
        self._seed = seed
        self.images, self.masks = dataset.materialize()

    @classmethod
    def from_arrays(cls, images: jnp.ndarray, masks: jnp.ndarray,
                    batch_size: int = 2, shuffle: bool = True, seed: int = 0
                    ) -> "DeviceDataLoader":
        """Loader over pre-materialized device arrays (N,S,S,1)."""
        self = cls.__new__(cls)
        self.dataset = None
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._epoch = 0
        self._seed = seed
        self.images = images
        self.masks = masks
        return self

    @property
    def n(self) -> int:
        return int(self.images.shape[0])

    def __len__(self) -> int:  # number of batches (DataLoader parity)
        return -(-self.n // self.batch_size)

    def batches(self, key: Optional[jax.Array] = None):
        """Shuffled (on device) full-batch stack + remainder."""
        n, b = self.n, self.batch_size
        if self.shuffle:
            if key is None:
                key = jax.random.key(self._seed + self._epoch)
                self._epoch += 1
            perm = jax.random.permutation(key, n)
            imgs = jnp.take(self.images, perm, axis=0)
            msks = jnp.take(self.masks, perm, axis=0)
        else:
            imgs, msks = self.images, self.masks
        nf = n // b
        full = (imgs[: nf * b].reshape(nf, b, *imgs.shape[1:]),
                msks[: nf * b].reshape(nf, b, *msks.shape[1:]))
        rem = None
        if n % b:
            rem = (imgs[nf * b:], msks[nf * b:])
        return full, rem

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        (fi, fm), rem = self.batches()
        fi, fm = np.asarray(fi), np.asarray(fm)
        for i in range(fi.shape[0]):
            yield fi[i], fm[i]
        if rem is not None:
            yield np.asarray(rem[0]), np.asarray(rem[1])


def prepare_data(image_paths: Sequence[str], mask_paths: Sequence[str],
                 batch_size: int = 2, img_size: Tuple[int, int] = (256, 256),
                 shuffle: bool = True,
                 canonical: Optional[Tuple[np.ndarray, np.ndarray]] = None
                 ) -> DeviceDataLoader:
    """DataLoader factory (reference: dataset.py:121-138)."""
    ds = CellSegmentationDataset(image_paths, mask_paths, img_size=img_size,
                                 canonical=canonical)
    return DeviceDataLoader(ds, batch_size=batch_size, shuffle=shuffle)
