"""PRVNet datasets.

≙ ``pvbDataset`` / ``pvbPretrainDataset`` (``train_regression.py:101-245``):
per-object directories holding 64 coverage images ``rgbaClip_<i>.png`` and an
integer ``view_budget.txt`` label; K input views chosen by ``IMG_PATTERN``;
images CenterCrop(720) + scaled to [0,1] (≙ transforms at
``train_regression.py:497-505``).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .model import IMG_PATTERN


def center_crop(img: np.ndarray, size: int = 720) -> np.ndarray:
    """Center crop (pad if smaller), ≙ torchvision CenterCrop(720)."""
    h, w = img.shape[:2]
    if h < size or w < size:
        ph, pw = max(size - h, 0), max(size - w, 0)
        img = np.pad(
            img,
            ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)) + ((0, 0),) * (img.ndim - 2),
        )
        h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top : top + size, left : left + size]


def load_rgb(path: str, crop: Optional[int] = 720) -> np.ndarray:
    """RGB float32 [0,1]; RGBA flattened onto black like PIL convert('RGB')
    drops alpha (≙ Image.open(...).convert('RGB'), train_regression.py:232)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    if crop:
        img = center_crop(img, crop)
    return img


def read_split(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class PVBDataset:
    """K-view samples: (views (K,H,W,3), label int)."""

    def __init__(
        self,
        root: str,
        split_file: str,
        pattern: Sequence[int] = IMG_PATTERN[4],
        crop: int = 720,
    ):
        self.root = root
        self.names = read_split(split_file)
        self.pattern = list(pattern)
        self.crop = crop

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        d = os.path.join(self.root, self.names[i])
        views = np.stack(
            [load_rgb(os.path.join(d, f"rgbaClip_{j}.png"), self.crop) for j in self.pattern]
        )
        label = int(np.loadtxt(os.path.join(d, "view_budget.txt")))
        return views, label

    def batches(
        self, batch_size: int, rng: Optional[np.random.Generator] = None, drop_last: bool = False
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            views, labels = zip(*(self[i] for i in idx))
            yield np.stack(views), np.asarray(labels, np.float32)


class PVBPretrainDataset:
    """Every one of the 64 views as an independent sample
    (≙ pvbPretrainDataset, train_regression.py:101-167)."""

    def __init__(self, root: str, split_file: str, viewspace_size: int = 64, crop: int = 720):
        self.samples = []
        for name in read_split(split_file):
            for j in range(viewspace_size):
                self.samples.append((name, j))
        self.root = root
        self.crop = crop

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int):
        name, j = self.samples[i]
        d = os.path.join(self.root, name)
        img = load_rgb(os.path.join(d, f"rgbaClip_{j}.png"), self.crop)
        label = int(np.loadtxt(os.path.join(d, "view_budget.txt")))
        return img, label

    def batches(
        self, batch_size: int, rng: Optional[np.random.Generator] = None, drop_last: bool = False
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """(imgs (B,H,W,3), labels (B,)) minibatches, shuffled when given rng."""
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            imgs, labels = zip(*(self[i] for i in idx))
            yield np.stack(imgs), np.asarray(labels, np.float32)
