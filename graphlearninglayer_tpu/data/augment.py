"""Host-side image augmentation pipeline (PIL / numpy).

Port of the reference's transform stack (config/augmentations.py,
config/datasets_setting.py): 14-op RandAugment with an always-applied random
Cutout (<=0.5 of width, gray fill), random rotation / crop-with-padding /
horizontal flip, and per-dataset channel normalization.  Augmentation runs on
the host CPU feeding the device — the TPU never sees PIL objects.

Images flow as uint8 HWC numpy arrays; ``normalize`` converts to float32 NHWC
in [0,1] minus mean over std (ToTensor + Normalize semantics).
"""
from __future__ import annotations

import numpy as np
import PIL
import PIL.Image
import PIL.ImageDraw
import PIL.ImageEnhance
import PIL.ImageOps

__all__ = ["RandAugment", "Transform", "CHANNEL_STATS", "normalize_batch",
           "Lighting", "cutout_default"]

# ToTensor+Normalize stats per dataset (config/datasets_setting.py:8-10,44-46,
# 80-82,121-123,163-166).
CHANNEL_STATS = {
    "mnist": ([0.1307], [0.3081]),
    "fashion_mnist": ([0.2860], [0.3530]),
    "cifar10": ([0.4914, 0.4822, 0.4465], [0.2470, 0.2435, 0.2616]),
    "cifar100": ([0.5071, 0.4867, 0.4408], [0.2675, 0.2565, 0.2761]),
    "miniimagenet": ([120.39586422 / 255, 115.59361427 / 255,
                      104.54012653 / 255],
                     [70.68188272 / 255, 68.27635443 / 255,
                      72.54505529 / 255]),
    "synthetic": ([0.5], [0.5]),
}


def _affine(img, coeffs):
    return img.transform(img.size, PIL.Image.AFFINE, coeffs)


def _shear_x(img, v, rng):
    v = -v if rng.random() > 0.5 else v
    return _affine(img, (1, v, 0, 0, 1, 0))


def _shear_y(img, v, rng):
    v = -v if rng.random() > 0.5 else v
    return _affine(img, (1, 0, 0, v, 1, 0))


def _translate_x(img, v, rng):
    v = -v if rng.random() > 0.5 else v
    return _affine(img, (1, 0, v * img.size[0], 0, 1, 0))


def _translate_y(img, v, rng):
    v = -v if rng.random() > 0.5 else v
    return _affine(img, (1, 0, 0, 0, 1, v * img.size[1]))


def _rotate(img, v, rng):
    return img.rotate(-v if rng.random() > 0.5 else v)


def _posterize(img, v, rng):
    return PIL.ImageOps.posterize(img, max(1, int(v)))


# (op, minval, maxval) — reference augment_list (config/augmentations.py:155-174).
_AUGMENT_LIST = [
    (lambda im, v, r: PIL.ImageOps.autocontrast(im), 0, 1),
    (lambda im, v, r: PIL.ImageEnhance.Brightness(im).enhance(v), 0.05, 0.95),
    (lambda im, v, r: PIL.ImageEnhance.Color(im).enhance(v), 0.05, 0.95),
    (lambda im, v, r: PIL.ImageEnhance.Contrast(im).enhance(v), 0.05, 0.95),
    (lambda im, v, r: PIL.ImageOps.equalize(im), 0, 1),
    (lambda im, v, r: im, 0, 1),  # Identity
    (_posterize, 4, 8),
    (_rotate, 0, 30),
    (lambda im, v, r: PIL.ImageEnhance.Sharpness(im).enhance(v), 0.05, 0.95),
    (_shear_x, 0.0, 0.3),
    (_shear_y, 0.0, 0.3),
    (lambda im, v, r: PIL.ImageOps.solarize(im, v), 0, 256),
    (_translate_x, 0.0, 0.3),
    (_translate_y, 0.0, 0.3),
]


def _cutout(img: PIL.Image.Image, frac: float, rng) -> PIL.Image.Image:
    """Random gray-filled square occlusion (config/augmentations.py:113-138)."""
    if frac <= 0:
        return img
    v = frac * img.size[0]
    w, h = img.size
    x0 = max(0, rng.uniform(0, w) - v / 2.0)
    y0 = max(0, rng.uniform(0, h) - v / 2.0)
    xy = (int(x0), int(y0), int(min(w, x0 + v)), int(min(h, y0 + v)))
    fill = (125, 123, 114) if img.mode == "RGB" else 125
    img = img.copy()
    PIL.ImageDraw.Draw(img).rectangle(xy, fill)
    return img


class RandAugment:
    """n random ops from the 14-op list + always-applied random Cutout
    (config/augmentations.py:223-234)."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, img: PIL.Image.Image, rng: np.random.Generator):
        for _ in range(self.n):
            op, lo, hi = _AUGMENT_LIST[rng.integers(len(_AUGMENT_LIST))]
            v = rng.uniform(0, 1) * (hi - lo) + lo
            img = op(img, v, rng)
        return _cutout(img, rng.uniform(0, 1) * 0.5, rng)


class Transform:
    """Per-dataset weak/strong/eval transform (datasets_setting.py).

    mode='weak'   : rotation/flip + padded random crop + RandAugment(1)
    mode='strong' : same with larger rotation + RandAugment(2)
    mode='eval'   : normalization only
    """

    def __init__(self, dataset: str, mode: str = "eval"):
        self.dataset = dataset
        self.mode = mode
        self.mean, self.std = CHANNEL_STATS[dataset]
        grayscale = dataset in ("mnist", "fashion_mnist", "synthetic")
        self.grayscale = grayscale
        if mode == "eval":
            self.rand = None
        else:
            self.rand = RandAugment(1 if mode == "weak" else 2)
        self.rotation = (10 if mode == "weak" else 20) if grayscale else 0
        self.flip = not grayscale and mode != "eval"
        # miniimagenet crops 84x84 with padding 8 (datasets_setting.py:168-169);
        # the 32x32/28x28 datasets use padding 4
        pad = 8 if dataset == "miniimagenet" else 4
        self.pad = pad if mode != "eval" else 0
        self.pad_mode = "constant" if grayscale else "reflect"

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """img: uint8 HWC (C=1 or 3).  Returns uint8 HWC."""
        if self.mode == "eval":
            return img
        pil = PIL.Image.fromarray(img.squeeze(-1) if self.grayscale else img)
        if self.rotation:
            pil = pil.rotate(rng.uniform(-self.rotation, self.rotation))
        if self.flip and rng.random() < 0.5:
            pil = PIL.ImageOps.mirror(pil)
        arr = np.asarray(pil)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        arr = self._random_crop(arr, rng)
        pil = PIL.Image.fromarray(arr.squeeze(-1) if self.grayscale else arr)
        pil = self.rand(pil, rng)
        out = np.asarray(pil)
        if out.ndim == 2:
            out = out[:, :, None]
        return out

    def _random_crop(self, arr: np.ndarray, rng) -> np.ndarray:
        p = self.pad
        h, w = arr.shape[:2]
        mode = "reflect" if self.pad_mode == "reflect" else "constant"
        arr = np.pad(arr, ((p, p), (p, p), (0, 0)), mode=mode)
        i = rng.integers(0, 2 * p + 1)
        j = rng.integers(0, 2 * p + 1)
        return arr[i:i + h, j:j + w]

    def normalize(self, batch: np.ndarray) -> np.ndarray:
        return normalize_batch(batch, self.mean, self.std)


def normalize_batch(batch: np.ndarray, mean, std) -> np.ndarray:
    """uint8 NHWC -> float32 normalized NHWC (ToTensor + Normalize)."""
    x = batch.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


class Lighting:
    """AlexNet-style PCA lighting noise on normalized HWC float images
    (reference config/augmentations.py:177-195)."""

    def __init__(self, alphastd: float, eigval, eigvec):
        self.alphastd = alphastd
        self.eigval = np.asarray(eigval, np.float32)
        self.eigvec = np.asarray(eigvec, np.float32)

    def __call__(self, img: np.ndarray, rng: np.random.Generator):
        if self.alphastd == 0:
            return img
        alpha = rng.normal(0, self.alphastd, 3).astype(np.float32)
        rgb = (self.eigvec * alpha[None, :] * self.eigval[None, :]).sum(1)
        return img + rgb[None, None, :]


def cutout_default(img: np.ndarray, length: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Zero-filled square cutout on normalized HWC float images
    (reference CutoutDefault, config/augmentations.py:198-221)."""
    h, w = img.shape[:2]
    y, x = rng.integers(h), rng.integers(w)
    y1, y2 = np.clip(y - length // 2, 0, h), np.clip(y + length // 2, 0, h)
    x1, x2 = np.clip(x - length // 2, 0, w), np.clip(x + length // 2, 0, w)
    out = img.copy()
    out[y1:y2, x1:x2] = 0.0
    return out
