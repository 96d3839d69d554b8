"""Device-side (in-jit) image augmentation — the TPU-resident data path.

The host pipeline (data/augment.py + data/native/augment.cpp) reproduces the
reference transform stack (reference config/augmentations.py:8-234,
config/datasets_setting.py) on the CPU and ships augmented uint8 batches to
the device.  Through the execution relay that transfer is the flagship
driver's per-step floor (~93 ms for batch+base at the reference shape,
benchmarks/probe_transfer_overlap.py) while the compute step itself is
~48 ms.  This module moves augmentation INSIDE the jitted train step so the
training set crosses the wire once (uint8, device-resident) and each step
transfers only index/label vectors.

Per-op semantics are the PIL semantics the native backend encodes
(data/native/augment.cpp, verified bit-exact vs PIL in
tests/test_native_aug.py):

* affine/rotate: nearest sample at output pixel centers (x+0.5, y+0.5),
  floor to the source pixel, zero fill out of bounds;
* enhance blends (brightness/color/contrast/sharpness): truncation toward
  zero of ``deg + (img - deg) * v``;
* L conversion: ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16``;
* contrast mean: round-half-up of the L mean;
* SMOOTH filter (sharpness degenerate): round-half-up, borders copied;
* autocontrast: per-channel linear LUT with truncation;
* equalize: PIL step formula (integer divisions), clamped at 255;
* solarize: float threshold, invert at >= threshold;
* posterize: bit mask;
* cutout: inclusive rectangle, gray fill (125, 123, 114) / 125.

Implementation notes (TPU-first):

* No ``lax.switch``: a vmapped switch executes every branch anyway, so the
  14 RandAugment ops are evaluated as four vectorized op CLASSES — (a) the
  seven histogram/LUT ops collapse to ONE per-image (C, 256) lookup table
  applied once, (b) color and (c) sharpness are pointwise/3x3 blends,
  (d) the five geometric ops share ONE nearest-neighbor affine warp whose
  6 coefficients are selected per image — followed by a 4-way select.
* Coordinate math runs in float64 under x64 (CPU tests: bit-exact vs the
  C double path) and float32 on TPU, where an output pixel whose exact
  source coordinate lies within f32 rounding of an integer boundary may
  pick the neighboring source pixel (measure-zero for random magnitudes).
* All ops are static-shape, jit/vmap-safe; randomness comes from
  ``jax.random`` keys (streams intentionally differ from the host
  pipeline's numpy/PCG streams — parity is per-op, not per-stream, exactly
  like the native backend).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .augment import CHANNEL_STATS

__all__ = ["DeviceTransform", "device_apply_op", "OP_IDS", "device_rotate",
           "device_mirror", "device_pad_crop", "device_cutout"]

# Op ids match data/native.py OP_IDS / augment.cpp OpId (reference
# config/augmentations.py:155-174 augment_list order).
OP_IDS = {
    "autocontrast": 0, "brightness": 1, "color": 2, "contrast": 3,
    "equalize": 4, "identity": 5, "posterize": 6, "rotate": 7,
    "sharpness": 8, "shear_x": 9, "shear_y": 10, "solarize": 11,
    "translate_x": 12, "translate_y": 13,
}
_NUM_OPS = 14
_OP_LO = np.array([0, 0.05, 0.05, 0.05, 0, 0, 4, 0, 0.05, 0, 0, 0, 0, 0],
                  np.float32)
_OP_HI = np.array([1, 0.95, 0.95, 0.95, 1, 1, 8, 30, 0.95, 0.3, 0.3, 256,
                   0.3, 0.3], np.float32)
# sign flips with p=1/2 for the geometric ops (augment.py:43-64)
_OP_SIGNED = np.zeros(_NUM_OPS, bool)
_OP_SIGNED[[7, 9, 10, 12, 13]] = True

_LEVELS = np.arange(256, dtype=np.int32)


def _ftype():
    """float64 when x64 is enabled (CPU test parity with the C double
    path), float32 on TPU."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _lum(img):
    """PIL 'L' conversion on int32 RGB (augment.cpp lum)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16


def _histogram(img):
    """(H, W, C) int32 -> (C, 256) int32 per-channel histogram."""
    onehot = img[..., None] == jnp.asarray(_LEVELS)
    return jnp.sum(onehot, axis=(0, 1), dtype=jnp.int32)


def _blend(deg, img, v):
    """PIL ImageEnhance blend: truncation toward zero, clamped."""
    r = deg + (img - deg) * v
    return jnp.clip(jnp.trunc(r), 0, 255).astype(jnp.int32)


def _blend_lut(deg, v):
    """(256,) LUT of _blend(deg, level, v)."""
    return _blend(deg, jnp.asarray(_LEVELS, _ftype()), v)


def _identity_lut():
    return jnp.asarray(_LEVELS)


def _solarize_lut(v):
    lv = jnp.asarray(_LEVELS)
    return jnp.where(lv.astype(_ftype()) < v, lv, 255 - lv)


def _posterize_lut(v):
    bits = jnp.maximum(1, v.astype(jnp.int32))
    mask = jnp.asarray(255, jnp.int32) & ~((1 << (8 - bits)) - 1)
    return jnp.asarray(_LEVELS) & mask


def _brightness_lut(v):
    return _blend_lut(jnp.asarray(0, _ftype()), v)


def _contrast_lut(img, v):
    """Blend toward the round-half-up mean of the L image
    (augment.cpp contrast_img)."""
    c = img.shape[-1]
    lum = _lum(img) if c == 3 else img[..., 0]
    npix = lum.shape[0] * lum.shape[1]
    mean = jnp.floor(jnp.sum(lum).astype(_ftype()) / npix + 0.5)
    return _blend_lut(mean, v)


def _autocontrast_lut(hist):
    """(C, 256) -> (C, 256): per-channel min/max stretch, PIL truncation."""
    ft = _ftype()
    nz = hist > 0
    lo = jnp.argmax(nz, axis=-1)
    hi = 255 - jnp.argmax(nz[:, ::-1], axis=-1)
    scale = 255.0 / jnp.maximum(hi - lo, 1).astype(ft)
    offset = -lo.astype(ft) * scale
    ix = jnp.trunc(jnp.asarray(_LEVELS, ft)[None] * scale[:, None]
                   + offset[:, None])
    lut = jnp.clip(ix, 0, 255).astype(jnp.int32)
    return jnp.where((hi <= lo)[:, None], jnp.asarray(_LEVELS)[None], lut)


def _equalize_lut(hist, npix: int):
    """(C, 256) -> (C, 256): PIL step formula (integer divisions;
    lut[v] uses the EXCLUSIVE prefix sum, augment.cpp equalize_img)."""
    nzmask = hist > 0
    nz = jnp.sum(nzmask, axis=-1)
    last_idx = 255 - jnp.argmax(nzmask[:, ::-1], axis=-1)
    last_nz = jnp.take_along_axis(hist, last_idx[:, None], axis=-1)[:, 0]
    step = jnp.where(nz <= 1, 0, (npix - last_nz) // 255)
    cum_ex = jnp.cumsum(hist, axis=-1) - hist
    nacc = step[:, None] // 2 + cum_ex
    lut = jnp.minimum(nacc // jnp.maximum(step[:, None], 1), 255)
    return jnp.where((step == 0)[:, None], jnp.asarray(_LEVELS)[None],
                     lut).astype(jnp.int32)


def _apply_lut(img, lut):
    """img (H, W, C) int32, lut (C, 256) or (256,) int32."""
    h, w, c = img.shape
    lut = jnp.broadcast_to(lut, (c, 256))
    table = jnp.broadcast_to(lut[None, None], (h, w, c, 256))
    return jnp.take_along_axis(table, img[..., None], axis=-1)[..., 0]


def _color(img, v):
    """Blend toward the L image; identity on grayscale."""
    if img.shape[-1] == 1:
        return img
    ft = _ftype()
    deg = _lum(img).astype(ft)[..., None]
    return _blend(deg, img.astype(ft), v)


def _sharpness(img, v):
    """Blend toward the PIL SMOOTH filter (3x3 [1 1 1; 1 5 1; 1 1 1]/13,
    round-half-up, border pixels copied)."""
    h, w, _ = img.shape
    ft = _ftype()
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    acc = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
           + p[1:-1, :-2] + 5 * p[1:-1, 1:-1] + p[1:-1, 2:]
           + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])
    deg = jnp.clip(jnp.floor(acc.astype(ft) / 13.0 + 0.5), 0, 255)
    border = np.zeros((h, w, 1), bool)
    border[0], border[-1], border[:, 0], border[:, -1] = (True,) * 4
    deg = jnp.where(jnp.asarray(border), img.astype(ft), deg)
    return _blend(deg, img.astype(ft), v)


def _flat_gather(img, iy, ix, valid):
    """out[y, x] = img[iy, ix] where valid else 0.  ONE row gather on the
    flattened image (static shapes; the only gather in the op set)."""
    h, w, c = img.shape
    flat = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    g = jnp.take(img.reshape(h * w, c), flat.reshape(-1),
                 axis=0).reshape(h, w, c)
    return jnp.where(valid[..., None], g, 0)


def _affine_nearest(img, coeffs):
    """PIL Image.transform(AFFINE) with nearest resampling:
    out(x,y) = in(floor(a(x+.5)+b(y+.5)+c0), floor(d(x+.5)+e(y+.5)+f0)),
    zero fill (augment.cpp affine_nearest)."""
    h, w, _ = img.shape
    ft = _ftype()
    a, b, c0, d, e, f0 = [x.astype(ft) for x in coeffs]
    xc = jnp.arange(w, dtype=ft) + 0.5
    yc = jnp.arange(h, dtype=ft) + 0.5
    ix = jnp.floor(a * xc[None, :] + b * yc[:, None] + c0).astype(jnp.int32)
    iy = jnp.floor(d * xc[None, :] + e * yc[:, None] + f0).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    return _flat_gather(img, iy, ix, valid)


def _rotate_coeffs(h: int, w: int, deg):
    """PIL Image.rotate(angle): CCW, center (w/2, h/2)
    (augment.cpp rotate_img)."""
    ft = _ftype()
    ang = -deg.astype(ft) * (np.pi / 180.0)
    cs, sn = jnp.cos(ang), jnp.sin(ang)
    cx, cy = w / 2.0, h / 2.0
    a, b, d, e = cs, sn, -sn, cs
    c0 = cx - a * cx - b * cy
    f0 = cy - d * cx - e * cy
    return a, b, c0, d, e, f0


def _id_coeffs(dtype):
    one = jnp.asarray(1, dtype)
    zero = jnp.asarray(0, dtype)
    return one, zero, zero, zero, one, zero


def _mirror(img):
    return img[:, ::-1, :]


def _pad_crop(img, pad: int, reflect: bool, i, j):
    """numpy-style pad (constant-0 / reflect) + crop at offset (i, j) in
    [0, 2*pad], expressed as one coordinate-mapped gather."""
    h, w, _ = img.shape
    ys = jnp.arange(h) + i - pad
    xs = jnp.arange(w) + j - pad
    if reflect:
        ys = jnp.abs(ys)
        ys = jnp.where(ys >= h, 2 * h - 2 - ys, ys)
        xs = jnp.abs(xs)
        xs = jnp.where(xs >= w, 2 * w - 2 - xs, xs)
        valid = jnp.ones((h, w), bool)
    else:
        valid = (((ys >= 0) & (ys < h))[:, None]
                 & ((xs >= 0) & (xs < w))[None, :])
    return _flat_gather(img, jnp.broadcast_to(ys[:, None], (h, w)),
                        jnp.broadcast_to(xs[None, :], (h, w)), valid)


def _cutout(img, frac, r1, r2):
    """Random gray square, inclusive rectangle fill
    (augment.cpp augment_one/cutout_rect; reference augmentations.py:113-138)."""
    h, w, c = img.shape
    ft = _ftype()
    v = frac.astype(ft) * w
    x0 = jnp.maximum(0.0, r1.astype(ft) * w - v / 2.0)
    y0 = jnp.maximum(0.0, r2.astype(ft) * h - v / 2.0)
    ix0, iy0 = x0.astype(jnp.int32), y0.astype(jnp.int32)
    ix1 = jnp.minimum(jnp.minimum(float(w), x0 + v).astype(jnp.int32), w - 1)
    iy1 = jnp.minimum(jnp.minimum(float(h), y0 + v).astype(jnp.int32), h - 1)
    xs, ys = jnp.arange(w), jnp.arange(h)
    mask = (((ys >= iy0) & (ys <= iy1))[:, None]
            & ((xs >= ix0) & (xs <= ix1))[None, :])
    fill = jnp.asarray([125, 123, 114][:c] if c == 3 else [125], jnp.int32)
    return jnp.where(mask[..., None] & (frac > 0), fill, img)


def _apply_rand_op(img, op, v, sv):
    """One RandAugment op on an int32 image; ``op`` may be traced.

    Four op classes evaluated vectorized + a 4-way select (no lax.switch:
    under vmap every branch runs anyway).  ``v`` is the unsigned magnitude,
    ``sv`` the sign-flipped one used by the geometric ops."""
    h, w, c = img.shape
    ft = _ftype()

    # (a) LUT class: autocontrast/brightness/contrast/equalize/identity/
    #     posterize/solarize -> one (C, 256) table
    hist = _histogram(img)
    lut = jnp.broadcast_to(_identity_lut()[None], (c, 256))
    lut = jnp.where(op == 0, _autocontrast_lut(hist), lut)
    lut = jnp.where(op == 1, _brightness_lut(v)[None], lut)
    lut = jnp.where(op == 3, _contrast_lut(img, v)[None], lut)
    lut = jnp.where(op == 4, _equalize_lut(hist, h * w), lut)
    lut = jnp.where(op == 6, _posterize_lut(v)[None], lut)
    lut = jnp.where(op == 11, _solarize_lut(v)[None], lut)
    out = _apply_lut(img, lut)

    # (b)/(c) pointwise blends
    out = jnp.where(op == 2, _color(img, v), out)
    out = jnp.where(op == 8, _sharpness(img, v), out)

    # (d) geometric class: one shared affine warp, coefficients selected
    svf = sv.astype(ft)
    ident = _id_coeffs(ft)
    rot = _rotate_coeffs(h, w, sv)
    shear_x = (ident[0], svf, ident[2], ident[3], ident[4], ident[5])
    shear_y = (ident[0], ident[1], ident[2], svf, ident[4], ident[5])
    trans_x = (ident[0], ident[1], svf * w, ident[3], ident[4], ident[5])
    trans_y = (ident[0], ident[1], ident[2], ident[3], ident[4], svf * h)
    coeffs = ident
    for op_id, cf in ((7, rot), (9, shear_x), (10, shear_y), (12, trans_x),
                      (13, trans_y)):
        coeffs = tuple(jnp.where(op == op_id, new, cur)
                       for new, cur in zip(cf, coeffs))
    is_geo = (op == 7) | (op == 9) | (op == 10) | (op == 12) | (op == 13)
    return jnp.where(is_geo, _affine_nearest(img, coeffs), out)


def device_apply_op(img_u8, op, v, sign):
    """Single-op entry point mirroring native ``gll_apply_op`` — the per-op
    parity surface tested against the PIL-exact native backend."""
    img = jnp.asarray(img_u8).astype(jnp.int32)
    op = jnp.asarray(op, jnp.int32)
    v = jnp.asarray(v, _ftype())
    sv = jnp.where(jnp.asarray(sign, bool), -v, v)
    return _apply_rand_op(img, op, v, sv).astype(jnp.uint8)


def device_rotate(img_u8, deg):
    img = jnp.asarray(img_u8).astype(jnp.int32)
    coeffs = _rotate_coeffs(img.shape[0], img.shape[1],
                            jnp.asarray(deg, _ftype()))
    return _affine_nearest(img, coeffs).astype(jnp.uint8)


def device_mirror(img_u8):
    return jnp.asarray(_mirror(jnp.asarray(img_u8)))


def device_pad_crop(img_u8, pad: int, reflect: bool, i, j):
    img = jnp.asarray(img_u8).astype(jnp.int32)
    return _pad_crop(img, pad, reflect, jnp.asarray(i),
                     jnp.asarray(j)).astype(jnp.uint8)


def device_cutout(img_u8, frac, r1, r2):
    img = jnp.asarray(img_u8).astype(jnp.int32)
    return _cutout(img, jnp.asarray(frac), jnp.asarray(r1),
                   jnp.asarray(r2)).astype(jnp.uint8)


def _rand_round(img, key):
    """Draw (op, magnitude, sign) and apply — augment.cpp augment_one's
    RandAugment loop body."""
    k1, k2, k3 = jax.random.split(key, 3)
    op = jax.random.randint(k1, (), 0, _NUM_OPS)
    u = jax.random.uniform(k2, (), _ftype())
    lo = jnp.asarray(_OP_LO)[op].astype(_ftype())
    hi = jnp.asarray(_OP_HI)[op].astype(_ftype())
    v = u * (hi - lo) + lo
    neg = jax.random.uniform(k3, ()) > 0.5
    sv = jnp.where(jnp.asarray(_OP_SIGNED)[op] & neg, -v, v)
    return _apply_rand_op(img, op, v, sv)


def _augment_one(img_u8, key, *, rand_n: int, rotation: int, flip: bool,
                 pad: int, pad_reflect: bool):
    """Full per-image transform: [rotate] -> [flip] -> pad+crop ->
    RandAugment(rand_n) -> cutout (data/augment.py Transform.__call__)."""
    img = img_u8.astype(jnp.int32)
    keys = jax.random.split(key, 4 + rand_n)
    k_rot, k_flip, k_pad, k_cut = keys[:4]
    if rotation > 0:
        ang = (jax.random.uniform(k_rot, (), _ftype()) * 2.0 - 1.0) * rotation
        img = _affine_nearest(img, _rotate_coeffs(*img.shape[:2], ang))
    if flip:
        do = jax.random.uniform(k_flip, ()) < 0.5
        img = jnp.where(do, _mirror(img), img)
    if pad > 0:
        ij = jax.random.randint(k_pad, (2,), 0, 2 * pad + 1)
        img = _pad_crop(img, pad, pad_reflect, ij[0], ij[1])
    for t in range(rand_n):
        img = _rand_round(img, keys[4 + t])
    u = jax.random.uniform(k_cut, (3,), _ftype())
    img = _cutout(img, u[0] * 0.5, u[1], u[2])
    return img.astype(jnp.uint8)


class DeviceTransform:
    """Per-dataset weak/strong/eval transform running inside jit — the
    device-side counterpart of data/augment.py::Transform (same mode
    semantics; reference config/datasets_setting.py).

    ``__call__(batch_u8, key)`` maps a (B, H, W, C) uint8 batch to an
    augmented uint8 batch of the same shape, vmapped over per-image keys.
    Eval mode is the identity (normalization happens in the train step via
    its ``norm=(mean, std)`` argument, trainer._device_normalize).
    """

    def __init__(self, dataset: str, mode: str = "eval"):
        if mode not in ("weak", "strong", "eval"):
            raise ValueError(f"unknown mode {mode!r}")
        self.dataset = dataset
        self.mode = mode
        self.mean, self.std = CHANNEL_STATS[dataset]
        grayscale = dataset in ("mnist", "fashion_mnist", "synthetic")
        self.grayscale = grayscale
        self.rand_n = 0 if mode == "eval" else (1 if mode == "weak" else 2)
        self.rotation = (10 if mode == "weak" else 20) if grayscale else 0
        self.flip = not grayscale and mode != "eval"
        pad = 8 if dataset == "miniimagenet" else 4
        self.pad = pad if mode != "eval" else 0
        self.pad_reflect = not grayscale

    @property
    def is_eval(self) -> bool:
        return self.mode == "eval"

    def __call__(self, batch_u8, key):
        if self.is_eval:
            return batch_u8
        fn = functools.partial(_augment_one, rand_n=self.rand_n,
                               rotation=self.rotation, flip=self.flip,
                               pad=self.pad, pad_reflect=self.pad_reflect)
        keys = jax.random.split(key, batch_u8.shape[0])
        return jax.vmap(fn)(batch_u8, keys)
