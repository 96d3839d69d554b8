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

Implementation notes (TPU-first; measured in benchmarks/probe_device_aug*.py):

* PLANAR-FLAT LAYOUT.  All batch math runs on (B, C, H*W) int32 — the
  trailing H*W axis fills the 128-wide vector lanes.  The naive
  (B, H, W, C) formulation lane-pads C=1/3 to 128, wasting 128/42x of
  every vector op and HBM byte; it measured 125 ms for a strong transform
  of 1500 32x32x1 images where this layout runs the same math in a few ms.
* WARPS ARE MATMULS.  Gathers are the slowest primitive on this TPU
  (probe_device_aug2: batched take_along_axis 18 ms vs onehot-matmul
  8 ms for the same warp), so the nearest-neighbor affine resample is a
  per-image one-hot (H*W, H*W) matrix applied on the MXU.  Nearest
  sampling has exactly one source per output pixel and uint8 values are
  exact in bfloat16 (<= 255 needs 8 mantissa bits), so the matmul result
  is bit-exact, including the zero fill (invalid rows are all-zero).
  Images larger than ``_MATMUL_MAX_PIXELS`` (miniimagenet 84x84) fall
  back to take_along_axis, where the one-hot matrix would not fit.
* ONE WARP FOR THE GEOMETRIC PREFIX.  rotate -> flip -> pad+crop are all
  coordinate maps; flip/pad/crop are integer-exact, so the composition
  (evaluate the rotation's float affine at the integer positions the
  flip/crop ask for) is bitwise-identical to applying the three stages
  sequentially — one resample instead of three.
* LUTS ARE EVALUATED ARITHMETICALLY.  brightness/contrast/solarize/
  posterize/autocontrast tables are closed-form in the pixel level, so
  they are applied per pixel directly (identical values to building the
  256-entry table and indexing it).  Only equalize genuinely needs its
  histogram-derived table; it is applied as a one-hot (H*W, 256) @ (256,)
  matmul (exact, same single-nonzero argument).
* No ``lax.switch``: under vmap every branch executes anyway, so each
  RandAugment round evaluates the vectorized op classes once for the
  whole batch and selects per image.
* Coordinate math runs in float64 under x64 (CPU tests: bit-exact vs the
  C double path) and float32 on TPU, where an output pixel whose exact
  source coordinate lies within f32 rounding of an integer boundary may
  pick the neighboring source pixel (measure-zero for random magnitudes).
* All ops are static-shape, jit/vmap-safe; randomness comes from
  ``jax.random`` keys (streams intentionally differ from the host
  pipeline's numpy/PCG streams — parity is per-op, not per-stream,
  exactly like the native backend).
"""
from __future__ import annotations

import contextlib
import threading

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

# above this pixel count the (P, P) one-hot warp matrix is replaced by a
# take_along_axis gather (84x84 miniimagenet: 50 M entries per image)
_MATMUL_MAX_PIXELS = 2048
# total-bytes cap on any materialized one-hot matmul operand (warp: B*P*P
# bf16; equalize LUT: B*C*P*256 bf16).  The per-image P gate alone scales
# quadratically in P and linearly in B — a caller augmenting a big
# device-resident batch would OOM a 16 GB v5e chip without this product
# gate.  4 GiB keeps the probed flagship shape (B=1500, P=1024: ~3.1 GiB
# warp / ~2.4 GiB LUT) on the exact-matmul fast path.
_MATMUL_MAX_BYTES = 4 << 30

# Trace-time batch divisor for the byte gates below: a GSPMD-sharded step
# traces at the GLOBAL batch shape while each device materializes only its
# 1/n_devices shard of the one-hot operands — without the divisor, gating
# on the global B disables the exact-matmul fast path precisely where the
# mesh was supposed to make it scale.  Set via shard_divisor() by the
# sharded train-step factories (train/trainer.py) around the aug call.
# Thread-LOCAL so a sharded step and an unsharded aug consumer tracing
# concurrently on different threads (e.g. a background prefetch thread)
# cannot observe each other's divisor — tracing happens on the calling
# thread, so the context manager scopes exactly the trace it wraps.
_SHARD_TLS = threading.local()


@contextlib.contextmanager
def shard_divisor(n: int):
    """Divide the one-hot-matmul memory gates' batch term by ``n`` for
    code traced inside this context ON THIS THREAD (per-device operand =
    global/n)."""
    old = getattr(_SHARD_TLS, "divisor", 1)
    _SHARD_TLS.divisor = max(int(n), 1)
    try:
        yield
    finally:
        _SHARD_TLS.divisor = old


def _gate_rows(b: int) -> int:
    """Per-device batch rows the byte gates should charge for."""
    return max(b // getattr(_SHARD_TLS, "divisor", 1), 1)


def _ftype():
    """float64 when x64 is enabled (CPU test parity with the C double
    path), float32 on TPU."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# --------------------------------------------------------------------------
# layout
# --------------------------------------------------------------------------

def _to_planar(batch_u8):
    """(B, H, W, C) uint8 -> (B, C, H*W) int32 planar-flat working layout."""
    b, h, w, c = batch_u8.shape
    return (batch_u8.astype(jnp.int32)
            .transpose(0, 3, 1, 2).reshape(b, c, h * w))


def _from_planar(x, h, w):
    """(B, C, H*W) int32 -> (B, H, W, C) uint8."""
    b, c, _ = x.shape
    return (x.reshape(b, c, h, w).transpose(0, 2, 3, 1)).astype(jnp.uint8)


def _xi_yi(h, w):
    """Flat integer pixel coordinates: (P,) column and row indices."""
    p = jnp.arange(h * w, dtype=jnp.int32)
    return p % w, p // w


# --------------------------------------------------------------------------
# warp: per-image source map -> resampled image
# --------------------------------------------------------------------------

def _chunked_over_batch(fn, chunk: int, *arrays):
    """Apply ``fn`` to ``chunk``-row slices of the leading (batch) axis via
    lax.map (pads the batch up to a multiple, trims after).  Bounds the
    transient memory of one-hot formulations whose per-image footprint is
    large (84x84: ~100 MB/image warp one-hot)."""
    b = arrays[0].shape[0]
    pad = (-b) % chunk
    padded = [jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
              if pad else a for a in arrays]
    stacked = [a.reshape((b + pad) // chunk, chunk, *a.shape[1:])
               for a in padded]
    out = jax.lax.map(lambda args: fn(*args), tuple(stacked))
    return out.reshape(-1, *out.shape[2:])[:b]


def _warp(x, src, valid):
    """out[b, c, p] = x[b, c, src[b, p]] where valid else 0.

    x (B, C, P) int32, src (B, P) int32 in [0, P), valid (B, P) bool.
    One-hot bf16 matmul on the MXU (exact: single nonzero per row, uint8
    values exact in bf16, f32 accumulation).  Past the direct-path memory
    budget the one-hot runs CHUNKED over the batch (lax.map) so the
    transient stays bounded — sequential MXU streams instead of TPU's
    catastrophic per-element gathers (84x84 measured: 460 ms gather vs
    the chunked matmul, probe_aug_breakdown.py).  The take_along_axis
    fallback remains for images so large even a one-image one-hot would
    blow the budget.
    """
    b, c, p = x.shape

    def direct(xc, sc, vc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p), 2)
        oh = ((sc[:, :, None] == iota) & vc[:, :, None])
        out = jnp.einsum("bpq,bcq->bcp", oh.astype(jnp.bfloat16),
                         xc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.int32)

    if (p <= _MATMUL_MAX_PIXELS
            and 2 * _gate_rows(b) * p * p <= _MATMUL_MAX_BYTES):
        return direct(x, src, valid)
    per_img = 2 * p * p
    if per_img * 8 <= _MATMUL_MAX_BYTES:           # chunked one-hot path
        chunk = max(int(_MATMUL_MAX_BYTES // per_img) // 8 * 8, 8)
        chunk = min(chunk, max(_gate_rows(b), 1))
        return _chunked_over_batch(direct, chunk, x, src, valid)
    g = jnp.take_along_axis(x, jnp.broadcast_to(src[:, None, :], x.shape),
                            axis=2)
    return jnp.where(valid[:, None, :], g, 0)


def _rotate_coeffs(h: int, w: int, deg):
    """PIL Image.rotate(angle): CCW, center (w/2, h/2)
    (augment.cpp rotate_img).  ``deg`` may be batched (B,)."""
    ft = _ftype()
    ang = -jnp.asarray(deg).astype(ft) * (np.pi / 180.0)
    cs, sn = jnp.cos(ang), jnp.sin(ang)
    cx, cy = w / 2.0, h / 2.0
    a, b, d, e = cs, sn, -sn, cs
    c0 = cx - a * cx - b * cy
    f0 = cy - d * cx - e * cy
    return a, b, c0, d, e, f0


def _affine_src(h, w, coeffs, qx, qy):
    """Evaluate a per-image affine map at integer positions (qx, qy).

    out pixel reads source floor(a*(qx+.5) + b*(qy+.5) + c0), ... — the
    PIL Image.transform(AFFINE, nearest) rule (augment.cpp affine_nearest).
    coeffs: six (B,) arrays; qx, qy: (B, P) int32.  Returns flat source
    indices (B, P) int32 (clipped) and the in-bounds mask (B, P).
    """
    ft = _ftype()
    a, b, c0, d, e, f0 = [jnp.asarray(v).astype(ft)[:, None] for v in coeffs]
    xc = qx.astype(ft) + 0.5
    yc = qy.astype(ft) + 0.5
    ix = jnp.floor(a * xc + b * yc + c0).astype(jnp.int32)
    iy = jnp.floor(d * xc + e * yc + f0).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    src = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    return src, valid


def _prefix_src(h, w, n, ang, do_flip, off, *, rotation: int, flip: bool,
                pad: int, pad_reflect: bool):
    """Source map of the composed [rotate] -> [flip] -> pad+crop prefix.

    flip and pad+crop are integer-exact coordinate maps, so evaluating the
    rotation's float affine at the positions they request is bitwise-equal
    to the three sequential resamples (see module notes).  Returns
    (src (B, P) int32, valid (B, P) bool).
    """
    xi, yi = _xi_yi(h, w)
    qx = jnp.broadcast_to(xi[None], (n, h * w))
    qy = jnp.broadcast_to(yi[None], (n, h * w))
    valid = jnp.ones((n, h * w), bool)
    if pad > 0:
        qy = qy + (off[:, 0:1] - pad)
        qx = qx + (off[:, 1:2] - pad)
        if pad_reflect:
            qy = jnp.abs(qy)
            qy = jnp.where(qy >= h, 2 * h - 2 - qy, qy)
            qx = jnp.abs(qx)
            qx = jnp.where(qx >= w, 2 * w - 2 - qx, qx)
        else:
            valid = (qx >= 0) & (qx < w) & (qy >= 0) & (qy < h)
    if flip:
        qx = jnp.where(do_flip[:, None], w - 1 - qx, qx)
    if rotation > 0:
        src, rot_valid = _affine_src(h, w, _rotate_coeffs(h, w, ang),
                                     jnp.clip(qx, 0, w - 1),
                                     jnp.clip(qy, 0, h - 1))
        # evaluate the rotation only at in-bounds crop positions; outside
        # the constant-pad box the pixel is 0 regardless
        return src, valid & rot_valid
    src = (jnp.clip(qy, 0, h - 1) * w + jnp.clip(qx, 0, w - 1))
    return src, valid


# --------------------------------------------------------------------------
# pixel-op building blocks (batched planar)
# --------------------------------------------------------------------------

def _lum_planar(x):
    """PIL 'L' conversion on int32 RGB: (B, 3, P) -> (B, P)
    (augment.cpp lum)."""
    return ((x[:, 0] * 19595 + x[:, 1] * 38470 + x[:, 2] * 7471
             + 0x8000) >> 16)


def _gray_planar(x):
    """The per-image L plane: (B, C, P) -> (B, P)."""
    return _lum_planar(x) if x.shape[1] == 3 else x[:, 0]


def _blend(deg, img, v):
    """PIL ImageEnhance blend: truncation toward zero, clamped."""
    r = deg + (img - deg) * v
    return jnp.clip(jnp.trunc(r), 0, 255).astype(jnp.int32)


def _hist_planar(x):
    """(B, C, P) int32 -> (B, C, 256) int32 per-channel histogram."""
    onehot = x[..., None] == jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(onehot, axis=2, dtype=jnp.int32)


def _apply_lut_planar(x, lut):
    """out[b, c, p] = lut[b, c, x[b, c, p]] as a one-hot matmul (exact:
    single nonzero per row, values <= 255 exact in bf16).

    The (B, C, P, 256) bf16 one-hot runs every RandAugment round for the
    whole batch; past the memory budget (miniimagenet 84x84 at the flagship
    batch size would be ~16 GiB) fall back to take_along_axis on the
    256-entry table — exact, no bf16 involved (same P gate as _warp)."""
    b, c, p = x.shape

    def direct(xc, lc):
        onehot = (xc[..., None] == jnp.arange(256, dtype=jnp.int32))
        out = jnp.einsum("bcpl,bcl->bcp", onehot.astype(jnp.bfloat16),
                         lc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.int32)

    if (p <= _MATMUL_MAX_PIXELS
            and 512 * _gate_rows(b) * c * p <= _MATMUL_MAX_BYTES):
        return direct(x, lut)
    per_img = 512 * c * p
    if per_img * 8 <= _MATMUL_MAX_BYTES:           # chunked one-hot path
        chunk = max(int(_MATMUL_MAX_BYTES // per_img) // 8 * 8, 8)
        chunk = min(chunk, max(_gate_rows(b), 1))
        return _chunked_over_batch(direct, chunk, x, lut)
    return jnp.take_along_axis(lut, x, axis=-1)


def _equalize_lut(hist, npix: int):
    """(B, C, 256) -> (B, C, 256): PIL step formula (integer divisions;
    lut[v] uses the EXCLUSIVE prefix sum, augment.cpp equalize_img)."""
    levels = jnp.arange(256, dtype=jnp.int32)
    nzmask = hist > 0
    nz = jnp.sum(nzmask, axis=-1)
    last_idx = 255 - jnp.argmax(nzmask[..., ::-1], axis=-1)
    last_nz = jnp.take_along_axis(hist, last_idx[..., None], axis=-1)[..., 0]
    step = jnp.where(nz <= 1, 0, (npix - last_nz) // 255)
    cum_ex = jnp.cumsum(hist, axis=-1) - hist
    nacc = step[..., None] // 2 + cum_ex
    lut = jnp.minimum(nacc // jnp.maximum(step[..., None], 1), 255)
    return jnp.where((step == 0)[..., None], levels[None, None],
                     lut).astype(jnp.int32)


def _contrast_mean(x):
    """Round-half-up mean of the L plane: (B, C, P) -> (B,) in _ftype()
    (augment.cpp contrast_img)."""
    ft = _ftype()
    lum = _gray_planar(x)
    npix = lum.shape[-1]
    return jnp.floor(jnp.sum(lum, axis=-1).astype(ft) / npix + 0.5)


def _sharpness_planar(x, v, h, w):
    """Blend toward the PIL SMOOTH filter (3x3 [1 1 1; 1 5 1; 1 1 1]/13,
    round-half-up, border pixels copied).  v: (B,)."""
    b, c, p = x.shape
    ft = _ftype()
    img = x.reshape(b * c, h, w)
    pd = jnp.pad(img, ((0, 0), (1, 1), (1, 1)))
    acc = (pd[:, :-2, :-2] + pd[:, :-2, 1:-1] + pd[:, :-2, 2:]
           + pd[:, 1:-1, :-2] + 5 * pd[:, 1:-1, 1:-1] + pd[:, 1:-1, 2:]
           + pd[:, 2:, :-2] + pd[:, 2:, 1:-1] + pd[:, 2:, 2:])
    deg = jnp.clip(jnp.floor(acc.astype(ft) / 13.0 + 0.5), 0, 255)
    border = np.zeros((h, w), bool)
    border[0], border[-1], border[:, 0], border[:, -1] = (True,) * 4
    deg = jnp.where(jnp.asarray(border)[None], img.astype(ft), deg)
    return _blend(deg.reshape(b, c, p), x.astype(ft), v[:, None, None])


def _cutout_planar(x, frac, r1, r2, h, w):
    """Random gray square, inclusive rectangle fill (augment.cpp
    augment_one/cutout_rect; reference augmentations.py:113-138).
    frac/r1/r2: (B,)."""
    b, c, p = x.shape
    ft = _ftype()
    v = frac.astype(ft) * w
    x0 = jnp.maximum(0.0, r1.astype(ft) * w - v / 2.0)
    y0 = jnp.maximum(0.0, r2.astype(ft) * h - v / 2.0)
    ix0, iy0 = x0.astype(jnp.int32), y0.astype(jnp.int32)
    ix1 = jnp.minimum(jnp.minimum(float(w), x0 + v).astype(jnp.int32), w - 1)
    iy1 = jnp.minimum(jnp.minimum(float(h), y0 + v).astype(jnp.int32), h - 1)
    xi, yi = _xi_yi(h, w)
    mask = ((yi[None] >= iy0[:, None]) & (yi[None] <= iy1[:, None])
            & (xi[None] >= ix0[:, None]) & (xi[None] <= ix1[:, None])
            & (frac > 0)[:, None])
    fill = jnp.asarray([125, 123, 114][:c] if c == 3 else [125], jnp.int32)
    return jnp.where(mask[:, None, :], fill[None, :, None], x)


# --------------------------------------------------------------------------
# one RandAugment round (all op classes evaluated, per-image select)
# --------------------------------------------------------------------------

def _round_planar(x, op, v, sv, h, w):
    """One RandAugment op per image on a (B, C, P) int32 batch.

    op (B,) int32 op ids; v (B,) unsigned magnitude; sv (B,) sign-flipped
    magnitude used by the geometric ops.  Every op class is computed
    vectorized for the whole batch and selected per image (a vmapped
    lax.switch would execute every branch anyway)."""
    b, c, p = x.shape
    ft = _ftype()
    xf = x.astype(ft)
    vb = v.astype(ft)[:, None, None]
    opb = op[:, None, None]

    out = x  # identity (op 5) and the default for unmatched ids

    # autocontrast (0): per-channel linear stretch; lo/hi are the channel
    # min/max (== first/last nonzero histogram bins), PIL truncation
    lo = jnp.min(x, axis=2, keepdims=True).astype(ft)
    hi = jnp.max(x, axis=2, keepdims=True).astype(ft)
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    offset = -lo * scale
    ac = jnp.clip(jnp.trunc(xf * scale + offset), 0, 255).astype(jnp.int32)
    ac = jnp.where(hi <= lo, x, ac)
    out = jnp.where(opb == 0, ac, out)

    # brightness (1): blend toward black
    out = jnp.where(opb == 1, _blend(jnp.asarray(0, ft), xf, vb), out)

    # color (2): blend toward the L plane; identity on grayscale
    if c == 3:
        deg = _lum_planar(x).astype(ft)[:, None, :]
        out = jnp.where(opb == 2, _blend(deg, xf, vb), out)

    # contrast (3): blend toward the round-half-up L mean
    mean = _contrast_mean(x)[:, None, None]
    out = jnp.where(opb == 3, _blend(mean, xf, vb), out)

    # equalize (4): the one op that needs its histogram-derived table
    eq = _apply_lut_planar(x, _equalize_lut(_hist_planar(x), p))
    out = jnp.where(opb == 4, eq, out)

    # posterize (6): bit mask
    bits = jnp.clip(v.astype(jnp.int32), 1, 8)
    pmask = jnp.asarray(255, jnp.int32) & ~((1 << (8 - bits)) - 1)
    out = jnp.where(opb == 6, x & pmask[:, None, None], out)

    # sharpness (8): blend toward SMOOTH
    out = jnp.where(opb == 8, _sharpness_planar(x, v, h, w), out)

    # solarize (11): invert at >= threshold
    out = jnp.where(opb == 11, jnp.where(xf < vb, x, 255 - x), out)

    # geometric class (7/9/10/12/13): one shared affine resample whose
    # coefficients are selected per image
    svf = sv.astype(ft)
    zero, one = jnp.zeros_like(svf), jnp.ones_like(svf)
    rot = _rotate_coeffs(h, w, sv)
    geo_tbl = {
        9: (one, svf, zero, zero, one, zero),             # shear_x
        10: (one, zero, zero, svf, one, zero),            # shear_y
        12: (one, zero, svf * w, zero, one, zero),        # translate_x
        13: (one, zero, zero, zero, one, svf * h),        # translate_y
    }
    coeffs = rot
    for op_id, cf in geo_tbl.items():
        coeffs = tuple(jnp.where(op == op_id, new, cur)
                       for new, cur in zip(cf, coeffs))
    xi, yi = _xi_yi(h, w)
    src, valid = _affine_src(h, w, coeffs,
                             jnp.broadcast_to(xi[None], (b, p)),
                             jnp.broadcast_to(yi[None], (b, p)))
    is_geo = (op == 7) | (op == 9) | (op == 10) | (op == 12) | (op == 13)
    ge = _warp(x, src, valid)
    return jnp.where(is_geo[:, None, None], ge, out)


# --------------------------------------------------------------------------
# public single-image surface (the per-op parity interface the native
# backend also exposes; tested bit-exact vs PIL in tests/test_device_aug.py)
# --------------------------------------------------------------------------

def device_apply_op(img_u8, op, v, sign):
    """One RandAugment op on one (H, W, C) uint8 image — mirrors native
    ``gll_apply_op``."""
    img = jnp.asarray(img_u8)
    h, w, _ = img.shape
    x = _to_planar(img[None])
    op = jnp.asarray(op, jnp.int32)[None]
    v = jnp.asarray(v, _ftype())[None]
    sv = jnp.where(jnp.asarray(sign, bool), -v, v)
    return _from_planar(_round_planar(x, op, v, sv, h, w), h, w)[0]


def device_rotate(img_u8, deg):
    img = jnp.asarray(img_u8)
    h, w, _ = img.shape
    x = _to_planar(img[None])
    xi, yi = _xi_yi(h, w)
    src, valid = _affine_src(
        h, w, _rotate_coeffs(h, w, jnp.asarray(deg, _ftype())[None]),
        xi[None], yi[None])
    return _from_planar(_warp(x, src, valid), h, w)[0]


def device_mirror(img_u8):
    return jnp.asarray(img_u8)[:, ::-1, :]


def device_pad_crop(img_u8, pad: int, reflect: bool, i, j):
    img = jnp.asarray(img_u8)
    h, w, _ = img.shape
    x = _to_planar(img[None])
    off = jnp.stack([jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32)])
    src, valid = _prefix_src(h, w, 1, None, None, off[None], rotation=0,
                             flip=False, pad=pad, pad_reflect=reflect)
    return _from_planar(_warp(x, src, valid), h, w)[0]


def device_cutout(img_u8, frac, r1, r2):
    img = jnp.asarray(img_u8)
    h, w, _ = img.shape
    x = _to_planar(img[None])
    out = _cutout_planar(x, jnp.asarray(frac)[None], jnp.asarray(r1)[None],
                         jnp.asarray(r2)[None], h, w)
    return _from_planar(out, h, w)[0]


# --------------------------------------------------------------------------
# the batch transform
# --------------------------------------------------------------------------

def _draw(keys, fn):
    """Vectorized per-image draws from a (B, 2) key array."""
    return jax.vmap(fn)(keys)


class DeviceTransform:
    """Per-dataset weak/strong/eval transform running inside jit — the
    device-side counterpart of data/augment.py::Transform (same mode
    semantics; reference config/datasets_setting.py).

    ``__call__(batch_u8, key)`` maps a (B, H, W, C) uint8 batch to an
    augmented uint8 batch of the same shape; per-image parameters are
    drawn from per-image subkeys.  Eval mode is the identity
    (normalization happens in the train step via its ``norm=(mean, std)``
    argument, trainer._device_normalize).
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
        n, h, w, _ = batch_u8.shape
        x = _to_planar(batch_u8)
        # per-image subkeys: rotate, flip, pad offsets, cutout, rand rounds
        per_img = jax.random.split(key, n)
        all_keys = jax.vmap(
            lambda k: jax.random.split(k, 4 + self.rand_n))(per_img)

        ang = None
        if self.rotation > 0:
            u = _draw(all_keys[:, 0], lambda k: jax.random.uniform(
                k, (), _ftype()))
            ang = (u * 2.0 - 1.0) * self.rotation
        do_flip = _draw(all_keys[:, 1],
                        lambda k: jax.random.uniform(k, ())) < 0.5
        off = _draw(all_keys[:, 2], lambda k: jax.random.randint(
            k, (2,), 0, 2 * self.pad + 1)) if self.pad > 0 else None

        # geometric prefix: [rotate] -> [flip] -> pad+crop as ONE resample
        if self.pad > 0 or self.rotation > 0 or self.flip:
            src, valid = _prefix_src(h, w, n, ang, do_flip, off,
                                     rotation=self.rotation, flip=self.flip,
                                     pad=self.pad,
                                     pad_reflect=self.pad_reflect)
            x = _warp(x, src, valid)

        # RandAugment rounds (augment.cpp augment_one's loop body)
        lo_t = jnp.asarray(_OP_LO)
        hi_t = jnp.asarray(_OP_HI)
        signed_t = jnp.asarray(_OP_SIGNED)
        for t in range(self.rand_n):
            rk = jax.vmap(lambda k: jax.random.split(k, 3))(all_keys[:, 4 + t])
            op = _draw(rk[:, 0], lambda k: jax.random.randint(
                k, (), 0, _NUM_OPS))
            u = _draw(rk[:, 1], lambda k: jax.random.uniform(k, (), _ftype()))
            neg = _draw(rk[:, 2], lambda k: jax.random.uniform(k, ())) > 0.5
            lo = jnp.take(lo_t, op).astype(_ftype())
            hi = jnp.take(hi_t, op).astype(_ftype())
            v = u * (hi - lo) + lo
            sv = jnp.where(jnp.take(signed_t, op) & neg, -v, v)
            x = _round_planar(x, op, v, sv, h, w)

        # always-applied cutout (reference augmentations.py:229-234)
        ucut = _draw(all_keys[:, 3], lambda k: jax.random.uniform(
            k, (3,), _ftype()))
        x = _cutout_planar(x, ucut[:, 0] * 0.5, ucut[:, 1], ucut[:, 2], h, w)
        return _from_planar(x, h, w)
