"""Device (in-jit) augmentation vs the PIL-exact native backend.

Per-op parity: ``device_apply_op`` must match ``apply_op_native`` — which
is itself bit-exact with PIL (tests/test_native_aug.py) — given the same
(op, magnitude, sign).  Under the test config (x64) the device coordinate
math runs in float64, matching the C double path, so equality is exact.
Random parameter streams differ by design (jax.random vs the host PCG) —
the batch transform is tested for determinism, shape/dtype preservation,
and jit-compatibility, not per-stream equality (same contract as the
native backend).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphlearninglayer_tpu.data import device_aug as D
from graphlearninglayer_tpu.data import native as N

requires_native = pytest.mark.skipif(
    not N.native_available(), reason="g++ / native library unavailable")


def _images(rng):
    rgb = rng.integers(0, 256, (32, 32, 3), np.uint8)
    # limited-range channel exercises autocontrast's lo/hi search
    rgb[..., 1] = 40 + (rgb[..., 1] % 150)
    gray = rng.integers(0, 256, (28, 28, 1), np.uint8)
    return [rgb, gray]


@requires_native
@pytest.mark.parametrize("op", sorted(D.OP_IDS))
def test_device_op_matches_native(op, rng):
    op_id = D.OP_IDS[op]
    lo, hi = float(D._OP_LO[op_id]), float(D._OP_HI[op_id])
    for img in _images(rng):
        for frac in (0.0, 0.33, 0.77, 1.0):
            v = lo + frac * (hi - lo)
            for sign in (False, True):
                want = N.apply_op_native(img, op, v, sign)
                got = np.asarray(D.device_apply_op(img, op_id, v, sign))
                np.testing.assert_array_equal(
                    got, want,
                    err_msg=f"{op} v={v} sign={sign} c={img.shape[-1]}")


def test_mirror_matches_numpy(rng):
    for img in _images(rng):
        np.testing.assert_array_equal(np.asarray(D.device_mirror(img)),
                                      img[:, ::-1])


def test_pad_crop_matches_numpy(rng):
    for img in _images(rng):
        h, w, _ = img.shape
        for pad, reflect in ((4, False), (4, True), (8, True)):
            for i, j in ((0, 0), (3, 7), (2 * pad, 2 * pad)):
                padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)),
                                mode="reflect" if reflect else "constant")
                want = padded[i:i + h, j:j + w]
                got = np.asarray(D.device_pad_crop(img, pad, reflect, i, j))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"pad={pad} reflect={reflect} "
                                       f"i={i} j={j}")


def test_cutout_matches_reference(rng):
    """Inclusive rectangle, truncated coordinates, gray fill — the
    augment.cpp cutout_rect semantics."""
    for img in _images(rng):
        h, w, c = img.shape
        fill = (125, 123, 114) if c == 3 else (125,)
        for frac, r1, r2 in ((0.4, 0.3, 0.6), (0.49, 0.99, 0.01),
                             (0.2, 0.0, 1.0), (0.5, 0.5, 0.5)):
            v = frac * w
            x0 = max(0.0, r1 * w - v / 2.0)
            y0 = max(0.0, r2 * h - v / 2.0)
            x1 = min(float(w), x0 + v)
            y1 = min(float(h), y0 + v)
            want = img.copy()
            want[int(y0):min(int(y1), h - 1) + 1,
                 int(x0):min(int(x1), w - 1) + 1] = fill
            got = np.asarray(D.device_cutout(img, frac, r1, r2))
            np.testing.assert_array_equal(
                got, want, err_msg=f"frac={frac} r1={r1} r2={r2} c={c}")


def test_device_transform_batch_deterministic(rng):
    batch = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    key = jax.random.PRNGKey(0)
    for mode in ("weak", "strong"):
        tf = D.DeviceTransform("cifar10", mode)
        out = np.asarray(tf(jnp.asarray(batch), key))
        assert out.shape == batch.shape and out.dtype == np.uint8
        out2 = np.asarray(tf(jnp.asarray(batch), key))
        np.testing.assert_array_equal(out, out2)
        out3 = np.asarray(tf(jnp.asarray(batch), jax.random.PRNGKey(1)))
        assert not np.array_equal(out, out3)
        # per-image keys: identical rows augment differently
        same = np.stack([batch[0]] * 8)
        outs = np.asarray(tf(jnp.asarray(same), key))
        assert len({o.tobytes() for o in outs}) > 1


def test_device_transform_grayscale_under_jit(rng):
    batch = rng.integers(0, 256, (4, 28, 28, 1), np.uint8)
    tf = D.DeviceTransform("mnist", "weak")

    @jax.jit
    def f(b, k):
        return tf(b, k)

    out = np.asarray(f(jnp.asarray(batch), jax.random.PRNGKey(0)))
    assert out.shape == batch.shape and out.dtype == np.uint8


def test_device_transform_eval_identity(rng):
    batch = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    tf = D.DeviceTransform("cifar10", "eval")
    assert tf.is_eval
    np.testing.assert_array_equal(
        np.asarray(tf(jnp.asarray(batch), jax.random.PRNGKey(0))), batch)


def test_from_data_step_matches_host_step(rng):
    """With augmentation off, the device-resident-data step must produce
    numerics identical to the host-batch step fed the same gathered rows."""
    import flax.linen as nn
    import optax

    from graphlearninglayer_tpu.models import l2_normalize
    from graphlearninglayer_tpu.train.trainer import (
        create_train_state, make_gl_train_step, make_gl_train_step_from_data)

    num_classes = 3

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.relu(nn.Conv(4, (3, 3), strides=2, padding=1)(x))
            x = jnp.mean(x, axis=(1, 2))
            feat = nn.Dense(8)(x)
            return nn.softmax(nn.Dense(num_classes)(feat)), l2_normalize(feat)

    model = Enc()
    tx = optax.sgd(0.1, momentum=0.9)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 1), jnp.float32))
    norm = ([0.5], [0.5])
    kwargs = dict(num_classes=num_classes, tau=0.07, epsilon="auto", k=4,
                  norm=norm)
    host_step = make_gl_train_step(model, tx, **kwargs)
    data_step = make_gl_train_step_from_data(model, tx,
                                             image_shape=(8, 8, 1), **kwargs)

    images = rng.integers(0, 256, (64, 8, 8, 1), np.uint8)
    labels_all = rng.integers(0, num_classes, 64)
    base_idx = np.arange(0, 24, 3)
    idx = rng.permutation(64)[:16]
    key = jax.random.PRNGKey(7)

    s1, m1, sc1 = host_step(state, jnp.asarray(images[base_idx]),
                            jnp.asarray(labels_all[base_idx]),
                            jnp.asarray(images[idx]),
                            jnp.asarray(labels_all[idx]), key)
    s2, m2, sc2 = data_step(state, jnp.asarray(images.reshape(64, -1)),
                            jnp.asarray(base_idx),
                            jnp.asarray(labels_all[base_idx]),
                            jnp.asarray(idx), jnp.asarray(labels_all[idx]),
                            key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), rtol=1e-5,
                               atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_prefix_warp_matches_sequential_ops(rng):
    """The composed geometric prefix (rotate -> flip -> pad+crop as ONE
    resample, _prefix_src + _warp) must be bit-exact with applying the
    three single-op functions sequentially — the core equivalence claim of
    the in-jit augmentation path, over random configs covering both pad
    modes, flip on/off, rotation on/off, and gray/RGB images."""
    for trial in range(30):
        c = int(rng.integers(0, 2)) * 2 + 1           # 1 or 3 channels
        h = w = int(rng.choice([28, 32]))
        img = rng.integers(0, 256, (h, w, c), np.uint8)
        rotation = int(rng.choice([0, 10, 20]))
        flip = bool(rng.integers(0, 2))
        do_flip = bool(rng.integers(0, 2))
        pad = int(rng.choice([0, 4, 8]))
        reflect = bool(rng.integers(0, 2))
        ang_val = float((rng.random() * 2 - 1) * rotation)
        i = int(rng.integers(0, 2 * pad + 1)) if pad else 0
        j = int(rng.integers(0, 2 * pad + 1)) if pad else 0
        if not (rotation or flip or pad):
            continue

        # sequential single-op reference
        want = img
        if rotation > 0:
            want = np.asarray(D.device_rotate(want, ang_val))
        if flip and do_flip:
            want = np.asarray(D.device_mirror(want))
        if pad > 0:
            want = np.asarray(D.device_pad_crop(want, pad, reflect, i, j))

        # composed prefix
        x = D._to_planar(jnp.asarray(img)[None])
        ang = jnp.asarray([ang_val], D._ftype()) if rotation > 0 else None
        off = jnp.asarray([[i, j]], jnp.int32)
        src, valid = D._prefix_src(h, w, 1, ang,
                                   jnp.asarray([do_flip]), off,
                                   rotation=rotation, flip=flip, pad=pad,
                                   pad_reflect=reflect)
        got = np.asarray(D._from_planar(D._warp(x, src, valid), h, w)[0])
        np.testing.assert_array_equal(
            got, want, err_msg=f"trial={trial} rot={rotation} ang={ang_val} "
            f"flip={flip}/{do_flip} pad={pad} reflect={reflect} "
            f"i={i} j={j} c={c}")


def test_warp_gather_fallback_matches_matmul(rng):
    """_warp's memory gates (per-image P cap AND total B*P*P budget) route
    to a take_along_axis gather that must agree exactly with the one-hot
    matmul path."""
    b, c, h, w = 3, 3, 16, 16
    x = jnp.asarray(rng.integers(0, 256, (b, c, h * w), np.int32))
    src = jnp.asarray(rng.integers(0, h * w, (b, h * w), np.int32))
    valid = jnp.asarray(rng.random((b, h * w)) < 0.9)
    fast = np.asarray(D._warp(x, src, valid))
    old_pix, old_bytes = D._MATMUL_MAX_PIXELS, D._MATMUL_MAX_BYTES
    try:
        D._MATMUL_MAX_PIXELS = 1            # per-image gate
        slow_p = np.asarray(D._warp(x, src, valid))
        D._MATMUL_MAX_PIXELS = old_pix
        D._MATMUL_MAX_BYTES = 1             # batch-product gate
        slow_b = np.asarray(D._warp(x, src, valid))
    finally:
        D._MATMUL_MAX_PIXELS, D._MATMUL_MAX_BYTES = old_pix, old_bytes
    np.testing.assert_array_equal(fast, slow_p)
    np.testing.assert_array_equal(fast, slow_b)


def test_equalize_lut_fallback_matches_matmul(rng):
    """The equalize LUT's large-image gather fallback (take_along_axis on
    the 256-entry table) must agree exactly with the one-hot matmul."""
    b, c, p = 2, 3, 1024
    x = jnp.asarray(rng.integers(0, 256, (b, c, p), np.int32))
    lut = D._equalize_lut(D._hist_planar(x), p)
    fast = np.asarray(D._apply_lut_planar(x, lut))
    old = D._MATMUL_MAX_PIXELS
    try:
        D._MATMUL_MAX_PIXELS = 1
        slow = np.asarray(D._apply_lut_planar(x, lut))
    finally:
        D._MATMUL_MAX_PIXELS = old
    np.testing.assert_array_equal(fast, slow)
    # equalize on a full batch via the public op stays exact for big P too
    img = rng.integers(0, 256, (84, 84, 3), np.uint8)   # miniimagenet shape
    out = np.asarray(D.device_apply_op(img, D.OP_IDS["equalize"], 0.5, False))
    assert out.shape == img.shape and out.dtype == np.uint8


@requires_native
def test_rand_round_covers_every_op_class(rng):
    """Sampling many keys exercises every op id (the 4-way class select);
    outputs must stay valid uint8 images."""
    img = _images(rng)[0]
    outs = []
    for s in range(24):
        out = np.asarray(D.device_apply_op(img, s % 14,
                                           float(D._OP_LO[s % 14]
                                                 + 0.5 * (D._OP_HI[s % 14]
                                                          - D._OP_LO[s % 14])),
                                           bool(s % 2)))
        assert out.shape == img.shape and out.dtype == np.uint8
        outs.append(out)
    assert len({o.tobytes() for o in outs}) > 5


def test_chunked_onehot_paths_match_direct(monkeypatch):
    """The chunked-over-batch one-hot warp/LUT (the 84x84 fast path) must
    be bitwise identical to the direct one-hot and to the gather fallback."""
    import graphlearninglayer_tpu.data.device_aug as da

    rng = np.random.default_rng(5)
    b, c, p = 20, 3, 1024
    x = jnp.asarray(rng.integers(0, 256, (b, c, p)).astype(np.int32))
    src = jnp.asarray(rng.integers(0, p, (b, p)).astype(np.int32))
    valid = jnp.asarray(rng.random((b, p)) < 0.9)
    lut = jnp.asarray(rng.integers(0, 256, (b, c, 256)).astype(np.int32))

    direct_w = np.asarray(da._warp(x, src, valid))
    direct_l = np.asarray(da._apply_lut_planar(x, lut))

    # shrink the budget so the direct path is gated off but a small chunk
    # still fits -> the chunked path runs
    monkeypatch.setattr(da, "_MATMUL_MAX_BYTES", 2 * p * p * 8 + 512 * c * p * 8)
    chunk_w = np.asarray(da._warp(x, src, valid))
    chunk_l = np.asarray(da._apply_lut_planar(x, lut))
    np.testing.assert_array_equal(chunk_w, direct_w)
    np.testing.assert_array_equal(chunk_l, direct_l)

    # gather fallback (budget too small even for one image) also matches
    monkeypatch.setattr(da, "_MATMUL_MAX_BYTES", 16)
    np.testing.assert_array_equal(np.asarray(da._warp(x, src, valid)),
                                  direct_w)
    np.testing.assert_array_equal(np.asarray(da._apply_lut_planar(x, lut)),
                                  direct_l)
