"""Jitted train/eval steps for GLL and MLP heads.

TPU-native equivalent of the reference per-batch training logic
(FullySup.py:115-202): one fused, jit-compiled step that runs the CNN
forward, the graph Laplace-learning head, the loss, the hand-derived
backward, and the optimizer update entirely on device.  The reference
crosses the host boundary four times per step (GLL.py:27,73,90,157); here
nothing leaves HBM.

Also computes the per-sample uncertainty scores used by score-driven
base-set refresh (FullySup.py:165-175) inside the same step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.device_aug import shard_divisor as device_aug_shard_divisor
from ..ops import laplace_learning
from .losses import custom_ce_loss

__all__ = ["TrainState", "create_train_state", "make_gl_train_step",
           "make_mlp_train_step", "make_gl_eval_step", "make_mlp_eval_step",
           "make_encode_step", "make_sharded_gl_train_step",
           "make_sharded_mlp_train_step", "params_finite",
           "make_gl_train_step_from_data", "make_mlp_train_step_from_data",
           "make_sharded_gl_train_step_from_data",
           "make_sharded_mlp_train_step_from_data"]


def params_finite(params) -> jax.Array:
    """Scalar bool: every parameter entry is finite.  The reference sweeps
    all model params for NaN after every optimizer step (FullySup.py:188-190);
    here the sweep is one fused device reduction folded into the train step
    and surfaced in the metrics dict (key 'params_finite')."""
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(p)) for p in leaves]))


class TrainState(NamedTuple):
    """Parameters + BN statistics + optimizer state + step counter."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(model, tx: optax.GradientTransformation, rng,
                       sample_input) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng}, sample_input,
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _apply(model, params, batch_stats, x, train: bool, rng=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": rng} if rng is not None else None
    if train and batch_stats:
        out, updates = model.apply(variables, x, train=True, rngs=rngs,
                                   mutable=["batch_stats"])
        return out, updates["batch_stats"]
    out = model.apply(variables, x, train=train, rngs=rngs)
    return out, batch_stats


def _device_normalize(x, norm):
    """uint8 NHWC batch -> normalized float32 on DEVICE.

    Shipping uint8 and normalizing inside the jitted step cuts the
    host->device transfer 4x; through the execution relay the f32 transfer
    alone costs ~330 ms/step at the reference shape vs ~120 ms for uint8
    (benchmarks/RESULTS.md).  ``norm=None`` expects already-normalized
    float inputs (the legacy path).  Same formula as
    data/augment.py::normalize_batch, in float32 either way."""
    if norm is None:
        return x
    mean, std = norm
    x = x.astype(jnp.float32) / 255.0
    return ((x - jnp.asarray(mean, jnp.float32))
            / jnp.asarray(std, jnp.float32))


def _scores(pred, labels, score_type: str):
    """Per-sample uncertainty scores for base-set selection
    (FullySup.py:165-172): 'entropy' = per-sample CE, 'l2' = 1 - ||p||^2."""
    if score_type == "entropy":
        onehot = jax.nn.one_hot(labels, pred.shape[1], dtype=pred.dtype)
        return -jnp.sum(onehot * jnp.log(pred + 1e-8), axis=1)
    if score_type == "l2":
        return 1.0 - jnp.sum(pred ** 2, axis=1)
    raise ValueError(score_type)


def make_gl_train_step(model, tx: optax.GradientTransformation,
                       num_classes: int, tau: float, epsilon="auto",
                       k: int = 25, solver: str = "cholesky",
                       score_type: str = "entropy", norm=None,
                       grad_warn="default") -> Callable:
    """GL-branch step (FullySup.py:152-157): stack base on top of the batch,
    encode, run the graph head with base labels, CE on batch labels.

    ``norm=(mean, std)``: accept uint8 batches and normalize on device
    (see _device_normalize).  ``grad_warn``: exploding-gradient warn
    threshold for the graph op's backward ('default' = module default;
    None or <= 0 disables — dryruns/tests on random data)."""

    @jax.jit
    def step(state: TrainState, base_images, base_labels, images, labels, rng):
        x = jnp.concatenate([_device_normalize(base_images, norm),
                             _device_normalize(images, norm)], axis=0)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=x.dtype)

        def loss_fn(params):
            (_, features), new_stats = _apply(model, params,
                                              state.batch_stats, x,
                                              train=True, rng=rng)
            pred = laplace_learning(features, y, tau=tau, epsilon=epsilon,
                                    k=k, solver=solver, grad_warn=grad_warn)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        scores = _scores(pred, labels, score_type)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}, scores

    return step


def make_sharded_gl_train_step(model, tx: optax.GradientTransformation,
                               num_classes: int, mesh, tau: float,
                               epsilon="auto", k: int = 25,
                               solver: str = "cholesky",
                               score_type: str = "entropy",
                               norm=None, grad_warn="default") -> Callable:
    """Mesh-sharded GL train step: the CNN is data-parallel over every mesh
    axis (batch rows sharded), and the graph head's node dimension carries a
    sharding constraint over the same axes, so GSPMD tiles the all-pairs
    distance matmul and Laplacian algebra across chips and inserts the
    ICI collectives.  Parameters/optimizer state are replicated; gradient
    reduction is the usual psum.

    Call with base/batch arrays whose leading dims are divisible by the
    mesh size.  The returned function is jitted with explicit shardings.
    ``norm=(mean, std)``: accept uint8 batches and normalize on device.
    ``grad_warn``: see make_gl_train_step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    batch_sharding = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())
    feat_sharding = NamedSharding(mesh, P(axes, None))

    def step(state: TrainState, base_images, base_labels, images, labels,
             rng):
        x = jnp.concatenate([_device_normalize(base_images, norm),
                             _device_normalize(images, norm)], axis=0)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=x.dtype)

        def loss_fn(params):
            (_, features), new_stats = _apply(model, params,
                                              state.batch_stats, x,
                                              train=True, rng=rng)
            features = jax.lax.with_sharding_constraint(features,
                                                        feat_sharding)
            pred = laplace_learning(features, y, tau=tau, epsilon=epsilon,
                                    k=k, solver=solver, grad_warn=grad_warn)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        # scores feed host-side base-set selection: replicate so every
        # process can read them without a cross-process fetch (one (B,)
        # all-gather, negligible)
        scores = jax.lax.with_sharding_constraint(
            _scores(pred, labels, score_type), repl)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}, scores

    return jax.jit(step, in_shardings=(None, repl, repl, batch_sharding,
                                       batch_sharding, None))


def make_sharded_mlp_train_step(model, tx: optax.GradientTransformation,
                                mesh, norm=None) -> Callable:
    """MLP-branch step with the batch sharded over every mesh axis (classic
    DP): XLA shards the CNN along the batch rows and inserts the gradient
    psums; params/opt state replicated.  ``norm``: see make_mlp_train_step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    batch_sharding = NamedSharding(mesh, P(axes))

    def step(state: TrainState, images, labels, rng):
        images = _device_normalize(images, norm)

        def loss_fn(params):
            (pred, _), new_stats = _apply(model, params, state.batch_stats,
                                          images, train=True, rng=rng)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}

    return jax.jit(step, in_shardings=(None, batch_sharding, batch_sharding,
                                       None))


def make_gl_train_step_from_data(model, tx: optax.GradientTransformation,
                                 num_classes: int, image_shape, tau: float,
                                 epsilon="auto", k: int = 25,
                                 solver: str = "cholesky",
                                 score_type: str = "entropy", norm=None,
                                 aug=None, grad_warn="default") -> Callable:
    """GL step over a DEVICE-RESIDENT dataset: per step the host sends only
    index/label vectors; base+batch rows are gathered on device and
    augmented inside the jitted step (data/device_aug.py).

    Through the execution relay the host->device image transfer is the
    flagship driver's per-step floor (~93 ms at the reference shape,
    benchmarks/probe_transfer_overlap.py) — this path removes it entirely
    after a one-time bulk transfer of the uint8 training set.

    ``data``: (N, H*W*C) uint8 — rows FLATTENED so the stored layout keeps
    a wide trailing dim (the (.., C=3) axis would otherwise be lane-padded
    on TPU) and the per-step row gather is contiguous.  Pass it as an
    ARGUMENT every step (never close over it: a 50k-row dataset baked into
    the HLO as a constant exceeds the remote-compile size cap).

    ``aug``: a ``DeviceTransform`` (or None / eval for normalization-only).
    The base rows are re-augmented each step alongside the batch, matching
    the reference's per-step base_loader draw (FullySup.py:135).
    """
    h, w, c = image_shape

    @jax.jit
    def step(state: TrainState, data, base_idx, base_labels, idx, labels,
             rng):
        rows = jnp.concatenate([base_idx, idx])
        images = jnp.take(data, rows, axis=0).reshape(-1, h, w, c)
        if aug is not None and not aug.is_eval:
            rng, aug_key = jax.random.split(rng)
            images = aug(images, aug_key)
        x = _device_normalize(images, norm)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=x.dtype)

        def loss_fn(params):
            (_, features), new_stats = _apply(model, params,
                                              state.batch_stats, x,
                                              train=True, rng=rng)
            pred = laplace_learning(features, y, tau=tau, epsilon=epsilon,
                                    k=k, solver=solver, grad_warn=grad_warn)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        scores = _scores(pred, labels, score_type)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}, scores

    return step


def make_mlp_train_step_from_data(model, tx: optax.GradientTransformation,
                                  image_shape, norm=None,
                                  aug=None) -> Callable:
    """MLP-branch step over a device-resident dataset (see
    make_gl_train_step_from_data)."""
    h, w, c = image_shape

    @jax.jit
    def step(state: TrainState, data, idx, labels, rng):
        images = jnp.take(data, idx, axis=0).reshape(-1, h, w, c)
        if aug is not None and not aug.is_eval:
            rng, aug_key = jax.random.split(rng)
            images = aug(images, aug_key)
        images = _device_normalize(images, norm)

        def loss_fn(params):
            (pred, _), new_stats = _apply(model, params, state.batch_stats,
                                          images, train=True, rng=rng)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}

    return step


def make_sharded_gl_train_step_from_data(
        model, tx: optax.GradientTransformation, num_classes: int,
        image_shape, mesh, tau: float, epsilon="auto", k: int = 25,
        solver: str = "cholesky", score_type: str = "entropy", norm=None,
        aug=None, grad_warn="default") -> Callable:
    """Device-resident dataset AND mesh sharding combined — the production
    multi-device step (replaces the reference's DataParallel encoder,
    utils.py:546-548, without its per-step host image transfers).

    The uint8 dataset stays REPLICATED over the mesh (one bulk transfer per
    device; ~150 MB at CIFAR-50k scale — far cheaper than a permuted
    row-sharded layout whose random per-step gathers would all-to-all every
    batch).  A sharding constraint right after the row gather makes each
    device slice only its local index range, so the on-device augmentation
    (data/device_aug.py — the B·P·P warp and LUT matmuls divide by the mesh
    size), the CNN, and the graph head's node dimension all run
    batch-sharded exactly like make_sharded_gl_train_step; GSPMD inserts
    the gradient psums.

    Per-step host->device traffic is index/label vectors only.  The
    augmentation RNG stream is identical to the single-device
    make_gl_train_step_from_data (same key split), so numerics match
    bitwise up to reduction order.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w, c = image_shape
    axes = tuple(mesh.axis_names)
    repl = NamedSharding(mesh, P())
    img_shd = NamedSharding(mesh, P(axes, None, None, None))
    feat_shd = NamedSharding(mesh, P(axes, None))

    def step(state: TrainState, data, base_idx, base_labels, idx, labels,
             rng):
        rows = jnp.concatenate([base_idx, idx])
        images = jnp.take(data, rows, axis=0).reshape(-1, h, w, c)
        images = jax.lax.with_sharding_constraint(images, img_shd)
        if aug is not None and not aug.is_eval:
            rng, aug_key = jax.random.split(rng)
            # trace-time hint: the aug's one-hot matmul memory gates charge
            # the per-device shard, not the global batch the trace sees
            with device_aug_shard_divisor(mesh.size):
                images = aug(images, aug_key)
        x = _device_normalize(images, norm)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=x.dtype)

        def loss_fn(params):
            (_, features), new_stats = _apply(model, params,
                                              state.batch_stats, x,
                                              train=True, rng=rng)
            features = jax.lax.with_sharding_constraint(features, feat_shd)
            pred = laplace_learning(features, y, tau=tau, epsilon=epsilon,
                                    k=k, solver=solver, grad_warn=grad_warn)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        scores = jax.lax.with_sharding_constraint(
            _scores(pred, labels, score_type), repl)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}, scores

    # the dataset and the index/label vectors arrive replicated (tiny, or
    # transferred once); all sharding happens via the internal constraints,
    # so non-divisible row counts degrade to XLA padding instead of erroring
    return jax.jit(step, in_shardings=(None, repl, repl, repl, repl, repl,
                                       None))


def make_sharded_mlp_train_step_from_data(
        model, tx: optax.GradientTransformation, image_shape, mesh,
        norm=None, aug=None) -> Callable:
    """MLP-branch step over a device-resident dataset with the batch sharded
    over the mesh (see make_sharded_gl_train_step_from_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w, c = image_shape
    axes = tuple(mesh.axis_names)
    repl = NamedSharding(mesh, P())
    img_shd = NamedSharding(mesh, P(axes, None, None, None))

    def step(state: TrainState, data, idx, labels, rng):
        images = jnp.take(data, idx, axis=0).reshape(-1, h, w, c)
        images = jax.lax.with_sharding_constraint(images, img_shd)
        if aug is not None and not aug.is_eval:
            rng, aug_key = jax.random.split(rng)
            with device_aug_shard_divisor(mesh.size):
                images = aug(images, aug_key)
        images = _device_normalize(images, norm)

        def loss_fn(params):
            (pred, _), new_stats = _apply(model, params, state.batch_stats,
                                          images, train=True, rng=rng)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}

    return jax.jit(step, in_shardings=(None, repl, repl, repl, None))


def make_mlp_train_step(model, tx: optax.GradientTransformation,
                        norm=None) -> Callable:
    """MLP-branch step (FullySup.py:158-160): classifier head + custom CE on
    its probability outputs.  ``norm``: see make_gl_train_step."""

    @jax.jit
    def step(state: TrainState, images, labels, rng):
        images = _device_normalize(images, norm)

        def loss_fn(params):
            (pred, _), new_stats = _apply(model, params, state.batch_stats,
                                          images, train=True, rng=rng)
            return custom_ce_loss(pred, labels), (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(pred, axis=1) == labels)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "params_finite": params_finite(params)}

    return step


def make_gl_eval_step(model, num_classes: int, tau: float, epsilon="auto",
                      k: int = 25, solver: str = "cholesky",
                      norm=None) -> Callable:
    """test_network equivalent (utils.py:596-634): classify a test batch by
    running the network + graph head against one base batch.
    ``norm=(mean, std)``: accept uint8 inputs, normalize on device."""

    @jax.jit
    def step(state: TrainState, base_images, base_labels, images):
        x = jnp.concatenate([_device_normalize(base_images, norm),
                             _device_normalize(images, norm)], axis=0)
        y = jax.nn.one_hot(base_labels, num_classes, dtype=x.dtype)
        (_, features), _ = _apply(model, state.params, state.batch_stats, x,
                                  train=False)
        pred = laplace_learning(features, y, tau=tau, epsilon=epsilon, k=k,
                                solver=solver)
        return jnp.argmax(pred, axis=1)

    return step


def make_mlp_eval_step(model, norm=None) -> Callable:
    """test_network's MLP predictor branch (utils.py:621-624): classify a
    test batch with the aux classifier head alone."""

    @jax.jit
    def step(state: TrainState, images):
        (pred, _), _ = _apply(model, state.params, state.batch_stats,
                              _device_normalize(images, norm), train=False)
        return jnp.argmax(pred, axis=1)

    return step


def make_encode_step(model, norm=None) -> Callable:
    """Feature-extraction step (loader_to_numpy equivalent, utils.py:241-267).
    ``norm=(mean, std)``: accept raw uint8 batches and normalize on device —
    the eval-path transfer is 4x smaller through the relay link."""

    @jax.jit
    def step(state: TrainState, images):
        (_, features), _ = _apply(model, state.params, state.batch_stats,
                                  _device_normalize(images, norm),
                                  train=False)
        return features

    return step


def make_encode_step_from_data(model, image_shape, batch: int,
                               norm=None) -> Callable:
    """Feature extraction over a DEVICE-RESIDENT flat uint8 dataset: each
    call slices ``batch`` contiguous rows starting at a (traced) row index
    and encodes them — zero per-eval host->device image traffic (the
    --device_data eval path; the wire path ships the full train+test sets
    through the relay every eval)."""
    h, w, c = image_shape

    @jax.jit
    def step(state: TrainState, data, start):
        rows = jax.lax.dynamic_slice_in_dim(data, start, batch, axis=0)
        x = _device_normalize(rows.reshape(batch, h, w, c), norm)
        (_, features), _ = _apply(model, state.params, state.batch_stats,
                                  x, train=False)
        return features

    return step
