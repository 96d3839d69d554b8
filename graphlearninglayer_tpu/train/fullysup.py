"""Fully-supervised training driver (GL or MLP head).

Equivalent of reference FullySup.py:22-365: loaders -> model -> optional
MLP-head pretrain -> epoch loop (GL or MLP branch) with per-step score
updates, periodic base-set refresh (random/score), transductive + per-batch
eval, checkpointing, loss/accuracy record plots, and a FileLogger stdout
tee.  The compute path is one jitted device step; the host loop only moves
data and bookkeeping.

Run:  python -m graphlearninglayer_tpu.train.fullysup --sup_train_type gl \
          --dataset cifar10 --cosine [--epsilon auto ...]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config.cli import parse_option
from ..data import (BatchLoader, DeviceTransform, ScoredDataset, Transform,
                    load_dataset)
from ..evalx import test_gl_transductive, test_network
from ..models import BuildNet
from ..utils.checkpoint import restore_checkpoint, save_checkpoint
from ..utils.meters import AverageMeter, FileLogger, Throughput
from ..utils.profiling import trace_steps
from .optim import make_lr_schedule, make_optimizer
from .trainer import (create_train_state, make_gl_train_step,
                      make_gl_train_step_from_data, make_mlp_train_step,
                      make_mlp_train_step_from_data)

__all__ = ["main", "run_training", "pretrain_linear"]


def pretrain_linear(model, state, loader, opt, num_classes: int,
                    norm=None):
    """MLP-classifier-head pretraining with the rest of the network frozen
    and BN in inference mode (reference ``pretrain_linear``,
    FullySup.py:22-112).  Updates only the ``linear_*`` aux-classifier
    parameters for ``opt.sup_epochs`` epochs at lr * pretrain_lr_multiply."""
    import optax

    from .losses import custom_ce_loss as _ce

    if opt.sup_epochs <= 0:
        return state

    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: any(getattr(k, "key", "") in ("linear_0", "linear_1")
                            for k in path), state.params)
    tx = optax.masked(
        optax.sgd(opt.learning_rate * opt.pretrain_lr_multiply,
                  momentum=opt.momentum), mask)
    opt_state = tx.init(state.params)

    from .trainer import _device_normalize

    @jax.jit
    def step(params, opt_state, batch_stats, images, labels):
        def loss_fn(p):
            # BN in eval mode: batch statistics frozen (FullySup.py:52-57)
            out = model.apply({"params": p, "batch_stats": batch_stats}
                              if batch_stats else {"params": p},
                              _device_normalize(images, norm), train=False)
            pred, _ = out
            return _ce(pred, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = state.params
    for epoch in range(1, opt.sup_epochs + 1):
        losses = []
        for _, images, labels in loader:
            params, opt_state, loss = step(params, opt_state,
                                           state.batch_stats,
                                           jnp.asarray(images),
                                           jnp.asarray(labels))
            losses.append(float(loss))
        print(f"pretrain epoch {epoch}: loss {np.mean(losses):.4f}")
    return state._replace(params=params)


def _records_and_plots(save_folder, records):
    """loss/acc history + PNG plots (FullySup.py:306-328)."""
    np.save(os.path.join(save_folder, "loss_acc_records.npy"), records,
            allow_pickle=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for key in ("loss", "train_acc", "test_acc"):
            if not records.get(key):
                continue
            plt.figure()
            plt.plot(records[key])
            plt.xlabel("epoch")
            plt.ylabel(key)
            plt.savefig(os.path.join(save_folder, f"{key}.png"))
            plt.close()
    except Exception as e:  # plotting is best-effort observability
        print(f"plotting skipped: {e}")


def run_training(opt) -> dict:
    # DCN multi-host init (no-op unless a coordinator is configured via
    # env/flags; SURVEY §2.3) — must run before the first computation so
    # jax.devices() spans every host when launched under a pod runner
    from ..parallel.multihost import initialize_multihost
    if initialize_multihost():
        print(f"multihost: process {jax.process_index()} of "
              f"{jax.process_count()}")
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0

    rng_np = np.random.default_rng(opt.seed)
    from ..data.datasets import synth_kwargs_from_opt
    spec = load_dataset(opt.dataset, allow_synthetic_fallback=True,
                        **synth_kwargs_from_opt(opt))
    num_classes = spec.num_classes

    sup_tf = Transform(spec.name if spec.name in
                       ("mnist", "fashion_mnist", "cifar10", "cifar100",
                        "miniimagenet", "synthetic") else "synthetic",
                       "eval" if opt.augment_type_sup == "no"
                       else opt.augment_type_sup)
    eval_tf = Transform(sup_tf.dataset, "eval")

    ds = ScoredDataset(spec)
    # uint8 batches + device-side normalization: the train-step transfer is
    # 4x smaller (benchmarks/RESULTS.md), numerics unchanged (same f32
    # formula, just on device)
    # to_device: batch transfers ride the producer thread, overlapping the
    # previous step's compute (the relay wire is the per-step floor —
    # benchmarks/probe_transfer_overlap.py)
    # multi-process: batches stay host-side and are assembled into GLOBAL
    # sharded arrays below (every process draws identical batches from the
    # same seed); single-process keeps the in-producer device_put overlap
    loader = BatchLoader(spec.train_images, spec.train_labels,
                         opt.batch_size, sup_tf, seed=opt.seed,
                         workers=opt.num_workers, emit="uint8",
                         to_device=not multiproc)
    step_norm = (sup_tf.mean, sup_tf.std)
    if len(loader) == 0:
        raise ValueError(
            f"batch_size {opt.batch_size} exceeds train set {len(ds)}")

    model = BuildNet(name=opt.model, head=opt.head_type,
                     feat_dim=opt.embedding_dim, num_classes=num_classes,
                     softmax=not opt.no_softmax,
                     dtype=jnp.bfloat16 if getattr(opt, "bf16", False)
                     else jnp.float32)
    schedule = make_lr_schedule(
        opt.learning_rate, opt.epochs, len(loader), cosine=opt.cosine,
        lr_decay_rate=opt.lr_decay_rate, lr_decay_epochs=opt.lr_decay_epochs,
        warm=opt.warm, warm_epochs=getattr(opt, "warm_epochs", 10),
        warmup_from=getattr(opt, "warmup_from", 1e-2),
        warmup_to=getattr(opt, "warmup_to", None))
    tx = make_optimizer(schedule, adam=opt.Adam, momentum=opt.momentum,
                        weight_decay=opt.weight_decay)
    sample = jnp.zeros((1, *spec.image_shape), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(opt.seed),
                               sample)
    # reference semantics (cli.py:36-37,45-46; FullySup.py:268): the
    # checkpoint only warms the weights; the epoch-loop offset comes from
    # --start_epochs (resume = pass both).  Loading another run's encoder
    # (e.g. the README's SimCLR/MLP checkpoint recipe) starts at epoch 0.
    start_epoch = opt.start_epochs
    if opt.cp_load_path != "no":
        state, ckpt_epoch = restore_checkpoint(opt.cp_load_path, state)
        print(f"Successfully loaded checkpoint from {opt.cp_load_path} "
              f"(epoch {ckpt_epoch})")
        if ckpt_epoch and ckpt_epoch > 0 and start_epoch == 0:
            print(f"note: checkpoint is at epoch {ckpt_epoch} but "
                  "--start_epochs is 0 — weights are warmed and the epoch "
                  f"loop restarts at 1; to RESUME pass --start_epochs "
                  f"{ckpt_epoch} as well (reference cli.py:36-37,45-46)")

    # NOTE the tau convention: FullySup passes --temp as tau to the GL op
    # (reference FullySup.py:156) while the transductive eval uses --tau
    # (utils.py:651).  The optional MLP-head pretraining (FullySup.py:224-249)
    # runs below, after the eval harness is set up, so the reference's
    # epoch -1 pre-pretrain evaluation (FullySup.py:229-243) can precede it.

    # --device_data: the uint8 training set crosses the wire ONCE (stored
    # row-flattened so TPU tiling doesn't lane-pad the channel axis) and
    # every step gathers + augments its rows inside the jitted step
    # (data/device_aug.py) — per-step host->device traffic is index/label
    # vectors only, removing the relay wire floor
    # (benchmarks/probe_device_aug.py).
    device_data = bool(getattr(opt, "device_data", False))

    # --mesh: multi-device execution as a production path (SURVEY §2.3/§7;
    # replaces the reference's DataParallel encoder, utils.py:546-548, and
    # its single-CPU 60k transductive solve, utils.py:637-651).  The train
    # step shards the batch (and the graph head's node dimension) over the
    # mesh; the transductive eval routes large graphs through the edge
    # -partitioned halo-exchange solver.
    mesh = eval_mesh = None
    mesh_opt = str(getattr(opt, "mesh", "off"))
    grad_warn = getattr(opt, "grad_warn", 10.0) or None
    if mesh_opt != "off":
        n_visible = len(jax.devices())
        want = n_visible if mesh_opt == "auto" else int(mesh_opt)
        if want > 1:
            if n_visible < want:
                raise ValueError(f"--mesh {want} but only {n_visible} "
                                 "devices are visible")
            from ..parallel import make_mesh
            mesh = make_mesh(want, axes=("data", "graph"))
            # all devices on one 'graph' axis for the edge-partitioned
            # transductive eval (maximal node sharding)
            eval_mesh = make_mesh(want, axes=("graph",))
            print(f"mesh: {want} devices "
                  f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # batch/replicated converters for the step inputs.  Multi-process runs
    # must hand the jitted step GLOBAL arrays (a process-local committed
    # array cannot feed a computation spanning processes): every process
    # holds the identical host batch, so any addressable shard is served
    # by slicing the local copy.
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        _batch_shd = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        _repl_shd = NamedSharding(mesh, P())
        if multiproc:
            def _glob(a, sh):
                a = np.asarray(a)
                return jax.make_array_from_callback(a.shape, sh,
                                                    lambda idx: a[idx])
            conv_batch = lambda a: _glob(a, _batch_shd)
            conv_repl = lambda a: _glob(a, _repl_shd)
            conv_key = lambda k: np.asarray(k)

            def globalize_state(st):
                return jax.tree_util.tree_map(
                    lambda a: _glob(a, _repl_shd), st)
        else:
            # commit replicated inputs WITH the mesh sharding: an
            # uncommitted single-device array would be re-broadcast by the
            # jitted step's in_shardings on every call (fatal for the
            # ~150 MB resident dataset)
            conv_batch = jnp.asarray

            def conv_repl(a):
                # device arrays reshard on-device; np.asarray on them would
                # block on a device->host fetch on the step critical path
                if isinstance(a, jax.Array):
                    return jax.device_put(a, _repl_shd)
                return jax.device_put(np.asarray(a), _repl_shd)

            conv_key = lambda a: a

            def globalize_state(st):
                # a fresh create_train_state is UNCOMMITTED and the jitted
                # step's in_shardings would replicate it implicitly — but a
                # restored checkpoint (orbax) comes back COMMITTED to one
                # device, which is a hard error against mesh-sharded batch
                # inputs; re-place every array leaf with the replicated
                # mesh sharding (no-op cost for already-replicated leaves)
                return jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, _repl_shd)
                    if isinstance(a, (jax.Array, np.ndarray)) else a, st)

            # producer-thread puts land pre-sharded (batch-sharded train
            # batches, replicated base batches): the step's in_shardings
            # then match and neither a reshard copy nor a host round trip
            # sits on the critical path
            loader.device = _batch_shd
            loader.base_device = _repl_shd
    else:
        conv_batch = conv_repl = jnp.asarray
        conv_key = globalize_state = lambda a: a

    if device_data:
        data_flat = np.ascontiguousarray(
            spec.train_images.reshape(len(spec.train_labels), -1))
        # on a mesh the dataset is replicated (one bulk transfer per
        # device); conv_repl builds the global array in multi-process runs
        data_dev = (conv_repl(data_flat) if mesh is not None
                    else jax.device_put(data_flat))
        # the test split is also kept resident so the eval encode ships no
        # images either (evalx/harness.py encode_dataset_resident)
        test_flat = np.ascontiguousarray(
            spec.test_images.reshape(len(spec.test_labels), -1))
        test_dev = (conv_repl(test_flat) if mesh is not None
                    else jax.device_put(test_flat))
        dev_aug = DeviceTransform(sup_tf.dataset, sup_tf.mode)
        rng_order = np.random.default_rng(opt.seed * 7919 + 1)
        if mesh is not None:
            from .trainer import (make_sharded_gl_train_step_from_data,
                                  make_sharded_mlp_train_step_from_data)
            gl_step = make_sharded_gl_train_step_from_data(
                model, tx, num_classes, spec.image_shape, mesh, tau=opt.temp,
                epsilon=opt.epsilon, k=opt.knn_k, solver=opt.gl_solver,
                score_type=opt.gl_score_type, norm=step_norm, aug=dev_aug,
                grad_warn=grad_warn)
            mlp_step = make_sharded_mlp_train_step_from_data(
                model, tx, spec.image_shape, mesh, norm=step_norm,
                aug=dev_aug)
        else:
            gl_step = make_gl_train_step_from_data(
                model, tx, num_classes, spec.image_shape, tau=opt.temp,
                epsilon=opt.epsilon, k=opt.knn_k, solver=opt.gl_solver,
                score_type=opt.gl_score_type, norm=step_norm, aug=dev_aug,
                grad_warn=grad_warn)
            mlp_step = make_mlp_train_step_from_data(
                model, tx, spec.image_shape, norm=step_norm, aug=dev_aug)
    elif mesh is not None:
        from .trainer import (make_sharded_gl_train_step,
                              make_sharded_mlp_train_step)
        gl_step = make_sharded_gl_train_step(
            model, tx, num_classes, mesh, tau=opt.temp, epsilon=opt.epsilon,
            k=opt.knn_k, solver=opt.gl_solver, score_type=opt.gl_score_type,
            norm=step_norm, grad_warn=grad_warn)
        mlp_step = make_sharded_mlp_train_step(model, tx, mesh,
                                               norm=step_norm)
    else:
        gl_step = make_gl_train_step(model, tx, num_classes, tau=opt.temp,
                                     epsilon=opt.epsilon, k=opt.knn_k,
                                     solver=opt.gl_solver,
                                     score_type=opt.gl_score_type,
                                     norm=step_norm, grad_warn=grad_warn)
        mlp_step = make_mlp_train_step(model, tx, norm=step_norm)

    # --ds_stepsize strides ONLY the pool the INITIAL class-uniform base
    # sample is drawn from (reference: DSCustomDataset wraps the
    # no-transform `dataset` inside set_loader, utils.py:340-348, which
    # feeds sample_dataset; the train/test splits and later score-based
    # refreshes use the full data)
    if getattr(opt, "ds_stepsize", 1) > 1:
        from ..data import downsample_by_stride
        pool_imgs, pool_labels = downsample_by_stride(
            spec.train_images, spec.train_labels, opt.ds_stepsize)
        pool = ScoredDataset(spec, images=pool_imgs, labels=pool_labels)
        base_imgs, base_labels, base_sel = pool.select_base(
            opt.num_train, "random", rng_np, return_indices=True)
        # pool row i is full-train row i * stepsize (downsample_by_stride)
        base_sel = base_sel * opt.ds_stepsize
    else:
        base_imgs, base_labels, base_sel = ds.select_base(
            opt.num_train, "random", rng_np, return_indices=True)
    if device_data:
        base_idx_dev = conv_repl(np.asarray(base_sel))
        base_labels_dev = conv_repl(np.asarray(base_labels))
    # multi-process: promote the (replicated) train state to global arrays
    # once — step outputs stay global from here on
    state = globalize_state(state)
    records = {"loss": [], "train_acc": [], "test_acc": []}

    edges_per_step = 2 * (opt.num_train + opt.batch_size) * opt.knn_k

    def _host_state():
        """Multi-process: the per-batch eval steps run as LOCAL programs,
        so pull the (replicated) global state back to host arrays first;
        identity otherwise."""
        if not multiproc:
            return state
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a.addressable_data(0))
            if isinstance(a, jax.Array) else a, state)

    # cross-eval amortization: one cache across all of this run's
    # transductive evals (permutation reuse + sticky compiled shapes + CG
    # warm start; ops/transductive.py EvalGraphCache)
    from ..ops import EvalGraphCache
    eval_cache = (None if getattr(opt, "no_eval_cache", False)
                  else EvalGraphCache())

    def evaluate():
        # eval cadence mirrors FullySup.py:253-261/287-296: the gl branch
        # reports the transductive accuracy; the mlp branch also runs the
        # transductive eval (discarded, matching the reference's `_ =`) and
        # reports test_network with the MLP predictor
        # norm=(mean,std): uint8 eval transfers + device-side normalization
        # (the eval encode otherwise ships the full train+test sets as f32
        # through the ~55 MB/s relay link every eval)
        eval_norm = (eval_tf.mean, eval_tf.std)
        # --device_data: the eval encode runs over the RESIDENT train/test
        # sets (base features = a row gather of the train features at
        # base_sel) — zero per-eval image transfers.  Multi-process runs
        # keep BOTH production paths: the resident encode runs as a global
        # program over the replicated dataset + global state (index scalars
        # globalized via conv_repl), and large graphs route through the
        # edge-sharded solver on the global mesh — no single-host fallback.
        resident = ((data_dev, test_dev, base_sel, spec.image_shape)
                    if device_data else None)
        resident_global = device_data and multiproc
        st = state if resident_global else _host_state()
        tacc = test_gl_transductive(
            model, st, base_imgs, base_labels, spec.test_images,
            spec.test_labels, eval_tf.normalize, num_classes,
            train_images=spec.train_images, knn_num=50, epsilon=opt.epsilon,
            tau=opt.tau, norm=eval_norm, mesh=eval_mesh,
            shard_min_n=getattr(opt, "shard_eval_min_n", 20000),
            resident=resident, cache=eval_cache,
            globalize=conv_repl if resident_global else None)
        if opt.sup_train_type == "mlp":
            return test_network(
                model, _host_state(), base_imgs, base_labels,
                spec.test_images, spec.test_labels, num_classes,
                tau=opt.temp, epsilon=opt.epsilon, k=opt.knn_k,
                batch_size=min(opt.test_batch_size, len(spec.test_images)),
                solver=opt.gl_solver, predictor="MLP", norm=eval_norm)
        return tacc

    def feature_viz(save_dir):
        """Embed the TRAIN-split features into ``save_dir`` with the
        current base points appended and starred (reference FullySup.py
        :300-304 visualizes at EVERY plot interval into a ckpt_epoch_<N>/
        directory; visualize.py:96-139 loads the full train split and
        appends the base features).  The split is subsampled to
        ``--viz_max_n`` points because the host-side embedding fallback
        (sklearn t-SNE when umap is absent) is superlinear in n — a
        documented deviation (PARITY.md).  Best-effort — never fails the
        run."""
        cap = int(getattr(opt, "viz_max_n", 10000))
        if cap == 0:       # 0 = skip visualizations (negative = no cap)
            return
        try:
            from ..evalx import encode_dataset, visualize
            from ..evalx.harness import _cached_encode_step, _norm_key

            # cached factory: a fresh jit wrapper per interval would
            # re-trace the encoder every visualization (harness.py)
            encode_step = _cached_encode_step(
                model, _norm_key((eval_tf.mean, eval_tf.std)))
            st_v = _host_state()
            n_tr = len(spec.train_images)
            if n_tr > cap > 0:
                rng_v = np.random.default_rng(opt.seed + 733)
                sel = np.sort(rng_v.choice(n_tr, cap, replace=False))
            else:
                sel = np.arange(n_tr)
            train_f = encode_dataset(encode_step, st_v,
                                     spec.train_images[sel])
            base_f = encode_dataset(encode_step, st_v, base_imgs)
            feats = np.concatenate([train_f, base_f])
            labels_v = np.concatenate([spec.train_labels[sel], base_labels])
            base_mask = np.zeros(len(feats), bool)
            base_mask[len(train_f):] = True
            visualize(feats, labels_v, save_dir, base_mask, tsne=opt.TSNE)
        except Exception as e:  # visualization is best-effort observability
            print(f"visualization skipped: {e}")

    # epoch -1 eval BEFORE the MLP-head pretrain (FullySup.py:229-243):
    # only when pretraining actually runs, same as the reference
    if opt.sup_epochs > 0:
        records["test_acc"].append(evaluate())
        # pretrain on host-local state (multi-process: every process trains
        # an identical local copy — the pretrain loader batches are host
        # arrays), then re-promote to global arrays
        state = globalize_state(
            pretrain_linear(model, _host_state(), loader, opt, num_classes,
                            norm=step_norm))

    # epoch-0 eval (FullySup.py:255)
    records["test_acc"].append(evaluate())

    # device trace of one full epoch: GLL_PROFILE_DIR=/path GLL_PROFILE_EPOCH=2
    profile_dir = os.environ.get("GLL_PROFILE_DIR")
    profile_epoch = int(os.environ.get("GLL_PROFILE_EPOCH", "1"))

    for epoch in range(start_epoch + 1, opt.epochs + 1):
        t_epoch = time.time()
        losses, accs = AverageMeter(), AverageMeter()
        batch_time, data_time = AverageMeter(), AverageMeter()
        tput = Throughput(edges_per_step)
        end = time.time()
        # Metrics/scores come back as device futures; pulling them to host
        # every step would serialize on the device->host round trip (the
        # dominant per-step cost through the relay: ~340 ms synced vs
        # ~170 ms pipelined at the reference shape —
        # benchmarks/probe_step_overhead.py).  Defer the sync to print
        # boundaries / epoch end so consecutive steps pipeline.
        pending = []          # (metrics dict of device scalars, n_labels)
        pending_scores = []   # (dataset indices, device scores)

        def flush_metrics():
            if not pending:
                return
            # ONE stacked device->host fetch for the whole pending window:
            # fetching each scalar individually costs a relay round trip per
            # value (~3 ms dispatch floor each; 3x per step)
            stacked = np.asarray(jnp.stack(
                [jnp.stack([m["loss"], m["acc"],
                            m.get("params_finite", jnp.asarray(True))
                            .astype(jnp.float32)]) for m, _ in pending]))
            for (m, n_lab), row in zip(pending, stacked):
                losses.update(float(row[0]), n_lab)
                accs.update(float(row[1]), n_lab)
                # per-step param NaN sweep (FullySup.py:188-190); computed
                # on device inside the step, surfaced at flush boundaries
                if not bool(row[2]):
                    print("nan value")
            pending.clear()

        # one epoch's worth of re-augmented base batches, produced (and
        # device-transferred) one step ahead off the critical path; the
        # fixed count keeps the augmentation RNG stream identical to the
        # synchronous full_batch() path across base refreshes
        base_iter = (loader.base_batches(base_imgs, base_labels)
                     if opt.sup_train_type == "gl" and not device_data
                     else None)
        if device_data:
            # per-step host->device traffic: one index vector + one label
            # vector; images are gathered + augmented inside the step
            order = rng_order.permutation(len(ds))
            step_stream = ((order[i * opt.batch_size:
                                  (i + 1) * opt.batch_size], None,
                            ds.labels[order[i * opt.batch_size:
                                            (i + 1) * opt.batch_size]])
                           for i in range(len(loader)))
        else:
            step_stream = loader
        with trace_steps(profile_dir, enabled=epoch == profile_epoch):
            for idx, (indices, images, labels) in enumerate(step_stream):
                data_time.update(time.time() - end)
                step_key = jax.random.PRNGKey(opt.seed + epoch * 10000 + idx)
                if opt.sup_train_type == "gl":
                    if device_data:
                        state, metrics, scores = gl_step(
                            state, data_dev, base_idx_dev, base_labels_dev,
                            conv_repl(np.asarray(indices)),
                            conv_repl(np.asarray(labels)),
                            conv_key(step_key))
                    else:
                        base_x, base_y = next(base_iter)
                        state, metrics, scores = gl_step(
                            state, conv_repl(base_x), conv_repl(base_y),
                            conv_batch(images), conv_batch(labels),
                            conv_key(step_key))
                    if (epoch % opt.gl_update_base_epochs == 0
                            and opt.gl_update_base_mode == "score"):
                        pending_scores.append((indices, scores))
                elif device_data:
                    state, metrics = mlp_step(state, data_dev,
                                              conv_repl(np.asarray(indices)),
                                              conv_repl(np.asarray(labels)),
                                              conv_key(step_key))
                else:
                    state, metrics = mlp_step(
                        state, conv_batch(images), conv_batch(labels),
                        conv_key(step_key))
                pending.append((metrics, len(labels)))
                tput.step()
                batch_time.update(time.time() - end)
                end = time.time()
                if (idx + 1) % opt.print_freq_ss == 0:
                    flush_metrics()
                    print(f"Train: [{epoch}][{idx + 1}/{len(loader)}]\t"
                          f"BT {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                          f"DT {data_time.val:.3f} ({data_time.avg:.3f})\t"
                          f"loss {losses.val:.3f} ({losses.avg:.3f})\t"
                          f"edges/s {tput.edges_per_s:.3e}")
                    sys.stdout.flush()
                    end = time.time()

        flush_metrics()
        # score updates only feed the per-epoch base refresh below
        for s_indices, s_scores in pending_scores:
            ds.update_scores(s_indices, np.asarray(s_scores))

        records["loss"].append(losses.avg)
        records["train_acc"].append(accs.avg)
        print(f"epoch {epoch}, total time {time.time() - t_epoch:.2f}, "
              f"loss {losses.avg:.4f}, train acc {accs.avg:.4f}")

        # base refresh (FullySup.py:277-283)
        if (opt.sup_train_type == "gl"
                and epoch % opt.gl_update_base_epochs == 0):
            base_imgs, base_labels, base_sel = ds.select_base(
                opt.num_train, opt.gl_update_base_mode, rng_np,
                return_indices=True)
            if device_data:
                base_idx_dev = conv_repl(np.asarray(base_sel))
                base_labels_dev = conv_repl(np.asarray(base_labels))

        if epoch % opt.plot_freq_ss == 0 or epoch == opt.epochs:
            records["test_acc"].append(evaluate())
            save_checkpoint(os.path.join(opt.save_folder, "ckpt"), state,
                            epoch)
            # records/plots: primary-only in multi-process runs (every
            # process computes identical records, but concurrent np.save/
            # savefig to the shared save_folder would interleave/corrupt);
            # save_checkpoint stays all-process (orbax coordinates itself)
            if primary:
                _records_and_plots(opt.save_folder, records)
                # per-interval feature embedding (reference visualizes at
                # every plot interval, FullySup.py:300-304); the final
                # epoch's embedding lands in save_folder after the loop
                if epoch % opt.plot_freq_ss == 0 and epoch != opt.epochs:
                    feature_viz(os.path.join(opt.save_folder,
                                             f"ckpt_epoch_{epoch}"))

    save_checkpoint(os.path.join(opt.save_folder, "last"), state, opt.epochs)
    if primary:
        _records_and_plots(opt.save_folder, records)

    # final feature-embedding visualization into ckpt_epoch_<epochs>/
    # (reference FullySup.py:335-338 embeds the last model into that dir;
    # the in-loop interval at epoch == epochs is skipped above because this
    # call writes the identical artifact); base points starred
    if primary:
        feature_viz(os.path.join(opt.save_folder,
                                 f"ckpt_epoch_{opt.epochs}"))
    return records


def main(argv=None):
    opt = parse_option(argv)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    logger = FileLogger(os.path.join(opt.save_folder,
                                     f"output_record_{stamp}.txt"))
    sys.stdout = logger
    try:
        return run_training(opt)
    finally:
        sys.stdout = logger.terminal
        logger.close()


if __name__ == "__main__":
    main()
