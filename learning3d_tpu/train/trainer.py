"""Generic Trainer: jitted sharded steps, orbax checkpointing, logging.

Replaces the reference's 11 copy-pasted train/test scripts
(examples/train_*.py — argparse + IOStream + epoch loops + best-model
snapshotting, SURVEY.md §2.1). One instance covers every task via the
loss functions in train.tasks. The train step is jit-compiled once; with
a mesh, batches are sharded on the 'data' axis and XLA inserts the
gradient psum over ICI.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from learning3d_tpu.data.device_pipeline import batch_iterator, prefetch_to_device
from learning3d_tpu.parallel.mesh import make_mesh, shard_batch
from learning3d_tpu.train.config import TrainConfig
from learning3d_tpu.train.tasks import TASKS


class IOStream:
    """Append-to-file + stdout text logger (reference
    examples/train_pointnet.py:35-45)."""

    def __init__(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        self.f = open(path, "a")

    def cprint(self, text):
        print(text)
        self.f.write(text + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


def _dataset_version(ds, depth=4):
    """Distribution tag of the (possibly wrapped) dataset: walks the
    ``data_class``/``base`` chain for a ``version_tag()`` provider
    (SyntheticModelNet40). None for real/untagged datasets."""
    while ds is not None and depth > 0:
        if hasattr(ds, "version_tag"):
            return ds.version_tag()
        ds = getattr(ds, "data_class", getattr(ds, "base", None))
        depth -= 1
    return None


def _make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    if cfg.cosine_decay:
        sched = optax.cosine_decay_schedule(cfg.lr, cfg.epochs * max(steps_per_epoch, 1))
    else:
        sched = cfg.lr
    if cfg.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=cfg.momentum)
        if cfg.weight_decay:
            # torch SGD semantics: L2 term added to the gradient BEFORE
            # momentum (the original CurveNet recipe uses wd=1e-4)
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    else:
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay) if cfg.weight_decay else optax.adam(sched)
    # One fused flat-vector update instead of a chain of tiny per-leaf ops:
    # the profiled PointNet train step at B=256 is optimizer-dispatch-bound
    # once the encoder tail is fused (tools/profile_train.py). Identical
    # math — adam/sgd are elementwise, so raveling commutes with the update.
    return optax.flatten(tx)


class Trainer:
    def __init__(self, config: TrainConfig, model: nnx.Module, loss_fn=None, mesh=None,
                 augment_fn=None):
        self.cfg = config
        self.model = model
        self.loss_fn = loss_fn or TASKS[config.task]
        if loss_fn is None and config.task == "classification" and config.label_smoothing:
            import functools

            from learning3d_tpu.train import tasks as _tasks

            self.loss_fn = functools.partial(
                _tasks.classification, smoothing=config.label_smoothing
            )
        if loss_fn is None and config.task == "masknet":
            import functools

            from learning3d_tpu.train import tasks as _tasks

            self.loss_fn = functools.partial(
                _tasks.masknet, loss_fn=getattr(config, "masknet_loss", "bce")
            )
        if augment_fn is None and config.augment and config.task == "classification":
            from learning3d_tpu.data.device_pipeline import augment_classification_batch

            def augment_fn(k, batch):
                return (augment_classification_batch(k, batch[0]), *batch[1:])
        self.mesh = mesh if mesh is not None else make_mesh(shape=config.mesh_shape)
        self.key = jax.random.PRNGKey(config.seed)
        self.best_loss = float("inf")
        self.epoch = 0
        self._tx = None
        self.optimizer = None
        self.textio = IOStream(Path(config.ckpt_dir) / config.exp_name / "run.log")
        self.writer = None
        try:  # tensorboard scalars, like the reference's SummaryWriter
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(
                logdir=str(Path(config.ckpt_dir) / config.exp_name / "tb")
            )
        except Exception:
            pass

        loss_fn_ = self.loss_fn
        if getattr(config, "remat", False):
            # jax.checkpoint (nnx lifting): the backward pass recomputes the
            # forward instead of holding every activation — HBM for FLOPs,
            # same update (pinned by tests/test_data_train.py). The lambda
            # pins the arity: nnx.remat would otherwise trace default
            # kwargs (e.g. classification's python-float `smoothing`).
            base_loss_fn = loss_fn_
            loss_fn_ = nnx.remat(lambda m, b, k: base_loss_fn(m, b, k))
        accum = max(int(getattr(config, "accum_steps", 1) or 1), 1)

        clip = float(getattr(config, "grad_clip_norm", 0.0) or 0.0)
        skip_nonfinite = bool(getattr(config, "skip_nonfinite", True))

        def guard_grads(grads):
            """Global-norm clip + non-finite step skip (zero the update so
            params stay finite; Adam moments decay one step, which is the
            standard optax.apply_if_finite trade-off)."""
            if clip <= 0.0 and not skip_nonfinite:
                return grads
            leaves = jax.tree.leaves(grads)
            sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
            gnorm = jnp.sqrt(sq)
            scale = jnp.float32(1.0)
            if clip > 0.0:
                scale = jnp.minimum(scale, clip / jnp.maximum(gnorm, 1e-12))
            ok = jnp.isfinite(gnorm) if skip_nonfinite else jnp.bool_(True)

            def fix(g):
                g32 = g.astype(jnp.float32) * scale
                # nan*0 == nan: non-finite steps must be where'd out, not scaled
                g32 = jnp.where(ok, g32, jnp.zeros_like(g32))
                return g32.astype(g.dtype)

            return jax.tree.map(fix, grads)

        @nnx.jit
        def train_step(model, optimizer, batch, key):
            if augment_fn is not None:  # fused into the jitted step
                ka, key = jax.random.split(key)
                batch = augment_fn(ka, batch)

            if accum == 1:
                def lf(m):
                    return loss_fn_(m, batch, key)

                (loss, aux), grads = nnx.value_and_grad(lf, has_aux=True)(model)
                optimizer.update(model, guard_grads(grads))
                return loss, aux

            # gradient accumulation: split the batch into `accum` equal
            # microbatches along axis 0 and average the grads before ONE
            # optimizer update. Equal microbatches keep mean-reduced losses
            # exactly equivalent to the full-batch step (mean of means);
            # BN batch stats update once per microbatch, as they would if
            # the microbatch were the physical batch.
            micro = jax.tree.map(
                lambda a: a.reshape((accum, a.shape[0] // accum) + a.shape[1:]),
                batch,
            )
            keys = jax.random.split(key, accum)
            loss = grads = aux = None
            for i in range(accum):
                mb = jax.tree.map(lambda a: a[i], micro)

                def lf(m, mb=mb, k=keys[i]):
                    return loss_fn_(m, mb, k)

                (li, ai), gi = nnx.value_and_grad(lf, has_aux=True)(model)
                loss = li if loss is None else loss + li
                aux = ai if aux is None else jax.tree.map(lambda a, b: a + b, aux, ai)
                grads = gi if grads is None else jax.tree.map(lambda a, b: a + b, grads, gi)
            inv = 1.0 / accum
            loss = loss * inv
            aux = jax.tree.map(lambda a: a * inv if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, aux)
            grads = jax.tree.map(lambda a: a * inv, grads)
            optimizer.update(model, guard_grads(grads))
            return loss, aux

        @nnx.jit
        def eval_step(model, batch, key):
            return loss_fn_(model, batch, key)

        self._train_step = train_step
        self._eval_step = eval_step

    # -- checkpointing ------------------------------------------------
    def _ckpt_path(self, name):
        return Path(self.cfg.ckpt_dir).resolve() / self.cfg.exp_name / name

    def save(self, name="latest"):
        """Snapshot model + optimizer + progress, like the reference's
        ``snap`` dict (examples/train_pointnet.py:132-142, which restores
        model AND optimizer on --resume)."""
        import orbax.checkpoint as ocp

        path = self._ckpt_path(name)
        with ocp.StandardCheckpointer() as ck:
            state = nnx.state(self.model)
            ck.save(path / "model", state, force=True)
            if self.optimizer is not None:
                ck.save(path / "opt", nnx.state(self.optimizer), force=True)
        meta = {"epoch": self.epoch, "best_loss": self.best_loss}
        if getattr(self, "dataset_version", None):
            # synthetic-dataset distribution tag (ADVICE r3): evals against
            # checkpoints trained on a different version are not comparable
            meta["dataset_version"] = self.dataset_version
        (path / "meta.json").parent.mkdir(parents=True, exist_ok=True)
        (path / "meta.json").write_text(json.dumps(meta))

    def load(self, name="latest"):
        import orbax.checkpoint as ocp

        path = self._ckpt_path(name)
        with ocp.StandardCheckpointer() as ck:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), nnx.state(self.model)
            )
            state = ck.restore(path / "model", abstract)
            opt_state = None
            if self.optimizer is not None and (path / "opt").exists():
                abstract_opt = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    nnx.state(self.optimizer),
                )
                opt_state = ck.restore(path / "opt", abstract_opt)
        nnx.update(self.model, state)
        if opt_state is not None:
            nnx.update(self.optimizer, opt_state)
        meta = json.loads((path / "meta.json").read_text())
        self.epoch = meta["epoch"]
        self.best_loss = meta["best_loss"]

    def export_feature_model(self, name="feature_model", attr="feature_model"):
        """Save just the encoder for transfer (the reference's ptnet export,
        train_pointnet.py:138 consumed by PointNetLK)."""
        import orbax.checkpoint as ocp

        sub = getattr(self.model, attr)
        with ocp.StandardCheckpointer() as ck:
            ck.save(self._ckpt_path(name) / "model", nnx.state(sub), force=True)

    # -- loops --------------------------------------------------------
    def _epoch(self, dataset, train: bool):
        step_fn = self._train_step if train else self._eval_step
        self.model.train() if train else self.model.eval()
        if hasattr(dataset, "set_epoch"):
            # fresh registration pairs per TRAIN epoch (torch DataLoader
            # semantics — see RegistrationData.set_epoch); eval always
            # pins epoch 0 so metrics stay comparable across runs even
            # when the same dataset object was previously advanced by a
            # training pass (e.g. evaluating the train split post-fit).
            dataset.set_epoch(self.epoch if train else 0)
        # Queue every step asynchronously and fetch once at epoch end —
        # a per-step float() costs a full host round-trip (tens of ms on
        # tunneled TPU attachments), which would dominate the step time.
        losses, auxes, count = [], [], 0
        # batch assembly + device_put run on a prefetch thread; the main
        # thread only dispatches compute (reference: DataLoader workers)
        it = prefetch_to_device(
            batch_iterator(
                dataset, self.cfg.batch_size, shuffle=train, seed=self.cfg.seed + self.epoch
            ),
            put=lambda b: shard_batch(self.mesh, b),
        )
        for batch in it:
            self.key, sub = jax.random.split(self.key)
            if train:
                loss, aux = step_fn(self.model, self.optimizer, batch, sub)
            else:
                loss, aux = step_fn(self.model, batch, sub)
            losses.append(loss)
            auxes.append(aux)
            count += 1
        n = max(count, 1)
        tot_loss = sum(float(l) for l in losses) / n
        tot_aux = {}
        for aux in auxes:
            for k, v in aux.items():
                tot_aux[k] = tot_aux.get(k, 0.0) + float(np.mean(np.asarray(v))) / n
        return tot_loss, tot_aux

    def fit(self, train_data, test_data=None, epochs=None):
        epochs = self.cfg.epochs if epochs is None else epochs
        self.dataset_version = _dataset_version(train_data)
        steps = max(len(train_data) // self.cfg.batch_size, 1)
        if self.optimizer is None:
            self._tx = _make_optimizer(self.cfg, steps)
            self.optimizer = nnx.Optimizer(self.model, self._tx, wrt=nnx.Param)
        if self.cfg.resume:
            self.load(self.cfg.resume)
        start = self.epoch
        cur = int(getattr(self.cfg, "curriculum_epochs", 0) or 0)
        metric = getattr(self.cfg, "best_metric", "loss") or "loss"
        for ep in range(start, epochs):
            self.epoch = ep
            if cur > 0 and hasattr(train_data, "set_difficulty"):
                # ramp 0.2 -> 1.0 over the first `cur` epochs, then full
                train_data.set_difficulty(min(1.0, 0.2 + 0.8 * ep / cur))
            t0 = time.time()
            train_loss, train_aux = self._epoch(train_data, train=True)
            msg = f"epoch {ep}: train_loss={train_loss:.6f}"
            if test_data is not None:
                test_loss, test_aux = self._epoch(test_data, train=False)
                msg += f" test_loss={test_loss:.6f}"
                for k, v in {**test_aux}.items():
                    msg += f" {k}={v:.4f}"
                score = test_loss if metric == "loss" else test_aux.get(metric, test_loss)
                if score < self.best_loss:
                    self.best_loss = score
                    self.save("best")
            for k, v in train_aux.items():
                msg += f" train_{k}={v:.4f}"
            msg += f" ({time.time() - t0:.1f}s)"
            self.textio.cprint(msg)
            if self.writer is not None:
                self.writer.add_scalar("train/loss", train_loss, ep)
                for k, v in train_aux.items():
                    self.writer.add_scalar(f"train/{k}", v, ep)
                if test_data is not None:
                    self.writer.add_scalar("test/loss", test_loss, ep)
                    self.writer.add_scalar("test/best_loss", self.best_loss, ep)
                    for k, v in test_aux.items():
                        self.writer.add_scalar(f"test/{k}", v, ep)
            if (ep + 1) % self.cfg.save_every == 0:
                self.save("latest")
        return self.best_loss

    def evaluate(self, test_data):
        return self._epoch(test_data, train=False)
