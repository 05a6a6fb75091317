"""On-device batch pipeline — where the TPU-native throughput lives.

The reference does per-item scipy/numpy transforms in DataLoader worker
processes (dataloaders.py:290-330). Here the host only yields contiguous
batches of raw clouds; rotation/jitter/pair synthesis run *inside* the
jitted train step from a batched PRNG key (SURVEY.md §7 stage 7), so
augmentation is fused with the model computation and never touches the
host after the initial transfer.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from learning3d_tpu.ops import transforms


def batch_iterator(dataset, batch_size, *, shuffle=True, seed=0, drop_last=True, epochs=None):
    """Minimal host batch iterator over an indexable dataset returning
    stacked numpy batches. Replaces torch DataLoader for this stack."""
    n = len(dataset)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.random.default_rng(seed + epoch).permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_last else n
        for start in range(0, stop, batch_size):
            idx = order[start : start + batch_size]
            items = [dataset[int(i)] for i in idx]
            yield tuple(np.stack([it[j] for it in items]) for j in range(len(items[0])))
        epoch += 1
        if epochs is None:
            return  # single pass by default; loop externally per epoch


def prefetch_to_device(iterator, put=None, size=2):
    """Double-buffered background prefetch: batch assembly (the
    ``dataset[i]`` numpy work) and the host->device transfer happen on a
    worker thread while the main thread dispatches compute — the role of
    the reference's ``DataLoader(num_workers=4)``
    (examples/train_pointnet.py:215), without fork overhead.

    ``put`` maps a host batch to device arrays (e.g.
    ``lambda b: shard_batch(mesh, b)``); None transfers lazily at use.
    ``size`` bounds the number of in-flight batches.
    """
    import queue
    import threading

    q = queue.Queue(maxsize=max(size, 1))
    sentinel = object()
    errors = []

    def worker():
        try:
            for item in iterator:
                q.put(item if put is None else put(item))
        except BaseException as e:  # surfaced on the consumer thread
            errors.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if errors:
                raise errors[0]
            return
        yield item


_SAMPLERS = {
    "PCRNet": lambda key, t: transforms.apply_pose7(
        transforms.random_pose7(key, t.shape[0]), t
    ),
    "iPCRNet": lambda key, t: transforms.apply_pose7(
        transforms.random_pose7(key, t.shape[0]), t
    ),
    "PointNetLK": lambda key, t: transforms.pnlk_transform(key, t, 0.8, True),
    "RPMNet": lambda key, t: transforms.rpmnet_transform(key, t, 0.8, True),
    "DCP": transforms.dcp_transform,
    "PRNet": transforms.dcp_transform,
    "DeepGMR": transforms.deepgmr_transform,
}


def make_registration_batch(key, template, algorithm="DCP", noise=False):
    """Synthesize (template, source, igt) on device for a (B, N, 3[+3])
    template batch — the jit-fusable equivalent of RegistrationData.
    igt maps template -> source."""
    k_t, k_n = jax.random.split(key)
    sampler = _SAMPLERS[algorithm]
    if algorithm == "RPMNet":
        source, igt = sampler(k_t, template)
    else:
        source, igt = sampler(k_t, template[..., :3])
    if noise:
        source = source.at[..., :3].set(
            transforms.jitter_pointcloud(k_n, source[..., :3])
        )
    return template, source, igt


def augment_classification_batch(key, points, rotate=True, jitter=True, scale=True):
    """Standard train-time augmentation for classification, fully on
    device: random z-rotation, anisotropic scale, gaussian jitter."""
    kr, kj, ks = jax.random.split(key, 3)
    B = points.shape[0]
    if rotate:
        theta = jax.random.uniform(kr, (B,), minval=0.0, maxval=2 * jnp.pi)
        c, s = jnp.cos(theta), jnp.sin(theta)
        zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
        R = jnp.stack(
            [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
        ).reshape(B, 3, 3)
        points = jnp.einsum("bij,bnj->bni", R, points)
    if scale:
        sc = jax.random.uniform(ks, (B, 1, 3), minval=0.8, maxval=1.25)
        points = points * sc
    if jitter:
        points = points + jnp.clip(
            0.01 * jax.random.normal(kj, points.shape), -0.05, 0.05
        )
    return points
