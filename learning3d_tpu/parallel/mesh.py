"""Device mesh construction + sharding helpers.

Replaces the reference's single ``nn.DataParallel`` call
(examples/train_flownet.py:243-245) with first-class JAX sharding: a
('data', 'model') mesh over ICI, NamedSharding rules for batches and
parameters, and helpers to tensor-shard wide MLP weights on the 'model'
axis. Multi-host extends the same mesh over DCN via
jax.distributed.initialize (the mesh axes don't change).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes=("data", "model"), shape=None, devices=None):
    """Build a Mesh over the available devices.

    shape=None puts all devices on the first axis (pure DP). Pass e.g.
    shape=(4, 2) for a 4-way-data x 2-way-model mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh, ndim=3, axis="data"):
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis="data"):
    """device_put every array in a (nested) batch with the batch axis
    sharded over ``axis``."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, batch)


def shard_module_params(mesh, state, min_size=2**18, axis="model"):
    """Tensor-shard large 2-D kernels across the 'model' axis, replicate
    everything else. Applied to an nnx.State / pytree of arrays; returns
    the same pytree device_put with NamedShardings.

    Sharding rule: a kernel (in, out) with out divisible by the axis size
    and total size >= min_size is split on its output dim (column-parallel
    — activations stay batch-sharded, XLA inserts the psum where layers
    reduce). Everything smaller is replicated: for this model family the
    MXU tiles are small enough that pure DP is usually optimal; the rule
    exists for the large-emb_dims regime.
    """
    n_shard = mesh.shape[axis]

    def rule(x):
        if (
            hasattr(x, "ndim")
            and x.ndim == 2
            and x.size >= min_size
            and x.shape[1] % n_shard == 0
            and n_shard > 1
        ):
            return NamedSharding(mesh, P(None, axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, rule(x)), state)
