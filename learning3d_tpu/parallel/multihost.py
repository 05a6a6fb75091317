"""Multi-host (DCN) entry point.

The reference has no distributed story (SURVEY.md §2.3); here multi-host
training is the same mesh code over more devices: call
``initialize_multihost()`` once per process before any jax op, then build
meshes with ``make_mesh`` as usual — ICI inside each slice, DCN across
slices, with XLA routing collectives appropriately.

This module is exercised in single-process form by the test suite (the
virtual 8-device mesh); real multi-host runs need the coordinator env
(JAX_COORDINATOR_ADDRESS etc. or TPU pod metadata) that jax.distributed
auto-detects on Cloud TPU pods.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Wire this process into the jax.distributed runtime. No-op when the
    runtime is already initialized; explicit coordinator failures raise.

    Must run before anything initializes the backend — even
    ``jax.process_count()`` counts, so don't probe devices first.
    """
    if jax.distributed.is_initialized():
        return
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()  # auto-detect (TPU pod metadata)
    except (ValueError, RuntimeError):
        if coordinator_address is not None:
            raise  # an explicit coordinator that fails is an error
        # auto-detect found no cluster env: stay single-process


def global_mesh(axes=("data", "model"), model_parallel=1):
    """A mesh over ALL processes' devices: data-parallel across hosts
    (DCN) x model-parallel inside the slice (ICI)."""
    from learning3d_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    if len(axes) == 1:
        shape = (n,)
    else:
        shape = (n // model_parallel, model_parallel) + (1,) * (len(axes) - 2)
    return make_mesh(axes, shape)


def is_primary():
    return jax.process_index() == 0
