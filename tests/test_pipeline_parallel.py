"""GPipe pipeline parallelism: pipelined == sequential, and differentiable."""

import numpy as np

import jax
import jax.numpy as jnp

from learning3d_tpu.parallel.mesh import make_mesh
from learning3d_tpu.parallel.pipeline import pipeline_apply


def _mlp_stage(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _stack(S, width, key):
    kw, kb = jax.random.split(key)
    return {
        "w": 0.3 * jax.random.normal(kw, (S, width, width)),
        "b": 0.01 * jax.random.normal(kb, (S, width)),
    }


def _sequential(params, x):
    S = params["w"].shape[0]
    for s in range(S):
        x = _mlp_stage(jax.tree.map(lambda a, s=s: a[s], params), x)
    return x


class TestPipelineParallel:
    def test_matches_sequential(self):
        S, width, B = 4, 16, 8
        mesh = make_mesh(("stage",), (S,), jax.devices()[:S])
        params = _stack(S, width, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, width))

        got = pipeline_apply(_mlp_stage, params, x, mesh, axis="stage")
        want = _sequential(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_more_microbatches_than_stages(self):
        S, width, B = 2, 8, 12
        mesh = make_mesh(("stage",), (S,), jax.devices()[:S])
        params = _stack(S, width, jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(3), (B, width))
        got = pipeline_apply(
            _mlp_stage, params, x, mesh, axis="stage", num_microbatches=6
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_sequential(params, x)), atol=1e-6
        )

    def test_backward_pipelines(self):
        """grad through the schedule == grad through the sequential stack
        (ppermute transposes; the backward pass is itself pipelined)."""
        S, width, B = 4, 8, 8
        mesh = make_mesh(("stage",), (S,), jax.devices()[:S])
        params = _stack(S, width, jax.random.PRNGKey(4))
        x = jax.random.normal(jax.random.PRNGKey(5), (B, width))

        def loss_pipe(p):
            return jnp.sum(pipeline_apply(_mlp_stage, p, x, mesh, axis="stage") ** 2)

        def loss_seq(p):
            return jnp.sum(_sequential(p, x) ** 2)

        g1 = jax.grad(loss_pipe)(params)
        g2 = jax.grad(loss_seq)(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            g1,
            g2,
        )
