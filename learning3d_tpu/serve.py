"""Batched inference engine — the serving-side counterpart of the
training Trainer.

The reference has no serving story (its examples loop a DataLoader over a
checkpointed model, e.g. /root/reference/examples/test_pointnet.py:25-60).
For production TPU serving the hot rules are: static shapes (one XLA
program per shape bucket, compiled once and cached), full batches (pad the
tail request up to the bucket so the MXU always sees the same tiles), and
no host↔device chatter inside the loop (one device_put in, one fetch out).

``InferenceEngine`` wraps any eval-mode nnx model:

    engine = InferenceEngine(model, batch_size=256)
    probs = engine(points)                # numpy (n, ...) any n
    out   = engine(template, source)      # registration models: dict out

* inputs of arbitrary leading size are split into full ``batch_size``
  chunks plus one padded tail; outputs are concatenated and the padding
  stripped, for dict results too (registration models return dicts of
  batched arrays — SURVEY.md §1's result-dict convention).
* the jitted callable is cached per (n_args, point-count) bucket, so a
  deployment serving 512- and 1024-point clouds compiles exactly twice.
* with ``mesh=``, batches are sharded over the 'data' axis (pjit handles
  the rest) — the multi-chip path is the same code.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu.parallel.mesh import shard_batch


def export_model(model: nnx.Module, *example_inputs, path: str | None = None):
    """Serialize an eval-mode model to a portable StableHLO artifact
    (jax.export): weights baked in, loadable and runnable WITHOUT the
    model's Python code — the deployment hand-off a production service
    wants. Returns the serialized bytes (and writes them to ``path``).

    Load side: ``run = load_model(path_or_bytes); run(points)``.
    """
    from jax import export as jexport

    model.eval()
    graphdef, state = nnx.split(model)

    def fn(*args):
        return nnx.merge(graphdef, state)(*args)

    specs = [
        jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype) for a in example_inputs
    ]
    exported = jexport.export(jax.jit(fn))(*specs)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_model(path_or_bytes):
    """Deserialize an `export_model` artifact into a callable."""
    from jax import export as jexport

    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return lambda *args: exported.call(*args)


class InferenceEngine:
    def __init__(self, model, batch_size: int = 256, mesh=None,
                 output_key: str | None = None):
        if isinstance(model, nnx.Module):
            model.eval()
            self._graphdef, self._state = nnx.split(model)
        else:
            # callable pytree, e.g. quant.QuantPointNetClassifier — the
            # int8 serving configuration drops straight into the engine
            self._graphdef = None
            self._state = model
        self.batch_size = int(batch_size)
        self.mesh = mesh
        self.output_key = output_key
        self._compiled = {}

    def _fn(self, n_args):
        if n_args not in self._compiled:
            graphdef = self._graphdef

            if graphdef is None:

                @jax.jit
                def run(state, *args):
                    return state(*args)

            else:

                @jax.jit
                def run(state, *args):
                    return nnx.merge(graphdef, state)(*args)

            self._compiled[n_args] = run
        return self._compiled[n_args]

    def __call__(self, *inputs):
        """inputs: numpy/jax arrays with a shared leading dimension n.
        Returns numpy array(s) with leading dimension n (dict results stay
        dicts). n may be anything; the tail chunk is zero-padded to the
        bucket and the padding stripped from the output."""
        inputs = [np.asarray(a) for a in inputs]
        n = inputs[0].shape[0]
        if any(a.shape[0] != n for a in inputs):
            raise ValueError("inputs must share the leading (batch) dimension")
        run = self._fn(len(inputs))
        bs = self.batch_size
        pieces = []
        for lo in range(0, n, bs):
            chunk = [a[lo : lo + bs] for a in inputs]
            got = chunk[0].shape[0]
            if got < bs:  # pad the tail to keep the compiled shape
                chunk = [np.concatenate([c, np.zeros((bs - got,) + c.shape[1:], c.dtype)]) for c in chunk]
            if self.mesh is not None:
                chunk = [shard_batch(self.mesh, c) for c in chunk]
            out = run(self._state, *chunk)
            out = jax.tree.map(lambda a: np.asarray(a[:got]), out)
            pieces.append(out)
        if len(pieces) == 1:
            out = pieces[0]
        else:
            out = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *pieces)
        if self.output_key is not None and isinstance(out, dict):
            return out[self.output_key]
        return out


class TemplateRegistrar:
    """One-template-many-sources registration serving.

    The dominant production registration pattern (localize scans against a
    reference model) keeps the template fixed across requests. For models
    exposing ``encode()``/``register_encoded()`` (DCP, models/dcp.py) the
    template's encoder pass — ~2.65 ms of DCP's ~15 ms forward — is
    computed ONCE here and broadcast inside the jitted program, so every
    request pays only source-encode + pointer + head.

        reg = TemplateRegistrar(dcp_model, template_cloud, batch_size=32)
        out = reg(sources)          # (n, N, 3) any n -> dict, est_* maps
                                    # each source onto the cached template

    Works with the int8 serving clone too (quant.quantize_dcp output).
    """

    def __init__(self, model, template, batch_size: int = 32):
        model.eval()
        self._graphdef, self._state = nnx.split(model)
        self.batch_size = int(batch_size)
        t = jnp.asarray(np.asarray(template), jnp.float32)
        if t.ndim == 2:
            t = t[None]
        if t.ndim != 3 or t.shape[0] != 1:
            raise ValueError("template must be one (N, 3) cloud")
        graphdef = self._graphdef

        @jax.jit
        def enc(state, t):
            return nnx.merge(graphdef, state).encode(t)

        self._template = t
        self._temb = enc(self._state, t)  # (1, N, E) cached encoder pass

        @jax.jit
        def reg(state, template, temb, source):
            m = nnx.merge(graphdef, state)
            b = source.shape[0]
            return m.register_encoded(
                jnp.broadcast_to(template, (b,) + template.shape[1:]),
                jnp.broadcast_to(temb, (b,) + temb.shape[1:]),
                source,
            )

        self._reg = reg

    def __call__(self, sources):
        sources = np.asarray(sources, np.float32)
        if sources.ndim == 2:
            sources = sources[None]
        n = sources.shape[0]
        bs = self.batch_size
        pieces = []
        for lo in range(0, n, bs):
            chunk = sources[lo : lo + bs]
            got = chunk.shape[0]
            if got < bs:  # pad the tail to keep the compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - got,) + chunk.shape[1:], chunk.dtype)]
                )
            out = self._reg(self._state, self._template, self._temb, chunk)
            pieces.append(jax.tree.map(lambda a: np.asarray(a[:got]), out))
        if len(pieces) == 1:
            return pieces[0]
        return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *pieces)
