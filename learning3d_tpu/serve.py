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


def rotation_starts(n_starts: int = 8):
    """Deterministic coarse cover of SO(3) for multi-start registration:
    the first ``n_starts`` elements of the 24-rotation octahedral group
    (all signed 3x3 permutation matrices with det +1), greedily ordered
    for spread — identity first, then farthest-point ordering in the
    geodesic metric. Max n_starts is 24.

    Why this grid: chamfer-trained iterative registration has wrong-pose
    attractors 40-180 deg from the ground truth
    (tools/diagnose_ipcrnet_attractor.py); a coarse deterministic cover
    guarantees some start lands the composed problem inside the correct
    basin.

    SELECTION LIMIT (measured, tools/diagnose_multistart_selection.py):
    picking the winner by chamfer is only reliable when the model is
    WELL-CONVERGED in its basin. For a weak model (r4b_ipcrnet, ~20 deg
    mean in-basin error) a well-refined 180-deg symmetry pose out-scores
    a 30-50-deg-misaligned correct pose under EVERY chamfer norm tested
    (mean-sqrt / mean-squared / p90 / max), so multi-start degrades
    aggregate rotation metrics there (19.5 -> 29.6 deg on the probe set)
    even though it also rescues genuine attractor escapes (18 -> 3.5
    deg on individual items). Use it on converged models, or treat the
    per-item ``chamfer``/``start_idx`` outputs as a confidence signal.
    """
    if not 1 <= n_starts <= 24:
        raise ValueError("n_starts must be in [1, 24] (octahedral rotation group)")
    import itertools

    rots = []
    for perm in itertools.permutations(range(3)):
        for signs in itertools.product((1.0, -1.0), repeat=3):
            R = np.zeros((3, 3), np.float32)
            for i, (j, s) in enumerate(zip(perm, signs)):
                R[i, j] = s
            if np.linalg.det(R) > 0:
                rots.append(R)
    rots = np.stack(rots)  # (24, 3, 3)
    # farthest-point ordering, seeded at the identity
    order = [int(np.argmax([np.trace(R) for R in rots]))]
    rest = [i for i in range(len(rots)) if i != order[0]]
    while rest and len(order) < n_starts:
        # geodesic distance ~ arccos((tr(Ra^T Rb) - 1) / 2); trace is monotone
        dmin = [
            min(np.trace(rots[a].T @ rots[b]) for b in order) for a in rest
        ]  # larger trace = closer — pick the SMALLEST max-trace (farthest)
        nxt = rest[int(np.argmin(dmin))]
        order.append(nxt)
        rest.remove(nxt)
    return jnp.asarray(rots[order[:n_starts]])


def multistart_register(model, template, source, rotations):
    """Multi-start registration: fold K coarse initial rotations into the
    batch axis (one forward at batch K*B — TPU-friendly: the MXU sees one
    bigger matmul, not K small ones), then pick per item the start whose
    composed transform gives the lowest symmetric chamfer.

    model:     any registration model returning {"est_T": (B, 4, 4)}
               (est_T maps source -> template); ``forward_arg_order``
               is honored (PRNet takes (source, template)).
    template:  (B, N, 3) or (B, N, 6) with normals
    source:    (B, M, 3) or (B, M, 6)
    rotations: (K, 3, 3) initial rotations (see ``rotation_starts``),
               applied about each source's centroid before the forward.

    Returns {"est_T": (B, 4, 4) composed best transform,
             "start_idx": (B,) winning start, "chamfer": (B,) its score}.
    Jittable; no data-dependent control flow.
    """
    from learning3d_tpu.kernels.chamfer import chamfer_distance

    Rs = jnp.asarray(rotations, template.dtype)
    K = Rs.shape[0]
    B = template.shape[0]
    xyz = source[..., :3]
    c = xyz.mean(axis=1)  # (B, 3) rotate about the source centroid so the
    # pre-rotated cloud stays inside the translation range the model saw
    rot = jnp.einsum("kij,bmj->kbmi", Rs, xyz - c[:, None, :]) + c[None, :, None, :]
    if source.shape[-1] > 3:  # carry normals through the pre-rotation
        nrm = jnp.einsum("kij,bmj->kbmi", Rs, source[..., 3:6])
        rot = jnp.concatenate([rot, nrm], axis=-1)
    src_k = rot.reshape((K * B,) + rot.shape[2:])
    tmpl_k = jnp.broadcast_to(template[None], (K,) + template.shape).reshape(
        (K * B,) + template.shape[1:]
    )
    order = getattr(model, "forward_arg_order", "template_source")
    out = model(src_k, tmpl_k) if order == "source_template" else model(tmpl_k, src_k)
    est = out["est_T"].reshape(K, B, 4, 4)
    # pre-rotation as a 4x4: G_k x = R_k (x - c) + c
    Gt = c[None] - jnp.einsum("kij,bj->kbi", Rs, c)  # (K, B, 3)
    G = jnp.zeros((K, B, 4, 4), est.dtype)
    G = G.at[..., :3, :3].set(jnp.broadcast_to(Rs[:, None], (K, B, 3, 3)))
    G = G.at[..., :3, 3].set(Gt)
    G = G.at[..., 3, 3].set(1.0)
    total = est @ G  # maps the ORIGINAL source -> template
    moved = (
        jnp.einsum("kbij,bmj->kbmi", total[..., :3, :3], xyz)
        + total[..., :3, 3][:, :, None, :]
    )
    t_flat = jnp.broadcast_to(
        template[None, ..., :3], (K, B) + template.shape[1:-1] + (3,)
    ).reshape(K * B, template.shape[1], 3)
    d1, d2 = chamfer_distance(t_flat, moved.reshape(K * B, -1, 3))
    score = 0.5 * (
        jnp.mean(jnp.sqrt(jnp.maximum(d1, 1e-12)), axis=-1)
        + jnp.mean(jnp.sqrt(jnp.maximum(d2, 1e-12)), axis=-1)
    ).reshape(K, B)
    k_star = jnp.argmin(score, axis=0)  # (B,)
    pick = jnp.take_along_axis(total, k_star[None, :, None, None], axis=0)[0]
    return {
        "est_T": pick,
        "start_idx": k_star,
        "chamfer": jnp.min(score, axis=0),
    }


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
