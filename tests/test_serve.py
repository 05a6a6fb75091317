"""InferenceEngine: chunking/padding/jit-cache serving wrapper."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from learning3d_tpu import models
from learning3d_tpu.serve import InferenceEngine


class TestInferenceEngine:
    def test_classifier_chunks_match_direct(self):
        pn = models.PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0))
        model = models.Classifier(pn, num_classes=4, rngs=nnx.Rngs(1))
        model.eval()
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (21, 32, 3)))

        engine = InferenceEngine(model, batch_size=8)
        got = engine(x)
        assert got.shape == (21, 4)
        want = np.asarray(model(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)
        # one compile per arity: a second ragged call reuses the program
        assert len(engine._compiled) == 1
        engine(x[:3])
        assert len(engine._compiled) == 1

    def test_registration_dict_output(self):
        pn = models.PointNet(emb_dims=32, use_bn=False, rngs=nnx.Rngs(0))
        model = models.iPCRNet(pn, rngs=nnx.Rngs(1))
        model.eval()
        t = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (5, 24, 3)))
        s = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (5, 24, 3)))

        engine = InferenceEngine(model, batch_size=2)
        out = engine(t, s)
        assert out["est_T"].shape == (5, 4, 4)
        assert out["transformed_source"].shape == (5, 24, 3)
        want = jax.tree.map(np.asarray, model(jnp.asarray(t), jnp.asarray(s)))
        np.testing.assert_allclose(out["est_T"], want["est_T"], atol=1e-4)

        est_t = InferenceEngine(model, batch_size=2, output_key="est_T")(t, s)
        np.testing.assert_allclose(est_t, out["est_T"])

    def test_export_roundtrip(self, tmp_path):
        """StableHLO export: serialized artifact runs without the model's
        Python object and matches the live forward."""
        from learning3d_tpu.serve import export_model, load_model

        pn = models.PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0))
        model = models.Classifier(pn, num_classes=4, rngs=nnx.Rngs(1))
        model.eval()
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (4, 32, 3)), np.float32)

        path = str(tmp_path / "clf.stablehlo")
        blob = export_model(model, x, path=path)
        assert len(blob) > 1000
        want = np.asarray(model(jnp.asarray(x)))

        run = load_model(path)
        got = np.asarray(run(x))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_mesh_sharded_serving(self):
        from learning3d_tpu.parallel.mesh import make_mesh

        pn = models.PointNet(emb_dims=32, use_bn=True, rngs=nnx.Rngs(0))
        model = models.Classifier(pn, num_classes=4, rngs=nnx.Rngs(1))
        model.eval()
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (16, 32, 3)))
        mesh = make_mesh()  # all 8 virtual CPU devices on 'data'
        got = InferenceEngine(model, batch_size=16, mesh=mesh)(x)
        want = np.asarray(model(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestQuantServing:
    def test_int8_classifier_in_engine(self):
        """The int8 PTQ classifier (a callable pytree, not an nnx module)
        serves through InferenceEngine with bucketing/padding."""
        import jax

        from learning3d_tpu import models
        from learning3d_tpu.quant import quantize_pointnet_classifier
        from learning3d_tpu.serve import InferenceEngine

        model = models.Classifier(
            models.PointNet(emb_dims=64, use_bn=True, rngs=nnx.Rngs(0)),
            num_classes=10,
            rngs=nnx.Rngs(1),
        )
        model.eval()
        calib = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 3))
        qm = quantize_pointnet_classifier(model, calib)
        eng = InferenceEngine(qm, batch_size=4)
        x = np.random.randn(7, 128, 3).astype(np.float32)  # ragged tail
        out = eng(x)
        assert out.shape == (7, 10)
        ref = np.asarray(qm(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestTemplateRegistrar:
    def test_cached_template_matches_full_forward(self):
        """TemplateRegistrar's cached-encoder registration == the plain
        DCP forward, including tail-padded chunks (serve.py pattern)."""
        from learning3d_tpu.serve import TemplateRegistrar

        dgcnn = models.DGCNN(emb_dims=32, k=4, rngs=nnx.Rngs(0))
        model = models.DCP(dgcnn, rngs=nnx.Rngs(1))
        model.eval()
        template = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (24, 3)))
        sources = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (5, 24, 3)))

        reg = TemplateRegistrar(model, template, batch_size=2)
        out = reg(sources)
        assert out["est_T"].shape == (5, 4, 4)

        t_b = jnp.broadcast_to(jnp.asarray(template)[None], sources.shape)
        want = jax.tree.map(np.asarray, model(t_b, jnp.asarray(sources)))
        np.testing.assert_allclose(out["est_T"], want["est_T"], atol=1e-4)
        np.testing.assert_allclose(
            out["transformed_source"], want["transformed_source"], atol=1e-4
        )
