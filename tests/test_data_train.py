"""Data pipeline + trainer + parallel-layer tests (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx


class TestData:
    def test_synthetic_dataset(self):
        from learning3d_tpu.data import ClassificationData, SyntheticModelNet40

        ds = ClassificationData(SyntheticModelNet40(num_points=128, size=64))
        assert len(ds) == 64
        pts, label = ds[5]
        assert pts.shape == (128, 3)
        assert 0 <= label < 40
        # deterministic per index
        pts2, _ = ds[5]
        np.testing.assert_array_equal(pts, pts2)

    def test_registration_data_host(self):
        from learning3d_tpu.data import RegistrationData, SyntheticModelNet40

        base = SyntheticModelNet40(num_points=128, size=16)
        for algo in ("DCP", "PointNetLK", "PCRNet", "DeepGMR"):
            ds = RegistrationData(algorithm=algo, data_class=base)
            template, source, igt = ds[3]
            assert source.shape == template.shape == (128, 3)
            # igt maps template -> source
            np.testing.assert_allclose(
                template @ igt[:3, :3].T + igt[:3, 3], source, atol=1e-4
            )
            # fixed per index (reproducibility contract)
            _, source2, igt2 = ds[3]
            np.testing.assert_array_equal(igt, igt2)

    def test_registration_partial_and_noise(self):
        from learning3d_tpu.data import RegistrationData, SyntheticModelNet40

        ds = RegistrationData(
            algorithm="PRNet",
            data_class=SyntheticModelNet40(num_points=128, size=8),
            partial_source=True,
            noise=True,
        )
        template, source, igt = ds[0]
        assert source.shape == (768, 3) or source.shape[0] <= 128

    def test_device_registration_batch(self):
        from learning3d_tpu.data.device_pipeline import make_registration_batch
        from learning3d_tpu.ops import se3

        template = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 3))
        for algo in ("DCP", "PointNetLK", "iPCRNet", "DeepGMR"):
            t, s, igt = make_registration_batch(jax.random.PRNGKey(1), template, algo)
            np.testing.assert_allclose(se3.transform(igt, template), s, atol=1e-4)

    def test_user_data(self):
        from learning3d_tpu.data import UserData

        pcs = np.random.randn(10, 64, 3).astype(np.float32)
        labels = np.arange(10)
        ds = UserData("classification", {"pcs": pcs, "labels": labels})
        assert len(ds) == 10
        with pytest.raises(ValueError):
            UserData("classification", {"pcs": pcs[0], "labels": labels})

    def test_batch_iterator(self):
        from learning3d_tpu.data import SyntheticModelNet40, batch_iterator

        ds = SyntheticModelNet40(num_points=32, size=20)
        batches = list(batch_iterator(ds, 8, seed=0))
        assert len(batches) == 2  # drop_last
        pts, labels = batches[0]
        assert pts.shape == (8, 32, 3)
        assert labels.shape == (8,)


class TestParallel:
    def test_mesh_and_shard_batch(self):
        from learning3d_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        batch = (jnp.ones((16, 32, 3)), jnp.ones((16,), jnp.int32))
        sharded = shard_batch(mesh, batch)
        assert sharded[0].sharding.spec[0] == "data"

    def test_ring_chamfer_matches_dense(self):
        from learning3d_tpu.kernels.chamfer import nn_distance
        from learning3d_tpu.parallel import make_mesh
        from learning3d_tpu.parallel.ring import ring_chamfer

        mesh = make_mesh(("data", "model"), (1, 8))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
        d1r, d2r = ring_chamfer(x, y, mesh, axis="model")
        d1, _, d2, _ = nn_distance(x, y, use_pallas=False)
        np.testing.assert_allclose(np.asarray(d1r), np.asarray(d1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2r), np.asarray(d2), atol=1e-4)

    def test_ring_knn_matches_dense(self):
        from learning3d_tpu.ops.geometry import knn
        from learning3d_tpu.parallel import make_mesh
        from learning3d_tpu.parallel.ring import ring_knn

        mesh = make_mesh(("data", "model"), (1, 8))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 3))
        d_r, i_r = ring_knn(x, 4, mesh, axis="model")
        ref_idx = knn(x, 4)
        np.testing.assert_array_equal(
            np.sort(np.asarray(i_r), -1), np.sort(np.asarray(ref_idx), -1)
        )


class TestTrainer:
    def test_classification_overfits_small_set(self):
        from learning3d_tpu import models
        from learning3d_tpu.data import ClassificationData, SyntheticModelNet40
        from learning3d_tpu.train import TrainConfig, Trainer

        ds = ClassificationData(SyntheticModelNet40(num_points=64, size=32, num_classes=4))
        cfg = TrainConfig(
            task="classification", batch_size=8, epochs=8, lr=3e-3,
            ckpt_dir="/tmp/l3d_test_ckpt", exp_name="cls_smoke",
        )
        pn = models.PointNet(emb_dims=64, use_bn=True, rngs=nnx.Rngs(0))
        model = models.Classifier(pn, num_classes=4, rngs=nnx.Rngs(1))
        tr = Trainer(cfg, model)
        tr.fit(ds, test_data=None, epochs=8)
        model.eval()
        _, aux = tr.evaluate(ds)
        assert aux["accuracy"] > 0.5, aux  # learns on a tiny synthetic set

    def test_checkpoint_roundtrip(self):
        from learning3d_tpu import models
        from learning3d_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(ckpt_dir="/tmp/l3d_test_ckpt", exp_name="ckpt_smoke")
        pn = models.PointNet(emb_dims=32, rngs=nnx.Rngs(0))
        model = models.Classifier(pn, num_classes=4, rngs=nnx.Rngs(1))
        tr = Trainer(cfg, model)
        tr.save("latest")
        before = np.asarray(model.linear3.kernel.value).copy()
        model.linear3.kernel.value = jnp.zeros_like(model.linear3.kernel.value)
        tr.load("latest")
        np.testing.assert_array_equal(np.asarray(model.linear3.kernel.value), before)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (32, 40)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
