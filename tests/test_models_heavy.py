"""Forward smoke tests for the heavier model families (PointConv,
CurveNet, FlowNet3D) — tiny configs so the CPU fake backend stays fast."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from learning3d_tpu.models.curvenet import CurveNet
from learning3d_tpu.models.flownet3d import FlowNet3D
from learning3d_tpu.models.pointconv import PointConvDensityClsSsg

B = 2


def cloud(seed, n, c=3):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, n, c))


def test_pointconv_classifier():
    net = PointConvDensityClsSsg(emb_dims=128, classifier=True, num_classes=10, rngs=nnx.Rngs(0))
    net.eval()
    out = net(cloud(0, 1024))
    assert out.shape == (B, 10)
    # log_softmax output sums to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-4)


def test_pointconv_features():
    net = PointConvDensityClsSsg(emb_dims=64, classifier=False, rngs=nnx.Rngs(0))
    net.eval()
    out = net(cloud(1, 1024))
    assert out.shape == (B, 64)


def test_curvenet():
    net = CurveNet(num_classes=40, k=8, rngs=nnx.Rngs(0))
    net.eval()
    out = net(cloud(2, 1024))
    assert out.shape == (B, 40)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flownet3d():
    net = FlowNet3D(rngs=nnx.Rngs(0))
    net.eval()
    pc1, pc2 = cloud(3, 2048), cloud(4, 2048)
    flow = net(pc1, pc2, pc1, pc2)
    assert flow.shape == (B, 2048, 3)
    assert np.all(np.isfinite(np.asarray(flow)))
