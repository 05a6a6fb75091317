"""Native C++ host-preprocessing library vs numpy oracles."""

import numpy as np

from learning3d_tpu.data import native


def test_fps_matches_numpy_greedy():
    pts = np.random.RandomState(0).randn(256, 3).astype(np.float32)
    idx = native.fps_host(pts, 32)
    # independent greedy reference
    dist = np.full(256, np.inf)
    cur, ref = 0, []
    for _ in range(32):
        ref.append(cur)
        dist = np.minimum(dist, np.sum((pts - pts[cur]) ** 2, -1))
        cur = int(np.argmax(dist))
    np.testing.assert_array_equal(idx, ref)


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(1)
    pts = rng.randn(128, 3).astype(np.float32)
    q = rng.randn(16, 3).astype(np.float32)
    idx = native.knn_host(pts, q, 4)
    d = np.sum((q[:, None] - pts[None]) ** 2, -1)
    ref = np.argsort(d, -1)[:, :4]
    np.testing.assert_array_equal(np.sort(idx, -1), np.sort(ref, -1))


def test_jitter_bounded_and_deterministic():
    pts = np.zeros((64, 3), np.float32)
    j1 = native.jitter_host(pts, sigma=0.04, clip=0.05, seed=7)
    j2 = native.jitter_host(pts, sigma=0.04, clip=0.05, seed=7)
    np.testing.assert_array_equal(j1, j2)
    assert np.abs(j1).max() <= 0.05
    assert np.abs(j1).max() > 0
