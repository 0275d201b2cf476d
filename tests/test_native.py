import numpy as np
import pytest

from irgs_tpu.utils import native


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.randn(2000, 3).astype(np.float32)
    out = native.mean_knn_dist2_native(pts, k=3, window=64)
    # brute force reference
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    # Morton window search is approximate; demand strong agreement
    rel = np.abs(out - ref) / np.maximum(ref, 1e-9)
    assert np.median(rel) < 1e-5
    assert (rel < 0.5).mean() > 0.8  # Morton-window approx, like simple-knn


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_ply_roundtrip():
    rng = np.random.RandomState(1)
    cols = rng.randn(7, 1000).astype(np.float32)
    payload = native.ply_interleave(cols)
    back = native.ply_deinterleave(payload, 1000, 7)
    np.testing.assert_array_equal(back, cols)


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_knn_used_for_large_init():
    from irgs_tpu.scene.gaussians import create_from_pcd
    rng = np.random.RandomState(2)
    pts = rng.rand(60_000, 3).astype(np.float32)
    cols = np.full((60_000, 3), 0.5, np.float32)
    params, aux = create_from_pcd(pts, cols, n_capacity=65536)
    assert int(aux.n_alive) == 60_000
    assert np.isfinite(np.asarray(params.scaling)).all()
