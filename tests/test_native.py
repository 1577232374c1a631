"""Native C++ host library: build + parity vs numpy."""

import numpy as np
import pytest

native = pytest.importorskip("dexnerf_tpu.ops.native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build failed: {e}")


def test_searchsorted_right_matches_numpy(lib):
    rng = np.random.RandomState(0)
    cdf = np.sort(rng.rand(7, 33), -1).astype(np.float32)
    u = rng.rand(7, 19).astype(np.float32)
    got = native.searchsorted_right(cdf, u)
    for b in range(7):
        np.testing.assert_array_equal(
            got[b], np.searchsorted(cdf[b], u[b], side="right")
        )


def test_searchsorted_ties(lib):
    cdf = np.array([[0.0, 0.5, 0.5, 1.0]], np.float32)
    u = np.array([[0.5, 0.0, 1.0, 2.0]], np.float32)
    np.testing.assert_array_equal(
        native.searchsorted_right(cdf, u)[0], [3, 1, 4, 4]
    )


def test_sample_pdf_host_matches_jax_core(lib):
    import jax.numpy as jnp

    from dexnerf_tpu.ops.sample_pdf_pallas import _sample_pdf_branchless_xla

    rng = np.random.RandomState(1)
    bins = np.sort(rng.rand(5, 16) * 4, -1).astype(np.float32)
    weights = rng.rand(5, 15).astype(np.float32)
    u = rng.rand(5, 8).astype(np.float32)
    got = native.sample_pdf_host(bins, weights, u)
    ref = np.asarray(
        _sample_pdf_branchless_xla(
            jnp.asarray(bins), jnp.asarray(weights), jnp.asarray(u)
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pack_rays(lib):
    rng = np.random.RandomState(2)
    ro = rng.randn(10, 3).astype(np.float32)
    rd = rng.randn(10, 3).astype(np.float32)
    rgb = rng.rand(10, 3).astype(np.float32)
    out = native.pack_rays(ro, rd, rgb)
    assert out.shape == (10, 12)
    np.testing.assert_allclose(out[:, :3], ro)
    np.testing.assert_allclose(out[:, 3:6], rd)
    np.testing.assert_allclose(
        out[:, 6:9], rd / np.linalg.norm(rd, axis=-1, keepdims=True), rtol=1e-5
    )
    np.testing.assert_allclose(out[:, 9:], rgb)


def test_gather_random_rows(lib):
    store = np.arange(50 * 4, dtype=np.float32).reshape(50, 4)
    out = native.gather_random_rows(store, seed=7, batch=20)
    assert out.shape == (20, 4)
    # every output row must be an exact store row
    store_rows = {tuple(r) for r in store}
    assert all(tuple(r) in store_rows for r in out)
    # deterministic in seed
    out2 = native.gather_random_rows(store, seed=7, batch=20)
    np.testing.assert_array_equal(out, out2)
    out3 = native.gather_random_rows(store, seed=8, batch=20)
    assert not np.array_equal(out, out3)


def test_cache_store_uses_native_pack(tmp_path, lib):
    """build_ray_store_from_cache assembles rows through the native
    pack_rays kernel; result matches the pure-numpy packing."""
    import os

    import jax.numpy as jnp

    from dexnerf_tpu.data.pipeline import build_ray_store_from_cache

    rng = np.random.RandomState(11)
    os.makedirs(tmp_path / "train", exist_ok=True)
    ro = rng.randn(50, 3).astype(np.float32)
    rd = rng.randn(50, 3).astype(np.float32)
    rgb = rng.rand(50, 3).astype(np.float32)
    np.savez(
        tmp_path / "train" / "0000.npz",
        height=5, width=10, focal_length=20.0,
        ray_bundle=np.stack([ro, rd], 0), target=rgb,
    )
    store = build_ray_store_from_cache(str(tmp_path), 2.0, 6.0)
    viewdirs = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    want = np.concatenate([ro, rd, viewdirs, rgb], axis=-1)
    np.testing.assert_allclose(np.asarray(store.data), want, rtol=1e-6)
