"""Tests for the dataset-from-checkpoint distillation tools."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def test_llff_storage_convention_roundtrip(tmp_path):
    """The LLFF generator's inverse of the loader's axis fixup must be
    exact: poses written to poses_bounds.npy and read back through
    load_llff_data (raw mode) reproduce the intended c2w columns."""
    import imageio.v2 as imageio

    from dexnerf_tpu.data.llff import load_llff_data

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from make_llff_dataset_from_ckpt import _lookat_c2w

    H, W, focal = 24, 32, 30.0
    rng = np.random.default_rng(3)
    rows, want = [], []
    for _ in range(3):
        pos = rng.uniform(-0.2, 0.2, 3)
        c2w = _lookat_c2w(pos, np.array([0.0, 0.0, -2.0]))
        # orthonormal, right-handed, looking roughly along -z
        R = c2w[:, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0.99
        assert (-R[:, 2]) @ np.array([0, 0, -1.0]) > 0.9
        hwf = np.array([[H], [W], [focal]])
        loaded = np.concatenate([c2w, hwf], axis=1)
        storage = np.concatenate(
            [-loaded[:, 1:2], loaded[:, 0:1], loaded[:, 2:]], axis=1
        )
        rows.append(np.concatenate([storage.reshape(-1), [1.0, 8.0]]))
        want.append(loaded)

    base = str(tmp_path / "llff")
    os.makedirs(os.path.join(base, "images"))
    np.save(os.path.join(base, "poses_bounds.npy"), np.stack(rows, 0))
    for k in range(3):
        imageio.imwrite(
            os.path.join(base, "images", f"r_{k}.png"),
            np.zeros((H, W, 3), np.uint8),
        )

    # raw mode: no recenter, no bd rescale -> the loader output IS the
    # fixup of the stored poses
    _, poses, bds, _, _ = load_llff_data(
        base, factor=1, recenter=False, bd_factor=None
    )
    assert poses.shape == (3, 3, 5)
    for k in range(3):
        np.testing.assert_allclose(poses[k], want[k], atol=1e-6)
    np.testing.assert_allclose(bds, np.tile([1.0, 8.0], (3, 1)))


def test_llff_generator_phase_consistency(tmp_path):
    """The generator's phase-B re-load sees the SAME poses a later
    training-time load sees (pose transforms depend only on
    poses_bounds.npy + image shape, never on pixel content)."""
    import imageio.v2 as imageio

    from dexnerf_tpu.data.llff import load_llff_data

    H, W = 24, 32
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(4):
        m = np.eye(3) + 0.01 * rng.standard_normal((3, 3))
        q, _ = np.linalg.qr(m)
        c2w = np.concatenate([q, rng.uniform(-0.2, 0.2, (3, 1))], axis=1)
        loaded = np.concatenate([c2w, [[H], [W], [30.0]]], axis=1)
        storage = np.concatenate(
            [-loaded[:, 1:2], loaded[:, 0:1], loaded[:, 2:]], axis=1
        )
        rows.append(np.concatenate([storage.reshape(-1), [4.0 / 3.0, 8.0]]))
    base = str(tmp_path / "llff")
    os.makedirs(os.path.join(base, "images"))
    np.save(os.path.join(base, "poses_bounds.npy"), np.stack(rows, 0))
    for k in range(4):
        imageio.imwrite(
            os.path.join(base, "images", f"r_{k}.png"),
            np.zeros((H, W, 3), np.uint8),
        )
    _, poses_a, bds_a, _, _ = load_llff_data(base, factor=1)
    # overwrite with "real" content, as phase B does
    for k in range(4):
        imageio.imwrite(
            os.path.join(base, "images", f"r_{k}.png"),
            np.full((H, W, 3), 57, np.uint8),
        )
        imageio.imwrite(
            os.path.join(base, "images_1", f"r_{k}.png"),
            np.full((H, W, 3), 57, np.uint8),
        )
    imgs, poses_b, bds_b, _, _ = load_llff_data(base, factor=1)
    np.testing.assert_array_equal(poses_a, poses_b)
    np.testing.assert_array_equal(bds_a, bds_b)
    assert abs(float(imgs.mean()) - 57.0 / 255.0) < 1e-6
    # the default bounds make the loader's bd rescale exactly 1
    np.testing.assert_allclose(bds_b[:, 0], 4.0 / 3.0, rtol=1e-6)
