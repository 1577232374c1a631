"""Real-data parity: render the reference's shipped pretrained checkpoints
through BOTH implementations and assert agreement.

This is the hard cross-implementation evidence for quality parity
(BASELINE.md north star): the same rays through (a) the reference's torch
code imported from ``/root/reference`` and (b) our JAX renderer with
``import_torch_checkpoint``-converted weights must produce near-identical
images (f32, deterministic validation path). See
``tools/reference_parity.py`` for the full 6-scene table
(docs/REFERENCE_PARITY.json: 92-120 dB).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tools.reference_parity import PRETRAINED, compare_scene  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PRETRAINED),
    reason="reference pretrained checkpoints not present",
)


@pytest.mark.parametrize("scene", ["lego-lowres", "hotdog-lowres"])
def test_pretrained_checkpoint_render_parity(scene):
    rec = compare_scene(scene, size=20)
    # ±0.1 dB parity bar needs ~40 dB agreement; we get >90 dB (f32-exact)
    assert rec["rgb_psnr_between_impls_db"] >= 40.0, rec
    assert rec["depth_mean_abs_diff_m"] < 1e-3, rec
