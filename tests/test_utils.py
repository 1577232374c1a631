"""Image conversion utilities."""

import numpy as np

from dexnerf_tpu.utils import (
    apply_jet_colormap,
    cast_to_disparity_image,
    cast_to_gray_image,
    cast_to_image,
)


def test_cast_to_image_clips_and_scales():
    img = np.array([[[-0.5, 0.5, 1.5]]], np.float32)
    out = cast_to_image(img)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0], [0, 127, 255])


def test_cast_to_gray_image_luma():
    rgb = np.ones((2, 2, 3), np.float32)
    out = cast_to_gray_image(rgb)
    assert out.shape == (2, 2)
    np.testing.assert_array_equal(out, 255)
    # already-gray passthrough
    out2 = cast_to_gray_image(np.full((2, 2), 0.5, np.float32))
    np.testing.assert_array_equal(out2, 127)


def test_cast_to_disparity_image_clamp():
    disp = np.array([[0.0, 1.0, 2.0, 5.0]], np.float32)
    out = cast_to_disparity_image(disp)
    np.testing.assert_array_equal(out[0], [0, 127, 255, 255])


def test_apply_jet_colormap_shape():
    gray = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
    out = apply_jet_colormap(gray)
    assert out.shape == (4, 4, 3)
    assert out.dtype == np.uint8
    # jet: low -> blue-ish, high -> red-ish
    assert out[0, 0, 2] > out[0, 0, 0]
    assert out[3, 3, 0] > out[3, 3, 2]
