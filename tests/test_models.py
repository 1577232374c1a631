"""Model zoo: shapes, registry, param counts, init statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.models import (
    MODEL_REGISTRY,
    FlexibleNeRFModel,
    build_model,
    get_model_cls,
)


def _init_and_apply(model, in_dim, batch=4):
    key = jax.random.PRNGKey(0)
    x = jnp.ones((batch, in_dim))
    params = model.init(key, x)
    out = model.apply(params, x)
    return params, out


def test_registry_contents():
    assert set(MODEL_REGISTRY) == {
        "VeryTinyNeRFModel",
        "MultiHeadNeRFModel",
        "ReplicateNeRFModel",
        "PaperNeRFModel",
        "FlexibleNeRFModel",
    }
    with pytest.raises(KeyError):
        get_model_cls("NopeModel")


def test_build_model_filters_kwargs():
    m = build_model("VeryTinyNeRFModel", filter_size=64, num_layers=99)
    assert m.filter_size == 64


@pytest.mark.parametrize(
    "name,in_dim",
    [
        ("VeryTinyNeRFModel", 2 * (3 + 3 * 2 * 6)),
        ("MultiHeadNeRFModel", 2 * (3 + 3 * 2 * 6)),
        ("ReplicateNeRFModel", encoding_dim(3, 6) + encoding_dim(3, 4)),
        ("PaperNeRFModel", encoding_dim(3, 6) + encoding_dim(3, 4)),
        ("FlexibleNeRFModel", encoding_dim(3, 6) + encoding_dim(3, 4)),
    ],
)
def test_model_output_shape(name, in_dim):
    model = build_model(name)
    _, out = _init_and_apply(model, in_dim)
    assert out.shape == (4, 4)


def test_flexible_skip_connection_runs():
    # num_layers=8, skip every 4: skip branch actually executes (the reference
    # implementation would crash here on the nonexistent self.linear_layers).
    model = FlexibleNeRFModel(num_layers=8, hidden_size=64, skip_connect_every=4)
    in_dim = encoding_dim(3, 6) + encoding_dim(3, 4)
    _, out = _init_and_apply(model, in_dim)
    assert out.shape == (4, 4)


def test_flexible_no_viewdirs():
    model = FlexibleNeRFModel(use_viewdirs=False)
    in_dim = encoding_dim(3, 6)
    _, out = _init_and_apply(model, in_dim)
    assert out.shape == (4, 4)


def test_flexible_param_count_default():
    # default: 4 layers x 128 hidden, viewdirs. Trunk: in->128, 3x(128->128);
    # heads: feat 128->128, alpha 128->1, dir (128+27)->64, rgb 64->3.
    model = FlexibleNeRFModel()
    in_dim = encoding_dim(3, 6) + encoding_dim(3, 4)
    params, _ = _init_and_apply(model, in_dim)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    expected = (
        (39 * 128 + 128)
        + 3 * (128 * 128 + 128)
        + (128 * 128 + 128)
        + (128 * 1 + 1)
        + ((128 + 27) * 64 + 64)
        + (64 * 3 + 3)
    )
    assert n == expected


def test_torch_style_init_bounds():
    model = FlexibleNeRFModel()
    in_dim = encoding_dim(3, 6) + encoding_dim(3, 4)
    params, _ = _init_and_apply(model, in_dim)
    leaves = jax.tree.leaves(params)
    for leaf in leaves:
        a = np.asarray(leaf)
        # torch Linear init: |w| <= 1/sqrt(fan_in) <= 1 for all our fan-ins
        assert np.abs(a).max() <= 1.0
        if a.size > 1:
            assert a.std() > 0  # actually random


def test_flexible_bfloat16_compute():
    import jax.numpy as jnp

    model32 = FlexibleNeRFModel(num_layers=4, hidden_size=32)
    model16 = FlexibleNeRFModel(num_layers=4, hidden_size=32, dtype="bfloat16")
    in_dim = encoding_dim(3, 6) + encoding_dim(3, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, in_dim))
    params = model32.init(jax.random.PRNGKey(0), x)
    out32 = model32.apply(params, x)
    out16 = model16.apply(params, x)  # same f32 params, bf16 compute
    assert out16.dtype == jnp.float32  # cast back for compositing
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=5e-2
    )
