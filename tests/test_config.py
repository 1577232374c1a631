"""CfgNode + schema: load reference-format YAML, merge, freeze, map to typed objects."""

import os

import pytest

from dexnerf_tpu.config import (
    CfgNode,
    load_config,
    m_thres_candidates,
    models_from_cfg,
    render_settings_from_cfg,
)

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_cfgnode_attribute_access():
    cfg = CfgNode({"a": 1, "b": {"c": "x", "d": [1, 2]}})
    assert cfg.a == 1
    assert cfg.b.c == "x"
    assert cfg.b.d == [1, 2]
    assert cfg["b"]["c"] == "x"
    with pytest.raises(AttributeError):
        _ = cfg.nope


def test_cfgnode_dump_roundtrip():
    cfg = CfgNode({"x": {"y": 2.5}, "z": True})
    import yaml

    loaded = yaml.safe_load(cfg.dump())
    assert loaded == {"x": {"y": 2.5}, "z": True}


def test_cfgnode_merge_from_list():
    cfg = CfgNode({"optimizer": {"lr": 0.005, "type": "Adam"}})
    cfg.merge_from_list(["optimizer.lr", 1e-4])
    assert cfg.optimizer.lr == 1e-4
    with pytest.raises(KeyError):
        cfg.merge_from_list(["optimizer.nope", 1])


def test_cfgnode_merge_from_other():
    base = CfgNode({"a": 1, "sub": {"x": 1.0, "y": 2}})
    other = CfgNode({"sub": {"x": 5.0}})
    base.merge_from_other_cfg(other)
    assert base.sub.x == 5.0
    assert base.sub.y == 2


def test_cfgnode_freeze():
    cfg = CfgNode({"a": 1, "b": {"c": 2}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a = 5
    with pytest.raises(AttributeError):
        cfg.b.c = 5
    cfg.defrost()
    cfg.a = 5
    assert cfg.a == 5


def test_cfgnode_renamed_deprecated():
    cfg = CfgNode({"new_key": 1})
    cfg.register_deprecated_key("old_gone")
    cfg.register_renamed_key("old_name", "new_key")
    assert cfg.key_is_deprecated("old_gone")
    with pytest.raises(KeyError):
        cfg.raise_key_rename_error("old_name")
    # deprecated keys are skipped on merge
    cfg.merge_from_list(["old_gone", 42])
    assert "old_gone" not in cfg


def test_cfgnode_py_source(tmp_path):
    py = tmp_path / "cfg.py"
    py.write_text("cfg = {'experiment': {'id': 'from_py'}, 'lr': 0.1}\n")
    with open(py) as f:
        cfg = CfgNode.load_cfg(f)
    assert cfg.experiment.id == "from_py"
    assert cfg.lr == 0.1


@pytest.mark.parametrize(
    "name", ["lego", "lego-tpu", "tiny", "messytable-obj", "fern"]
)
def test_shipped_configs_load(name):
    cfg = load_config(os.path.join(CONFIGS, f"{name}.yml"))
    assert cfg.experiment.id
    assert cfg.models.coarse.type == "FlexibleNeRFModel"
    s = render_settings_from_cfg(cfg, "train")
    assert s.num_coarse > 0
    sv = render_settings_from_cfg(cfg, "validation")
    assert not sv.perturb


def test_lego_tpu_config_builds_fused_loss():
    # the TPU-tuned config reaches the combined-kernel path end-to-end
    from dexnerf_tpu.train.loop import maybe_fused_loss

    cfg = load_config(os.path.join(CONFIGS, "lego-tpu.yml"))
    assert cfg.nerf.use_pallas
    assert cfg.nerf.train.num_random_rays == 8192
    s = render_settings_from_cfg(cfg, "train")
    fl = maybe_fused_loss(cfg, s, "rgb")
    assert fl is not None


def test_render_settings_from_lego():
    cfg = load_config(os.path.join(CONFIGS, "lego.yml"))
    s = render_settings_from_cfg(cfg, "train")
    assert s.num_coarse == 64 and s.num_fine == 64
    assert s.perturb and s.radiance_field_noise_std == 0.2
    assert s.num_encoding_fn_xyz == 10 and s.num_encoding_fn_dir == 4
    assert s.m_thres_cand == ()


def test_m_thres_sweep_messytable():
    cfg = load_config(os.path.join(CONFIGS, "messytable-obj.yml"))
    cand = m_thres_candidates(cfg, "validation")
    assert cand == tuple(float(x) for x in range(5, 105, 5))
    s = render_settings_from_cfg(cfg, "validation", dex=True)
    assert len(s.m_thres_cand) == 20
    s_nodex = render_settings_from_cfg(cfg, "validation", dex=False)
    assert s_nodex.m_thres_cand == ()


def test_models_from_cfg():
    cfg = load_config(os.path.join(CONFIGS, "lego.yml"))
    coarse, fine = models_from_cfg(cfg)
    assert coarse.num_layers == 8
    assert coarse.hidden_size == 128
    assert coarse.skip_connect_every == 3
    assert fine is not None
