"""The render/depth HTTP service (apps/serve.py).

Trains a 2-iter tiny model to an orbax checkpoint, stands the server up
on an ephemeral port, and exercises every route: /healthz, /render (PNG),
/depth (npy meters + the reference's uint32-mm PNG format, expected and
σ-threshold Dex depth), POST /render with an explicit c2w, and the error
paths. The service renders through the same jitted-frame design as
apps.eval; occupancy tightening is exercised in-service.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from dexnerf_tpu.apps.serve import (
        build_parser,
        build_service,
        make_http_server,
    )
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import make_synthetic_scene
    from dexnerf_tpu.train import SceneData, run_training

    tmp = tmp_path_factory.mktemp("serve")
    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.array([0, 1]), i_val=np.array([2]),
    )
    cfg = CfgNode({
        "experiment": {
            "id": "serve", "logdir": str(tmp), "randomseed": 1,
            "train_iters": 2, "validate_every": 0, "save_every": 2,
            "print_every": 1,
        },
        "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                    "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {
                "type": "FlexibleNeRFModel", "num_layers": 2,
                "hidden_size": 16, "num_encoding_fn_xyz": 2,
                "num_encoding_fn_dir": 1,
            },
            "fine": {
                "type": "FlexibleNeRFModel", "num_layers": 2,
                "hidden_size": 16, "num_encoding_fn_xyz": 2,
                "num_encoding_fn_dir": 1,
            },
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {
                "num_random_rays": 16, "chunksize": 64, "perturb": True,
                "num_coarse": 4, "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
            "validation": {
                "chunksize": 64, "perturb": False, "num_coarse": 4,
                "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
                "m_thres": 10,
            },
        },
    })
    out = run_training(cfg, scene=scene, use_tensorboard=False)
    cfg_path = tmp / "config.yml"
    cfg_path.write_text(cfg.dump())

    args = build_parser().parse_args([
        "--config", str(cfg_path),
        "--checkpoint", str(tmp / "serve" / "checkpoints"),
        "--hwf", "8", "8", "10.0",
        "--occupancy", "0.5",
        "--occupancy-resolution", "16",
        "--occupancy-probes", "16",
        "--occupancy-subsample", "1",
    ])
    service = build_service(args)
    service.warmup(verbose=False)
    httpd = make_http_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    # stash artifact paths for tests that build a second (no-occupancy)
    # service from the same checkpoint
    service.test_cfg_path = str(cfg_path)
    service.test_ckpt_dir = str(tmp / "serve" / "checkpoints")
    yield base, service
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz(server):
    base, service = server
    status, ctype, body = _get(base + "/healthz")
    assert status == 200 and ctype == "application/json"
    info = json.loads(body)
    assert info["status"] == "ok"
    assert info["height"] == 8 and info["width"] == 8
    assert info["m_thres_cand"] == [5.0, 10.0]
    assert info["occupancy"] is True


def test_render_png(server):
    import imageio.v2 as imageio

    base, _ = server
    status, ctype, body = _get(base + "/render?theta=30&phi=-30&radius=4")
    assert status == 200 and ctype == "image/png"
    img = imageio.imread(io.BytesIO(body))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_depth_npy_and_dex(server):
    base, service = server
    status, ctype, body = _get(base + "/depth?theta=0&phi=-45&radius=4")
    assert status == 200 and ctype == "application/octet-stream"
    d = np.load(io.BytesIO(body))
    assert d.shape == (8, 8) and d.dtype == np.float32
    assert np.isfinite(d).all()

    # σ-threshold Dex depth, snapped to the candidate grid
    status, _, body_dex = _get(
        base + "/depth?theta=0&phi=-45&radius=4&threshold=6"
    )
    assert status == 200
    d_dex = np.load(io.BytesIO(body_dex))
    assert d_dex.shape == (8, 8)
    assert service.nearest_threshold(6.0) == 0  # 5 is nearest to 6


def test_depth_mm_png_roundtrip(server, tmp_path):
    base, _ = server
    status, ctype, body = _get(
        base + "/depth?theta=0&phi=-45&radius=4&format=png"
    )
    assert status == 200 and ctype == "image/png"
    from PIL import Image

    mm = np.asarray(Image.open(io.BytesIO(body)))
    assert mm.shape == (8, 8)
    # uint32-mm convention: values in the scene's metric range (< 10 m)
    assert mm.max() < 10_000


def test_post_render_c2w(server):
    from dexnerf_tpu.data.blender import pose_spherical

    base, _ = server
    c2w = np.asarray(pose_spherical(45.0, -30.0, 4.0), np.float32)
    req = urllib.request.Request(
        base + "/render",
        data=json.dumps({"c2w": c2w.tolist(), "output": "depth"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        d = np.load(io.BytesIO(r.read()))
    assert d.shape == (8, 8)


def test_error_paths(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/depth?format=tiff")
    assert e.value.code == 400
    # bad c2w shape surfaces as 400, not a hung connection
    req = urllib.request.Request(
        base + "/render",
        data=json.dumps({"c2w": [[1, 2], [3, 4]]}).encode(),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=120)
    assert e.value.code == 400


def test_confidence_unavailable_with_occupancy(server):
    # the module server runs with --occupancy: /confidence must refuse
    # (full-interval z reconstruction vs tightened per-ray intervals)
    base, service = server
    info = json.loads(_get(base + "/healthz")[2])
    assert info["depth_confidence"] is False
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/confidence?theta=0&phi=-45&radius=4")
    assert e.value.code == 400


def test_confidence_route(server):
    """A no-occupancy service serves /confidence: npz {depth, confidence},
    confidence in [0, 1], monotone in delta, == accumulation at huge
    delta (weights sum)."""
    from dexnerf_tpu.apps.serve import (
        build_parser,
        build_service,
        make_http_server,
    )

    _, occ_service = server
    args = build_parser().parse_args([
        "--config", occ_service.test_cfg_path,
        "--checkpoint", occ_service.test_ckpt_dir,
        "--hwf", "8", "8", "10.0",
    ])
    service = build_service(args)
    httpd = make_http_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        info = json.loads(_get(base + "/healthz")[2])
        assert info["depth_confidence"] is True

        status, ctype, body = _get(
            base + "/confidence?theta=0&phi=-45&radius=4&delta=0.25"
        )
        assert status == 200 and ctype == "application/octet-stream"
        z = np.load(io.BytesIO(body))
        d, c = z["depth"], z["confidence"]
        assert d.shape == (8, 8) and c.shape == (8, 8)
        assert np.isfinite(c).all() and c.min() >= 0.0 and c.max() <= 1.0 + 1e-5

        _, c_wide = service.render_depth_conf(
            service.pose_from_angles(0.0, -45.0, 4.0), 1e9
        )
        assert np.all(c <= c_wide + 1e-6)  # monotone in delta
        # delta covering the whole interval -> conf == accumulation
        import jax.numpy as jnp

        from dexnerf_tpu.core.rays import get_ray_bundle_c2w
        from dexnerf_tpu.render import render_image
        from dexnerf_tpu.config import load_config
        from dexnerf_tpu.train.loop import load_eval_params, setup_models

        cfg = load_config(occ_service.test_cfg_path)
        cfg, params, _, _ = load_eval_params(cfg, occ_service.test_ckpt_dir)
        coarse_fn, fine_fn, _ = setup_models(cfg, 1)
        ro, rd = get_ray_bundle_c2w(
            8, 8, 10.0, jnp.asarray(service.pose_from_angles(0.0, -45.0, 4.0))
        )
        out = render_image(
            coarse_fn, fine_fn, params, ro, rd, 2.0, 6.0, service.settings
        )
        acc = np.asarray(out.fine.accumulation)
        np.testing.assert_allclose(c_wide, acc, atol=1e-5)

        # png format renders a grayscale map
        status, ctype, _ = _get(
            base + "/confidence?theta=0&phi=-45&radius=4&format=png"
        )
        assert status == 200 and ctype == "image/png"
    finally:
        httpd.shutdown()
        httpd.server_close()
