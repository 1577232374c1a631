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
