"""Dex-NeRF render/depth service: a persistent TPU process serving frames
and METRIC DEPTH over HTTP.

Dex-NeRF's end product is metric depth for transparent-object grasping
(reference ``volume_rendering_utils.py:51-58``); downstream planners
consume it per-query. The reference's deployment story is a batch k8s
job that writes PNGs to disk (``job-example.yaml``) — every consumer
re-runs ``eval_nerf.py`` and pays model load + per-frame setup each time.
Here the trained field stays resident on the chip with ONE compiled
frame program (ray generation + hierarchical render + output selection —
the same jitted-frame design as ``apps.eval``, ~0.2 s/frame on v5e at
400x400), optionally occupancy-tightened, behind a dependency-free
stdlib HTTP server.

Endpoints (all GET unless noted):

* ``/healthz`` — JSON service info: frame geometry, sample budget, dex
  threshold candidates, occupancy state, timing of the last render.
* ``/render?theta=-30&phi=-45&radius=4`` — RGB PNG from a spherical-orbit
  camera (the reference's render-path convention,
  ``load_blender.py:33-38``).
* ``/depth?theta=..&phi=..&radius=..[&threshold=M][&format=npy|png]`` —
  metric depth for the same camera: the rendered EXPECTED depth, or the
  Dex-NeRF σ>M first-crossing depth when ``threshold`` is given (snapped
  to the config's ``m_thres`` candidate grid). ``format=npy`` (default)
  returns a float32 meters array; ``format=png`` the reference's uint32
  millimeter PNG artifact format (``train_nerf_rgb.py:395-399``).
* ``POST /render`` — body ``{"c2w": [[..4x4..]], "output": "rgb"|"depth"
  [, "threshold": M]}`` for arbitrary camera poses; returns PNG (rgb) or
  npy (depth).

One chip, one render at a time: requests serialize on an internal lock
(the server itself is threaded so /healthz stays responsive mid-render).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Serve NeRF renders + Dex-NeRF metric depth over HTTP"
    )
    p.add_argument("--config", type=str, required=True)
    p.add_argument(
        "--checkpoint", type=str, required=True,
        help="orbax checkpoint (or its directory: latest is picked) or a "
        "reference .ckpt",
    )
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8100)
    p.add_argument(
        "--hwf", type=float, nargs=3, default=None, metavar=("H", "W", "F"),
        help="frame geometry override (else checkpoint/config)",
    )
    p.add_argument(
        "--samples", type=int, nargs=2, default=None,
        metavar=("COARSE", "FINE"),
        help="override the config's validation sample counts",
    )
    p.add_argument(
        "--occupancy", type=float, default=None, metavar="SIGMA",
        help="bake a σ > SIGMA occupancy grid at startup and tighten every "
        "request's ray intervals (apps.eval --occupancy semantics)",
    )
    p.add_argument("--occupancy-resolution", type=int, default=128)
    p.add_argument("--occupancy-radius", type=float, default=1.5)
    p.add_argument(
        "--occupancy-center", type=float, nargs=3, default=(0.0, 0.0, 0.0)
    )
    p.add_argument("--occupancy-dilate", type=int, default=1)
    p.add_argument("--occupancy-probes", type=int, default=128)
    p.add_argument("--occupancy-subsample", type=int, default=2)
    p.add_argument(
        "--no-warmup", action="store_true",
        help="skip the startup compile render (first request pays it)",
    )
    p.add_argument(
        "--platform", type=str, default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (cpu when the TPU tunnel is down)",
    )
    return p


class RenderService:
    """Compiled frame programs + the single-chip render lock."""

    def __init__(
        self,
        cfg,
        params,
        coarse_fn,
        fine_fn,
        settings,
        H: int,
        W: int,
        focal: float,
        *,
        use_ndc: bool = False,
        rays_impl=None,
        occupancy=None,
        occupancy_probes: int = 128,
        occupancy_subsample: int = 2,
    ):
        import jax
        import jax.numpy as jnp

        from dexnerf_tpu.core.rays import get_ray_bundle_c2w
        from dexnerf_tpu.render import render_image

        self.H, self.W, self.focal = int(H), int(W), float(focal)
        self.settings = settings
        self.m_thres_cand = tuple(
            float(m) for m in (settings.m_thres_cand or ())
        )
        self.occupancy = occupancy
        self.lock = threading.Lock()
        self.last_render_s: Optional[float] = None
        self.renders_served = 0
        near, far = float(cfg.dataset.near), float(cfg.dataset.far)

        def _render(ro, rd):
            out = render_image(
                coarse_fn, fine_fn, params, ro, rd, near, far, settings,
                use_ndc=use_ndc, height=self.H, width=self.W,
                focal_length=self.focal, rays_impl=rays_impl,
                occupancy=occupancy,
                occupancy_probes=occupancy_probes,
                occupancy_subsample=occupancy_subsample,
            )
            return out.fine if out.fine is not None else out.coarse

        @jax.jit
        def frame_rgb(pose):
            ro, rd = get_ray_bundle_c2w(self.H, self.W, self.focal, pose)
            return _render(ro, rd).rgb

        @jax.jit
        def frame_depth(pose):
            ro, rd = get_ray_bundle_c2w(self.H, self.W, self.focal, pose)
            return _render(ro, rd).depth

        @jax.jit
        def frame_depth_dex(pose, thres_idx):
            ro, rd = get_ray_bundle_c2w(self.H, self.W, self.focal, pose)
            r = _render(ro, rd)
            # select ONE threshold plane on device: the full [T, H, W]
            # stack never crosses the (slow, remote) host link
            return jnp.take(r.depth_dex, thres_idx, axis=0)

        @jax.jit
        def frame_depth_conf(pose, delta):
            from dexnerf_tpu.core import depth_confidence
            from dexnerf_tpu.core.sampling import (
                hierarchical_z_vals,
                stratified_z_vals,
            )

            ro, rd = get_ray_bundle_c2w(self.H, self.W, self.focal, pose)
            out = render_image(
                coarse_fn, fine_fn, params, ro, rd, near, far, settings,
                use_ndc=use_ndc, height=self.H, width=self.W,
                focal_length=self.focal, rays_impl=rays_impl,
            )
            r = out.fine if out.fine is not None else out.coarse
            # serve renders deterministically (eval settings), so the
            # z-values are reconstructable from the coarse weights
            nearb = jnp.full(
                out.coarse.weights.shape[:-1], near,
                out.coarse.weights.dtype,
            )
            z_c = stratified_z_vals(
                nearb, jnp.full_like(nearb, far), settings.num_coarse,
                lindisp=settings.lindisp,
            )
            if out.fine is not None:
                z_w, _ = hierarchical_z_vals(
                    None, z_c, out.coarse.weights, settings.num_fine,
                    det=True,
                )
                w = out.fine.weights
            else:
                z_w, w = z_c, out.coarse.weights
            return r.depth, depth_confidence(w, z_w, r.depth, delta)

        self._frame_rgb = frame_rgb
        self._frame_depth = frame_depth
        # confidence reconstructs full-interval z-values; occupancy
        # tightens per-ray intervals, so the two are mutually exclusive
        self._frame_depth_conf = frame_depth_conf if occupancy is None else None
        # σ-threshold depth rides the FINE pass only (reference semantics,
        # renderer.py render_rays): without one, r.depth_dex is None and
        # the program would crash at trace time
        has_fine_pass = fine_fn is not None and settings.num_fine > 0
        self._frame_depth_dex = (
            frame_depth_dex if (self.m_thres_cand and has_fine_pass) else None
        )

    def warmup(self, verbose: bool = True) -> None:
        """Compile the frame programs once, before serving."""
        pose = self.pose_from_angles(-30.0, -45.0, 4.0)
        t0 = time.time()
        np.asarray(self._frame_rgb(pose))
        np.asarray(self._frame_depth(pose))
        if self._frame_depth_dex is not None:
            np.asarray(self._frame_depth_dex(pose, 0))
        if verbose:
            print(
                f"warmup: frame programs compiled in {time.time() - t0:.1f}s"
            )

    @staticmethod
    def pose_from_angles(theta: float, phi: float, radius: float):
        from dexnerf_tpu.data.blender import pose_spherical

        return np.asarray(pose_spherical(theta, phi, radius), np.float32)

    def nearest_threshold(self, m: float) -> int:
        if self._frame_depth_dex is None:
            if not self.m_thres_cand:
                raise ValueError(
                    "this config defines no dex threshold candidates "
                    "(nerf.validation.m_thres)"
                )
            raise ValueError(
                "σ-threshold depth needs a fine pass (reference semantics): "
                "set nerf.validation.num_fine > 0 and configure a fine model"
            )
        return int(np.argmin(np.abs(np.asarray(self.m_thres_cand) - m)))

    def render_rgb(self, pose: np.ndarray) -> np.ndarray:
        with self.lock:
            t0 = time.time()
            rgb = np.asarray(self._frame_rgb(pose))
            self.last_render_s = time.time() - t0
            self.renders_served += 1
        return rgb

    def render_depth(
        self, pose: np.ndarray, threshold: Optional[float] = None
    ) -> np.ndarray:
        with self.lock:
            t0 = time.time()
            if threshold is None:
                d = np.asarray(self._frame_depth(pose))
            else:
                idx = self.nearest_threshold(threshold)
                d = np.asarray(self._frame_depth_dex(pose, idx))
            self.last_render_s = time.time() - t0
            self.renders_served += 1
        return d

    def render_depth_conf(self, pose: np.ndarray, delta: float):
        if self._frame_depth_conf is None:
            raise ValueError(
                "depth confidence reconstructs full-interval z-values and "
                "is unavailable with --occupancy interval tightening"
            )
        with self.lock:
            t0 = time.time()
            d, c = self._frame_depth_conf(pose, np.float32(delta))
            d, c = np.asarray(d), np.asarray(c)
            self.last_render_s = time.time() - t0
            self.renders_served += 1
        return d, c

    def info(self) -> dict:
        return {
            "status": "ok",
            "height": self.H,
            "width": self.W,
            "focal": self.focal,
            "num_coarse": int(self.settings.num_coarse),
            "num_fine": int(self.settings.num_fine),
            "m_thres_cand": list(self.m_thres_cand),
            "occupancy": self.occupancy is not None,
            "depth_confidence": self._frame_depth_conf is not None,
            "renders_served": self.renders_served,
            "last_render_s": self.last_render_s,
        }


def _png_bytes(rgb01: np.ndarray) -> bytes:
    import imageio.v2 as imageio

    img = np.clip(np.asarray(rgb01) * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    imageio.imwrite(buf, img, format="png")
    return buf.getvalue()


def _depth_png_bytes(depth_m: np.ndarray) -> bytes:
    """uint32 millimeter PNG — the reference's depth artifact format
    (``train_nerf_rgb.py:395-399``)."""
    from PIL import Image

    mm = (np.asarray(depth_m) * 1000.0).astype(np.uint32)
    buf = io.BytesIO()
    Image.fromarray(mm.astype(np.int32), mode="I").save(buf, format="PNG")
    return buf.getvalue()


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr, np.float32))
    return buf.getvalue()


def make_http_server(service: RenderService, host: str, port: int):
    """Build (not start) the threaded stdlib HTTP server."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    def _angles(q) -> np.ndarray:
        theta = float(q.get("theta", ["-30"])[0])
        phi = float(q.get("phi", ["-45"])[0])
        radius = float(q.get("radius", ["4"])[0])
        return service.pose_from_angles(theta, phi, radius)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._reply(
                code, "application/json",
                json.dumps(obj).encode("utf-8"),
            )

        def do_GET(self):
            try:
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path == "/healthz":
                    self._json(200, service.info())
                elif u.path == "/render":
                    rgb = service.render_rgb(_angles(q))
                    self._reply(200, "image/png", _png_bytes(rgb))
                elif u.path == "/depth":
                    thres = q.get("threshold")
                    d = service.render_depth(
                        _angles(q),
                        float(thres[0]) if thres else None,
                    )
                    fmt = q.get("format", ["npy"])[0]
                    if fmt == "png":
                        self._reply(200, "image/png", _depth_png_bytes(d))
                    elif fmt == "npy":
                        self._reply(
                            200, "application/octet-stream", _npy_bytes(d)
                        )
                    else:
                        self._json(400, {"error": f"unknown format {fmt!r}"})
                elif u.path == "/confidence":
                    delta = float(q.get("delta", ["0.05"])[0])
                    d, c = service.render_depth_conf(_angles(q), delta)
                    fmt = q.get("format", ["npz"])[0]
                    if fmt == "npz":
                        buf = io.BytesIO()
                        np.savez(
                            buf,
                            depth=d.astype(np.float32),
                            confidence=c.astype(np.float32),
                        )
                        self._reply(
                            200, "application/octet-stream", buf.getvalue()
                        )
                    elif fmt == "png":
                        gray = (np.clip(c, 0.0, 1.0) * 255.0).astype(np.uint8)
                        self._reply(200, "image/png", _png_bytes(gray / 255.0))
                    else:
                        self._json(400, {"error": f"unknown format {fmt!r}"})
                else:
                    self._json(404, {"error": f"no route {u.path}"})
            except Exception as e:  # surface errors to the client
                self._json(400, {"error": str(e)})

        def do_POST(self):
            try:
                u = urlparse(self.path)
                if u.path != "/render":
                    self._json(404, {"error": f"no route {u.path}"})
                    return
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                c2w = np.asarray(req["c2w"], np.float32)
                if c2w.shape != (4, 4):
                    raise ValueError(f"c2w must be 4x4, got {c2w.shape}")
                output = req.get("output", "rgb")
                if output == "rgb":
                    rgb = service.render_rgb(c2w)
                    self._reply(200, "image/png", _png_bytes(rgb))
                elif output == "depth":
                    d = service.render_depth(c2w, req.get("threshold"))
                    self._reply(
                        200, "application/octet-stream", _npy_bytes(d)
                    )
                else:
                    raise ValueError(f"unknown output {output!r}")
            except Exception as e:
                self._json(400, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def build_service(args) -> RenderService:
    """Load config + checkpoint and construct the RenderService (shared by
    ``main`` and the tests)."""
    import dataclasses

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.train.loop import (
        load_eval_params,
        maybe_fused_render_impl,
        setup_models,
    )

    cfg = load_config(args.config)
    cfg, params, ck_hwf, _ = load_eval_params(cfg, args.checkpoint)
    coarse_fn, fine_fn, _init_params = setup_models(
        cfg, int(cfg.experiment.randomseed)
    )
    H = W = focal = None
    if ck_hwf is not None:
        H, W, focal = ck_hwf
    if args.hwf is not None:
        H, W = int(args.hwf[0]), int(args.hwf[1])
        focal = float(args.hwf[2])
    if H is None:
        raise SystemExit(
            "frame geometry unknown: pass --hwf H W FOCAL (orbax "
            "checkpoints carry no frame size; the shipped *-lowres "
            "reference scenes are `--hwf 400 400 555.555`)"
        )

    has_dex = True
    try:
        cfg.nerf.validation.m_thres
    except Exception:
        has_dex = False
    s_val = render_settings_from_cfg(
        cfg, "validation", dex=has_dex
    ).eval_variant()
    if args.samples is not None:
        s_val = dataclasses.replace(
            s_val,
            num_coarse=int(args.samples[0]),
            num_fine=int(args.samples[1]),
        )
    rays_impl = maybe_fused_render_impl(cfg, s_val)

    occupancy = None
    if args.occupancy is not None:
        from dexnerf_tpu.render import make_mlp_field
        from dexnerf_tpu.render.occupancy import build_occupancy_grid

        occ_fine = "fine" in params and fine_fn is not None
        occ_field = make_mlp_field(fine_fn if occ_fine else coarse_fn, s_val)
        occupancy = build_occupancy_grid(
            occ_field,
            params["fine"] if occ_fine else params["coarse"],
            sigma_threshold=float(args.occupancy),
            center=tuple(args.occupancy_center),
            radius=float(args.occupancy_radius),
            resolution=int(args.occupancy_resolution),
            dilate=int(args.occupancy_dilate),
        )
        print(
            f"occupancy grid baked: "
            f"{100.0 * occupancy.occupancy_fraction():.1f}% occupied"
        )

    return RenderService(
        cfg, params, coarse_fn, fine_fn, s_val, H, W, focal,
        rays_impl=rays_impl,
        occupancy=occupancy,
        occupancy_probes=int(args.occupancy_probes),
        occupancy_subsample=int(args.occupancy_subsample),
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    service = build_service(args)
    if not args.no_warmup:
        service.warmup()
    httpd = make_http_server(service, args.host, args.port)
    host, port = httpd.server_address[:2]
    print(
        f"serving on http://{host}:{port}  "
        f"(/healthz /render /depth; {service.H}x{service.W}, "
        f"{service.settings.num_coarse}+{service.settings.num_fine} samples"
        + (
            f", dex thresholds {service.m_thres_cand[0]:g}.."
            f"{service.m_thres_cand[-1]:g}"
            if service.m_thres_cand
            else ""
        )
        + ")",
        flush=True,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
