"""Occupancy-grid-guided ray-interval tightening (empty-space skipping).

Beyond-parity render acceleration in the Instant-NGP family: a binary
σ-occupancy grid is baked from the trained density field once per
checkpoint, and at render time every ray's ``[near, far]`` integration
interval is tightened to the segment that actually intersects occupied
space. The renderer's sample budget then concentrates where matter is —
the same image quality needs far fewer samples per ray, which is where
all the FLOPs are (the reference integrates the full frustum with 64+64
samples unconditionally, ``train_utils.py:111-133``).

TPU-native formulation — everything is shape-static so it jits into the
same program as the render itself:

* The grid bake is a fixed-batch ``lax.map`` of the renderer's own field
  function over a dense lattice (the same device-side σ evaluation
  ``apps.mesh`` uses), followed by ``dilate`` rounds of 3³ max-pooling
  (``lax.reduce_window``) so thin structures and the trilinear footprint
  survive thresholding.
* Interval tightening probes K fixed points along each ray (a [N, K]
  broadcast, one flat gather into the grid, a masked min/max — no
  data-dependent control flow, no per-ray loops). Rays that hit nothing
  keep their original interval: with no occupied sample the field
  composites to background exactly as before, so misses are handled by
  VALUES, not by shape-varying control flow.

The tightened intervals ride the existing per-ray ``RayBatch.near/far``
(both the XLA renderer and the fused Pallas render kernel already sample
``stratified_z_vals(rays.near, rays.far)``), so acceleration needs no
kernel changes. NDC rays are rejected: occupancy lives in world space
and NDC reparameterizes the frustum (``nerf_helpers.py:172-199``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyGrid(NamedTuple):
    """Axis-aligned binary occupancy over ``[center - radius, center + radius]³``.

    ``occ``: [R, R, R] bool — cell (i, j, k) covers the half-open box
    whose min corner is ``center - radius + (i, j, k) * spacing`` with
    ``spacing = 2 * radius / R``.
    """

    occ: jnp.ndarray  # [R, R, R] bool
    center: jnp.ndarray  # [3] f32
    radius: jnp.ndarray  # [] f32

    @property
    def resolution(self) -> int:
        return int(self.occ.shape[0])

    def occupancy_fraction(self) -> float:
        return float(jnp.mean(self.occ.astype(jnp.float32)))


@functools.lru_cache(maxsize=8)
def _lattice_blocks(
    resolution: int, radius: float, batch: int, style: str = "centers"
):
    """Device-resident, center-free lattice, blocked for ``lax.map``.
    Cached: re-bakes (occupancy-guided TRAINING re-bakes every few thousand
    steps) must not re-upload the 25 MB lattice each time.

    ``style="centers"`` samples cell centers (the grid as a volume
    classifier — the center is the least-biased single probe of a cell);
    ``style="corners"`` samples the inclusive endpoint lattice
    (isosurface extraction wants node values at cube corners)."""
    n = int(resolution)
    if style == "corners":
        lin = np.linspace(
            -float(radius), float(radius), n, dtype=np.float32
        )
    elif style == "centers":
        spacing = 2.0 * float(radius) / n
        lin = (np.arange(n, dtype=np.float32) + 0.5) * spacing - float(radius)
    else:
        raise ValueError(f"unknown lattice style {style!r}")
    pts = np.stack(
        np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    total = pts.shape[0]
    bs = int(min(batch, total))
    pad = (-total) % bs
    padded = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    return jax.device_put(jnp.asarray(padded.reshape(-1, bs, 3))), total


@functools.lru_cache(maxsize=8)
def _sigma_eval_fn(field):
    """One compiled lattice evaluator per FIELD FUNCTION OBJECT.

    Callers that re-bake (the train loop) must pass a STABLE field
    callable — a fresh ``make_mlp_field`` closure per bake would compile a
    fresh program each time (minutes per re-bake on the remote-TPU
    backend)."""

    @jax.jit
    def run(p, blks, center):
        def one(block):
            block = block + center
            vd = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), block.shape
            )
            raw = field(p, block[:, None, :], vd)
            return jnp.maximum(raw[:, 0, 3], 0.0)

        return jax.lax.map(one, blks)

    return run


def eval_sigma_grid(
    field: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: Any,
    *,
    center=(0.0, 0.0, 0.0),
    radius: float = 1.5,
    resolution: int = 128,
    batch: int = 65536,
    style: str = "centers",
) -> jnp.ndarray:
    """Evaluate relu(σ) on a dense ``resolution³`` lattice, on device.

    ``field`` is a renderer ``FieldFn`` (``make_mlp_field``): σ is
    view-independent in every model family (the viewdir branch feeds rgb
    only), so a fixed +z direction satisfies the interface. Returns an
    [R, R, R] f32 array ordered ``ij`` (x-major); ``style`` picks cell
    CENTERS (occupancy bakes) or corner NODES (isosurface extraction,
    ``apps.mesh``) — see ``_lattice_blocks``.
    """
    n = int(resolution)
    blocks, total = _lattice_blocks(n, float(radius), int(batch), str(style))
    run = _sigma_eval_fn(field)
    sigma = run(params, blocks, jnp.asarray(center, jnp.float32))
    sigma = sigma.reshape(-1)[:total]
    return sigma.reshape(n, n, n)


def dilate_occupancy(occ: jnp.ndarray, rounds: int = 1) -> jnp.ndarray:
    """Binary dilation by ``rounds`` cells (3³ max-pool per round)."""
    x = occ.astype(jnp.float32)
    for _ in range(int(rounds)):
        x = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(3, 3, 3),
            window_strides=(1, 1, 1),
            padding="SAME",
        )
    return x > 0.5


def build_occupancy_grid(
    field,
    params,
    *,
    sigma_threshold: float,
    center=(0.0, 0.0, 0.0),
    radius: float = 1.5,
    resolution: int = 128,
    dilate: int = 1,
    batch: int = 65536,
) -> OccupancyGrid:
    """Bake a binary occupancy grid from a trained field.

    ``sigma_threshold`` uses the same units as the Dex-NeRF depth
    threshold family (``volume_rendering_utils.py:51-58``); a value FAR
    below the scene's surface threshold keeps semi-transparent fringes
    inside the integration interval — excluded fringe mass biases the
    render even when each excluded cell's per-sample alpha looks small.
    Chip sweep on lego-lowres at 64+64 vs a converged reference:
    σ=0.2 → 52.9 dB, σ=0.5 → 44.4 dB, σ=2.0 → 37.7 dB (full interval:
    41.7 dB), so ~0.2 is the recommended default where depth thresholds
    run ~15+.
    """
    sigma = eval_sigma_grid(
        field,
        params,
        center=center,
        radius=radius,
        resolution=resolution,
        batch=batch,
    )
    occ = sigma > float(sigma_threshold)
    if dilate:
        occ = dilate_occupancy(occ, dilate)
    return OccupancyGrid(
        occ=occ,
        center=jnp.asarray(center, jnp.float32),
        radius=jnp.asarray(float(radius), jnp.float32),
    )


def tighten_ray_intervals(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    *,
    num_probes: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray tightened ``(near, far)`` from fixed-count occupancy probes.

    Probes ``num_probes`` midpoints of ``[near, far]`` per ray, looks each
    up in the grid, and brackets the occupied span with one probe step of
    margin on each side. Rays with no occupied probe keep their original
    interval (values handle the miss — the field composites to background
    there). Probe spacing should not exceed the grid's (dilated) feature
    size: with ``dilate=1`` occupied blobs are ≥ 3 cells wide, so
    ``num_probes >= (far - near) / (3 * spacing)`` cannot skip one.

    TPU layout: everything is computed as dense [N, K] tiles — per-axis
    grid coordinates, never [N, K, 3] (a 3-lane minor dim wastes 125/128
    vector lanes; measured 25 ms/frame at 400², tools/tighten_microbench).
    The one flat grid gather is the dominant cost (~8 ns/index on v5e
    regardless of table size), so probe count — not grid resolution — is
    the knob that buys time; :func:`tighten_image_intervals` amortizes it
    over pixel coherence for full frames.
    """
    k = int(num_probes)
    res = grid.resolution
    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    frac = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    t = near[..., None] + (far - near)[..., None] * frac  # [N, K]
    lo = grid.center - grid.radius
    inv_spacing = res / (2.0 * grid.radius)
    flat = None
    inbounds = None
    for a in range(3):
        u = (
            origins[..., a : a + 1] + directions[..., a : a + 1] * t - lo[a]
        ) * inv_spacing  # [N, K] dense
        ia = jnp.floor(u).astype(jnp.int32)
        inb_a = (ia >= 0) & (ia < res)
        inbounds = inb_a if inbounds is None else (inbounds & inb_a)
        ia = jnp.clip(ia, 0, res - 1)
        flat = ia if flat is None else flat * res + ia
    # gather as uint8 (TPU gathers of pred lower poorly), compare after
    occ_flat = grid.occ.reshape(-1).astype(jnp.uint8)
    hit = (jnp.take(occ_flat, flat) > 0) & inbounds  # [N, K]

    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    t0 = jnp.min(jnp.where(hit, t, big), axis=-1)
    t1 = jnp.max(jnp.where(hit, t, -big), axis=-1)
    step = (far - near) / k
    any_hit = jnp.any(hit, axis=-1)
    new_near = jnp.where(any_hit, jnp.maximum(near, t0 - step), near)
    new_far = jnp.where(any_hit, jnp.minimum(far, t1 + step), far)
    return new_near.astype(near.dtype), new_far.astype(far.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_probes", "block", "num_rays")
)
def _tighten_blocks(grid, data, near, far, num_probes, block, num_rays):
    padded = jnp.pad(data, ((0, (-num_rays) % block), (0, 0)))
    blocks = padded.reshape(-1, block, data.shape[1])

    def one(rows):
        n, f = tighten_ray_intervals(
            grid,
            rows[:, 0:3],
            rows[:, 3:6],
            jnp.full((block,), near, jnp.float32),
            jnp.full((block,), far, jnp.float32),
            num_probes=num_probes,
        )
        return jnp.stack([n, f], axis=-1)

    return jax.lax.map(one, blocks).reshape(-1, 2)[:num_rays]


def tighten_store_intervals(
    grid: OccupancyGrid,
    data: jnp.ndarray,
    near: float,
    far: float,
    *,
    num_probes: int = 64,
    block: int = 65536,
) -> jnp.ndarray:
    """Tightened per-ray ``[N, 2]`` intervals for a whole packed ray store.

    ``data`` is the ``RayStore.data`` layout ([N, >=6]: origins in columns
    0:3, directions 3:6); ``near``/``far`` are the scene scalars — each
    re-bake tightens from the ORIGINAL interval, never from a previous
    tightening, so successive bakes cannot compound clipping. Runs as a
    fixed-block ``lax.map`` on device (the store never leaves HBM); cost
    is dominated by the ``N * num_probes`` grid gathers (~8 ns each on
    v5e), e.g. 16M rays x 64 probes ≈ 8 s — amortized over an occupancy
    re-bake period of thousands of steps.
    """
    n = int(data.shape[0])
    return _tighten_blocks(
        grid,
        data,
        float(near),
        float(far),
        int(num_probes),
        int(min(block, n)),
        n,
    )


def tighten_image_intervals(
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    img_shape: Tuple[int, int],
    *,
    num_probes: int = 128,
    subsample: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-frame interval tightening amortized over pixel coherence.

    Probes only every ``subsample``-th pixel in each image axis (the
    dominant cost is the per-probe grid gather), then propagates each
    probed interval to its neighborhood with a conservative 3×3
    min(near)/max(far) window before nearest-neighbor upsampling. A probed
    MISS keeps the full ``[near, far]`` interval, so the window propagates
    full intervals — never clipped ones — into uncertain regions.

    Conservative when the grid's dilated occupied blobs are wider on
    screen than ``subsample`` pixels: with ``dilate=1`` a blob is ≥ 3
    cells ≈ ``3·spacing·focal/far`` px (≈ 5 px for the blender scenes at
    128³), so the default ``subsample=2`` cannot step over one.
    """
    s = int(subsample)
    h, w = int(img_shape[0]), int(img_shape[1])
    if s <= 1 or (h % s) or (w % s):
        return tighten_ray_intervals(
            grid, origins, directions, near, far, num_probes=num_probes
        )
    ro = origins.reshape(h, w, 3)[::s, ::s]
    rd = directions.reshape(h, w, 3)[::s, ::s]
    nr = near.reshape(h, w)[::s, ::s]
    fr = far.reshape(h, w)[::s, ::s]
    t_near, t_far = tighten_ray_intervals(
        grid,
        ro.reshape(-1, 3),
        rd.reshape(-1, 3),
        nr.reshape(-1),
        fr.reshape(-1),
        num_probes=num_probes,
    )
    hs, ws = h // s, w // s
    t_near = t_near.reshape(hs, ws)
    t_far = t_far.reshape(hs, ws)
    t_near = -jax.lax.reduce_window(
        -t_near, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    t_far = jax.lax.reduce_window(
        t_far, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    up_near = jnp.repeat(jnp.repeat(t_near, s, axis=0), s, axis=1)
    up_far = jnp.repeat(jnp.repeat(t_far, s, axis=1), s, axis=0)
    near2 = jnp.maximum(jnp.asarray(near, jnp.float32).reshape(h, w),
                        up_near)
    far2 = jnp.minimum(jnp.asarray(far, jnp.float32).reshape(h, w), up_far)
    # window min/max of miss rows restores full intervals, but keep the
    # invariant near <= far explicitly for safety
    near2 = jnp.minimum(near2, far2)
    return near2.reshape(-1), far2.reshape(-1)
