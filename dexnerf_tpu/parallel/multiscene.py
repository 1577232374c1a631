"""Multi-scene batched training: N independent NeRFs trained in lockstep.

The reference's scale-out story is one Kubernetes job per scene
(``job-example.yaml`` — each Dex-NeRF table scene gets its own GPU and its
own process). The TPU-native answer is to BATCH scenes: every scene is an
independent NeRF (own parameters, own optimizer state, own ray store), the
per-scene train step is ``vmap``-ed over a leading scene axis, and the
stacked state/stores are sharded over the device mesh on that axis. Scenes
are embarrassingly parallel, so the program contains ZERO collectives — the
GSPMD partitioner splits the vmapped program across chips with no
communication, which is exactly the reference's "launch more jobs" topology
without the jobs.

This is also a single-chip throughput lever: the flagship MLP's dot chains
are latency-bound on the MXU (docs/PERF_NOTES.md "interleave"), and two
scenes' chains are independent, so XLA can interleave them within one
program the same way the fused kernels interleave ray-parts.

Scope: the XLA render path. The fused Pallas kernels assume they own the
whole chip's VMEM for one scene's block pipeline; batching them behind
``vmap`` would serialize the grid anyway, so multi-scene keeps the XLA path
(per-scene fused training remains available by training scenes separately).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dexnerf_tpu.data.pipeline import RayStore
from dexnerf_tpu.parallel.mesh import RAY_AXIS
from dexnerf_tpu.render.renderer import (
    ModelFn,
    RayBatch,
    RenderSettings,
    render_rays,
)
from dexnerf_tpu.train.step import TrainState, nerf_loss

SCENE_AXIS = "scene"


def make_scene_mesh(
    num_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh named ``scene`` (same construction as ``make_mesh``, which
    names its axis ``rays`` — a multi-scene program shards the SCENE axis)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = list(devices)[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(SCENE_AXIS,))


def make_scene_data_mesh(
    scene_devices: int,
    data_devices: int,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ``(scene, rays)`` mesh: ``scene_devices * data_devices`` chips.

    The scene axis is the outer (slower) mesh dim so each scene's
    ``data_devices``-chip group is ICI-contiguous — the gradient ``pmean``
    inside a scene rides the fast links; there is NO communication across
    scenes at all."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    need = scene_devices * data_devices
    if len(devices) < need:
        raise ValueError(
            f"scene_devices*data_devices = {need} but only "
            f"{len(devices)} devices available"
        )
    grid = np.asarray(list(devices)[:need]).reshape(
        scene_devices, data_devices
    )
    return Mesh(grid, axis_names=(SCENE_AXIS, RAY_AXIS))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "near", "far"),
    meta_fields=("rays_per_image",),
)
@dataclasses.dataclass(frozen=True)
class MultiSceneStore:
    """Stacked ray stores: ``data[s]`` is scene ``s``'s packed rays.

    ``near``/``far`` are per-scene ARRAYS (data fields — scenes may have
    different depth ranges), unlike the single-scene ``RayStore`` where
    they are static metadata. ``rays_per_image`` stays static and must
    agree across scenes (0 when any scene lacks image structure).
    """

    data: jnp.ndarray  # [M, N, 12]
    near: jnp.ndarray  # [M]
    far: jnp.ndarray  # [M]
    rays_per_image: int = 0

    @property
    def num_scenes(self) -> int:
        return self.data.shape[0]

    @property
    def num_rays(self) -> int:
        return self.data.shape[1]


def stack_ray_stores(stores: Sequence[RayStore]) -> MultiSceneStore:
    """Stack single-scene stores along a new scene axis.

    All scenes must have the same ray count (same image count and
    resolution — the natural case for a capture rig sweeping many table
    scenes; pad or crop upstream otherwise).
    """
    if not stores:
        raise ValueError("no stores to stack")
    counts = {s.num_rays for s in stores}
    if len(counts) != 1:
        raise ValueError(
            f"scenes have different ray counts {sorted(counts)}; "
            "multi-scene training needs equal-sized stores"
        )
    rpis = {s.rays_per_image for s in stores}
    rpi = rpis.pop() if len(rpis) == 1 else 0
    return MultiSceneStore(
        data=jnp.stack([s.data for s in stores]),
        near=jnp.asarray([s.near for s in stores], jnp.float32),
        far=jnp.asarray([s.far for s in stores], jnp.float32),
        rays_per_image=rpi,
    )


def scene_store(ms: MultiSceneStore, i: int) -> RayStore:
    """Slice scene ``i`` back out as a single-scene ``RayStore`` (host-side;
    for eval/validation of one scene)."""
    return RayStore(
        data=ms.data[i],
        near=float(ms.near[i]),
        far=float(ms.far[i]),
        rays_per_image=ms.rays_per_image,
    )


def stack_params(params_list: Sequence[Any]) -> Any:
    """Stack per-scene parameter pytrees along a new leading scene axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def scene_params(stacked: Any, i: int) -> Any:
    """Slice scene ``i``'s parameters back out (for checkpointing/eval)."""
    return jax.tree.map(lambda x: x[i], stacked)


def init_multi_scene_state(
    stacked_params: Any, tx: optax.GradientTransformation
) -> TrainState:
    """TrainState whose params/opt_state carry a leading scene axis.

    ``step`` stays a single scalar — scenes advance in lockstep."""
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=stacked_params,
        opt_state=jax.vmap(tx.init)(stacked_params),
    )


def shard_multi_scene(
    state: TrainState, store: MultiSceneStore, mesh: Mesh
) -> Tuple[TrainState, MultiSceneStore]:
    """Place the stacked state/store with the scene axis sharded over the
    mesh (everything scene-major on dim 0; ``state.step`` replicated).
    The scene count must divide by the mesh's scene-axis size. Works for
    the 1-D ``(scene,)`` mesh and the 2-D ``(scene, rays)`` mesh alike —
    on the 2-D mesh everything is replicated across the ``rays`` axis."""
    n_dev = (
        mesh.shape[SCENE_AXIS]
        if SCENE_AXIS in mesh.axis_names
        else mesh.devices.size
    )
    m = store.num_scenes
    if m % n_dev:
        raise ValueError(f"{m} scenes not divisible by {n_dev} devices")
    scene = NamedSharding(mesh, P(SCENE_AXIS))
    repl = NamedSharding(mesh, P())

    def put_scene(x):
        return jax.device_put(x, scene)

    state = TrainState(
        step=jax.device_put(state.step, repl),
        params=jax.tree.map(put_scene, state.params),
        opt_state=jax.tree.map(put_scene, state.opt_state),
    )
    store = MultiSceneStore(
        data=put_scene(store.data),
        near=put_scene(store.near),
        far=put_scene(store.far),
        rays_per_image=store.rays_per_image,
    )
    return state, store


def make_multi_scene_train_step(
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    batch_per_scene: int,
    *,
    supervision: str = "rgb",
    sampling: str = "uniform",
    steps_per_call: int = 1,
):
    """Build the vmapped multi-scene train step.

    Returns ``step(state, store, key) -> (state, metrics)`` where every
    metric is a per-scene ``[num_scenes]`` array. Each scene draws its rays
    with ``fold_in(key, scene_index)`` and then follows EXACTLY the
    single-scene step's draw structure (split -> sample -> render), so
    scene ``i``'s trajectory is bit-identical to training it alone with
    ``make_train_step`` under key ``fold_in(key, i)`` — regression-tested.

    Sharding: the step is pure vmap — jit it against inputs placed by
    :func:`shard_multi_scene` and GSPMD splits it over the mesh with no
    collectives (scenes are independent).
    """

    def scene_loss(params, data, near, far, key):
        k_sample, k_render = jax.random.split(key)
        n_rays = data.shape[0]
        idx = jax.random.randint(k_sample, (batch_per_scene,), 0, n_rays)
        rows = jnp.take(data, idx, axis=0)
        rays = RayBatch(
            origins=rows[:, 0:3],
            directions=rows[:, 3:6],
            viewdirs=rows[:, 6:9],
            near=jnp.broadcast_to(near, (batch_per_scene,)).astype(rows.dtype),
            far=jnp.broadcast_to(far, (batch_per_scene,)).astype(rows.dtype),
        )
        result = render_rays(
            coarse_fn, fine_fn, params, rays, k_render, settings
        )
        return nerf_loss(result, rows[:, 9:12], supervision=supervision)

    if sampling == "per_image":
        raise NotImplementedError(
            "multi-scene per_image sampling: use uniform (the store-wide "
            "sampling variant); per-image draws need the per-scene image "
            "structure threaded through — train scenes separately for "
            "reference-exact sampling"
        )
    if sampling != "uniform":
        raise ValueError(f"unknown sampling mode: {sampling}")

    def scene_step(params, opt_state, data, near, far, key):
        (_, metrics), grads = jax.value_and_grad(scene_loss, has_aux=True)(
            params, data, near, far, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["psnr"] = -10.0 * jnp.log10(
            jnp.maximum(metrics["loss"], 1e-10)
        )
        return params, opt_state, metrics

    vstep = jax.vmap(scene_step)

    def one_step(state: TrainState, store: MultiSceneStore, key: jax.Array):
        m = store.num_scenes
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(m))
        params, opt_state, metrics = vstep(
            state.params, state.opt_state, store.data, store.near,
            store.far, keys,
        )
        return (
            TrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            metrics,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, store: MultiSceneStore, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if steps_per_call == 1:
            return one_step(state, store, key)

        def body(carry, k):
            return one_step(carry, store, k)

        keys = jax.random.split(key, steps_per_call)
        state, metrics_seq = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(lambda x: x[-1], metrics_seq)

    return train_step


def make_multi_scene_parallel_train_step(
    mesh: Mesh,
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    batch_per_scene: int,
    *,
    supervision: str = "rgb",
    steps_per_call: int = 1,
):
    """2-D scene x data parallel train step over a ``(scene, rays)`` mesh.

    Composes the two parallelism axes: M scenes are sharded over the
    ``scene`` mesh axis (zero cross-scene communication) and each scene's
    ray batch is split over the ``rays`` axis with a per-scene gradient
    ``pmean`` riding the ICI links WITHIN its device group — the TPU-native
    version of the reference's "one (multi-GPU) k8s job per scene" topology
    as one compiled program (``job-example.yaml``; the reference itself is
    single-GPU per job, SURVEY §2.2 — this goes beyond it).

    RNG contract: scene ``i`` folds the step key as ``fold_in(key, i)`` and
    then follows EXACTLY the 1-D data-parallel draw structure
    (``sharding.make_parallel_train_step``: per-device ``fold_in`` by
    ``rays``-axis index, split, uniform index draw), so scene ``i``'s
    trajectory is bit-identical to training it ALONE data-parallel over
    ``data_devices`` chips under ``fold_in(key, i)`` — regression-tested.

    ``batch_per_scene`` must divide by the mesh's ``rays``-axis size; the
    scene count must divide by the ``scene``-axis size. XLA path only (see
    the module docstring for why the fused kernels stay single-scene).
    """
    if set(mesh.axis_names) != {SCENE_AXIS, RAY_AXIS}:
        raise ValueError(
            f"need a (scene, rays) mesh, got axes {mesh.axis_names}"
        )
    n_data = mesh.shape[RAY_AXIS]
    if batch_per_scene % n_data:
        raise ValueError(
            f"batch_per_scene {batch_per_scene} not divisible by "
            f"{n_data} data devices"
        )
    local_batch = batch_per_scene // n_data

    def scene_local_grads(params, data, near, far, key):
        # identical draw structure to sharding.make_parallel_train_step
        # ("uniform"): fold by data-axis index, split, uniform index draw
        key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
        k_sample, k_render = jax.random.split(key)
        idx = jax.random.randint(k_sample, (local_batch,), 0, data.shape[0])
        rows = jnp.take(data, idx, axis=0)
        rays = RayBatch(
            origins=rows[:, 0:3],
            directions=rows[:, 3:6],
            viewdirs=rows[:, 6:9],
            near=jnp.broadcast_to(near, (local_batch,)).astype(rows.dtype),
            far=jnp.broadcast_to(far, (local_batch,)).astype(rows.dtype),
        )
        result = render_rays(
            coarse_fn, fine_fn, params, rays, k_render, settings
        )
        return nerf_loss(result, rows[:, 9:12], supervision=supervision)

    def scene_step(params, opt_state, data, near, far, key):
        (_, metrics), grads = jax.value_and_grad(
            scene_local_grads, has_aux=True
        )(params, data, near, far, key)
        grads = jax.lax.pmean(grads, RAY_AXIS)
        metrics = jax.lax.pmean(metrics, RAY_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["psnr"] = -10.0 * jnp.log10(
            jnp.maximum(metrics["loss"], 1e-10)
        )
        return params, opt_state, metrics

    vstep = jax.vmap(scene_step)  # over this shard's local scenes

    def one_step(carry, data, near, far, key):
        step, params, opt_state = carry
        m_local = data.shape[0]
        s0 = jax.lax.axis_index(SCENE_AXIS) * m_local
        keys = jax.vmap(lambda i: jax.random.fold_in(key, s0 + i))(
            jnp.arange(m_local)
        )
        params, opt_state, metrics = vstep(
            params, opt_state, data, near, far, keys
        )
        return (step + 1, params, opt_state), metrics

    def sharded_step(step, params, opt_state, data, near, far, key):
        carry = (step, params, opt_state)
        if steps_per_call == 1:
            return one_step(carry, data, near, far, key)

        def body(c, k):
            return one_step(c, data, near, far, k)

        keys = jax.random.split(key, steps_per_call)
        carry, metrics_seq = jax.lax.scan(body, carry, keys)
        return carry, jax.tree.map(lambda x: x[-1], metrics_seq)

    scene = P(SCENE_AXIS)
    shard_mapped = jax.shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), scene, scene, scene, scene, scene, P()),
        out_specs=((P(), scene, scene), scene),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, store: MultiSceneStore, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (step, params, opt_state), metrics = shard_mapped(
            state.step, state.params, state.opt_state,
            store.data, store.near, store.far, key,
        )
        return TrainState(step=step, params=params, opt_state=opt_state), metrics

    return train_step
