"""Multi-chip rendering: pixel-tile sharding over a device mesh.

The reference is strictly single-GPU (one queue, ``src/main.cpp:1017-1024``);
the TPU-native scale axis is rays — embarrassingly parallel — so raytpu
shards **pixel rows** across chips with ``shard_map`` over a 1-D
``jax.sharding.Mesh`` (SURVEY.md §5). Scene data (BVH + triangles + skybox,
≤ a few hundred MB) is replicated per chip; no collective is needed inside a
frame — the only cross-chip data movement is the final tile gather, which
XLA emits as an all-gather over ICI when the output sharding asks for it.

For scenes exceeding per-chip HBM, the extension point is BVH sharding with
ring-passed ray queues (ring-attention analog) — documented, not needed by
any reference config.

Testable without hardware: an 8-device CPU mesh via
``--xla_force_host_platform_device_count=8`` (tests/conftest.py) — the
driver's ``dryrun_multichip`` uses the same path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytpu.device_scene import DeviceScene, SceneStatic
from raytpu.integrator import RenderStatic, render_pixels


def make_mesh(n_devices: Optional[int] = None, axis: str = "tiles") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def render_frame_sharded(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    camera: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Full-frame render sharded row-wise across ``mesh``.

    Rows are padded to a multiple of the mesh size; each device renders its
    row slab with the scene replicated — the multi-chip analog of one
    ``vkCmdTraceRaysKHR`` dispatch (``src/main.cpp:2620-2624``).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    h, w = rs.height, rs.width
    pad_rows = (-h) % n_dev
    h_padded = h + pad_rows

    ys, xs = jnp.mgrid[0:h_padded, 0:w]
    pix = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)  # (Hp, W, 2)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    def shard_render(scene_rep, camera_rep, pix_tile):
        flat = pix_tile.reshape(-1, 2)
        colors = render_pixels(scene_rep, static, rs, camera_rep, flat)
        return colors.reshape(pix_tile.shape[0], w, 3)

    img = shard_render(scene, camera, pix)
    return img[:h]


@functools.partial(jax.jit, static_argnums=(1, 2), static_argnames=("mesh",))
def _render_sharded_jit(scene, static, rs, camera, *, mesh):
    return render_frame_sharded(scene, static, rs, camera, mesh)


def render_sharded(
    scene: DeviceScene,
    static: SceneStatic,
    rs: RenderStatic,
    camera,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Jitted sharded frame render (mesh defaults to all devices)."""
    if mesh is None:
        mesh = make_mesh()
    return _render_sharded_jit(
        scene, static, rs, jnp.asarray(camera), mesh=mesh
    )
