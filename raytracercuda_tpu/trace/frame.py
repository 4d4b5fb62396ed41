"""FrameRenderer: the product path for pinhole frames.

The reference's hot path IS its product path (`SceneTree::march`,
`SceneTree.cpp:109-127`): applications call one method and get the
measured-fastest kernel.  This module gives the TPU framework the same
property — `bench.py`, the render CLI, and the driver entry point all
render through FrameRenderer, so the flagship Pallas kernels are exercised
by every consumer (and by every compile check) instead of only by
hand-wired benchmarks — the structural fix for rounds 1-2 shipping
uncompiled kernels.

The frame is two jitted stages (a single whole-frame program was measured
to push the remote-compile tunnel past 25 minutes; two stages hand off
device-to-device for ~0.7 ms):

  1. ``prep + fused trace``: rotate the ray grid, tile it, conservative
     frustum cull, then the fused trace+interpolate Pallas kernel
     (`pallas_sweep.trace_shade_tiles_pallas`) returns the winner's t/u/v
     and its interpolated normal/albedo/uv — no scattered gathers.
  2. ``shadow + shade``: directional-light occlusion kernel over the hit
     points, then pure elementwise Lambert shading and the single
     tile->row-major reorder of the packed framebuffer.

Off-TPU (or with ``use_pallas_sweep=False``) the same API runs the XLA
dense path (`trace/dense.py`), which is also the differentiable route.
Shade-attribute blocks are built ONCE per (scene, accel) — the fix for
the r2 advisor finding that the pipeline re-materialized them per frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import SceneData
from ..ops.math import normalize
from .dense import tile_pixels, untile_pixels


def use_pallas(config: RenderConfig, cluster_size: int) -> bool:
    """Resolve the auto flag: Pallas tile-sweep on TPU (or when forced),
    XLA dense elsewhere.  Requires lane-aligned segments."""
    if cluster_size % 128 != 0:
        return False
    flag = config.trace.use_pallas_sweep
    if flag is None:
        return jax.default_backend() == "tpu"
    return flag


class FrameRenderer:
    """Render pinhole frames of one (scene, accel) pair at a fixed size.

    Builds per-scene kernel operands once; `render` is then two jitted
    dispatches on the Pallas path (one on the XLA path).
    """

    def __init__(
        self,
        scene: SceneData,
        accel,
        config: RenderConfig,
        height: int,
        width: int,
        light_dir=(0.4, 0.8, -0.45),
        ambient: float = 0.08,
        background=(0.0, 1.0, 0.0),
        shadows: bool = True,
        single_dispatch: bool = False,
    ):
        self.scene = scene
        self.accel = accel
        self.config = config
        self.height, self.width = height, width
        self.ambient = float(ambient)
        self.background = jnp.asarray(background, jnp.float32)
        self.shadows = shadows
        self.single_dispatch = single_dispatch
        self.light = normalize(jnp.asarray(light_dir, jnp.float32))
        lo = scene.positions.min(axis=0)
        hi = scene.positions.max(axis=0)
        self.extent = float(jnp.max(hi - lo))
        # Shadow-ray offset scaled to the scene: push the origin toward
        # the light far enough to clear the surface at float precision.
        self.shadow_eps = jnp.float32(config.trace.t_epsilon * self.extent)
        self.tile_px = config.trace.dense_tile_px
        self.pallas = use_pallas(config, getattr(accel, "cluster_size", 0))
        if self.pallas:
            from .pallas_sweep import segment_blocks, shade_segment_blocks

            # Built ONCE per (scene, accel): the fused trace blocks carry
            # interpolation attributes; occlusion sweeps corners only.
            self.blocks, self.has_uv = shade_segment_blocks(accel, scene)
            self.occ_blocks = (accel.tri_blocks
                               if getattr(accel, "tri_blocks", None)
                               is not None else segment_blocks(accel))
        else:
            from .shade import build_face_tables

            self.tables = build_face_tables(scene)

    # ---------------- Pallas path (two stages) ----------------

    def _trace_impl(self, accel, blocks, rays, eye, orient):
        from .pallas_sweep import trace_shade_tiles_pallas
        from .pipeline import rotate_rays

        dirs = rotate_rays(rays, orient)
        d_tiles = tile_pixels(dirs, self.height, self.width, self.tile_px)
        hit, normal, albedo, tex_uv = trace_shade_tiles_pallas(
            accel, blocks, self.has_uv, eye, d_tiles,
            tile_px=self.tile_px, trace_cfg=self.config.trace)
        return d_tiles, hit, normal, albedo, tex_uv

    def _shadow_shade_impl(self, accel, occ_blocks, textures, eye, d_tiles,
                           hit, normal, albedo, tex_uv):
        from .pallas_sweep import occlusion_tiles_pallas

        tp = self.tile_px
        t = d_tiles.shape[0]
        dirs_flat = d_tiles.reshape(-1, 3)
        n = normalize(normal, eps=1e-30)
        flip = jnp.sum(n * dirs_flat, axis=-1) > 0.0
        n = jnp.where(flip[..., None], -n, n)
        ndotl = jnp.maximum(jnp.sum(n * self.light, axis=-1), 0.0)
        if self.shadows:
            # Shadow rays only where they can change the pixel: surfaces
            # facing away from the light (ndotl == 0) shade to ambient
            # with or without occlusion.  This also tightens each tile's
            # swept hit box, shrinking the occlusion survivor lists.
            active = hit.hit_mask & (ndotl > 0.0)
            p = eye[None, :] + dirs_flat * jnp.minimum(hit.t, 1e6)[..., None]
            so = (jnp.where(active[..., None], p, eye[None, :])
                  + self.light * self.shadow_eps)
            shadow = occlusion_tiles_pallas(
                accel, occ_blocks, so.reshape(t, tp * tp, 3), self.light,
                active.reshape(t, tp * tp), tile_px=tp,
                trace_cfg=self.config.trace)
            ndotl = jnp.where(shadow, 0.0, ndotl)
        rgb = self._shade_lit(hit, ndotl, albedo, tex_uv, textures)
        from .shade import pack_shaded

        packed = pack_shaded(rgb)
        return untile_pixels(packed.reshape(t, tp * tp), self.height,
                             self.width, tp)

    def _shade_lit(self, hit, ndotl, albedo, tex_uv, textures):
        if tex_uv is not None and textures.shape[0] > 0:
            from .shade import sample_texture

            tex_id = tex_uv[:, 0].astype(jnp.int32)
            tex_rgb = sample_texture(textures, tex_id,
                                     tex_uv[:, 1], tex_uv[:, 2])
            albedo = jnp.where((tex_id >= 0)[:, None], albedo * tex_rgb,
                               albedo)
        rgb = albedo * (self.ambient + (1.0 - self.ambient) * ndotl)[..., None]
        return jnp.where(hit.hit_mask[..., None], rgb, self.background)

    @partial(jax.jit, static_argnums=0)
    def _stage_trace(self, accel, blocks, rays, eye, orient):
        return self._trace_impl(accel, blocks, rays, eye, orient)

    @partial(jax.jit, static_argnums=0)
    def _stage_shadow_shade(self, accel, occ_blocks, textures, eye, d_tiles,
                            hit, normal, albedo, tex_uv):
        return self._shadow_shade_impl(accel, occ_blocks, textures, eye,
                                       d_tiles, hit, normal, albedo, tex_uv)

    @partial(jax.jit, static_argnums=0)
    def _frame_pallas(self, accel, blocks, occ_blocks, textures, rays, eye,
                      orient):
        """Both stages in one program.  Measured SLOWER than two stages
        on the bunny frame (11.3 vs 9.7 ms): back-to-back frames pipeline
        across the two-program boundary, which one big program cannot.
        Kept for callers that need the frame as a single jittable unit
        (e.g. sharding the whole frame under one shard_map)."""
        d_tiles, hit, normal, albedo, tex_uv = self._trace_impl(
            accel, blocks, rays, eye, orient)
        return self._shadow_shade_impl(accel, occ_blocks, textures, eye,
                                       d_tiles, hit, normal, albedo, tex_uv)

    # ---------------- XLA dense fallback (one stage) ----------------

    @partial(jax.jit, static_argnums=0)
    def _frame_xla(self, scene, accel, tables, rays, eye, orient):
        from .dense import occlusion_dense, trace_dense
        from .pipeline import rotate_rays, trace_hit
        from .shade import pack_shaded, shade_lambert_rgb

        tc = self.config.trace
        dirs = rotate_rays(rays, orient)
        origin = jnp.broadcast_to(eye[None, :], dirs.shape)
        hit = trace_hit(scene, accel, origin, dirs, self.config,
                        frame_hw=(self.height, self.width),
                        common_origin=eye)
        shadow = None
        if self.shadows:
            p = origin + dirs * jnp.minimum(hit.t, 1e6)[..., None]
            so = (jnp.where(hit.hit_mask[..., None], p, origin)
                  + self.light * self.shadow_eps)
            if hasattr(accel, "cluster_size"):
                shadow = occlusion_dense(
                    accel, so, self.light, hit.hit_mask,
                    self.height, self.width, tile_px=self.tile_px,
                    round_k=tc.dense_round_clusters,
                    tiles_per_chunk=tc.dense_tiles_per_chunk,
                    cluster_chunk=tc.dense_cluster_chunk, trace_cfg=tc)
            else:
                from .bruteforce import any_hit_brute

                from ..types import FLT_MAX

                shadow = any_hit_brute(
                    self.scene.positions, self.scene.faces, so,
                    jnp.broadcast_to(self.light, dirs.shape),
                    jnp.full(dirs.shape[:1], float(FLT_MAX)), tc)
                shadow = shadow & hit.hit_mask
        rgb = shade_lambert_rgb(scene, hit, origin, dirs,
                                light_dir=self.light, shadow_mask=shadow,
                                ambient=self.ambient,
                                background=self.background, tables=tables)
        return pack_shaded(rgb)

    # ---------------- public API ----------------

    def render(self, eye: jnp.ndarray, orient: jnp.ndarray,
               rays: jnp.ndarray) -> jnp.ndarray:
        """Packed-u32 row-major framebuffer for one camera pose.

        ``rays``: the precomputed pinhole ray grid (`camera_ray_grid`),
        row-major ``[H*W, 3]``."""
        if self.pallas:
            if self.single_dispatch:
                return self._frame_pallas(self.accel, self.blocks,
                                          self.occ_blocks,
                                          self.scene.textures, rays, eye,
                                          orient)
            d_tiles, hit, normal, albedo, tex_uv = self._stage_trace(
                self.accel, self.blocks, rays, eye, orient)
            return self._stage_shadow_shade(self.accel, self.occ_blocks,
                                            self.scene.textures, eye,
                                            d_tiles, hit, normal, albedo,
                                            tex_uv)
        return self._frame_xla(self.scene, self.accel, self.tables, rays,
                               eye, orient)
