"""Tiled deferred point-light accumulation (Pallas TPU).

The deferred lighting resolve previously evaluated the full Cook-Torrance
BRDF for EVERY light at EVERY pixel (a fori_loop over L lights of dense
(H, W) math) — with 100 scene lights that loop dominates the whole frame,
yet each light's inverse-square window confines it to a small screen region.

This kernel is the classic tiled-deferred culling pass, TPU-shaped: the
framebuffer is walked in (TH, TW) VMEM tiles; each tile computes its
world-space AABB from the G-buffer position plane (covered pixels only),
then statically unrolls the light list from SMEM, guarding each light's
~40-vector-op BRDF evaluation behind a scalar sphere-vs-AABB test
(`pl.when`). Lights that cannot touch the tile cost two scalar compares.

Matches renderer.deferred._ggx_brdf + its distance window exactly; the
deferred lighting node uses it for the point-light sum and keeps
sun/ambient/emissive/shadow as dense elementwise jnp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zenith_tpu.ops.runtime import cdiv, pallas_interpret


def _ggx_point_light(nx, ny, nz, vx, vy, vz, lx, ly, lz,
                     ar, ag, ab, metallic, roughness):
    """Cook-Torrance GGX for one light direction, component planes.
    Mirrors renderer.deferred._ggx_brdf (kept in lock-step by tests)."""
    hx, hy, hz = lx + vx, ly + vy, lz + vz
    hn = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-16))
    hx, hy, hz = hx * hn, hy * hn, hz * hn

    ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 1e-4)
    ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    vdh = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)

    a = jnp.maximum(roughness * roughness, 1e-3)
    a2 = a * a
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(np.pi * denom * denom, 1e-8)

    k = (roughness + 1.0) * (roughness + 1.0) / 8.0
    g = (ndv / (ndv * (1 - k) + k)) * (ndl / jnp.maximum(ndl * (1 - k) + k, 1e-8))

    f0r = 0.04 * (1.0 - metallic) + ar * metallic
    f0g = 0.04 * (1.0 - metallic) + ag * metallic
    f0b = 0.04 * (1.0 - metallic) + ab * metallic
    fres = jnp.power(1.0 - vdh, 5.0)
    fr = f0r + (1.0 - f0r) * fres
    fg = f0g + (1.0 - f0g) * fres
    fb = f0b + (1.0 - f0b) * fres

    spec_s = d * g / jnp.maximum(4.0 * ndv * ndl, 1e-4)
    inv_pi = 1.0 / np.pi
    out_r = ((1.0 - fr) * (1.0 - metallic) * ar * inv_pi + spec_s * fr) * ndl
    out_g = ((1.0 - fg) * (1.0 - metallic) * ag * inv_pi + spec_s * fg) * ndl
    out_b = ((1.0 - fb) * (1.0 - metallic) * ab * inv_pi + spec_s * fb) * ndl
    return out_r, out_g, out_b


def _tiled_lights_kernel(
    lights_ref,  # SMEM (L, 16): px py pz radius cr cg cb spot
    #                            dx dy dz cos_outer inv_cone pad pad pad
    cam_ref,  # SMEM (1, 8): camera xyz …
    am_ref,  # VMEM (4, TH, TW) albedo+metallic
    nr_ref,  # VMEM (4, TH, TW) normal+roughness
    pe_ref,  # VMEM (4, TH, TW) world pos + emissive
    d_ref,  # VMEM (TH, TW) depth (coverage: > 0)
    out_ref,  # VMEM (4, TH, TW) rgb + pad accumulated
    *,
    num_lights: int,
):
    wx = pe_ref[0]
    wy = pe_ref[1]
    wz = pe_ref[2]
    covered = d_ref[:] > 0.0

    # Tile world AABB over covered pixels (background pixels would drag the
    # box to the origin and defeat the cull).
    big = 3.0e38
    wminx = jnp.min(jnp.where(covered, wx, big))
    wmaxx = jnp.max(jnp.where(covered, wx, -big))
    wminy = jnp.min(jnp.where(covered, wy, big))
    wmaxy = jnp.max(jnp.where(covered, wy, -big))
    wminz = jnp.min(jnp.where(covered, wz, big))
    wmaxz = jnp.max(jnp.where(covered, wz, -big))
    any_cov = jnp.any(covered)

    nx, ny, nz = nr_ref[0], nr_ref[1], nr_ref[2]
    rough = nr_ref[3]
    ar, ag, ab = am_ref[0], am_ref[1], am_ref[2]
    metal = am_ref[3]

    cx = cam_ref[0, 0]
    cy = cam_ref[0, 1]
    cz = cam_ref[0, 2]
    vx, vy, vz = cx - wx, cy - wy, cz - wz
    vn = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-16))
    vx, vy, vz = vx * vn, vy * vn, vz * vn

    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for li in range(num_lights):
        px = lights_ref[li, 0]
        py = lights_ref[li, 1]
        pz = lights_ref[li, 2]
        radius = lights_ref[li, 3]
        # Scalar sphere-vs-AABB: squared distance from the light to the box.
        ddx = jnp.maximum(jnp.maximum(wminx - px, px - wmaxx), 0.0)
        ddy = jnp.maximum(jnp.maximum(wminy - py, py - wmaxy), 0.0)
        ddz = jnp.maximum(jnp.maximum(wminz - pz, pz - wmaxz), 0.0)
        hit = (ddx * ddx + ddy * ddy + ddz * ddz <= radius * radius) & any_cov

        @pl.when(hit)
        def _light():
            tx, ty, tz = px - wx, py - wy, pz - wz
            d2 = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-8)
            dist = jnp.sqrt(d2)
            inv = 1.0 / dist
            lxp, lyp, lzp = tx * inv, ty * inv, tz * inv
            att = 1.0 / jnp.maximum(d2, 1e-8)
            q = dist / radius
            q2 = q * q
            win = jnp.clip(1.0 - q2 * q2, 0.0, 1.0)
            win = win * win
            br, bg, bb = _ggx_point_light(
                nx, ny, nz, vx, vy, vz, lxp, lyp, lzp,
                ar, ag, ab, metal, rough,
            )
            # Spot cone falloff (smooth inner→outer edge). Point lights
            # carry spot=0 → factor 1 with zero extra scalar loads skipped
            # by the compiler is not guaranteed, but the math is 6 vector
            # ops — cheap next to the ~40-op BRDF it gates.
            spot = lights_ref[li, 7]
            dx = lights_ref[li, 8]
            dy = lights_ref[li, 9]
            dz = lights_ref[li, 10]
            cos_outer = lights_ref[li, 11]
            inv_cone = lights_ref[li, 12]
            # cos of angle between the beam axis and light→surface.
            cosang = -(lxp * dx + lyp * dy + lzp * dz)
            t = jnp.clip((cosang - cos_outer) * inv_cone, 0.0, 1.0)
            cone = 1.0 + spot * (t * t - 1.0)
            # Uncovered pixels carry undefined G-buffer data — mask them.
            w = jnp.where(covered, att * win * cone, 0.0)
            cr = lights_ref[li, 4]
            cg = lights_ref[li, 5]
            cb = lights_ref[li, 6]
            out_ref[0] += br * cr * w
            out_ref[1] += bg * cg * w
            out_ref[2] += bb * cb * w


def accumulate_point_lights(
    albedo_metal: jnp.ndarray,  # (H, W, 4)
    normal_rough: jnp.ndarray,  # (H, W, 4)
    pos_emissive: jnp.ndarray,  # (H, W, 4)
    depth: jnp.ndarray,  # (H, W) coverage: > 0
    camera_pos: jnp.ndarray,  # (3,)
    light_pos: jnp.ndarray,  # (L, 3)
    light_color: jnp.ndarray,  # (L, 3)
    light_radius: jnp.ndarray,  # (L,)
    tile_h: int = 16,
    tile_w: int = 128,
    interpret: Optional[bool] = None,
    spot_params: "Optional[jnp.ndarray]" = None,  # (L, 5): dir3 ci co
) -> jnp.ndarray:
    """Tile-culled point/spot-light sum → (H, W, 3) linear radiance.

    ``spot_params`` rows are (dir_x, dir_y, dir_z, cos_inner, cos_outer)
    per light; a row of zeros (or cos_inner <= cos_outer <= -1) marks a
    point light. Spots reuse the point path (position, radius window,
    inverse-square) times a smooth cone-edge factor."""
    if interpret is None:
        interpret = pallas_interpret()
    h, w = depth.shape
    l = light_pos.shape[0]
    if l == 0:
        return jnp.zeros((h, w, 3), jnp.float32)

    if spot_params is None:
        spot_cols = jnp.zeros((l, 8), jnp.float32)
    else:
        sp = spot_params.astype(jnp.float32)
        d = sp[:, :3]
        is_spot = (
            jnp.linalg.norm(d, axis=1) > 1e-6
        ).astype(jnp.float32)[:, None]
        cos_inner = sp[:, 3:4]
        cos_outer = sp[:, 4:5]
        inv_cone = 1.0 / jnp.maximum(cos_inner - cos_outer, 1e-4)
        spot_cols = jnp.concatenate(
            [d, cos_outer, inv_cone, jnp.zeros((l, 3), jnp.float32)],
            axis=1,
        )  # dx dy dz cos_outer inv_cone pad pad pad
        # The `spot` flag lives at column 7 (after the color triplet).
    lights = jnp.concatenate(
        [
            light_pos.astype(jnp.float32),
            light_radius.astype(jnp.float32)[:, None],
            light_color.astype(jnp.float32),
            (
                is_spot if spot_params is not None
                else jnp.zeros((l, 1), jnp.float32)
            ),
            spot_cols,
        ],
        axis=1,
    )  # (L, 16)
    cam = jnp.zeros((1, 8), jnp.float32).at[0, :3].set(
        camera_pos.astype(jnp.float32)
    )

    hp = cdiv(h, tile_h) * tile_h
    wp = cdiv(w, tile_w) * tile_w

    def to_planes(img4):
        p = jnp.moveaxis(img4.astype(jnp.float32), -1, 0)  # (4, H, W)
        if (hp, wp) != (h, w):
            p = jnp.pad(p, ((0, 0), (0, hp - h), (0, wp - w)))
        return p

    am = to_planes(albedo_metal)
    nr = to_planes(normal_rough)
    pe = to_planes(pos_emissive)
    dz = depth.astype(jnp.float32)
    if (hp, wp) != (h, w):
        dz = jnp.pad(dz, ((0, hp - h), (0, wp - w)))

    kernel = functools.partial(_tiled_lights_kernel, num_lights=l)
    grid = (hp // tile_h, wp // tile_w)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((l, 16), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, tile_h, tile_w), lambda ty, tx: (0, ty, tx)),
            pl.BlockSpec((4, tile_h, tile_w), lambda ty, tx: (0, ty, tx)),
            pl.BlockSpec((4, tile_h, tile_w), lambda ty, tx: (0, ty, tx)),
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx: (ty, tx)),
        ],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda ty, tx: (0, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        interpret=interpret,
    )(lights, cam, am, nr, pe, dz)
    out = out[:3, :h, :w]
    return jnp.moveaxis(out, 0, -1)
