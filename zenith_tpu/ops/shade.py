"""Pass B — visibility resolve + perspective-correct attribute interpolation.

Dense per-pixel jnp over the visibility buffer produced by ops.raster. XLA
fuses this with the user's fragment shader and the blend stage into one
program — the moral equivalent of the GPU running the fragment stage, except
every pixel shades exactly once (zero overdraw).

Perspective correction composes two levels of barycentrics:
1. screen-space barycentrics of the (possibly near-clipped) *sub-triangle*,
   recomputed from the record's edge equations at the pixel center;
2. each sub-triangle corner carries 1/w and its barycentrics w.r.t. the
   ORIGINAL triangle (ops.geometry), so attributes are gathered from the
   original vertex arrays regardless of clipping.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from zenith_tpu.ops import geometry as g
from zenith_tpu.rhi.shader import FragmentBuiltins


def finalize_attrs(
    z: jnp.ndarray,  # (H, W) resolved depth
    acc: jnp.ndarray,  # (A+1, H, W) from raster_interp_pass
    attr_layout: "list[tuple[str, int]]",  # (name, channels) in packing order
) -> "Tuple[Dict[str, jnp.ndarray], jnp.ndarray, FragmentBuiltins]":
    """Gather-free varying resolution: divide the attr·(1/w) accumulator
    planes by the interpolated 1/w plane. Purely elementwise — this is why
    the interp kernel exists (per-pixel gathers are ~100× slower than
    streaming on TPU; measured 44 ms vs 0.5 ms for a 1080p resolve)."""
    h, w = z.shape
    iw = acc[-1]
    mask = iw > 0.0
    inv = jnp.where(mask, 1.0 / jnp.where(mask, iw, 1.0), 0.0)

    out: Dict[str, jnp.ndarray] = {}
    offset = 0
    for name, channels in attr_layout:
        planes = acc[offset : offset + channels] * inv[None]
        out[name] = jnp.moveaxis(planes, 0, -1)  # (H, W, C)
        offset += channels

    x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5, (h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5, (h, w))
    front = out.pop("__front", None)
    builtins = FragmentBuiltins(
        frag_coord=jnp.stack([x, y], axis=-1),
        depth=z,
        front_facing=(front[..., 0] > 0.5) if front is not None else mask,
        resolution=(w, h),
    )
    return out, mask, builtins


def resolve_varyings(
    slot_img: jnp.ndarray,  # (H, W) i32 — record index, -1 = background
    rast16: jnp.ndarray,  # (R, 16)
    shade16: jnp.ndarray,  # (R, 16)
    tri_id: jnp.ndarray,  # (R,) i32
    indices: jnp.ndarray,  # (T, 3) i32
    varyings: "Dict[str, jnp.ndarray]",  # name → (Nv, C) vertex-stage outputs
) -> "Tuple[Dict[str, jnp.ndarray], jnp.ndarray, FragmentBuiltins]":
    """Interpolate vertex-stage outputs at every covered pixel.

    Returns (interpolated {name: (H, W, C)}, coverage mask (H, W) bool,
    fragment builtins).
    """
    h, w = slot_img.shape
    mask = slot_img >= 0
    s = jnp.maximum(slot_img, 0)

    rec = jnp.take(rast16, s.reshape(-1), axis=0).reshape(h, w, 16)
    sh = jnp.take(shade16, s.reshape(-1), axis=0).reshape(h, w, 16)

    x = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    x = jnp.broadcast_to(x, (h, w))
    y = jnp.broadcast_to(y, (h, w))

    e01 = rec[..., g.RAST_A01] * x + rec[..., g.RAST_B01] * y + rec[..., g.RAST_C01]
    e12 = rec[..., g.RAST_A12] * x + rec[..., g.RAST_B12] * y + rec[..., g.RAST_C12]
    e20 = rec[..., g.RAST_A20] * x + rec[..., g.RAST_B20] * y + rec[..., g.RAST_C20]
    inv_det = rec[..., g.RAST_INV_DET]

    # Screen-space sub-triangle barycentrics (w_k = weight of corner k).
    w0 = e12 * inv_det
    w1 = e20 * inv_det
    w2 = e01 * inv_det

    z = (
        w0 * rec[..., g.RAST_Z0]
        + w1 * rec[..., g.RAST_Z1]
        + w2 * rec[..., g.RAST_Z2]
    )

    # Perspective correction: weight corners by 1/w and renormalize.
    pw0 = w0 * sh[..., g.SHADE_IW0]
    pw1 = w1 * sh[..., g.SHADE_IW1]
    pw2 = w2 * sh[..., g.SHADE_IW2]
    denom = pw0 + pw1 + pw2
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    pw0, pw1, pw2 = pw0 / denom, pw1 / denom, pw2 / denom

    # Compose with the corners' original-triangle barycentrics.
    a = (
        pw0 * sh[..., g.SHADE_B0X]
        + pw1 * sh[..., g.SHADE_B1X]
        + pw2 * sh[..., g.SHADE_B2X]
    )
    b = (
        pw0 * sh[..., g.SHADE_B0Y]
        + pw1 * sh[..., g.SHADE_B1Y]
        + pw2 * sh[..., g.SHADE_B2Y]
    )
    c = 1.0 - a - b

    tid = jnp.take(tri_id, s.reshape(-1), axis=0).reshape(h, w)
    tri = jnp.take(indices.astype(jnp.int32), tid.reshape(-1), axis=0)  # (HW, 3)
    i0 = tri[:, 0].reshape(h, w)
    i1 = tri[:, 1].reshape(h, w)
    i2 = tri[:, 2].reshape(h, w)

    out: Dict[str, jnp.ndarray] = {}
    for name, v in varyings.items():
        v = v.astype(jnp.float32)
        v0 = jnp.take(v, i0.reshape(-1), axis=0).reshape(h, w, -1)
        v1 = jnp.take(v, i1.reshape(-1), axis=0).reshape(h, w, -1)
        v2 = jnp.take(v, i2.reshape(-1), axis=0).reshape(h, w, -1)
        out[name] = a[..., None] * v0 + b[..., None] * v1 + c[..., None] * v2

    builtins = FragmentBuiltins(
        frag_coord=jnp.stack([x, y], axis=-1),
        depth=z,
        front_facing=sh[..., g.SHADE_FRONT] > 0.5,
        resolution=(w, h),
    )
    return out, mask, builtins


# ---------------------------------------------------------------------------
# Screen-space derivatives + derivative-based tangent frames
# ---------------------------------------------------------------------------


def dfdx(img: jnp.ndarray) -> jnp.ndarray:
    """Screen-space x derivative of a dense (H, W, ...) fragment plane —
    the dFdx/ddx analog (forward difference, last column repeated)."""
    d = img[:, 1:] - img[:, :-1]
    return jnp.concatenate([d, d[:, -1:]], axis=1)


def dfdy(img: jnp.ndarray) -> jnp.ndarray:
    """Screen-space y derivative (dFdy analog)."""
    d = img[1:] - img[:-1]
    return jnp.concatenate([d, d[-1:]], axis=0)


def perturb_normal(
    n: jnp.ndarray,  # (H, W, 3) geometric world normal (normalized)
    world_pos: jnp.ndarray,  # (H, W, 3)
    uv: jnp.ndarray,  # (H, W, 2)
    normal_sample: jnp.ndarray,  # (H, W, 3) tangent-space map in [0, 1]
) -> jnp.ndarray:
    """Apply a tangent-space normal map WITHOUT vertex tangents: the
    cotangent frame is reconstructed per pixel from screen-space derivatives
    of world position and UV (Schüler, "Normal Mapping Without Precomputed
    Tangents"). Exactly what a GPU fragment shader does with dFdx/dFdy —
    and the asset pipeline's Vertex carries no tangents (render.rs:10-26),
    so this is also the parity-correct choice. Silhouette pixels see
    cross-surface derivatives; their frames degrade gracefully to the
    geometric normal (r clamps when the uv determinant vanishes).
    """
    dp1 = dfdx(world_pos)
    dp2 = dfdy(world_pos)
    du1 = dfdx(uv)
    du2 = dfdy(uv)
    det = du1[..., 0:1] * du2[..., 1:2] - du2[..., 0:1] * du1[..., 1:2]
    ok = jnp.abs(det) > 1e-12
    r = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    t = (dp1 * du2[..., 1:2] - dp2 * du1[..., 1:2]) * r
    b = (dp2 * du1[..., 0:1] - dp1 * du2[..., 0:1]) * r
    # Gram-Schmidt against the interpolated normal.
    t = t - n * jnp.sum(n * t, axis=-1, keepdims=True)
    t_len = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = t / jnp.maximum(t_len, 1e-8)
    b = b - n * jnp.sum(n * b, axis=-1, keepdims=True)
    b = b - t * jnp.sum(t * b, axis=-1, keepdims=True)
    b_len = jnp.linalg.norm(b, axis=-1, keepdims=True)
    b = b / jnp.maximum(b_len, 1e-8)
    nm = normal_sample * 2.0 - 1.0
    out = t * nm[..., 0:1] + b * nm[..., 1:2] + n * nm[..., 2:3]
    out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)
    # Degenerate frames (t or b vanished) fall back to the geometric normal.
    good = (t_len > 1e-6) & (b_len > 1e-6)
    return jnp.where(good, out, n)
