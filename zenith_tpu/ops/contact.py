"""Screen-space contact shadows for the sun.

Shadow maps miss small-scale contact occlusion: their finite resolution
and depth bias open a light leak exactly where geometry meets the ground.
The standard fix (UE's "contact shadows", also in Unity HDRP) is a SHORT
screen-space ray march from each shaded pixel toward the light, testing
the G-buffer depth for occluders over ~1-2 world units — crisp contact
darkening that composites multiplicatively with the shadow-map factor.

TPU-first: same design as the SSR march (ops/ssr.py) — one packed
(H·W, 4) world-position+depth tap plane (one 4-channel ``jnp.take`` per
step), per-pixel phase dither from the SSAO coordinate hash (elementwise,
zero gathers; the noise resolves under TAA or stays sub-visible at the
default short range), linear steps (the range is short — quadratic
spacing buys nothing). Budget: ``steps`` gathers per pixel (8 default),
well under SSAO's 12+blur.

The knobs are baked trace constants read from ``DirectionalLight``
(changing them recompiles — consistent with every other sun field).
No reference counterpart (zenith has no shadows at all).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Self-intersection guard (world units, camera-radial): the marched point
# must be this far behind the tapped surface before it counts as occluded.
_HIT_BIAS = 0.08


def contact_shadow_factor(
    world_pos: jnp.ndarray,  # (H, W, 3) this band's G-buffer positions
    depth: jnp.ndarray,  # (H, W) this band's reverse-Z depth (0 = bg)
    tap_pos: jnp.ndarray,  # (Hf, Wf, 3) FULL-surface positions (tap plane)
    tap_depth: jnp.ndarray,  # (Hf, Wf) FULL-surface depth
    sun_dir: jnp.ndarray,  # (3,) unit, TOWARD the sun
    cam_pos: jnp.ndarray,  # (3,) camera world position
    view_proj: jnp.ndarray,  # (4, 4)
    strength: float = 1.0,
    max_dist: float = 2.0,
    thickness: float = 0.6,
    steps: int = 8,
    row0=0,
) -> jnp.ndarray:
    """(H, W) visibility in [1-strength, 1]: 1 = lit, lower = contact-
    occluded. Under SPMD pass the band's planes as ``world_pos``/``depth``
    and the gathered full surface as the tap planes (``row0`` = the band's
    first global row, for the dither hash)."""
    h, w = depth.shape
    hf, wf = tap_depth.shape
    covered = depth > 0.0

    from zenith_tpu.ops.ssao import _pixel_hash_angle

    phase = _pixel_hash_angle(h, w, row0) * (0.5 / np.pi)  # [0, 1)

    flat_pd = jnp.concatenate(
        [tap_pos, tap_depth[..., None]], axis=-1
    ).reshape(-1, 4)

    occluded = jnp.zeros((h, w), bool)
    for i in range(steps):
        t = max_dist * (i + 0.5 + phase) / steps
        q = world_pos + sun_dir * t[..., None]
        clip = (
            jnp.concatenate([q, jnp.ones_like(q[..., :1])], axis=-1)
            @ view_proj.T
        )
        cw = clip[..., 3]
        ok = cw > 1e-4
        cwc = jnp.maximum(cw, 1e-4)
        sx = (clip[..., 0] / cwc * 0.5 + 0.5) * wf - 0.5
        sy = (clip[..., 1] / cwc * 0.5 + 0.5) * hf - 0.5
        inside = ok & (sx >= 0) & (sx <= wf - 1) & (sy >= 0) & (sy <= hf - 1)
        ix = jnp.clip(jnp.floor(sx + 0.5).astype(jnp.int32), 0, wf - 1)
        iy = jnp.clip(jnp.floor(sy + 0.5).astype(jnp.int32), 0, hf - 1)
        tap = jnp.take(flat_pd, (iy * wf + ix).reshape(-1), axis=0).reshape(
            h, w, 4
        )
        s_pos, s_dep = tap[..., :3], tap[..., 3]
        dq = jnp.linalg.norm(q - cam_pos, axis=-1)
        ds = jnp.linalg.norm(s_pos - cam_pos, axis=-1)
        gap = dq - ds
        occluded = occluded | (
            inside & (s_dep > 0.0)
            & (gap > _HIT_BIAS) & (gap < thickness)
        )

    return jnp.where(occluded & covered, 1.0 - strength, 1.0)
