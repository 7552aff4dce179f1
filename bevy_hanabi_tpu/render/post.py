"""HDR post-processing helpers: bloom + tonemapping.

The reference renders HDR colors (e.g. firework.rs's 4x white flash) and
relies on Bevy's bloom + tonemapping passes for the final look
(reference examples add ``Bloom`` to the camera). This framework renders
headless, so the equivalent passes live here: a threshold + separable
gaussian bloom and filmic tonemaps, all jittable XLA (two 1D convolutions;
the TPU runs them on the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bloom", "tonemap_reinhard", "tonemap_aces"]


def _gaussian_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_separable(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """[H, W, C] gaussian blur via two 1D SAME convolutions."""
    k = jnp.asarray(_gaussian_kernel(sigma))
    n = k.shape[0]

    def conv_axis(x, axis):
        # [H, W, C] -> conv along `axis` per channel
        moved = jnp.moveaxis(x, axis, -1)  # [..., L]
        shape = moved.shape
        flat = moved.reshape(-1, 1, shape[-1])  # [B, 1, L]
        out = jax.lax.conv_general_dilated(
            flat,
            k.reshape(1, 1, n),
            window_strides=(1,),
            padding=[(n // 2, n // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    return conv_axis(conv_axis(img, 0), 1)


def bloom(
    img: jnp.ndarray,
    threshold: float = 1.0,
    sigma: float = 4.0,
    intensity: float = 0.7,
) -> jnp.ndarray:
    """Add a glow around HDR-bright pixels (Bevy ``Bloom`` analogue).

    ``img`` is [H, W, 4] linear HDR. Pixels whose channels exceed
    ``threshold`` contribute their excess to a gaussian-blurred glow that
    is added back (energy-additive, like the reference's additive bloom
    pipeline). Alpha passes through unchanged.
    """
    rgb = img[..., :3]
    bright = jnp.maximum(rgb - threshold, 0.0)
    glow = _blur_separable(bright, sigma)
    return jnp.concatenate([rgb + intensity * glow, img[..., 3:4]], axis=-1)


def tonemap_reinhard(img: jnp.ndarray) -> jnp.ndarray:
    """x / (1 + x) per channel; alpha unchanged."""
    rgb = img[..., :3]
    return jnp.concatenate([rgb / (1.0 + rgb), img[..., 3:4]], axis=-1)


def tonemap_aces(img: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES filmic approximation (the default Bevy tonemapper's
    common stand-in); alpha unchanged."""
    x = img[..., :3]
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    mapped = jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)
    return jnp.concatenate([mapped, img[..., 3:4]], axis=-1)
