"""SSIM with a gaussian window (reference: brush-train/src/ssim.rs).

Semantics replicated exactly, including the reference's padding choice of
ceil(window/2) (ssim.rs:48), which yields an output two pixels larger than
the input and averages the zero-padded border into the score — this feeds
the loss, so it must match for training parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """Normalized 1D gaussian (ssim.rs:7-14)."""
    extent = window_size // 2
    xs = np.arange(window_size, dtype=np.float32)
    vals = np.exp(-((xs - extent) ** 2) / (2.0 * sigma**2))
    return vals / vals.sum()


class Ssim:
    """SSIM measure over NHWC float images in [0, 1]."""

    def __init__(self, window_size: int = 11, channels: int = 3, sigma: float = 1.5):
        w1 = gaussian_window(window_size, sigma)
        w2 = np.outer(w1, w1)
        # (out_ch, in_ch/groups=1, kh, kw), grouped per channel.
        self.weights = jnp.asarray(
            np.tile(w2[None, None], (channels, 1, 1, 1)), jnp.float32
        )
        self.channels = channels
        # Burn uses padding = ceil(window/2) (ssim.rs:48).
        self.padding = -(-window_size // 2)

    def _blur(self, img_nchw: jnp.ndarray) -> jnp.ndarray:
        p = self.padding
        # HIGHEST: TPU lowers default-precision f32 convs to bf16 on the
        # MXU; the 121-tap window sums would carry ~2^-8-relative noise
        # straight into the training loss and its gradients. The reference
        # computes SSIM in f32 (ssim.rs).
        return jax.lax.conv_general_dilated(
            img_nchw,
            self.weights,
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            feature_group_count=self.channels,
            precision=jax.lax.Precision.HIGHEST,
        )

    def ssim(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        """Mean SSIM of two (N, H, W, C) images (ssim.rs:42-102)."""
        x = img1.transpose(0, 3, 1, 2)
        y = img2.transpose(0, 3, 1, 2)

        mu_x = self._blur(x)
        mu_y = self._blur(y)
        mu_xx = mu_x * mu_x
        mu_yy = mu_y * mu_y
        mu_xy = mu_x * mu_y

        sigma_xx = jnp.maximum(self._blur(x * x) - mu_xx, 0.0)
        sigma_yy = jnp.maximum(self._blur(y * y) - mu_yy, 0.0)
        sigma_xy = self._blur(x * y) - mu_xy

        c1 = 0.01**2
        c2 = 0.03**2
        ssim_map = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
            (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
        )
        return jnp.mean(ssim_map)
