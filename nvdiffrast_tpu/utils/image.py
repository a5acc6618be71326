"""Image helpers: bilinear 2x downsample, PSNR, save."""

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_downsample(x, steps=1):
    """2x bilinear downsample with the reference's 4x4 [1,3,3,1] kernel
    (samples/torch/util.py:56-60), NHWC, expressed as an XLA conv."""
    x = jnp.asarray(x, jnp.float32)
    w1 = jnp.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0
    w = jnp.outer(w1, w1)  # [4, 4], sums to 1
    C = x.shape[-1]
    kernel = jnp.zeros((4, 4, 1, C), jnp.float32) + w[:, :, None, None]
    for _ in range(steps):
        x = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
    return x


def psnr(a, b, peak=1.0):
    mse = float(jnp.mean((jnp.asarray(a) - jnp.asarray(b)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def save_image(fn, x):
    from PIL import Image

    x = np.asarray(x)
    x = np.rint(x * 255.0)
    x = np.clip(x, 0, 255).astype(np.uint8)
    Image.fromarray(x).save(fn)


def display_image(x, title=None):
    """Show an image interactively (reference: samples/torch/util.py).

    Uses PIL's viewer when a display is available; silently no-ops in
    headless environments (the common case on TPU pods).
    """
    try:
        from PIL import Image

        x = np.asarray(x)
        x = np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)
        img = Image.fromarray(x)
        img.show(title=title)
        return True
    except Exception:
        return False
