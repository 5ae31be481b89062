"""Image film: filtered sample splatting via scatter-add.

TPU-native replacement for ImageFilm (/root/reference/film/image.cpp).
AddSample's filter-table splat over the support window
(film/image.cpp:103-147) becomes a fixed-window scatter-add: each sample
contributes to a static (2*ceil(w)) x (2*ceil(w)) pixel neighborhood with
filter weights evaluated exactly (no 16x16 table quantization — we can
afford the real filter on the VPU). WriteImage's XYZ->RGB + weight
normalization (film/image.cpp:157-212) becomes `develop`.

The film accumulator is a pytree so it shards over devices; merging shards
is a psum (the reference's manual exrassemble flow, automated).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import spectrum as spec
from ..core.pytree import pytree_dataclass, static
from ..filters import filters as ftr


@pytree_dataclass
class Film:
    pixels: jnp.ndarray      # f32[yres, xres, 3] weighted radiance (XYZ wts
                             # applied at develop; we store RGB like ref L)
    alpha: jnp.ndarray       # f32[yres, xres]
    weight_sum: jnp.ndarray  # f32[yres, xres]
    xres: int = static(default=0)
    yres: int = static(default=0)
    # Crop window in NDC [x0,x1,y0,y1] (film/image.cpp:79-85).
    crop: tuple = static(default=(0.0, 1.0, 0.0, 1.0))


def make_film(xres, yres, crop=(0.0, 1.0, 0.0, 1.0)) -> Film:
    return Film(pixels=jnp.zeros((yres, xres, 3), jnp.float32),
                alpha=jnp.zeros((yres, xres), jnp.float32),
                weight_sum=jnp.zeros((yres, xres), jnp.float32),
                xres=xres, yres=yres, crop=crop)


def pixel_extent(film: Film):
    """Crop-window pixel bounds (xstart, xcount, ystart, ycount)."""
    x0, x1, y0, y1 = film.crop
    import math
    xstart = math.ceil(film.xres * x0)
    xcount = max(1, math.ceil(film.xres * x1) - xstart)
    ystart = math.ceil(film.yres * y0)
    ycount = max(1, math.ceil(film.yres * y1) - ystart)
    return xstart, xcount, ystart, ycount


def add_samples(film: Film, image_x, image_y, L, alpha,
                filter_kind: str, xwidth: float, ywidth: float,
                **filter_kw) -> Film:
    """Filtered splat of a sample batch (film/image.cpp:103-147 semantics:
    discrete pixel coords are continuous-0.5)."""
    import math
    dx = image_x - 0.5
    dy = image_y - 0.5
    x0 = jnp.ceil(dx - xwidth).astype(jnp.int32)
    y0 = jnp.ceil(dy - ywidth).astype(jnp.int32)
    nx = int(2 * math.ceil(xwidth)) + 1
    ny = int(2 * math.ceil(ywidth)) + 1

    pix = film.pixels
    alph = film.alpha
    wsum = film.weight_sum
    H, W = pix.shape[0], pix.shape[1]

    # Static window unroll: nx*ny scatter-adds over the whole batch.
    for j in range(ny):
        for i in range(nx):
            px = x0 + i
            py = y0 + j
            fx = px.astype(jnp.float32) - dx
            fy = py.astype(jnp.float32) - dy
            w = ftr.evaluate(filter_kind, fx, fy, xwidth, ywidth, **filter_kw)
            inside = (jnp.abs(fx) <= xwidth) & (jnp.abs(fy) <= ywidth) & \
                (px >= 0) & (px < W) & (py >= 0) & (py < H)
            w = jnp.where(inside, w, 0.0)
            pxc = jnp.clip(px, 0, W - 1)
            pyc = jnp.clip(py, 0, H - 1)
            pix = pix.at[pyc, pxc].add(w[..., None] * L)
            alph = alph.at[pyc, pxc].add(w * alpha)
            wsum = wsum.at[pyc, pxc].add(w)
    return Film(pixels=pix, alpha=alph, weight_sum=wsum, xres=film.xres,
                yres=film.yres, crop=film.crop)


def develop(film: Film, premultiply_alpha: bool = True):
    """WriteImage normalization (film/image.cpp:157-212): weight divide (the
    reference converts through XYZ and back with the same matrices — a
    no-op for in-gamut RGB, so we divide directly). Returns (rgb, alpha)."""
    w = jnp.maximum(film.weight_sum, 1e-10)[..., None]
    rgb = film.pixels / w
    alpha = jnp.clip(film.alpha / w[..., 0], 0.0, 1.0)
    if premultiply_alpha:
        pass  # stored unpremultiplied; EXR writer applies if requested
    return rgb, alpha


def merge(films):
    """Sum-merge accumulator shards (tools/exrassemble.cpp, automated)."""
    out = films[0]
    for f in films[1:]:
        out = Film(pixels=out.pixels + f.pixels, alpha=out.alpha + f.alpha,
                   weight_sum=out.weight_sum + f.weight_sum,
                   xres=out.xres, yres=out.yres, crop=out.crop)
    return out
