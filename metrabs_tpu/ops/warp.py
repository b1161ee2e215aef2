"""Perspective-correct crop warping with lens distortion and pyramid antialias.

TPU-native re-design of `metrabs_tf/multiperson/warping.py:8-91`. The
reference loops over crops in an autograph graph loop calling the
tensorflow_addons C++ `transform` / `interpolate_bilinear` kernels per crop.
Here the entire (num_crops x out_h x out_w) resample is ONE batched gather
expression: XLA lowers it to a single fused gather + lerp without ever
materializing per-crop copies of the source images (indices address the
flattened image stack, so crops from the same image share memory traffic).

Semantics preserved from the reference (SURVEY.md §8.8-8.12):
 - always-distort formulation: zero coefficients reduce exactly to the
   homography, so there is no data-dependent branch;
 - zero border emulated by 1px zero padding + shifted lookups with replicate
   clamping beyond, matching tfa.interpolate_bilinear on the padded image
   (`warping.py:83-90`) — NOT torch grid_sample align_corners semantics;
 - 3-level box-filter pyramid with per-crop level selection
   floor(-log2(crop_scale)) clamped to [0, 2], intrinsics adjusted by the
   corner-aligned scale matrix (`warping.py:8-24`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from metrabs_tpu.ops import distortion as distortion_ops
from metrabs_tpu.ops.camera import corner_aligned_scale_mat, to_homogeneous


def avg_pool_nxn(images: jnp.ndarray, n_pool: int) -> jnp.ndarray:
    """nxn box filter with stride n, VALID padding ('warping.py:15')."""
    n, h, w, c = images.shape
    h2, w2 = h // n_pool, w // n_pool
    x = images[:, :h2 * n_pool, :w2 * n_pool, :]
    x = x.reshape(n, h2, n_pool, w2, n_pool, c)
    return x.mean(axis=(2, 4))


def avg_pool_2x2(images: jnp.ndarray) -> jnp.ndarray:
    """2x2 box filter (the pyramid-build step) = avg_pool_nxn(images, 2)."""
    return avg_pool_nxn(images, 2)


def select_pyramid_level(crop_scales: jnp.ndarray, intrinsic_matrix: jnp.ndarray,
                         n_pyramid_levels: int):
    """Per-crop pyramid level (floor(-log2(scale)), clipped) and the
    level-adjusted intrinsics K_l = S(1/2^l) @ K ('warping.py:20-28').
    Shared by BOTH warp backends (the XLA gather here and the Pallas tiled
    kernel) so the two stay drop-in equivalent. Returns (i_levels [N],
    k_sel [N, 3, 3])."""
    i_levels = jnp.floor(-jnp.log(crop_scales) / jnp.log(2.0))
    i_levels = jnp.clip(i_levels, 0, n_pyramid_levels - 1).astype(jnp.int32)
    k_levels = jnp.stack([
        jnp.einsum('ij,bjk->bik', corner_aligned_scale_mat(1.0 / 2 ** level),
                   intrinsic_matrix, precision='highest')
        for level in range(n_pyramid_levels)], axis=0)  # [L, N, 3, 3]
    k_sel = jnp.take_along_axis(
        k_levels, i_levels[None, :, None, None], axis=0)[0]  # [N, 3, 3]
    return i_levels, k_sel


def bilinear_gather(
        images: jnp.ndarray, image_ids: jnp.ndarray, coords_xy: jnp.ndarray) -> jnp.ndarray:
    """Samples `images[image_ids[i]]` at `coords_xy[i]` with zero border.

    Args:
      images: [n_images, H, W, C] source stack.
      image_ids: [n_crops] int index per crop.
      coords_xy: [n_crops, out_h, out_w, 2] sample positions in source pixel
        coordinates (x, y), pixel centers at integers.

    Returns: [n_crops, out_h, out_w, C]
    """
    n_images, h, w, c = images.shape
    # 1px zero border; beyond it lookups clamp into the zero ring, emulating
    # border-constant-zero like the reference (`warping.py:83-90`).
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    # Channel-MAJOR flat layout [C, T]: a [T, 3] array would be padded to 128
    # lanes on TPU (42x memory blowup) and gathers on it crawl.
    flat = padded.transpose(3, 0, 1, 2).reshape(c, n_images * hp * wp)

    x = coords_xy[..., 0] + 1.0
    y = coords_xy[..., 1] + 1.0
    # Replicate-clamp the query into the padded canvas (tfa semantics).
    x = jnp.clip(x, 0.0, wp - 1.0)
    y = jnp.clip(y, 0.0, hp - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, wp - 2.0)
    y0 = jnp.clip(jnp.floor(y), 0.0, hp - 2.0)
    fx = (x - x0)[..., jnp.newaxis]
    fy = (y - y0)[..., jnp.newaxis]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    base = (image_ids.astype(jnp.int32) * hp)[:, jnp.newaxis, jnp.newaxis]
    idx00 = (base + y0i) * wp + x0i
    idx01 = idx00 + 1
    idx10 = idx00 + wp
    idx11 = idx10 + 1

    g = lambda idx: jnp.take(flat, idx, axis=1)  # [C, n, oh, ow]
    fx = fx[..., 0][jnp.newaxis]
    fy = fy[..., 0][jnp.newaxis]
    top = g(idx00) * (1 - fx) + g(idx01) * fx
    bottom = g(idx10) * (1 - fx) + g(idx11) * fx
    out = top * (1 - fy) + bottom * fy
    return jnp.transpose(out, (1, 2, 3, 0))  # [n, oh, ow, C]


def warp_coords(
        new_invprojmat: jnp.ndarray, intrinsic_matrix: jnp.ndarray,
        distortion_coeffs: jnp.ndarray, output_shape: Tuple[int, int]) -> jnp.ndarray:
    """Maps output crop pixels to source-image pixel coordinates.

    For each output pixel p = (x, y, 1):
      ray = new_invprojmat @ p; src = K @ homog(distort(project(ray)))
    (`warping.py:74-81`). Batched over crops: matrices are [n_crops, 3, 3],
    distortion_coeffs [n_crops, n_coef]. Returns [n_crops, oh, ow, 2].
    """
    oh, ow = output_shape
    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # [oh, ow]
    new_coords = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], axis=-1)  # [oh, ow, 3]
    ray = jnp.einsum(
        'hwc,bCc->bhwC', new_coords, new_invprojmat, precision='highest')
    projected = ray[..., :2] / ray[..., 2:3]
    distorted = distortion_ops.distort_points(
        projected, distortion_coeffs[:, jnp.newaxis, jnp.newaxis, :])
    old = jnp.einsum(
        'bhwc,bCc->bhwC', to_homogeneous(distorted), intrinsic_matrix,
        precision='highest')
    return old[..., :2]


def warp_images(
        images: jnp.ndarray, intrinsic_matrix: jnp.ndarray, new_invprojmat: jnp.ndarray,
        distortion_coeffs: jnp.ndarray, image_ids: jnp.ndarray,
        output_shape: Tuple[int, int]) -> jnp.ndarray:
    """Single-level batched warp (`warping.py:52-64` without the graph loop)."""
    coords = warp_coords(new_invprojmat, intrinsic_matrix, distortion_coeffs, output_shape)
    return bilinear_gather(images, image_ids, coords)


def build_flat_pyramid(images: jnp.ndarray, n_levels: int):
    """Box-filter pyramid with 1px zero borders, flattened into ONE buffer.

    Returns (flat [n_images * total_len, C], level_info) where level_info is a
    list of (offset, padded_h, padded_w) per level and total_len is the sum of
    padded areas. A single buffer means the per-crop level choice becomes
    index arithmetic instead of three separate masked gathers.
    """
    n, h, w, c = images.shape
    levels = []
    cur = images
    for level in range(n_levels):
        if level > 0:
            cur = avg_pool_2x2(cur)
        levels.append(jnp.pad(cur, ((0, 0), (1, 1), (1, 1), (0, 0))))
    level_info = []
    offset = 0
    flats = []
    for lv in levels:
        hp, wp = lv.shape[1], lv.shape[2]
        level_info.append((offset, hp, wp))
        # Channel-major [C, n, hp*wp]: see bilinear_gather layout note.
        flats.append(lv.transpose(3, 0, 1, 2).reshape(c, n, hp * wp))
        offset += hp * wp
    flat = jnp.concatenate(flats, axis=2)  # [c, n, total_len]
    return flat.reshape(c, n * offset), level_info, offset


def bilinear_gather_flat(
        flat: jnp.ndarray, base_offset: jnp.ndarray, hp: jnp.ndarray,
        wp: jnp.ndarray, coords_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample from a flattened padded image region.

    flat: [C, total] channel-major; per crop: base_offset [N] (start of the
    crop's source image+level region), hp/wp [N] (that region's padded dims),
    coords_xy [N, oh, ow, 2] in UNPADDED source pixels. Zero-border semantics
    as in `bilinear_gather`.
    """
    x = coords_xy[..., 0] + 1.0
    y = coords_xy[..., 1] + 1.0
    wp_f = wp[:, None, None].astype(jnp.float32)
    hp_f = hp[:, None, None].astype(jnp.float32)
    x = jnp.clip(x, 0.0, wp_f - 1.0)
    y = jnp.clip(y, 0.0, hp_f - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, wp_f - 2.0)
    y0 = jnp.clip(jnp.floor(y), 0.0, hp_f - 2.0)
    fx = (x - x0)[..., jnp.newaxis]
    fy = (y - y0)[..., jnp.newaxis]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idx00 = base_offset[:, None, None] + y0i * wp[:, None, None] + x0i
    idx01 = idx00 + 1
    idx10 = idx00 + wp[:, None, None]
    idx11 = idx10 + 1

    g = lambda idx: jnp.take(flat, idx, axis=1)  # [C, N, oh, ow]
    fx = fx[..., 0][jnp.newaxis]
    fy = fy[..., 0][jnp.newaxis]
    top = g(idx00) * (1 - fx) + g(idx01) * fx
    bottom = g(idx10) * (1 - fx) + g(idx11) * fx
    out = top * (1 - fy) + bottom * fy
    return jnp.transpose(out, (1, 2, 3, 0))


def warp_images_with_pyramid(
        images: jnp.ndarray, intrinsic_matrix: jnp.ndarray, new_invprojmat: jnp.ndarray,
        distortion_coeffs: jnp.ndarray, crop_scales: jnp.ndarray, image_ids: jnp.ndarray,
        output_shape: Tuple[int, int], n_pyramid_levels: int = 3) -> jnp.ndarray:
    """Antialiased batched warp with per-crop pyramid level selection.

    Args mirror `warping.py:8-49`: `intrinsic_matrix` is the per-crop ORIGINAL
    camera matrix; each level uses corner_aligned_scale_mat(1/2^l) @ K.

    TPU formulation: the level choice is resolved BEFORE sampling by selecting
    the per-crop level-adjusted intrinsics (a [N,3,3] select), so there is
    exactly ONE coords computation and ONE 4-corner gather into a flattened
    pyramid buffer — sampling cost scales with output pixels only, and HBM
    reads touch each source pixel at most ~1.33x (pyramid build).
    Returns [n_crops, oh, ow, 3].
    """
    i_levels, k_sel = select_pyramid_level(
        crop_scales, intrinsic_matrix, n_pyramid_levels)

    flat, level_info, per_image_len = build_flat_pyramid(images, n_pyramid_levels)

    coords = warp_coords(new_invprojmat, k_sel, distortion_coeffs, output_shape)

    offsets = jnp.asarray([info[0] for info in level_info], jnp.int32)
    hps = jnp.asarray([info[1] for info in level_info], jnp.int32)
    wps = jnp.asarray([info[2] for info in level_info], jnp.int32)
    base = (image_ids.astype(jnp.int32) * per_image_len + offsets[i_levels])
    return bilinear_gather_flat(flat, base, hps[i_levels], wps[i_levels], coords)
