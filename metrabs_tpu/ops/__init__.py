"""Numeric/tensor ops: the TPU-native equivalent of the reference's
tfu.py/tfu3d.py/warping.py math layer."""

from metrabs_tpu.ops.camera import (
    corner_aligned_scale_mat, intrinsics_from_fov, project, to_homogeneous)
from metrabs_tpu.ops.distortion import (
    distort_points, distortion_terms, pad_distortion_coeffs, undistort_points)
from metrabs_tpu.ops.heatmap import heatmap_to_25d, heatmap_to_image, heatmap_to_metric
from metrabs_tpu.ops.masked import (
    divide_no_nan, mean_stdev_masked, reduce_mean_masked, reduce_sum_masked)
from metrabs_tpu.ops.procrustes import procrustes_align, procrustes_transform, rigid_align
from metrabs_tpu.ops.reconstruct import (
    back_project, is_within_fov, project_pose, reconstruct_absolute,
    reconstruct_ref_fullpersp, reconstruct_ref_weakpersp)
from metrabs_tpu.ops.rotation import lookat_rotation_matrix, rotation_mat
from metrabs_tpu.ops.heatmap_decode import decode_heatmap, soft_argmax, softmax_multi_axis
from metrabs_tpu.ops.lm_solver import (
    optimize_z_offset_by_bones, reconstruct_absolute_by_bone_lengths)
from metrabs_tpu.ops.warp import (
    bilinear_gather, warp_coords, warp_images, warp_images_with_pyramid)
