"""Irregular point-cloud op substrate: Pallas TPU kernels + pure-XLA references.

Public surface mirrors the reference's native-op inventory (SURVEY.md §2.1):

- ``furthest_point_sample``  (pointnet2_ops CUDA -> Pallas sequential kernel)
- ``knn`` / ``group_points`` (KNN_CUDA + Group module -> MXU distance + top_k)
- ``chamfer_distance_l1/l2`` (chamfer CUDA extension -> Pallas tiled NN + custom VJP)
- ``gather_points``          (pointnet2_ops gather_operation -> take_along_axis)
- ``three_nn_interpolate``   (PointNetFeaturePropagation 3-NN inverse-distance
                              -> dense-weight MXU matmul, ops/interpolate.py)
- ``ball_query``             (segmentation query_ball_point)
"""
from act_tpu.ops.reference import (
    square_distance,
    furthest_point_sample_ref,
    knn_ref,
    gather_points,
    chamfer_ref,
    three_nn_interpolate_ref,
    ball_query_ref as ball_query,
)
from act_tpu.ops.interpolate import three_nn_interpolate
from act_tpu.ops.fps import furthest_point_sample
from act_tpu.ops.group import knn, group_points, graph_feature_idx, fps_subsample
from act_tpu.ops.chamfer import (
    chamfer_distances,
    chamfer_distance_l1,
    chamfer_distance_l2,
    chamfer_distance_l2_split,
)
from act_tpu.ops.sampling import gumbel_argmax_pallas, use_fused_gumbel
