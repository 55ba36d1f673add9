"""Geometry op layer - TPU-native replacement of the CUDA `pointnet2_cuda`
extension (reference `modules/pointnet2/pointnet2/src/`, SURVEY.md section 2.1).
"""

from garment4d_tpu.ops.pemax import (
    group_chain_max,
    group_pe_max,
    group_pe_max_split_frozen,
    query_group_pe_multi,
)
from garment4d_tpu.ops.pointcloud import (
    KnnResult,
    ball_query,
    ball_query_multi,
    query_group_pruned_multi,
    furthest_point_sample,
    gather_points,
    group_all,
    group_points,
    group_points_cf,
    interp_weights_from_dists,
    knn_points,
    pairwise_sqdist,
    query_and_group,
    three_interpolate,
    three_nn,
)
from garment4d_tpu.ops.meshmath import (
    cot_laplacian_apply,
    cotangent_weights,
    face_normals,
    vertex_normals,
)
from garment4d_tpu.ops.morton import (
    morton_codes,
    spatial_order,
)
from garment4d_tpu.ops.graph import (
    build_mesh_adjacency,
    gcn_adjacency,
    gcn_stack,
    graph_matmul,
    laplacian_adjacency,
    row_normalize,
    smoothing_operator,
)

__all__ = [
    "KnnResult",
    "ball_query",
    "ball_query_multi",
    "query_group_pruned_multi",
    "furthest_point_sample",
    "gather_points",
    "group_all",
    "group_points",
    "group_points_cf",
    "group_chain_max",
    "group_pe_max",
    "group_pe_max_split_frozen",
    "query_group_pe_multi",
    "interp_weights_from_dists",
    "knn_points",
    "morton_codes",
    "pairwise_sqdist",
    "spatial_order",
    "query_and_group",
    "three_interpolate",
    "three_nn",
    "cot_laplacian_apply",
    "cotangent_weights",
    "face_normals",
    "vertex_normals",
    "build_mesh_adjacency",
    "gcn_adjacency",
    "gcn_stack",
    "graph_matmul",
    "laplacian_adjacency",
    "row_normalize",
    "smoothing_operator",
]
