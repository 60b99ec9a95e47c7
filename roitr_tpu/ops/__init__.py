from roitr_tpu.ops.geometry import (  # noqa: F401
    pairwise_sq_dist,
    masked_pairwise_sq_dist,
    calc_ppf,
    apply_transform,
    weighted_procrustes,
)
from roitr_tpu.ops.neighbors import (  # noqa: F401
    masked_knn,
    knn_gather,
    three_nn_interpolate,
)
from roitr_tpu.ops.fps import furthest_point_sampling  # noqa: F401
from roitr_tpu.ops.normals import estimate_normals  # noqa: F401
from roitr_tpu.ops.partition import (  # noqa: F401
    point_to_node_partition,
    node_correspondences,
    node_occlusion_score,
)
from roitr_tpu.ops.sinkhorn import log_sinkhorn_ot  # noqa: F401
