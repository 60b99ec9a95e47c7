from roitr_tpu.eval.benchmark import benchmark, evaluate_registration  # noqa: F401
from roitr_tpu.eval.fdmatch_eval import compute_nrfmr, evaluate_fdmatch  # noqa: F401
from roitr_tpu.eval.ransac import (  # noqa: F401
    get_inlier_ratio_correspondence,
    ransac_pose_estimation_correspondences,
)
from roitr_tpu.eval.registration import (  # noqa: F401
    benchmark_registration,
    benchmark_registration_rotated,
)
from roitr_tpu.eval.tester import Tester, get_trainer  # noqa: F401
