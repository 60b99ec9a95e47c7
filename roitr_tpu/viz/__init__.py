from roitr_tpu.viz.visualizer import Visualizer  # noqa: F401
from roitr_tpu.viz.feature_space import visualize_feature_space  # noqa: F401
