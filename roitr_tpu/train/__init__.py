from roitr_tpu.train.checkpoint import (  # noqa: F401
    init_best_metrics,
    load_checkpoint,
    save_checkpoint,
    update_bests,
)
from roitr_tpu.train.trainer import Trainer  # noqa: F401
