from roitr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from roitr_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
