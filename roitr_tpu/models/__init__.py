from roitr_tpu.models.backbone import RIPointTransformer  # noqa: F401
from roitr_tpu.models.roitr import PairInputs, RoITr, create_model  # noqa: F401
