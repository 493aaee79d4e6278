from mds_tpu.losses.ohem_ce import (  # noqa: F401
    MdsOhemCELoss,
    MdsOhemNLLPlusLoss,
    OhemCELoss,
    cross_entropy_per_pixel,
    select_class,
)
from mds_tpu.losses.helpers import (  # noqa: F401
    adj_nll_plus_loss,
    circle_loss,
    focal_loss,
    multi_label_cross_entropy,
    nll_plus_loss,
    recall_cross_entropy,
    weighted_nll_plus_loss,
)
from mds_tpu.losses.lovasz import (  # noqa: F401
    boundary_aware_focal_loss,
    lovasz_softmax,
)
from mds_tpu.losses.rmi import rmi_loss  # noqa: F401
from mds_tpu.losses.aaf import AAFLoss  # noqa: F401
from mds_tpu.losses.contrast import (  # noqa: F401
    MemoryBank,
    PixelContrastLoss,
    memory_bank_push,
)
from mds_tpu.losses.cross_datasets import CrossDatasetsCELossAdvGNN  # noqa: F401
