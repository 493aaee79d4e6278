from mds_tpu.evaluation.evaluator import (  # noqa: F401
    MscEvalV0,
    MscEvalV0Contrast,
    MscEvalCrop,
    compute_ious,
    confusion_hist,
    eval_model,
    get_round_size,
    resize_bilinear_ac,
)
