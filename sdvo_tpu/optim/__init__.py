from sdvo_tpu.optim.estimators import MESTIMATORS, mestimator_weights, compute_std  # noqa: F401
from sdvo_tpu.optim.optimizer import (  # noqa: F401
    LMSettings,
    LevenbergMethod,
    OptimizerStatus,
    optimize_gn,
    optimize_lm,
    tukey_weights,
)
