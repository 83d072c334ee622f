from sdvo_tpu.depth.filter import (  # noqa: F401
    FilterBank,
    init_filters,
    update_filters,
    vogiatzis_update,
    compute_tau,
)
from sdvo_tpu.depth.epipolar import epipolar_search, affine_warp_matrix  # noqa: F401
