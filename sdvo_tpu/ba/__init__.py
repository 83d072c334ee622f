from sdvo_tpu.ba.bundle_adjustment import (  # noqa: F401
    BAObservations,
    BASettings,
    build_point_table,
    local_ba,
    two_view_ba,
    optimize_pose,
    optimize_structure,
)
