from sdvo_tpu.features.detection import (  # noqa: F401
    FeatureSelection,
    detect_gradient_by_value,
    gradient_magnitude_with_ssc,
)
from sdvo_tpu.features.ssc import ssc_select  # noqa: F401
from sdvo_tpu.features.klt import pyramidal_klt, optical_flow_with_gate  # noqa: F401
