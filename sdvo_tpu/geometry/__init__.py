from sdvo_tpu.geometry import se3, camera, robust, triangulation, essential  # noqa: F401
from sdvo_tpu.geometry.se3 import SE3  # noqa: F401
from sdvo_tpu.geometry.camera import PinholeCamera  # noqa: F401
