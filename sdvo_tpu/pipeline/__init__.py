from sdvo_tpu.pipeline.system import System, SystemStatus, FrameResult  # noqa: F401
from sdvo_tpu.pipeline.bootstrap import bootstrap_two_view  # noqa: F401
