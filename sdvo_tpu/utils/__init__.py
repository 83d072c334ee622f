from sdvo_tpu.utils.logging import get_logger, configure_logging  # noqa: F401
from sdvo_tpu.utils.timing import Timers, scope_timer  # noqa: F401
