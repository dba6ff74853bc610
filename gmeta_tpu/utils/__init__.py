from gmeta_tpu.utils.metrics import MetricLogger, StepTimer, rss_gb  # noqa: F401
from gmeta_tpu.utils import checkpoint  # noqa: F401
