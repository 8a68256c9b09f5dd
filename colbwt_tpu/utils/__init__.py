from colbwt_tpu.utils.config import ColBwtConfig, SplitMode  # noqa: F401
from colbwt_tpu.utils.log import get_logger, Timer, status  # noqa: F401
