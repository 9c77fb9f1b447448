from ssl_tpu.utils.logger import AvgTimer, MessageLogger, get_env_info, get_root_logger  # noqa: F401
from ssl_tpu.utils.misc import check_resume, get_time_str, make_exp_dirs, mkdir_and_rename, scandir  # noqa: F401
from ssl_tpu.utils.options import parse_options  # noqa: F401
from ssl_tpu.utils.registry import (  # noqa: F401
    ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY, METRIC_REGISTRY, MODEL_REGISTRY,
)
