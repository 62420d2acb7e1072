from avt_tpu.utils.compile_cache import enable_compile_cache
from avt_tpu.utils.metrics import topk_accuracy
from avt_tpu.utils.logging import get_logger

__all__ = ["topk_accuracy", "get_logger", "enable_compile_cache"]
