from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .profiling import Timer, timed_loop, trace  # noqa: F401
from .env import get_config  # noqa: F401
