from .simulation import set_random_seed, is_dag, count_accuracy  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .logging import MetricLogger  # noqa: F401
