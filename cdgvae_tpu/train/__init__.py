from .steps import make_train_step, make_infomax_step, make_semi_step  # noqa: F401
from .loop import train_epoch, Averager  # noqa: F401
