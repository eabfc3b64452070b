from .checkpoint import save_checkpoint, restore_checkpoint, partial_restore  # noqa: F401
from .artifacts import save_feature_dumps, save_prediction_strip  # noqa: F401
