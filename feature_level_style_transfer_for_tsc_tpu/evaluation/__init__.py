from .metrics import accuracy, per_class_precision_weights, normalize_model_weights  # noqa: F401
from .voting import entropy_precision_vote, entropy_only_vote  # noqa: F401
