from .ts_parser import load_from_tsfile  # noqa: F401
from .dataset import TsClassificationData, TrainData, TestData  # noqa: F401
from .batching import epoch_batches, num_full_batches  # noqa: F401
