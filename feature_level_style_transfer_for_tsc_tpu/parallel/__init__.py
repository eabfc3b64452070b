from .mesh import make_mesh, data_sharding, domain_sharding, replicated  # noqa: F401
from .dp import shard_epoch_batches, replicate  # noqa: F401
from .dp_explicit import make_dp_phase1_epoch  # noqa: F401
from .multi_source import MultiSourceEnsemble  # noqa: F401
