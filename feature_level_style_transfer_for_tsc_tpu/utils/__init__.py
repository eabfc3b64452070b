from .logging import FileLogger  # noqa: F401
from .profiling import profile_trace, phase_scope  # noqa: F401
