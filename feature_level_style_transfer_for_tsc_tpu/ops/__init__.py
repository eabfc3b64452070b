"""TPU compute ops: Pallas kernels and their XLA fallbacks.

Every op here has (a) a pure-XLA implementation that works on any backend and
(b) where profitable, a Pallas TPU kernel.  `use_pallas()` picks the kernel
path on TPU; tests force the XLA path (or interpret mode) on CPU.
"""

import os

import jax


def use_pallas() -> bool:
    """True when the Pallas kernel paths should be used.

    Defaults to True on TPU backends; override with FLSTTSC_USE_PALLAS=0/1.
    """
    env = os.environ.get("FLSTTSC_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode (CPU testing of kernel logic)."""
    return os.environ.get("FLSTTSC_PALLAS_INTERPRET", "0") not in ("0", "false", "False")


from .grl import gradient_reversal, grl_coeff  # noqa: E402,F401
from .batchnorm import batch_norm  # noqa: E402,F401
from .gate import fused_add_tanh_sigmoid_multiply  # noqa: E402,F401
from .osconv import build_os_mask, masked_os_conv  # noqa: E402,F401
from .coupling import affine_coupling_forward, affine_coupling_inverse  # noqa: E402,F401
