from .classification import cross_entropy, softmax_entropy  # noqa: F401
from .cdan import cdan_loss  # noqa: F401
from .wgan import wgan_loss  # noqa: F401
from .gradnorm import GradNormState, gradnorm_init, gradnorm_step  # noqa: F401
from ..models.flow import waveglow_loss  # noqa: F401
