from .structure import (  # noqa: F401
    MAX_KERNEL_SIZE,
    default_parameter_budgets,
    generate_layer_parameter_list,
    layer_parameter_list_input_change,
    layer_shapes,
    mask_bounds,
    primes_in_range,
    receptive_field,
    total_out_channels,
)
from .os_cnn import (  # noqa: F401
    os_block_apply,
    os_block_init,
    os_block_masks,
    os_cnn_apply,
    os_cnn_head,
    os_cnn_init,
    os_cnn_res_apply,
    os_cnn_res_init,
    os_cnn_res_trunk,
)
from .flow import (  # noqa: F401
    inv1x1_forward,
    inv1x1_init,
    inv1x1_inverse,
    waveglow_forward,
    waveglow_forward_pair,
    waveglow_infer,
    waveglow_init,
    waveglow_loss,
    wn_apply,
    wn_init,
)
from .adapters import (  # noqa: F401
    NoiseTransferState,
    dimension_unification_apply,
    dimension_unification_init,
    noise_transfer_apply,
    noise_transfer_init,
    prob_transfer_apply,
    prob_transfer_init,
)
from .critics import (  # noqa: F401
    CriticState,
    ad_net_apply,
    ad_net_init,
    critic_state_init,
    feature_discriminator_apply,
    feature_discriminator_init,
    random_layer_apply,
    random_layer_init,
)
from .cpc import cpc_apply, cpc_apply_pair, cpc_init  # noqa: F401
from .transformer import (  # noqa: F401
    discriminator_att_apply,
    discriminator_att_init,
    seq_transformer_apply,
    seq_transformer_init,
)
