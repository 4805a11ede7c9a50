from vqvae_speech_tpu.nn.conv import (
    conv1d_init,
    conv1d,
    conv_transpose1d_init,
    conv_transpose1d,
    conv_weight,
)
from vqvae_speech_tpu.nn.layers import (
    residual_init,
    residual_apply,
    residual_stack_init,
    residual_stack_apply,
    jitter,
    upsample_nearest,
    embedding_init,
    embedding_lookup,
)
