from vqvae_speech_tpu.models.vq import (
    vector_quantizer_init,
    vector_quantizer_apply,
    VQOutput,
)
from vqvae_speech_tpu.models.encoder import (
    convolutional_encoder_init,
    convolutional_encoder_apply,
)
from vqvae_speech_tpu.models.decoder import (
    deconvolutional_decoder_init,
    deconvolutional_decoder_apply,
)
from vqvae_speech_tpu.models.conv_vqvae import (
    conv_vqvae_init,
    conv_vqvae_apply,
    conv_vqvae_encode,
    ConvVQVAEOutput,
)
