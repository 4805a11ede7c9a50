from vqvae_speech_tpu.models.wavenet.model import (
    wavenet_init,
    wavenet_apply,
    receptive_field_size,
    WaveNetConfig,
)
from vqvae_speech_tpu.models.wavenet.incremental import wavenet_incremental_generate
from vqvae_speech_tpu.models.wavenet.mixture import (
    discretized_mix_logistic_loss,
    sample_from_discretized_mix_logistic,
)
from vqvae_speech_tpu.models.wavenet.util import (
    is_mulaw_quantize,
    is_mulaw,
    is_raw,
    is_scalar_input,
    build_wavenet_from_hparams,
)
