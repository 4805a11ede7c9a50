from vqvae_speech_tpu.models.clarinet.wavenet import (
    GaussianWaveNetConfig,
    gaussian_wavenet_init,
    gaussian_wavenet_apply,
    gaussian_wavenet_upsample,
    gaussian_wavenet_core,
    gaussian_wavenet_generate,
    gaussian_wavenet_core_fused,
)
from vqvae_speech_tpu.models.clarinet.wavenet_iaf import (
    StudentConfig,
    wavenet_student_init,
    wavenet_student_apply,
    wavenet_student_generate,
)
from vqvae_speech_tpu.models.clarinet.loss import (
    gaussian_loss,
    sample_from_gaussian,
    kl_gaussians,
    stft_magnitude,
)
