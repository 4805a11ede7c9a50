from vqvae_speech_tpu.models.flowavenet.model import (
    FlowavenetConfig,
    flowavenet_init,
    flowavenet_forward,
    flowavenet_reverse,
    flowavenet_upsample,
    actnorm_initialize,
)
