from vqvae_speech_tpu.ops.mu_law import mu_law_encode, mu_law_decode
from vqvae_speech_tpu.ops.mel import (
    melspectrogram,
    normalized_log_mel,
    mel_filterbank_slaney,
)
from vqvae_speech_tpu.ops.pairwise import pdist, cdist
from vqvae_speech_tpu.ops.dsp import (
    frame_signal,
    power_spectrum,
    mel_filterbank,
    mfcc,
    logfbank,
    delta,
    speech_features,
    num_frames,
)
