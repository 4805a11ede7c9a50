"""Input-type predicates + hparams-dict model factory.

Capability-parity with reference src/wavenet_vocoder/util.py:31-51 and
src/wavenet_vocoder/builder.py:31-68.
"""
from vqvae_speech_tpu.models.wavenet.model import WaveNetConfig, wavenet_init


def is_mulaw_quantize(input_type: str) -> bool:
    return input_type == "mulaw-quantize"


def is_mulaw(input_type: str) -> bool:
    return input_type == "mulaw"


def is_raw(input_type: str) -> bool:
    return input_type == "raw"


def is_scalar_input(input_type: str) -> bool:
    return is_raw(input_type) or is_mulaw(input_type)


def build_wavenet_from_hparams(key, hparams: dict):
    """hparams-dict -> (params, WaveNetConfig), mirroring the r9y9 builder
    (builder.py:31-68): scalar_input derives from ``input_type``; quantize
    channels set out_channels for the categorical mode."""
    input_type = hparams.get("input_type", "mulaw-quantize")
    scalar_input = is_scalar_input(input_type)
    cfg = WaveNetConfig(
        out_channels=hparams.get("out_channels",
                                 256 if not scalar_input
                                 else 10 * 3),  # num_mixtures x 3
        layers=hparams.get("layers", 20),
        stacks=hparams.get("stacks", 2),
        residual_channels=hparams.get("residual_channels", 512),
        gate_channels=hparams.get("gate_channels", 512),
        skip_out_channels=hparams.get("skip_out_channels", 512),
        kernel_size=hparams.get("kernel_size", 3),
        dropout=hparams.get("dropout", 1 - 0.95),
        cin_channels=hparams.get("cin_channels", -1),
        gin_channels=hparams.get("gin_channels", -1),
        n_speakers=hparams.get("n_speakers"),
        upsample_conditional_features=hparams.get(
            "upsample_conditional_features", False),
        upsample_scales=tuple(hparams.get("upsample_scales") or ()) or None,
        freq_axis_kernel_size=hparams.get("freq_axis_kernel_size", 3),
        scalar_input=scalar_input,
        use_speaker_embedding=hparams.get("use_speaker_embedding", True),
        legacy=hparams.get("legacy", True),
    )
    return wavenet_init(key, cfg), cfg
