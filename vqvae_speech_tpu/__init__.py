"""VQ-VAE-Speech TPU — a TPU-native (JAX/XLA/Pallas/pjit) speech VQ-VAE framework.

A ground-up rebuild of the capabilities of the CiE-XinYuChen/VQ-VAE-Speech
reference (PyTorch) as an idiomatic TPU framework:

- ``ops``      — pure XLA/Pallas compute primitives (mu-law, MFCC/logfbank DSP,
                 fused VQ codebook search, pairwise distances).
- ``nn``       — a minimal functional layer system (explicit param pytrees,
                 pure apply functions, explicit PRNG threading).
- ``models``   — encoder / decoder / VQ-VAE composites, WaveNet vocoder,
                 ClariNet and FloWaveNet heads.
- ``parallel`` — device mesh + sharding (the TPU-native replacement for the
                 reference's nn.DataParallel, see
                 reference src/experiments/device_configuration.py:32-76).
- ``data``     — VCTK ingest, feature export to a columnar store, normalizer.
- ``train``    — experiments driver (YAML base + JSON overrides), jitted
                 train step, checkpoint/auto-resume.
- ``eval``     — evaluation/analysis suite (alignments, clustering metrics,
                 embedding-space stats, loss plots).
"""

__version__ = "0.1.0"
