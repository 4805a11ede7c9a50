from vqvae_speech_tpu.parallel.mesh import (
    MeshConfiguration,
    make_mesh,
    shard_batch,
    replicate,
)
