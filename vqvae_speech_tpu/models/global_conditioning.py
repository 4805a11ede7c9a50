"""Speaker (global) conditioning: embedding lookup broadcast over time.

Capability-parity with reference src/speech_utils/global_conditioning.py:32-58,
re-designed as a proper learnable parameter.  NOTE a documented reference
quirk: the reference constructs a brand-new randomly initialized nn.Embedding
(std=0.1) on *every call* (global_conditioning.py:34), so its speaker
conditioning is untrained noise each forward.  This framework keeps a
persistent table (the intended semantics); pass ``resample_key`` to reproduce
the reference's fresh-random-table-per-call behavior for A/B studies.
"""
import jax
import jax.numpy as jnp


def global_conditioning_init(key, num_speakers: int, gin_channels: int = 40,
                             std: float = 0.1, dtype=jnp.float32):
    return {"table": std * jax.random.normal(key, (num_speakers, gin_channels), dtype)}


def global_conditioning_apply(params, speaker_ids, T: int, expand: bool = True,
                              resample_key=None, std: float = 0.1):
    """speaker_ids (B,) int -> (B, T, gin) if expand else (B, 1, gin)."""
    table = params["table"]
    if resample_key is not None:
        table = std * jax.random.normal(resample_key, table.shape, table.dtype)
    g = table[speaker_ids.astype(jnp.int32)][:, None, :]  # (B, 1, gin)
    if not expand:
        return g
    return jnp.broadcast_to(g, (g.shape[0], T, g.shape[2]))
