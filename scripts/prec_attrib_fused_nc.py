"""Attribute the fused-NC-chain TPU f32 discrepancy to matmul precision.

On TPU, `ops/fused_resblock.py:fused_block_chain_nc` at f32 differs from
the unfused XLA chain by ~1e-3 on a few scattered rows (CPU agrees to
roundoff — tests/test_fused_resblock.py).  Hypothesis: the default TPU
matmul precision (bf16-class passes) rounds differently depending on how
the convs are laid out, so BOTH paths sit ~1e-3 from the HIGHEST-precision
reference and the fused/XLA delta is precision noise, not a kernel bug.

This probe computes max|.| of each path against the same chain run under
`jax.default_matmul_precision('highest')`:
  * if xla_default-vs-highest is the same magnitude as fused-vs-highest,
    the discrepancy is attributed to matmul precision (both are rounding,
    neither is wrong);
  * if the fused delta is much larger, the kernel has a real numerics
    issue at f32 on TPU.

Run on a real chip (CPU runs trivially agree): python scripts/prec_attrib_fused_nc.py
"""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.clarinet.modules import (
    resblock_init, resblock_apply)
from vqvae_speech_tpu.ops.fused_resblock import (
    fused_block_chain_nc, stack_block_weights)


def main():
    layers, k, C, G, S, cin, T, tile = 2, 3, 64, 128, 64, 80, 512, 256
    dil = tuple(2 ** i for i in range(layers))
    ks = jax.random.split(jax.random.PRNGKey(7), layers + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(layers)]
    x = jax.random.normal(ks[-2], (1, T, C), jnp.float32)
    c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32)

    def ref():
        h = x
        sk = 0.0
        for p, d in zip(blocks, dil):
            h, s = resblock_apply(p, h, c, k, d, causal=False)
            sk = sk + s
        return h, sk

    h_def, s_def = ref()
    with jax.default_matmul_precision("highest"):
        h_hi, s_hi = ref()
    stacked = stack_block_weights(blocks, compute_dtype=jnp.float32)
    interpret = jax.default_backend() == "cpu"  # Pallas needs a real chip
    gx, gs = fused_block_chain_nc(x[0], c[0], stacked, layers=layers,
                                  kernel_size=k, dilations=dil, tile=tile,
                                  interpret=interpret)
    report = {
        "platform": jax.default_backend(),
        "x_xla_default_vs_highest": float(jnp.max(jnp.abs(h_def[0] - h_hi[0]))),
        "x_fused_vs_highest": float(jnp.max(jnp.abs(gx - h_hi[0]))),
        "skip_xla_default_vs_highest": float(jnp.max(jnp.abs(s_def[0] - s_hi[0]))),
        "skip_fused_vs_highest": float(jnp.max(jnp.abs(gs - s_hi[0]))),
    }
    import json
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
