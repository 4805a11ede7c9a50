"""Parameter initializers matching the reference's PyTorch init distributions.

The reference relies on PyTorch defaults (Conv1d: kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weight and bias)
and optionally `nn.init.kaiming_normal_` (gain sqrt(2), fan_in mode) under a
`weight_norm` reparameterization (reference: src/modules/conv1d_builder.py:32-44).

Matching the *distributions* (not the bitstream — PyTorch and JAX PRNGs
differ) keeps training dynamics comparable.
"""
import math

import jax
import jax.numpy as jnp


def torch_conv_uniform(key, shape, fan_in, dtype=jnp.float32):
    """PyTorch default Conv1d init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    # NOTE: keep default args free of jnp calls — evaluating jnp at import
    # time initializes the JAX backend before the caller can pick a platform.
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal(key, shape, fan_in, dtype=jnp.float32, gain=math.sqrt(2.0)):
    """torch.nn.init.kaiming_normal_ (default a=0 => gain sqrt(2), fan_in mode)."""
    std = gain / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)
