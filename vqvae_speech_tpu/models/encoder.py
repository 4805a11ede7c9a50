"""Chorowski-2019 convolutional speech encoder (downsample x2).

Capability-parity with reference src/models/convolutional_encoder.py:36-146:
two k3/p1 convs (the second with a residual add), a k4/s2/p2 strided conv
halving time, two more k3/p1 residual convs, then a (weight-tied) residual
stack with a skip connection.  ReLU after every conv.  Layout is (B, T, C) so
every conv lowers to an MXU matmul over the 768-channel axis.
"""
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn import (
    conv1d_init,
    conv1d,
    residual_stack_init,
    residual_stack_apply,
)


def convolutional_encoder_init(key, features_filters: int, num_hiddens: int,
                               num_residual_layers: int, num_residual_hiddens: int,
                               use_weight_norm: bool = False, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "conv_1": conv1d_init(ks[0], features_filters, num_hiddens, 3,
                              use_weight_norm=use_weight_norm, dtype=dtype),
        "conv_2": conv1d_init(ks[1], num_hiddens, num_hiddens, 3,
                              use_weight_norm=use_weight_norm, dtype=dtype),
        "conv_3": conv1d_init(ks[2], num_hiddens, num_hiddens, 4,
                              use_weight_norm=use_weight_norm, dtype=dtype),
        "conv_4": conv1d_init(ks[3], num_hiddens, num_hiddens, 3,
                              use_weight_norm=use_weight_norm, dtype=dtype),
        "conv_5": conv1d_init(ks[4], num_hiddens, num_hiddens, 3,
                              use_weight_norm=use_weight_norm, dtype=dtype),
        "residual_stack": residual_stack_init(
            ks[5], num_hiddens, num_hiddens, num_residual_layers,
            num_residual_hiddens, use_weight_norm, dtype),
    }


def convolutional_encoder_apply(params, x, num_residual_layers: int = 2):
    """x: (B, T, features_filters) -> (B, ceil((T+1)/2), num_hiddens)."""
    x1 = jax.nn.relu(conv1d(params["conv_1"], x, padding=1))
    x = jax.nn.relu(conv1d(params["conv_2"], x1, padding=1)) + x1
    x3 = jax.nn.relu(conv1d(params["conv_3"], x, stride=2, padding=2))
    x4 = jax.nn.relu(conv1d(params["conv_4"], x3, padding=1)) + x3
    x5 = jax.nn.relu(conv1d(params["conv_5"], x4, padding=1)) + x4
    return residual_stack_apply(params["residual_stack"], x5,
                                num_residual_layers) + x5
