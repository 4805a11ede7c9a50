"""Fused WaveNet decode-step kernel vs XLA reference (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vqvae_speech_tpu.ops.wavenet_step import (
    fused_glu_stack_step, glu_stack_step_xla)


def _rand_stack(L=4, k=3, B=1, C=16, G=32, S=8, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
    return dict(
        x0=f(B, C), taps=f(L, k - 1, B, C), cond=f(L, B, G),
        wtap=f(L, k, C, G), bias=f(L, G),
        wskip=f(L, G // 2, S), bskip=f(L, S),
        wout=f(L, G // 2, C), bout=f(L, C))


def test_fused_step_matches_xla_interpret():
    for (L, k, B), legacy in [((4, 3, 1), False), ((6, 2, 2), True),
                              ((3, 3, 4), True)]:
        args = _rand_stack(L=L, k=k, B=B)
        with pltpu.force_tpu_interpret_mode():
            got_x, got_s, got_all = fused_glu_stack_step(legacy=legacy,
                                                         **args)
        want_x, want_s, want_all = glu_stack_step_xla(legacy=legacy, **args)
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_all), np.asarray(want_all),
                                   rtol=1e-4, atol=1e-5)


