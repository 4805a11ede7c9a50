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


def test_fused_step_q_matches_dequantized_xla():
    """int8 fused stack vs XLA on pre-dequantized weights (exact match —
    the scale factorization is exact)."""
    from vqvae_speech_tpu.ops.wavenet_step_q import fused_glu_stack_step_q
    from vqvae_speech_tpu.models.wavenet.incremental import _quantize_int8
    import jax.numpy as jnp

    for (L, k, B), legacy in [((4, 3, 1), True), ((3, 2, 2), False)]:
        args = _rand_stack(L=L, k=k, B=B, C=16, G=32, S=8)
        # quantize the stacks per layer
        wtap_i8, stap, wskip_i8, sskip, wout_i8, sout = [], [], [], [], [], []
        deq = dict(args)
        wt, ws, wo = [], [], []
        for l in range(L):
            qi, si = _quantize_int8(args["wtap"][l], axes=(0, 1))
            wtap_i8.append(qi); stap.append(si[0])
            wt.append(qi.astype(np.float32) * si[0])
            qi, si = _quantize_int8(args["wskip"][l], axes=(0,))
            wskip_i8.append(qi); sskip.append(si[0])
            ws.append(qi.astype(np.float32) * si[0])
            qi, si = _quantize_int8(args["wout"][l], axes=(0,))
            wout_i8.append(qi); sout.append(si[0])
            wo.append(qi.astype(np.float32) * si[0])
        deq["wtap"] = jnp.stack(wt)
        deq["wskip"] = jnp.stack(ws)
        deq["wout"] = jnp.stack(wo)

        with pltpu.force_tpu_interpret_mode():
            got_x, got_s, got_all = fused_glu_stack_step_q(
                args["x0"], args["taps"], args["cond"],
                jnp.stack(wtap_i8), jnp.stack(stap), args["bias"],
                jnp.stack(wskip_i8), jnp.stack(sskip), args["bskip"],
                jnp.stack(wout_i8), jnp.stack(sout), args["bout"],
                legacy=legacy)
        want_x, want_s, want_all = glu_stack_step_xla(legacy=legacy, **deq)
        # the quantized kernel runs its dots in bf16 (single MXU pass)
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                                   rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(np.asarray(got_all), np.asarray(want_all),
                                   rtol=5e-2, atol=5e-3)
