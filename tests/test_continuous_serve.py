"""ContinuousSynthesisServer: continuous-batching AR decode (serve.py).

Contracts under test:
* a slot's greedy stream is bit-identical to a standalone batch-1 greedy
  decode of the same request, regardless of chunk size, admission time, or
  what shares the slot pool;
* slots are reused across requests with full state reset;
* sampled streams use per-slot PRNG chains — independent of batch
  composition (the property the bucketed server cannot offer);
* int8 weight-only decoding composes.
"""
import numpy as np
import jax
import pytest

from vqvae_speech_tpu.serve import ContinuousSynthesisServer


@pytest.fixture(scope="module")
def vocoder():
    from vqvae_speech_tpu.models.wavenet.model import (
        WaveNetConfig, wavenet_init)
    cfg = WaveNetConfig(out_channels=32, layers=4, stacks=2,
                        residual_channels=8, gate_channels=8,
                        skip_out_channels=8, kernel_size=2,
                        cin_channels=4, gin_channels=-1,
                        upsample_conditional_features=True,
                        upsample_scales=(2, 2))
    return wavenet_init(jax.random.PRNGKey(0), cfg), cfg


def _conds(lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n, 4)).astype(np.float32) for n in lengths]


def _standalone_greedy(params, cfg, c):
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    _, want = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(0), c.shape[0] * 4, c=c[None],
        sample=False)
    return np.asarray(want)[0]


def test_greedy_matches_standalone_across_chunks(vocoder):
    params, cfg = vocoder
    # chunk 7 is NOT a divisor of any request length: every stream crosses
    # chunk boundaries mid-flight
    server = ContinuousSynthesisServer(params, cfg, slots=2, chunk_size=7,
                                       max_frames=12, sample=False)
    conds = _conds([6, 4, 12, 9, 3])
    results = server.run(conds)
    for c, r in zip(conds, results):
        assert r.wave.shape == (c.shape[0] * 4,)
        np.testing.assert_array_equal(r.wave, _standalone_greedy(
            params, cfg, c))
    # 5 requests through 2 slots: slots were necessarily reused
    assert server.stats["launches"] >= 3
    assert 0.0 < server.stats["slot_utilization"] <= 1.0


def test_stream_independent_of_admission_time_and_neighbors(vocoder):
    params, cfg = vocoder
    target = _conds([8], seed=9)[0]
    alone = ContinuousSynthesisServer(
        params, cfg, slots=2, chunk_size=16, max_frames=8,
        sample=False).run([target])[0].wave
    # same request admitted LAST behind a crowd of different lengths: it
    # enters mid-flight, in a different slot, at a different clock
    crowd = _conds([5, 8, 3, 6], seed=10) + [target]
    late = ContinuousSynthesisServer(
        params, cfg, slots=2, chunk_size=16, max_frames=8,
        sample=False).run(crowd)[4].wave
    np.testing.assert_array_equal(late, alone)


def test_sampled_streams_use_per_request_keys(vocoder):
    params, cfg = vocoder
    target = _conds([6], seed=3)[0]
    # request index pins the key: index 2 alone-in-queue vs index 2 in a
    # crowd must sample the SAME stream (bucketed server cannot do this)
    filler = _conds([4, 5], seed=4)
    a = ContinuousSynthesisServer(
        params, cfg, slots=4, chunk_size=8, max_frames=6,
        sample=True).run(filler + [target])[2].wave
    b = ContinuousSynthesisServer(
        params, cfg, slots=2, chunk_size=32, max_frames=6,
        sample=True).run(filler + [target])[2].wave
    np.testing.assert_array_equal(a, b)
    # and the sampled stream is a real sample, not the greedy stream
    g = ContinuousSynthesisServer(
        params, cfg, slots=2, chunk_size=8, max_frames=6,
        sample=False).run(filler + [target])[2].wave
    assert not np.array_equal(a, g)


def test_int8_composition(vocoder):
    params, cfg = vocoder
    server = ContinuousSynthesisServer(params, cfg, slots=2, chunk_size=8,
                                       max_frames=6, sample=False,
                                       weight_quant="int8")
    c = _conds([6], seed=5)[0]
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    _, want = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(0), 24, c=c[None], sample=False,
        weight_quant="int8")
    np.testing.assert_array_equal(server.run([c])[0].wave,
                                  np.asarray(want)[0])


def test_rejects_oversized_conditioning(vocoder):
    params, cfg = vocoder
    server = ContinuousSynthesisServer(params, cfg, slots=2, chunk_size=8,
                                       max_frames=4)
    with pytest.raises(ValueError):
        server.run(_conds([5]))


def test_online_submit_step_collect(vocoder):
    """Online API: requests submitted WHILE others are mid-flight complete
    with streams identical to standalone decode; the pool drains fully and
    a later drain (after the clock reset) still matches."""
    params, cfg = vocoder
    server = ContinuousSynthesisServer(params, cfg, slots=2, chunk_size=5,
                                       max_frames=12, sample=False)
    c0, c1, c2 = _conds([12, 6, 9], seed=21)
    r0 = server.submit(c0)
    done = server.step()                 # c0 in flight (48 samples > 5)
    assert done == [] and server.collect(r0) is None
    r1 = server.submit(c1)               # joins mid-flight
    r2 = server.submit(c2)               # queues behind it (2 slots)
    while server.pending:
        server.step()
    for rid, c in ((r0, c0), (r1, c1), (r2, c2)):
        res = server.collect(rid)
        np.testing.assert_array_equal(res.wave, _standalone_greedy(
            params, cfg, c))
        assert server.collect(rid) is None          # collect is take-once
    assert server.stats["mean_latency_chunks"] > 0
    # per-request latency attribution: total = admission wait + decode,
    # and with 3 requests on 2 slots at least one request waited >=1 chunk
    st = server.stats
    for k in ("latency_chunks", "admission_wait_chunks", "decode_chunks"):
        assert st[k] is not None and st[k]["max"] >= st[k]["p50"] >= 0
    assert st["admission_wait_chunks"]["max"] >= 1
    assert (st["latency_chunks"]["mean"] ==
            pytest.approx(st["admission_wait_chunks"]["mean"]
                          + st["decode_chunks"]["mean"], abs=0.02))
    # second drain after the pool emptied (shared clock rewound): identical
    again = server.run([c0])[0].wave
    np.testing.assert_array_equal(again, _standalone_greedy(params, cfg, c0))


def test_int8_block_composition(vocoder):
    params, cfg = vocoder
    server = ContinuousSynthesisServer(params, cfg, slots=2, chunk_size=8,
                                       max_frames=6, sample=False,
                                       weight_quant="int8_block")
    c = _conds([6], seed=5)[0]
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    _, want = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(0), 24, c=c[None], sample=False,
        weight_quant="int8_block")
    np.testing.assert_array_equal(server.run([c])[0].wave,
                                  np.asarray(want)[0])
