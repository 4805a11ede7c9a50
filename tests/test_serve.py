"""BucketedEncodeServer: static-shape bucketed serving (serve.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqvae_speech_tpu.serve import BucketedEncodeServer
from vqvae_speech_tpu.models import conv_vqvae_init, conv_vqvae_encode
from vqvae_speech_tpu.ops import speech_features

CFG = dict(
    input_features_type="mfcc",
    input_features_filters=13,
    augment_input_features=True,
    output_features_filters=13,
    augment_output_features=True,
    sampling_rate=16000,
    num_hiddens=32,
    num_residual_layers=2,
    residual_channels=32,
    embedding_dim=16,
    num_embeddings=8,
    commitment_cost=0.25,
    decay=0.0,
    use_kaiming_normal=False,
    use_jitter=False,
    jitter_probability=0.12,
    use_speaker_conditioning=False,
)


@pytest.fixture(scope="module")
def model():
    return conv_vqvae_init(jax.random.PRNGKey(0), CFG)


def _reference_codes(params, state, wave, bucket):
    """Standalone batch-1 encode of the zero-padded wave (the contract)."""
    padded = np.zeros(bucket, np.float32)
    padded[:len(wave)] = wave
    feats = speech_features(
        "mfcc", jnp.asarray(padded[None]), 16000, 13, True
    ).astype(jnp.float32)
    out = conv_vqvae_encode(params, state, feats, CFG, training=False)
    return np.asarray(out.indices).reshape(-1).astype(np.int32)


def _waves(lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [(0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
            for n in lengths]


def test_codes_match_standalone_batch1_encode(model):
    params, state = model
    server = BucketedEncodeServer(params, state, CFG,
                                  wave_buckets=(4000, 8000), max_batch=4)
    lengths = [4000, 3000, 8000, 5000, 4000, 7999]
    waves = _waves(lengths)
    results = server.encode(waves)
    assert len(results) == len(waves)
    for w, r in zip(waves, results):
        want = _reference_codes(params, state, w, r.bucket)
        np.testing.assert_array_equal(r.codes, want)
        assert r.bucket in (4000, 8000)
    # 3 waves in each bucket, max_batch 4 -> one launch per bucket
    assert server.stats["launches"] == 2
    assert server.stats["compiled_buckets"] == [4000, 8000]


def test_codes_independent_of_batch_composition(model):
    params, state = model
    server = BucketedEncodeServer(params, state, CFG,
                                  wave_buckets=(4000,), max_batch=8)
    target = _waves([4000], seed=1)[0]
    alone = server.encode([target])[0].codes
    with_friends = server.encode(
        _waves([3000, 2000], seed=2) + [target] + _waves([4000], seed=3))
    np.testing.assert_array_equal(with_friends[2].codes, alone)


def test_chunking_over_max_batch(model):
    params, state = model
    server = BucketedEncodeServer(params, state, CFG,
                                  wave_buckets=(4000,), max_batch=2)
    waves = _waves([4000] * 5)
    results = server.encode(waves)
    assert server.stats["launches"] == 3  # ceil(5/2)
    for w, r in zip(waves, results):
        np.testing.assert_array_equal(
            r.codes, _reference_codes(params, state, w, 4000))


def test_oversize_request_rejected(model):
    params, state = model
    server = BucketedEncodeServer(params, state, CFG, wave_buckets=(4000,))
    with pytest.raises(ValueError, match="exceeds the largest bucket"):
        server.encode(_waves([4001]))


def test_normalizer_applied(model):
    params, state = model
    feats = np.asarray(speech_features(
        "mfcc", jnp.asarray(_waves([4000])[0][None]), 16000, 13, True))
    norm = {"train_mean": feats.mean((0, 1)).astype(np.float32),
            "train_std": (feats.std((0, 1)) + 1e-3).astype(np.float32)}
    server = BucketedEncodeServer(params, state, CFG, wave_buckets=(4000,),
                                  normalizer=norm)
    plain = BucketedEncodeServer(params, state, CFG, wave_buckets=(4000,))
    w = _waves([4000], seed=5)
    a = server.encode(w)[0]
    b = plain.encode(w)[0]
    assert a.codes.shape == b.codes.shape
    assert a.n_frames == b.n_frames > 0


# -------------------- synthesis serving --------------------


@pytest.fixture(scope="module")
def vocoder():
    from vqvae_speech_tpu.models.wavenet.model import WaveNetConfig, wavenet_init
    cfg = WaveNetConfig(out_channels=32, layers=2, stacks=1,
                        residual_channels=8, gate_channels=8,
                        skip_out_channels=8, kernel_size=2,
                        cin_channels=4, gin_channels=-1,
                        upsample_conditional_features=True,
                        upsample_scales=(2, 2))
    return wavenet_init(jax.random.PRNGKey(0), cfg), cfg


def _conds(lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n, 4)).astype(np.float32) for n in lengths]


def test_synthesis_matches_standalone_greedy(vocoder):
    from vqvae_speech_tpu.serve import BucketedSynthesisServer
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    params, cfg = vocoder
    server = BucketedSynthesisServer(params, cfg, frame_buckets=(6, 12),
                                     max_batch=2, sample=False)
    conds = _conds([6, 4, 12, 9])
    results = server.synthesize(conds)
    assert server.stats["upsample_factor"] == 4
    for c, r in zip(conds, results):
        assert r.wave.shape == (c.shape[0] * 4,)
        padded = np.zeros((1, r.bucket, 4), np.float32)
        padded[0, :c.shape[0]] = c
        _, want = wavenet_incremental_generate(
            params, cfg, jax.random.PRNGKey(0), r.bucket * 4,
            c=padded, sample=False)
        np.testing.assert_array_equal(r.wave, np.asarray(want)[0, :len(r.wave)])


def test_synthesis_exact_bucket_no_padding(vocoder):
    from vqvae_speech_tpu.serve import BucketedSynthesisServer
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    params, cfg = vocoder
    server = BucketedSynthesisServer(params, cfg, frame_buckets=(6,),
                                     max_batch=4, sample=False)
    c = _conds([6], seed=7)[0]
    got = server.synthesize([c])[0].wave
    _, want = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(0), 24, c=c[None], sample=False)
    np.testing.assert_array_equal(got, np.asarray(want)[0])


def test_synthesis_batch_composition_independence(vocoder):
    from vqvae_speech_tpu.serve import BucketedSynthesisServer
    params, cfg = vocoder
    server = BucketedSynthesisServer(params, cfg, frame_buckets=(6,),
                                     max_batch=4, sample=False)
    target = _conds([6], seed=9)[0]
    alone = server.synthesize([target])[0].wave
    crowd = server.synthesize(_conds([5, 6], seed=10) + [target])
    np.testing.assert_array_equal(crowd[2].wave, alone)


# -------------------- parallel (one-pass) vocoder serving --------------------


@pytest.fixture(scope="module")
def flow_vocoder():
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init)
    cfg = FlowavenetConfig(in_channel=1, cin_channel=6, n_block=2, n_flow=2,
                           n_layer=1, filter_size=8, block_per_split=8,
                           upsample_scales=(4,))
    params = flowavenet_init(jax.random.PRNGKey(0), cfg)
    return params, cfg


@pytest.fixture(scope="module")
def iaf_vocoder():
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init,
        StudentConfig, wavenet_student_init)
    t_cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=6,
        upsample_scales=(2, 2))
    s_cfg = StudentConfig(num_blocks_student=(1, 1), num_layers=2,
                          front_channels=4, residual_channels=8,
                          gate_channels=8, skip_channels=8,
                          kernel_size=3, cin_channels=6)
    t_params = gaussian_wavenet_init(jax.random.PRNGKey(0), t_cfg)
    s_params = wavenet_student_init(jax.random.PRNGKey(1), s_cfg)
    return s_params, s_cfg, t_params, t_cfg


def _mels(lengths, cin=6, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n, cin)).astype(np.float32)
            for n in lengths]


def test_parallel_flow_matches_standalone(flow_vocoder):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    from vqvae_speech_tpu.models.flowavenet import flowavenet_reverse
    params, cfg = flow_vocoder
    srv = BucketedParallelSynthesisServer(
        "flowavenet", params, cfg, frame_buckets=(8, 16), max_batch=4,
        temp=0.8)
    conds = _mels([8, 5, 16])
    out = srv.synthesize(conds, seed=7)
    hop = srv.stats["upsample_factor"]
    for i, c in enumerate(conds):
        bucket = 8 if c.shape[0] <= 8 else 16
        c_pad = np.zeros((1, bucket, 6), np.float32)
        c_pad[0, :c.shape[0]] = c
        z = np.asarray(jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(7), i),
            (bucket * hop, 1), jnp.float32))[None] * 0.8
        ref = np.asarray(flowavenet_reverse(params, cfg, jnp.asarray(z),
                                            jnp.asarray(c_pad)))
        np.testing.assert_array_equal(out[i].wave,
                                      ref[0, :c.shape[0] * hop, 0])


def test_parallel_flow_batch_composition_independence(flow_vocoder):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    params, cfg = flow_vocoder
    srv = BucketedParallelSynthesisServer(
        "flowavenet", params, cfg, frame_buckets=(8,), max_batch=4)
    conds = _mels([8, 8, 8])
    together = srv.synthesize(conds, seed=3)
    alone = srv.synthesize(conds[:1], seed=3)
    np.testing.assert_array_equal(together[0].wave, alone[0].wave)


def test_parallel_iaf_matches_standalone(iaf_vocoder):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    from vqvae_speech_tpu.models.clarinet import (
        gaussian_wavenet_upsample, wavenet_student_generate)
    s_params, s_cfg, t_params, t_cfg = iaf_vocoder
    srv = BucketedParallelSynthesisServer(
        "iaf_student", s_params, s_cfg, teacher_params=t_params,
        teacher_cfg=t_cfg, frame_buckets=(12,), max_batch=4, temp=1.0)
    conds = _mels([12, 9])
    out = srv.synthesize(conds, seed=11)
    hop = srv.stats["upsample_factor"]
    assert hop == 4
    for i, c in enumerate(conds):
        c_pad = np.zeros((1, 12, 6), np.float32)
        c_pad[0, :c.shape[0]] = c
        z = np.asarray(jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(11), i),
            (12 * hop, 1), jnp.float32))[None]
        c_up = gaussian_wavenet_upsample(t_params, jnp.asarray(c_pad), t_cfg)
        ref = np.asarray(wavenet_student_generate(
            s_params, s_cfg, jnp.asarray(z), c_up))
        # eager batch-1 vs the server's jitted batch-4 program: XLA fusion
        # changes rounding in the last ulp, so near-parity here; bit-parity
        # across batch compositions is asserted separately below
        np.testing.assert_allclose(out[i].wave,
                                   ref[0, :c.shape[0] * hop, 0],
                                   rtol=1e-5, atol=1e-5)


def test_parallel_iaf_batch_composition_independence(iaf_vocoder):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    s_params, s_cfg, t_params, t_cfg = iaf_vocoder
    srv = BucketedParallelSynthesisServer(
        "iaf_student", s_params, s_cfg, teacher_params=t_params,
        teacher_cfg=t_cfg, frame_buckets=(12,), max_batch=4)
    conds = _mels([12, 9, 12])
    together = srv.synthesize(conds, seed=5)
    alone = srv.synthesize(conds[:1], seed=5)
    np.testing.assert_array_equal(together[0].wave, alone[0].wave)


def test_parallel_iaf_fused_chain_matches_xla_server(iaf_vocoder):
    """use_fused_chain=True (single-stream Pallas path; interpret on CPU)
    must reproduce the XLA server's waves."""
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    s_params, s_cfg, t_params, t_cfg = iaf_vocoder
    kw = dict(teacher_params=t_params, teacher_cfg=t_cfg,
              frame_buckets=(12,), temp=1.0)
    xla = BucketedParallelSynthesisServer(
        "iaf_student", s_params, s_cfg, max_batch=1, **kw)
    fused = BucketedParallelSynthesisServer(
        "iaf_student", s_params, s_cfg, max_batch=1, use_fused_chain=True,
        **kw)
    conds = _mels([12, 9])
    want = xla.synthesize(conds, seed=11)
    got = fused.synthesize(conds, seed=11)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g.wave, w.wave, rtol=1e-5, atol=1e-5)


def test_parallel_fused_chain_requires_single_stream_iaf(iaf_vocoder):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    s_params, s_cfg, t_params, t_cfg = iaf_vocoder
    with pytest.raises(ValueError, match="single-stream"):
        BucketedParallelSynthesisServer(
            "iaf_student", s_params, s_cfg, teacher_params=t_params,
            teacher_cfg=t_cfg, max_batch=4, use_fused_chain=True)


def test_parallel_server_rejects_bad_kind(flow_vocoder):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    params, cfg = flow_vocoder
    with pytest.raises(ValueError):
        BucketedParallelSynthesisServer("melgan", params, cfg)
    from vqvae_speech_tpu.models.clarinet import StudentConfig
    with pytest.raises(ValueError):
        BucketedParallelSynthesisServer("iaf_student", params,
                                        StudentConfig())


def test_parallel_flow_bf16_composition_independent(flow_vocoder):
    """bf16 serving keeps the batch-composition-independence contract."""
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    params, cfg = flow_vocoder
    srv = BucketedParallelSynthesisServer(
        "flowavenet", params, cfg, frame_buckets=(8,), max_batch=4,
        compute_dtype=jnp.bfloat16)
    conds = _mels([8, 6, 8])
    together = srv.synthesize(conds, seed=3)
    alone = srv.synthesize(conds[:1], seed=3)
    np.testing.assert_array_equal(together[0].wave, alone[0].wave)
    assert together[0].wave.dtype == np.float32


def test_synthesis_server_tensor_parallel_matches_single_chip(vocoder):
    """mesh with a >1 model axis routes decode through the channel-sharded
    TP scan; greedy waves match the single-chip server bit-for-bit."""
    from vqvae_speech_tpu.serve import BucketedSynthesisServer
    from vqvae_speech_tpu.parallel.mesh import make_mesh
    params, cfg = vocoder  # gate_channels=8 -> supports 2-way model axis
    mesh = make_mesh(num_data=4, num_model=2)
    tp_srv = BucketedSynthesisServer(params, cfg, frame_buckets=(6,),
                                     max_batch=2, sample=False, mesh=mesh)
    plain = BucketedSynthesisServer(params, cfg, frame_buckets=(6,),
                                    max_batch=2, sample=False)
    conds = _conds([6, 4], seed=3)
    got = tp_srv.synthesize(conds)
    want = plain.synthesize(conds)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a.wave, b.wave)


def test_parallel_flow_fused_chain_matches_xla_server(flow_vocoder):
    """flowavenet + use_fused_chain=True (non-causal halo-window Pallas;
    interpret on CPU) must reproduce the XLA server's waves."""
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    params, cfg = flow_vocoder
    xla = BucketedParallelSynthesisServer(
        "flowavenet", params, cfg, frame_buckets=(12,), max_batch=1)
    fused = BucketedParallelSynthesisServer(
        "flowavenet", params, cfg, frame_buckets=(12,), max_batch=1,
        use_fused_chain=True)
    conds = _mels([12, 9])
    want = xla.synthesize(conds, seed=3)
    got = fused.synthesize(conds, seed=3)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g.wave, w.wave, rtol=1e-5, atol=1e-5)
