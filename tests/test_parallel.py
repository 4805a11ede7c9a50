"""Mesh/sharding unit tests on the 8-device virtual CPU mesh."""
import os

import numpy as np
import pytest
import jax
import jax.flatten_util
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vqvae_speech_tpu.parallel.mesh import (
    MeshConfiguration, make_mesh, shard_batch, replicate)
from vqvae_speech_tpu.data.prefetch import prefetch_to_device


def test_make_mesh_shapes():
    mesh = make_mesh(num_data=8, num_model=1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh42 = make_mesh(num_data=4, num_model=2)
    assert mesh42.shape == {"data": 4, "model": 2}


def test_mesh_configuration_from_config():
    mc = MeshConfiguration.load_from_configuration(
        {"use_data_parallel": True})
    assert mc.data_axis_size == 8 and mc.use_data_parallel
    mc1 = MeshConfiguration.load_from_configuration(
        {"use_data_parallel": False})
    assert mc1.data_axis_size == 1 and not mc1.use_data_parallel


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(num_data=8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["x"].sharding
    assert shards.spec == P("data")
    assert len(sharded["x"].addressable_shards) == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_replicate_places_everywhere():
    mesh = make_mesh(num_data=8)
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.spec == P()
    assert rep["w"].sharding.is_fully_replicated


def test_psum_compiles_over_mesh():
    """A sharded-batch mean under jit produces the global mean (XLA inserts
    the cross-device reduction)."""
    mesh = make_mesh(num_data=8)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    xs = shard_batch({"x": x}, mesh)["x"]

    @jax.jit
    def global_mean(v):
        return jnp.mean(v)

    np.testing.assert_allclose(float(global_mean(xs)), x.mean(), rtol=1e-6)


def test_prefetch_to_device_yields_all_batches():
    batches = [{"a": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["a"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["a"]),
                                      np.full((2, 2), i))


def test_prefetch_with_mesh_shards():
    mesh = make_mesh(num_data=8)
    batches = [{"a": np.arange(16, dtype=np.float32).reshape(8, 2)}]
    out = list(prefetch_to_device(iter(batches), mesh=mesh))
    assert out[0]["a"].sharding.spec == P("data")


def test_sharded_vq_search_matches_single_device():
    from vqvae_speech_tpu.parallel.sharded_vq import (
        sharded_vq_search, place_sharded_codebook)
    from vqvae_speech_tpu.ops.vq import vq_search_xla

    mesh = make_mesh(num_data=4, num_model=2)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal((96, 64)).astype(np.float32))
    cb_host = rng.standard_normal((128, 64)).astype(np.float32)
    cb = place_sharded_codebook(jnp.asarray(cb_host), mesh)

    idx, mins = jax.jit(
        lambda f, c: sharded_vq_search(f, c, mesh))(flat, cb)
    want = vq_search_xla(flat, jnp.asarray(cb_host))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want.indices))
    # min distances match the full matrix minima
    from vqvae_speech_tpu.ops.vq import vq_distances

    d = np.asarray(vq_distances(flat, jnp.asarray(cb_host)))
    np.testing.assert_allclose(np.asarray(mins), d.min(axis=1),
                               rtol=1e-4, atol=1e-4)


def test_sharded_vq_search_8way():
    from vqvae_speech_tpu.parallel.sharded_vq import (
        sharded_vq_search, place_sharded_codebook)
    from vqvae_speech_tpu.ops.vq import vq_search_xla

    mesh = make_mesh(num_data=1, num_model=8)
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.standard_normal((48, 16)).astype(np.float32))
    cb_host = rng.standard_normal((64, 16)).astype(np.float32)
    cb = place_sharded_codebook(jnp.asarray(cb_host), mesh)
    idx, _ = sharded_vq_search(flat, cb, mesh)
    want = vq_search_xla(flat, jnp.asarray(cb_host))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want.indices))


def test_sequence_parallel_encoder_time_sharding():
    """Sequence parallelism: the encoder's convs run with the TIME axis
    sharded over the mesh — XLA GSPMD inserts the halo exchanges for the
    k3/k4 convolution windows automatically.  Results must match the
    unsharded forward (long-utterance scaling path, SURVEY.md 2.10/5)."""
    from jax.sharding import NamedSharding
    from vqvae_speech_tpu.models.encoder import (
        convolutional_encoder_init, convolutional_encoder_apply)

    mesh = make_mesh(num_data=8, num_model=1)
    params = convolutional_encoder_init(jax.random.PRNGKey(0), 39, 32, 2, 32)
    x = np.random.default_rng(0).standard_normal((1, 192, 39)).astype(np.float32)

    want = np.asarray(convolutional_encoder_apply(params, jnp.asarray(x), 2))

    seq_sharding = NamedSharding(mesh, P(None, "data", None))
    x_sharded = jax.device_put(jnp.asarray(x), seq_sharding)
    fwd = jax.jit(lambda p, v: convolutional_encoder_apply(p, v, 2),
                  in_shardings=(NamedSharding(mesh, P()), seq_sharding))
    got = fwd(params, x_sharded)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_initialize_multihost_single_host_is_noop(monkeypatch):
    """No coordinator => no distributed init AND no backend touch."""
    from vqvae_speech_tpu.parallel import mesh as mesh_mod

    def boom(*a, **k):  # any backend instantiation is an ordering bug
        raise AssertionError("backend touched before distributed init")

    monkeypatch.setattr(jax, "process_count", boom)
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    mesh_mod.initialize_multihost()  # must not raise


def test_initialize_multihost_orders_distributed_init_first(monkeypatch):
    """With a coordinator, jax.distributed.initialize is called WITHOUT any
    prior backend instantiation (jax.process_count would initialize it —
    the round-1 ordering bug)."""
    from vqvae_speech_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(
        jax, "process_count",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("jax.process_count called before distributed init")))
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append(kw))
    monkeypatch.setattr(mesh_mod, "_multihost_initialized", False)

    mesh_mod.initialize_multihost("localhost:1234", num_processes=2,
                                  process_id=0)
    assert calls == [dict(coordinator_address="localhost:1234",
                          num_processes=2, process_id=0)]
    # second call is a no-op (idempotent)
    mesh_mod.initialize_multihost("localhost:1234", num_processes=2,
                                  process_id=0)
    assert len(calls) == 1


def test_initialize_multihost_two_process_cpu():
    """Real jax.distributed over two CPU processes on localhost: both hosts
    see process_count==2 and a cross-host psum produces the global sum
    (SURVEY.md 2.10 — the DCN path of the comm backend)."""
    import socket
    import subprocess
    import sys
    import pytest

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {root!r})
pid = int(sys.argv[1]); port = int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")  # some images ship env-overriding plugins
from vqvae_speech_tpu.parallel.mesh import initialize_multihost
initialize_multihost(f"localhost:{{port}}", num_processes=2, process_id=pid)
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2
from jax.experimental.multihost_utils import process_allgather
got = process_allgather(jnp.float32(pid + 1.0))
assert float(got.sum()) == 3.0, got
print("MULTIHOST_OK", pid)
""".format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # each process is 1 device
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out in outs:
        if rc != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"distributed service unavailable in sandbox: {out[-300:]}")
        assert rc == 0, out
        assert "MULTIHOST_OK" in out


# -------------------- data-parallel vocoder train steps --------------------


def _vocoder_dp_compare(make_step_with_mesh, make_state, batch, steps=2,
                        loss_of=lambda out: out[0] if isinstance(out, tuple)
                        else out):
    """Run `steps` updates on one device and on the 8-device DP mesh; the
    loss trajectories must agree (mean-of-shards == global mean)."""
    single_step = make_step_with_mesh(None)
    dp_step = make_step_with_mesh(make_mesh(num_data=8, num_model=1))
    s1, s8 = make_state(), make_state()
    mesh = make_mesh(num_data=8, num_model=1)
    s8 = replicate(s8, mesh)
    sharded = shard_batch(batch, mesh)
    for _ in range(steps):
        s1, out1 = single_step(s1, batch)
        s8, out8 = dp_step(s8, sharded)
        np.testing.assert_allclose(float(loss_of(out1)),
                                   float(loss_of(out8)),
                                   rtol=2e-4, atol=1e-5)


def test_data_parallel_clarinet_teacher_step():
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_teacher_train_step, make_vocoder_optimizer,
        create_vocoder_state)

    cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=6,
        upsample_scales=(4, 4))
    opt = make_vocoder_optimizer(1e-3, 10.0)
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), cfg)
    B, Tc = 8, 4
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (B, Tc * 16, 1)) * 0.1,
        "c": jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 6)),
    }
    _vocoder_dp_compare(
        lambda mesh: make_teacher_train_step(cfg, opt, mesh=mesh),
        lambda: create_vocoder_state(
            jax.random.PRNGKey(3),
            gaussian_wavenet_init(jax.random.PRNGKey(0), cfg), opt),
        batch)


def test_data_parallel_flowavenet_step():
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_flow_train_step, make_vocoder_optimizer, create_vocoder_state)

    cfg = FlowavenetConfig(in_channel=1, cin_channel=6, n_block=2, n_flow=2,
                           n_layer=1, filter_size=8, block_per_split=8,
                           upsample_scales=(4,))
    opt = make_vocoder_optimizer(1e-3, 1.0)
    B, Tc = 8, 8
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (B, Tc * 4, 1)) * 0.3,
        "c": jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 6)),
    }
    _vocoder_dp_compare(
        lambda mesh: make_flow_train_step(cfg, opt, mesh=mesh),
        lambda: create_vocoder_state(
            jax.random.PRNGKey(3),
            flowavenet_init(jax.random.PRNGKey(0), cfg), opt),
        batch,
        loss_of=lambda out: out[0])


# -------------------- sequence-parallel vocoder forward --------------------


def test_sequence_parallel_teacher_core_matches_global():
    """Time-sharded ClariNet teacher forward == global forward (halo
    exchange supplies exactly the causal left context; shard 0's open
    ppermute end supplies the causal zero pad)."""
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.models.clarinet.wavenet import gaussian_wavenet_core
    from vqvae_speech_tpu.parallel.sp_vocoder import sp_gaussian_wavenet_core

    cfg = GaussianWaveNetConfig(
        num_blocks=2, num_layers=3, front_channels=8, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=3, cin_channels=6,
        upsample_scales=(4, 4))
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 512  # T_local = 64 >= max halo (k-1)*3^2 + front 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c_up = jax.random.normal(jax.random.PRNGKey(2), (B, T, 6))

    ref = gaussian_wavenet_core(params, cfg, x, c_up)
    mesh = make_mesh(num_data=8, num_model=1)
    sp = sp_gaussian_wavenet_core(params, cfg, x, c_up, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_sequence_parallel_teacher_loss_and_grad_match():
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.models.clarinet.wavenet import gaussian_wavenet_core
    from vqvae_speech_tpu.models.clarinet.loss import gaussian_loss
    from vqvae_speech_tpu.parallel.sp_vocoder import sp_teacher_loss

    cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=6,
        upsample_scales=(4, 4))
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 256
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1)) * 0.1
    c_up = jax.random.normal(jax.random.PRNGKey(2), (B, T, 6))
    mesh = make_mesh(num_data=8, num_model=1)

    def ref_loss(p):
        y = gaussian_wavenet_core(p, cfg, x, c_up)
        return jnp.mean(gaussian_loss(y[:, :-1], x[:, 1:]))

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    l_sp, g_sp = jax.value_and_grad(
        lambda p: sp_teacher_loss(p, cfg, x, c_up, mesh))(params)
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_sp)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_r),
                               rtol=5e-4, atol=1e-6)


def test_sequence_parallel_halo_too_large_raises():
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.parallel.sp_vocoder import sp_gaussian_wavenet_core

    cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=6, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=3, cin_channels=6,
        upsample_scales=(4, 4))
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 128, 1))   # T_local 16 << dilation 3^5 halo
    c_up = jnp.zeros((1, 128, 6))
    mesh = make_mesh(num_data=8, num_model=1)
    with pytest.raises(ValueError):
        sp_gaussian_wavenet_core(params, cfg, x, c_up, mesh)


def test_data_parallel_flow_bf16_step_runs():
    """DP x mixed precision compose: sharded batch, bf16 couplings,
    f32 log-density accumulation."""
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_flow_train_step, make_vocoder_optimizer, create_vocoder_state)

    cfg = FlowavenetConfig(in_channel=1, cin_channel=6, n_block=2, n_flow=2,
                           n_layer=1, filter_size=8, block_per_split=8,
                           upsample_scales=(4,))
    opt = make_vocoder_optimizer(1e-3, 1.0)
    mesh = make_mesh(num_data=8, num_model=1)
    state = replicate(create_vocoder_state(
        jax.random.PRNGKey(1),
        flowavenet_init(jax.random.PRNGKey(0), cfg), opt), mesh)
    B, Tc = 8, 8
    batch = shard_batch({
        "x": np.asarray(jax.random.normal(
            jax.random.PRNGKey(1), (B, Tc * 4, 1))) * 0.3,
        "c": np.asarray(jax.random.normal(
            jax.random.PRNGKey(2), (B, Tc, 6))),
    }, mesh)
    step = make_flow_train_step(cfg, opt, mesh=mesh,
                                compute_dtype=jnp.bfloat16)
    state, (loss, aux) = step(state, batch)
    assert np.isfinite(float(loss))


def test_data_parallel_wavenet_vqvae_step():
    """WaveNetVQVAE DP: loss matches single-device over 2 steps."""
    import optax
    from vqvae_speech_tpu.models.wavenet_vqvae import wavenet_vqvae_init
    from vqvae_speech_tpu.train.wavenet_trainer import (
        WaveNetTrainState, make_wavenet_train_step)
    from tests.test_training import TINY_CFG

    cfg = dict(TINY_CFG)
    cfg.update(decoder_type="wavenet", length=512, quantize=16,
               input_features_dim=3, output_features_dim=3,
               num_hiddens=8, embedding_dim=8, num_embeddings=5,
               residual_channels=8, n_loop=1, n_layers=2, filter_size=2,
               gate_channels=8, skip_out_channels=8,
               global_condition_dim=4, local_condition_dim=8,
               num_speakers=2)
    key = jax.random.PRNGKey(0)
    params, model_state, wn_cfg = wavenet_vqvae_init(key, cfg, 2)
    opt = optax.amsgrad(1e-3)

    def fresh():
        return WaveNetTrainState(params, model_state, opt.init(params), key)

    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "preprocessed_audio": np.tanh(rng.standard_normal(
            (B, cfg["length"] + 1))).astype(np.float32),
        "input_features": rng.standard_normal(
            (B, cfg["length"] // 160 + 1, 39)).astype(np.float32),
        "speaker_id": np.zeros((B,), np.int32),
    }
    single = make_wavenet_train_step(cfg, wn_cfg, opt)
    mesh = make_mesh(num_data=8, num_model=1)
    dp = make_wavenet_train_step(cfg, wn_cfg, opt, mesh=mesh)
    s1, s8 = fresh(), replicate(fresh(), mesh)
    sharded = shard_batch(batch, mesh)
    for _ in range(2):
        s1, m1 = single(s1, batch)
        s8, m8 = dp(s8, sharded)
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=2e-4, atol=1e-5)


def test_tensor_parallel_decode_matches_single_device():
    """Channel-sharded AR decode == single-device scan (greedy stream and
    logits) on an 8-way model axis."""
    from vqvae_speech_tpu.models.wavenet.model import (
        WaveNetConfig, wavenet_init)
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    from vqvae_speech_tpu.parallel.tp_decode import (
        wavenet_incremental_generate_tp)

    cfg = WaveNetConfig(out_channels=32, layers=4, stacks=2,
                        residual_channels=16, gate_channels=32,
                        skip_out_channels=16, kernel_size=2,
                        cin_channels=4, gin_channels=-1,
                        upsample_conditional_features=True,
                        upsample_scales=(2, 2))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    T = 24
    c = jax.random.normal(jax.random.PRNGKey(1), (2, T // 4, 4))

    ref_out, ref_emit = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False)

    mesh = make_mesh(num_data=1, num_model=8)
    tp_out, tp_emit = wavenet_incremental_generate_tp(
        params, cfg, jax.random.PRNGKey(2), T, mesh, c=c, sample=False)

    np.testing.assert_allclose(np.asarray(tp_out), np.asarray(ref_out),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tp_emit), np.asarray(ref_emit))


def test_tensor_parallel_decode_2way_with_speakers():
    from vqvae_speech_tpu.models.wavenet.model import (
        WaveNetConfig, wavenet_init)
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    from vqvae_speech_tpu.parallel.tp_decode import (
        wavenet_incremental_generate_tp)

    cfg = WaveNetConfig(out_channels=32, layers=3, stacks=1,
                        residual_channels=8, gate_channels=16,
                        skip_out_channels=8, kernel_size=3,
                        cin_channels=4, gin_channels=6, n_speakers=3,
                        upsample_conditional_features=True,
                        upsample_scales=(4,))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    T = 16
    c = jax.random.normal(jax.random.PRNGKey(1), (2, T // 4, 4))
    g = jnp.asarray([0, 2], jnp.int32)

    ref_out, ref_emit = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, g=g, sample=False)
    mesh = make_mesh(num_data=4, num_model=2)
    tp_out, tp_emit = wavenet_incremental_generate_tp(
        params, cfg, jax.random.PRNGKey(2), T, mesh, c=c, g=g,
        sample=False)
    np.testing.assert_allclose(np.asarray(tp_out), np.asarray(ref_out),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tp_emit), np.asarray(ref_emit))


def test_prepare_tp_decode_caches_compiled_program_per_bucket():
    """The serving path's contract: repeated launches at the same (T, B)
    reuse ONE compiled program (weights prepared once, no per-call
    shard_map/jit rebuild — the round-2 advisor finding)."""
    from vqvae_speech_tpu.models.wavenet.model import (
        WaveNetConfig, wavenet_init)
    from vqvae_speech_tpu.parallel.tp_decode import prepare_tp_decode

    cfg = WaveNetConfig(out_channels=32, layers=3, stacks=1,
                        residual_channels=8, gate_channels=16,
                        skip_out_channels=8, kernel_size=2,
                        cin_channels=4, gin_channels=-1,
                        upsample_conditional_features=True,
                        upsample_scales=(4,))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(num_data=1, num_model=8)
    gen = prepare_tp_decode(params, cfg, mesh)

    T = 16
    c = jax.random.normal(jax.random.PRNGKey(1), (2, T // 4, 4))
    _, e1 = gen(jax.random.PRNGKey(2), T, c=c)
    assert len(gen.cache) == 1
    _, e2 = gen(jax.random.PRNGKey(2), T, c=c)
    assert len(gen.cache) == 1          # same bucket: no new program
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    _, _ = gen(jax.random.PRNGKey(2), T * 2,
               c=jax.random.normal(jax.random.PRNGKey(3), (2, T // 2, 4)))
    assert len(gen.cache) == 2          # new bucket: one more program


def test_tensor_parallel_decode_int8_matches_single_chip_int8():
    """int8 x TP: per-column scales are permutation-equivariant, so the
    sharded int8 decode matches the single-chip int8 scan."""
    from vqvae_speech_tpu.models.wavenet.model import (
        WaveNetConfig, wavenet_init)
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    from vqvae_speech_tpu.parallel.tp_decode import (
        wavenet_incremental_generate_tp)

    cfg = WaveNetConfig(out_channels=32, layers=4, stacks=2,
                        residual_channels=16, gate_channels=32,
                        skip_out_channels=16, kernel_size=2,
                        cin_channels=4, gin_channels=-1,
                        upsample_conditional_features=True,
                        upsample_scales=(2, 2))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    T = 20
    c = jax.random.normal(jax.random.PRNGKey(1), (1, T // 4, 4))

    ref_out, ref_emit = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False,
        weight_quant="int8")
    mesh = make_mesh(num_data=1, num_model=8)
    tp_out, tp_emit = wavenet_incremental_generate_tp(
        params, cfg, jax.random.PRNGKey(2), T, mesh, c=c, sample=False,
        weight_quant="int8")
    np.testing.assert_allclose(np.asarray(tp_out), np.asarray(ref_out),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tp_emit), np.asarray(ref_emit))


def test_two_process_dp_train_step_matches_single_process():
    """Cross-process DP TRAIN STEP over real jax.distributed (VERDICT r3 #6):
    two localhost processes build the global 2-device mesh, run
    make_train_step on a batch sharded across the process boundary, and the
    replicated loss equals the single-process value — i.e. the gradient/loss
    psum actually crosses DCN, not just an allgather.  The single-process
    reference value is computed in THIS process (mesh=None, full batch)."""
    import socket
    import subprocess
    import sys
    import pytest

    # ---- single-process reference loss on the full batch ----
    import numpy as np
    from tests.test_training import TINY_CFG

    def _full_batch():
        rng = np.random.default_rng(0)
        return {
            "input_features": rng.standard_normal(
                (4, 47, 39), dtype=np.float32),
            "output_features": rng.standard_normal(
                (4, 47, 39), dtype=np.float32),
        }

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.conv_vqvae import conv_vqvae_init
    from vqvae_speech_tpu.train.trainer import (
        TrainState, make_optimizer, make_train_step)

    cfg = dict(TINY_CFG)
    params, model_state = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg["learning_rate"])
    state = TrainState(params, model_state, opt.init(params),
                       jax.random.PRNGKey(1))
    step = make_train_step(cfg, opt, mesh=None)
    batch = {k: jnp.asarray(v) for k, v in _full_batch().items()}
    _, metrics = step(state, batch)
    expected_loss = float(metrics["loss"])

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {root!r})
pid = int(sys.argv[1]); port = int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
from vqvae_speech_tpu.parallel.mesh import initialize_multihost
initialize_multihost(f"localhost:{{port}}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from tests.test_training import TINY_CFG
from vqvae_speech_tpu.models.conv_vqvae import conv_vqvae_init
from vqvae_speech_tpu.train.trainer import (
    TrainState, make_optimizer, make_train_step)

cfg = dict(TINY_CFG)
params, model_state = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
opt = make_optimizer(cfg["learning_rate"])
state = TrainState(params, model_state, opt.init(params),
                   jax.random.PRNGKey(1))

mesh = Mesh(np.asarray(jax.devices()), ("data",))   # global 2-device mesh
repl = NamedSharding(mesh, P())
data = NamedSharding(mesh, P("data"))
state = jax.device_put(state, repl)

rng = np.random.default_rng(0)                       # same batch as parent
full = {{
    "input_features": rng.standard_normal((4, 47, 39), dtype=np.float32),
    "output_features": rng.standard_normal((4, 47, 39), dtype=np.float32),
}}
# each process contributes ITS rows; make_array assembles the global array
batch = {{k: jax.make_array_from_process_local_data(
    data, v[pid * 2:(pid + 1) * 2]) for k, v in full.items()}}

step = make_train_step(cfg, opt, mesh=mesh)
_, metrics = step(state, batch)
print("DP_LOSS", pid, repr(float(metrics["loss"])))
""".format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # each process is 1 device
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for rc, out in outs:
        if rc != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"distributed service unavailable in sandbox: {out[-300:]}")
        assert rc == 0, out
        for line in out.splitlines():
            if line.startswith("DP_LOSS"):
                losses.append(float(line.split()[-1]))
    assert len(losses) == 2, outs
    # both processes see the same replicated loss, equal to single-process
    assert losses[0] == losses[1], losses
    np.testing.assert_allclose(losses[0], expected_loss, rtol=2e-5)
