"""Orbax checkpoint backend round-trip tests."""
import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.train.orbax_checkpoint import (
    save_checkpoint_orbax, load_checkpoint_orbax,
    latest_checkpoint_epoch_orbax)


def test_orbax_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    model_state = {"vq": {"codebook": jnp.full((4, 2), 0.5)}}
    opt_state = {"count": jnp.zeros((), jnp.int32)}
    losses = [{"loss": 1.0}, {"loss": 0.5}]

    save_checkpoint_orbax(str(tmp_path), "exp", 0, params, model_state,
                          opt_state, losses, [2.0, 3.0])
    save_checkpoint_orbax(str(tmp_path), "exp", 1, params, model_state,
                          opt_state, losses, [2.0, 3.0])

    epoch, path = latest_checkpoint_epoch_orbax(str(tmp_path), "exp")
    assert epoch == 2

    ckpt = load_checkpoint_orbax(str(tmp_path), "exp")
    assert ckpt["epoch"] == 2
    assert ckpt["experiment_name"] == "exp"
    np.testing.assert_array_equal(np.asarray(ckpt["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(
        np.asarray(ckpt["model_state"]["vq"]["codebook"]),
        np.full((4, 2), 0.5))
    assert ckpt["train_res_recon_error"] == losses


def test_orbax_missing_returns_none(tmp_path):
    assert latest_checkpoint_epoch_orbax(str(tmp_path), "nope") == (None, None)


def test_orbax_sharded_trainstate_roundtrip_resumes_dp_training(tmp_path):
    """The multi-chip failure mode round 2 never covered: save a
    mesh-replicated DP TrainState via orbax, restore it WITH shardings on
    the 8-device mesh, resume training, and assert the loss trajectory is
    identical to the uninterrupted run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vqvae_speech_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate)
    from vqvae_speech_tpu.models import conv_vqvae_init
    from vqvae_speech_tpu.train.trainer import (
        TrainState, make_train_step, make_optimizer)
    from vqvae_speech_tpu.train.orbax_checkpoint import (
        sharded_restore_target)

    cfg = dict(
        input_features_filters=13, augment_input_features=True,
        output_features_filters=13, augment_output_features=True,
        num_hiddens=8, num_residual_layers=1, residual_channels=8,
        embedding_dim=4, num_embeddings=5, commitment_cost=0.25,
        decay=0.0, use_kaiming_normal=False, use_jitter=False,
        jitter_probability=0.12, use_speaker_conditioning=False,
        learning_rate=1e-3,
    )
    mesh = make_mesh(num_data=8, num_model=1)
    opt = make_optimizer(cfg["learning_rate"])
    step = make_train_step(cfg, opt, mesh=mesh)

    params, model_state = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
    state = replicate(TrainState(params, model_state, opt.init(params),
                                 jax.random.PRNGKey(7)), mesh)

    rng = np.random.default_rng(0)
    batches = [shard_batch({
        "input_features": rng.standard_normal((16, 47, 39)).astype(
            np.float32),
        "output_features": rng.standard_normal((16, 47, 39)).astype(
            np.float32),
    }, mesh) for _ in range(4)]

    # two steps, checkpoint, two more steps (the uninterrupted tail)
    for b in batches[:2]:
        state, _ = step(state, b)
    save_checkpoint_orbax(str(tmp_path), "dp", 0, state.params,
                          {"model_state": state.model_state,
                           "opt_state": state.opt_state,
                           "rng": state.rng}, {})
    # host-side abstract copy BEFORE the tail steps donate state's buffers
    payload_like = jax.device_get({
        "params": state.params,
        "model_state": {"model_state": state.model_state,
                        "opt_state": state.opt_state,
                        "rng": state.rng},
        "opt_state": {},
    })
    tail_losses = []
    tail_state = state
    for b in batches[2:]:
        tail_state, m = step(tail_state, b)
        tail_losses.append(float(m["loss"]))

    # restore directly onto the mesh (replicated shardings), resume
    repl = NamedSharding(mesh, P())
    ckpt = load_checkpoint_orbax(
        str(tmp_path), "dp",
        target=sharded_restore_target(payload_like, repl))
    for leaf in jax.tree_util.tree_leaves(ckpt["params"]):
        assert leaf.sharding.is_fully_replicated
        assert leaf.sharding.mesh == mesh
    resumed = TrainState(ckpt["params"],
                         ckpt["model_state"]["model_state"],
                         ckpt["model_state"]["opt_state"],
                         ckpt["model_state"]["rng"])
    resumed_losses = []
    for b in batches[2:]:
        resumed, m = step(resumed, b)
        resumed_losses.append(float(m["loss"]))
    np.testing.assert_allclose(resumed_losses, tail_losses, rtol=1e-6)
