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
