"""Vocoder training drivers: ClariNet teacher, IAF student distillation,
FloWaveNet MLE — jitted steps with weight-EMA, LR halving, grad clipping.

Capability-parity with the reference's standalone CLIs:
* teacher (reference src/clarinet/train.py:42-293): Adam, LR x0.5 at
  200k/400k/600k steps, grad-clip 10, weight-EMA shadow (decay 0.9999),
  Gaussian NLL on ``y_hat[:-1] vs y[1:]``, best-loss checkpointing,
* student (reference src/clarinet/train_student.py:42-403): z ~ N(0,1),
  teacher scores student samples, KL + 4*reg + STFT frame loss,
* flow (reference src/flow_wavenet/train.py:55-90): loss = -(log_p + logdet),
  grad-clip 1.

Each trainer is ONE compiled step (forward+backward+update+EMA) instead of
the reference's framework-call chains.
"""
import os
import pickle
from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vqvae_speech_tpu.utils.logger import ConsoleLogger


LR_HALVING_STEPS = (200_000, 400_000, 600_000)  # reference train.py:75-86


def step_lr_schedule(base_lr: float, boundaries=LR_HALVING_STEPS):
    """Clarinet milestones: halve at 200k/400k/600k, then hold.

    NOTE (PARITY #31): the reference INTENDS this but its implementation
    mutates ``param_group['learning_rate']`` — torch param groups key the
    rate as ``'lr'``, so the reference actually trains at a constant LR.
    We implement the intended schedule."""
    def schedule(step):
        factor = 1.0
        for b in boundaries:
            factor = jnp.where(step >= b, factor * 0.5, factor)
        return base_lr * factor
    return schedule


def steplr_schedule(base_lr: float, halve_every: int = 200_000):
    """FloWaveNet's torch StepLR(step_size=200000, gamma=0.5)
    (reference flow train.py:253): halve every 200k steps, indefinitely
    — unlike the clarinet milestones, which stop after 600k."""
    def schedule(step):
        return base_lr * 0.5 ** (step // halve_every)
    return schedule


def make_vocoder_optimizer(learning_rate: float, clip_norm: float,
                           halve_every: int = None):
    """Adam + global-norm clip + LR schedule.  ``halve_every`` selects
    the flow-style StepLR; default is the clarinet milestone schedule."""
    schedule = (steplr_schedule(learning_rate, halve_every)
                if halve_every else step_lr_schedule(learning_rate))
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda step: -schedule(step)),
    )


class VocoderTrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any      # weight-EMA shadow (reference modules.py:127-138)
    step: jax.Array
    rng: jax.Array


def _ema_update(ema, params, decay):
    # reference EMA: shadow = decay * x + (1-decay) * shadow
    # (modules.py:136-138 — note the unconventional direction: the *new*
    # value gets weight `decay`)
    return jax.tree_util.tree_map(
        lambda s, p: decay * p + (1.0 - decay) * s, ema, params)


def _jit_vocoder_step(step, mesh):
    """Compile a (state, batch) -> (state, loss) step, optionally
    data-parallel over a mesh: batch sharded on the ``data`` axis, state
    replicated — same contract as the flagship trainer
    (train/trainer.py:117-124); XLA inserts the gradient all-reduce."""
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data),
                   out_shardings=(repl, repl))


def create_vocoder_state(key, params, optimizer):
    return VocoderTrainState(params, optimizer.init(params),
                             jax.tree_util.tree_map(jnp.asarray, params),
                             jnp.zeros((), jnp.int32), key)


def make_teacher_train_step(cfg, optimizer, ema_decay: float = 0.9999,
                            mesh=None, compute_dtype=None):
    """``compute_dtype=jnp.bfloat16`` = mixed precision: master params,
    optimizer state, NLL reduction and the update stay f32; the WaveNet
    forward/backward runs on the MXU bf16 path (params/inputs cast inside
    the loss, so grads flow to the f32 masters)."""
    from vqvae_speech_tpu.models.clarinet import gaussian_wavenet_apply
    from vqvae_speech_tpu.models.clarinet.loss import gaussian_loss

    def loss_fn(params, batch):
        x, c = batch["x"], batch["c"]
        if compute_dtype is not None:
            fwd_params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), params)
            y_hat = gaussian_wavenet_apply(
                fwd_params, cfg, x.astype(compute_dtype),
                c.astype(compute_dtype)).astype(jnp.float32)
        else:
            y_hat = gaussian_wavenet_apply(params, cfg, x, c)
        # predict the NEXT sample (reference train.py teacher forcing:
        # y_hat[:, :, :-1] vs y[:, 1:])
        return jnp.mean(gaussian_loss(y_hat[:, :-1], x[:, 1:]))

    def step(state: VocoderTrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = _ema_update(state.ema_params, params, ema_decay)
        return VocoderTrainState(params, opt_state, ema, state.step + 1,
                                 state.rng), loss

    return _jit_vocoder_step(step, mesh)


def make_student_train_step(teacher_cfg, student_cfg, teacher_params,
                            optimizer, ema_decay: float = 0.9999,
                            kl_type: str = "qp", stft_filter: int = 1024,
                            stft_hop: int = 256, mesh=None,
                            compute_dtype=None):
    """Probability-density distillation step.  The (frozen) teacher's
    params enter the compiled program as a jit ARGUMENT, not a captured
    constant — a reference-scale teacher is tens of MB, and baking it into
    the executable bloats compile and transport (DESIGN.md compile-size
    discipline).  ``compute_dtype=jnp.bfloat16`` runs both WaveNet stacks
    in bf16 (masters, KL and STFT losses stay f32)."""
    from vqvae_speech_tpu.models.clarinet import (
        gaussian_wavenet_apply, gaussian_wavenet_upsample,
        wavenet_student_apply)
    from vqvae_speech_tpu.models.clarinet.loss import kl_loss, stft_frame_loss

    def loss_fn(params, batch, key, t_params):
        x, c = batch["x"], batch["c"]
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), params)
            t_params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), t_params)
            c = c.astype(compute_dtype)
        # draw in f32 (the reference's distribution), cast to compute dtype
        z = jax.random.normal(key, x.shape).astype(c.dtype)
        c_up = gaussian_wavenet_upsample(t_params, c, teacher_cfg)
        x_s, mu_s, logs_s = wavenet_student_apply(params, student_cfg, z,
                                                  c_up)
        mu_logs_t = gaussian_wavenet_apply(t_params, teacher_cfg, x_s, c)
        x_s = x_s.astype(jnp.float32)
        mu_s = mu_s.astype(jnp.float32)
        logs_s = logs_s.astype(jnp.float32)
        mu_logs_t = mu_logs_t.astype(jnp.float32)
        mu_t, logs_t = mu_logs_t[:, :-1, 0:1], mu_logs_t[:, :-1, 1:2]
        if kl_type == "pq":
            total, kl, reg = kl_loss(mu_t, logs_t, mu_s, logs_s)
        else:
            total, kl, reg = kl_loss(mu_s, logs_s, mu_t, logs_t)
        frame = stft_frame_loss(x_s[:, 1:, 0], x[:, 1:, 0],
                                stft_filter, stft_hop)
        return total + frame, {"kl": kl, "reg": reg, "frame": frame}

    def step(state: VocoderTrainState, batch, t_params):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub, t_params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = _ema_update(state.ema_params, params, ema_decay)
        return VocoderTrainState(params, opt_state, ema, state.step + 1,
                                 rng), (loss, aux)

    if mesh is None:
        jitted = jax.jit(step)
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jitted = jax.jit(step, in_shardings=(repl, data, repl),
                         out_shardings=(repl, repl))
    t_params_dev = jax.tree_util.tree_map(jnp.asarray, teacher_params)

    def wrapped(state, batch):
        return jitted(state, batch, t_params_dev)

    return wrapped


def make_flow_train_step(cfg, optimizer, mesh=None, compute_dtype=None):
    """``compute_dtype=jnp.bfloat16`` = mixed precision MLE: bf16 coupling
    WaveNets, f32 masters and f32 log-density accumulation (see
    flowavenet_forward)."""
    from vqvae_speech_tpu.models.flowavenet import flowavenet_forward

    def loss_fn(params, batch):
        log_p, logdet = flowavenet_forward(params, cfg, batch["x"],
                                           batch["c"],
                                           compute_dtype=compute_dtype)
        return -(log_p + logdet), {"log_p": log_p, "logdet": logdet}

    def step(state: VocoderTrainState, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return VocoderTrainState(params, opt_state, state.ema_params,
                                 state.step + 1, state.rng), (loss, aux)

    return _jit_vocoder_step(step, mesh)


class VocoderTrainer:
    """Epoch loop + best-loss checkpointing (reference train.py:281-284).

    When an ``eval_loader`` + ``eval_loss_fn`` are given, the 'best'
    checkpoint is gated on the TEST loss after each epoch — the
    reference's contract (clarinet train.py:273-283 evaluates the
    EMA-averaged model on the test loader; flow train.py:288-293 the raw
    model).  ``eval_on_ema`` selects which params the eval uses.
    Without an eval loader, gating falls back to the train epoch loss."""

    def __init__(self, step_fn, state: VocoderTrainState, loader,
                 checkpoint_dir: str, name: str, eval_loader=None,
                 eval_loss_fn=None, eval_on_ema: bool = True,
                 on_best=None):
        self._step_fn = step_fn
        self.state = state
        self._loader = loader
        self._eval_loader = eval_loader
        self._eval_loss_fn = eval_loss_fn
        self._eval_on_ema = eval_on_ema
        self._on_best = on_best
        self._dir = checkpoint_dir
        self._name = name
        self.best_loss = np.inf
        # per-epoch loss histories persisted like the reference's
        # {name}_train.npy / {name}.npy (train.py:284-296)
        self.train_losses = []
        self.eval_losses = []
        os.makedirs(checkpoint_dir, exist_ok=True)

    def evaluate(self):
        """Mean eval loss over the test loader (reference evaluate())."""
        if self._eval_loader is None or self._eval_loss_fn is None:
            return None
        params = (self.state.ema_params if self._eval_on_ema
                  else self.state.params)
        total, count = 0.0, 0
        for batch in self._eval_loader:
            total += float(self._eval_loss_fn(params, batch))
            count += 1
        return total / max(count, 1)

    def train_epoch(self, epoch: int):
        total, count = 0.0, 0
        for batch in self._loader:
            self.state, out = self._step_fn(self.state, batch)
            loss = out[0] if isinstance(out, tuple) else out
            total += float(loss)
            count += 1
        avg = total / max(count, 1)
        gate = self.evaluate()
        if gate is None:
            ConsoleLogger.status(
                f"{self._name} epoch {epoch}: loss {avg:.4f}")
            gate = avg
        else:
            ConsoleLogger.status(
                f"{self._name} epoch {epoch}: loss {avg:.4f} "
                f"test {gate:.4f}")
        self.train_losses.append(avg)
        self.eval_losses.append(gate)
        np.save(os.path.join(self._dir, f"{self._name}_train.npy"),
                np.asarray(self.train_losses))
        np.save(os.path.join(self._dir, f"{self._name}.npy"),
                np.asarray(self.eval_losses))
        # run the gate comparison BEFORE the per-epoch save so the epoch
        # checkpoint records this epoch's best_loss (a resume from it must
        # not let a later, worse epoch overwrite {name}_best.pkl)
        new_best = gate < self.best_loss
        if new_best:
            self.best_loss = gate
        self.save(epoch, avg)
        if new_best:
            self.save(epoch, gate, best=True)
            if self._on_best is not None:
                # reference: synthesize a sample whenever a new best is
                # saved (flow train.py:290-295)
                self._on_best(self.state, epoch)
        return avg

    def save(self, epoch, loss, best=False):
        payload = {
            "epoch": epoch,
            "loss": loss,
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "rng": jax.device_get(self.state.rng),
            "train_losses": list(self.train_losses),
            "eval_losses": list(self.eval_losses),
            "best_loss": float(min(self.best_loss, loss)
                               if best else self.best_loss),
        }
        suffix = "best" if best else str(epoch)
        path = os.path.join(self._dir, f"{self._name}_{suffix}.pkl")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        return path


def restore_vocoder_trainer(trainer, path):
    """Resume a VocoderTrainer from a checkpoint (the reference's
    --load_step path, clarinet train.py:261-266: restores model/optimizer/
    EMA, the loss histories, and the running best test loss).  Returns the
    next epoch to train."""
    ckpt = load_vocoder_checkpoint(path)
    as_jax = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    trainer.state = VocoderTrainState(
        as_jax(ckpt["params"]), as_jax(ckpt["opt_state"]),
        as_jax(ckpt["ema_params"]),
        jnp.asarray(ckpt["step"], jnp.int32),
        as_jax(ckpt["rng"]) if "rng" in ckpt else trainer.state.rng)
    trainer.train_losses = list(ckpt.get("train_losses", []))
    trainer.eval_losses = list(ckpt.get("eval_losses", []))
    trainer.best_loss = float(ckpt.get(
        "best_loss", min(trainer.eval_losses, default=np.inf)))
    return int(ckpt["epoch"]) + 1


def make_student_eval_loss(teacher_cfg, student_cfg, teacher_params,
                           kl_type: str = "qp", stft_filter: int = 1024,
                           stft_hop: int = 256):
    """Jitted distillation test-loss (reference train_student.py
    evaluate(): same KL+reg+frame objective on the test loader, with the
    EMA-averaged student).  z is drawn from a fixed key so the gate is
    deterministic across epochs."""
    from vqvae_speech_tpu.models.clarinet import (
        gaussian_wavenet_apply, gaussian_wavenet_upsample,
        wavenet_student_apply)
    from vqvae_speech_tpu.models.clarinet.loss import kl_loss, stft_frame_loss

    t_params = jax.tree_util.tree_map(jnp.asarray, teacher_params)

    @jax.jit
    def loss(params, batch):
        x, c = batch["x"], batch["c"]
        z = jax.random.normal(jax.random.PRNGKey(0), x.shape)
        c_up = gaussian_wavenet_upsample(t_params, c, teacher_cfg)
        x_s, mu_s, logs_s = wavenet_student_apply(params, student_cfg, z,
                                                  c_up)
        mu_logs_t = gaussian_wavenet_apply(t_params, teacher_cfg, x_s, c)
        mu_t, logs_t = mu_logs_t[:, :-1, 0:1], mu_logs_t[:, :-1, 1:2]
        if kl_type == "pq":
            total, _, _ = kl_loss(mu_t, logs_t, mu_s, logs_s)
        else:
            total, _, _ = kl_loss(mu_s, logs_s, mu_t, logs_t)
        frame = stft_frame_loss(x_s[:, 1:, 0], x[:, 1:, 0],
                                stft_filter, stft_hop)
        return total + frame

    return loss


def make_teacher_eval_loss(cfg):
    """Jitted test-loss for the teacher (reference train.py:117-136:
    Gaussian NLL of the EMA model on the test loader)."""
    from vqvae_speech_tpu.models.clarinet import gaussian_wavenet_apply
    from vqvae_speech_tpu.models.clarinet.loss import gaussian_loss

    @jax.jit
    def loss(params, batch):
        y_hat = gaussian_wavenet_apply(params, cfg, batch["x"], batch["c"])
        return jnp.mean(gaussian_loss(y_hat[:, :-1], batch["x"][:, 1:]))

    return loss


def make_flow_eval_loss(cfg):
    """Jitted test-loss for FloWaveNet (reference flow train.py:92-110)."""
    from vqvae_speech_tpu.models.flowavenet import flowavenet_forward

    @jax.jit
    def loss(params, batch):
        log_p, logdet = flowavenet_forward(params, cfg, batch["x"],
                                           batch["c"])
        return -(log_p + logdet)

    return loss


def load_vocoder_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)
