"""Vocoder CLI: LJSpeech preprocessing, teacher/student/flow training and
synthesis.

Replaces the reference's five standalone CLIs (src/clarinet/train.py,
train_student.py, synthesize.py, synthesize_student.py and the
src/flow_wavenet twins) with one subcommand driver.
"""
import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def build_parser():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("preprocess", help="LJSpeech -> audio/mel npy store")
    pp.add_argument("--in_dir", required=True)
    pp.add_argument("--out_dir", required=True)
    pp.add_argument("--limit", type=int, default=None)

    for name in ("train-teacher", "train-student", "train-flow"):
        tp = sub.add_parser(name)
        tp.add_argument("--data_root", required=True)
        tp.add_argument("--checkpoint_dir", default="vocoder_checkpoints")
        tp.add_argument("--model_name", default=name.replace("train-", ""))
        tp.add_argument("--batch_size", type=int, default=8)
        tp.add_argument("--epochs", type=int, default=1000)
        tp.add_argument("--learning_rate", type=float, default=1e-3)
        tp.add_argument("--seed", type=int, default=0)
        tp.add_argument("--resume", default=None,
                        help="checkpoint .pkl to resume from (restores "
                             "state, loss histories, best loss)")
        tp.add_argument("--bf16", action="store_true",
                        help="mixed precision: bf16 forward/backward, "
                             "f32 masters and losses")
        tp.add_argument("--data_parallel", action="store_true",
                        help="shard the batch over all devices "
                             "(jax.sharding data axis)")
        tp.add_argument("--tiny", action="store_true",
                        help="tiny model preset (tests/smoke)")
        if name == "train-student":
            tp.add_argument("--teacher_checkpoint", required=True)
            tp.add_argument("--KL_type", default="qp", choices=["qp", "pq"])

    for name in ("synthesize-teacher", "synthesize-student",
                 "synthesize-flow"):
        sp = sub.add_parser(name)
        sp.add_argument("--checkpoint", required=True)
        sp.add_argument("--mel_path", required=True)
        sp.add_argument("--out_wav", required=True)
        sp.add_argument("--temp", type=float, default=0.8)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--tiny", action="store_true",
                        help="tiny model preset (tests/smoke)")
        if name == "synthesize-student":
            sp.add_argument("--teacher_checkpoint", required=True)
    return p


def _write_wav(path, audio, sr=22050):
    from scipy.io import wavfile

    wavfile.write(path, sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16))


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    if args.command == "preprocess":
        from vqvae_speech_tpu.data.ljspeech import preprocess

        preprocess(args.in_dir, args.out_dir, args.limit)
        return 0

    from vqvae_speech_tpu.data.ljspeech import LJSpeechDataset, LJSpeechLoader
    from vqvae_speech_tpu.train.vocoder import (
        make_vocoder_optimizer, create_vocoder_state, VocoderTrainer,
        make_teacher_train_step, make_student_train_step,
        make_flow_train_step, load_vocoder_checkpoint,
        make_teacher_eval_loss, make_flow_eval_loss,
        make_student_eval_loss, restore_vocoder_trainer)
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init,
        gaussian_wavenet_generate, gaussian_wavenet_upsample,
        StudentConfig, wavenet_student_init)
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init, flowavenet_reverse)

    key = jax.random.PRNGKey(getattr(args, "seed", 0))

    def teacher_cfg_for(args):
        if getattr(args, "tiny", False):
            return GaussianWaveNetConfig(
                num_blocks=1, num_layers=2, front_channels=4,
                residual_channels=8, gate_channels=8, skip_channels=8,
                kernel_size=2, cin_channels=80, upsample_scales=(16, 16))
        return GaussianWaveNetConfig()

    def student_cfg_for(args):
        if getattr(args, "tiny", False):
            return StudentConfig(num_blocks_student=(1, 1), num_layers=2,
                                 front_channels=4, residual_channels=8,
                                 gate_channels=8, skip_channels=8,
                                 kernel_size=3, cin_channels=80)
        return StudentConfig()

    def flow_cfg_for(args):
        if getattr(args, "tiny", False):
            return FlowavenetConfig(in_channel=1, cin_channel=80, n_block=2,
                                    n_flow=1, n_layer=1, filter_size=8,
                                    block_per_split=8,
                                    upsample_scales=(16, 16))
        return FlowavenetConfig()

    if args.command.startswith("train-"):
        ds = LJSpeechDataset(args.data_root, train=True)
        loader = LJSpeechLoader(ds, args.batch_size, seed=args.seed)
        # reference gates 'best' on the TEST loss (clarinet train.py:273-283)
        test_ds = LJSpeechDataset(args.data_root, train=False)
        eval_loader = (LJSpeechLoader(test_ds, args.batch_size,
                                      seed=args.seed)
                       if len(test_ds) >= args.batch_size else None)
        compute_dtype = jnp.bfloat16 if args.bf16 else None
        mesh = None
        if args.data_parallel:
            from vqvae_speech_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()

    if args.command == "train-teacher":
        cfg = teacher_cfg_for(args)
        params = gaussian_wavenet_init(key, cfg)
        opt = make_vocoder_optimizer(args.learning_rate, clip_norm=10.0)
        state = create_vocoder_state(key, params, opt)
        step = make_teacher_train_step(cfg, opt, mesh=mesh,
                                       compute_dtype=compute_dtype)
        trainer = VocoderTrainer(step, state, loader, args.checkpoint_dir,
                                 args.model_name, eval_loader=eval_loader,
                                 eval_loss_fn=make_teacher_eval_loss(cfg),
                                 eval_on_ema=True)
        start = (restore_vocoder_trainer(trainer, args.resume)
                 if args.resume else 0)
        for epoch in range(start, args.epochs):
            trainer.train_epoch(epoch)
        return 0

    if args.command == "train-student":
        t_ckpt = load_vocoder_checkpoint(args.teacher_checkpoint)
        teacher_cfg = teacher_cfg_for(args)
        t_params = jax.tree_util.tree_map(jnp.asarray,
                                          t_ckpt["ema_params"])
        student_cfg = student_cfg_for(args)
        params = wavenet_student_init(key, student_cfg)
        opt = make_vocoder_optimizer(args.learning_rate, clip_norm=10.0)
        state = create_vocoder_state(key, params, opt)
        trainer = VocoderTrainer(
            make_student_train_step(teacher_cfg, student_cfg, t_params, opt,
                                    kl_type=args.KL_type, mesh=mesh,
                                    compute_dtype=compute_dtype),
            state, loader, args.checkpoint_dir, args.model_name,
            eval_loader=eval_loader,
            eval_loss_fn=make_student_eval_loss(
                teacher_cfg, student_cfg, t_params, kl_type=args.KL_type),
            eval_on_ema=True)
        start = (restore_vocoder_trainer(trainer, args.resume)
                 if args.resume else 0)
        for epoch in range(start, args.epochs):
            trainer.train_epoch(epoch)
        return 0

    if args.command == "train-flow":
        from vqvae_speech_tpu.models.flowavenet import actnorm_initialize

        cfg = flow_cfg_for(args)
        params = flowavenet_init(key, cfg)
        first = next(iter(loader))
        params = actnorm_initialize(params, cfg,
                                    jnp.asarray(first["x"]),
                                    jnp.asarray(first["c"]))
        opt = make_vocoder_optimizer(args.learning_rate, clip_norm=1.0,
                                     halve_every=200_000)
        state = create_vocoder_state(key, params, opt)
        def synth_on_best(state, epoch):
            # reference flow train.py:290-295: write a sample whenever a
            # new best checkpoint is saved
            if eval_loader is None:
                return
            batch = next(iter(eval_loader))
            mel = jnp.asarray(batch["c"][:1])
            T = mel.shape[1] * 256
            z = 0.8 * jax.random.normal(jax.random.PRNGKey(epoch), (1, T, 1))
            wave = flowavenet_reverse(state.params, cfg, z, mel)
            _write_wav(os.path.join(
                args.checkpoint_dir,
                f"generate_{args.model_name}_{epoch}.wav"),
                np.asarray(wave)[0, :, 0])

        trainer = VocoderTrainer(
            make_flow_train_step(cfg, opt, mesh=mesh,
                                 compute_dtype=compute_dtype),
            state, loader, args.checkpoint_dir, args.model_name,
            eval_loader=eval_loader, eval_loss_fn=make_flow_eval_loss(cfg),
            eval_on_ema=False, on_best=synth_on_best)
        start = (restore_vocoder_trainer(trainer, args.resume)
                 if args.resume else 0)
        for epoch in range(start, args.epochs):
            trainer.train_epoch(epoch)
        return 0

    # ---------------- synthesis ----------------
    mel = np.load(args.mel_path)[None]  # (1, T, 80)

    if args.command == "synthesize-teacher":
        ckpt = load_vocoder_checkpoint(args.checkpoint)
        cfg = teacher_cfg_for(args)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["ema_params"])
        T = mel.shape[1] * 256
        audio = gaussian_wavenet_generate(params, cfg, key, T,
                                          jnp.asarray(mel))
        _write_wav(args.out_wav, np.asarray(audio)[0])
        return 0

    if args.command == "synthesize-student":
        from vqvae_speech_tpu.models.clarinet.wavenet_iaf import (
            wavenet_student_generate)

        t_ckpt = load_vocoder_checkpoint(args.teacher_checkpoint)
        teacher_cfg = teacher_cfg_for(args)
        t_params = jax.tree_util.tree_map(jnp.asarray, t_ckpt["ema_params"])
        ckpt = load_vocoder_checkpoint(args.checkpoint)
        student_cfg = student_cfg_for(args)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["ema_params"])
        c_up = gaussian_wavenet_upsample(t_params, jnp.asarray(mel),
                                         teacher_cfg)
        z = args.temp * jax.random.normal(key, (1, c_up.shape[1], 1))
        audio = wavenet_student_generate(params, student_cfg, z, c_up)
        _write_wav(args.out_wav, np.asarray(audio)[0, :, 0])
        return 0

    if args.command == "synthesize-flow":
        ckpt = load_vocoder_checkpoint(args.checkpoint)
        cfg = flow_cfg_for(args)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        T = mel.shape[1] * 256
        z = args.temp * jax.random.normal(key, (1, T, 1))
        audio = flowavenet_reverse(params, cfg, z, jnp.asarray(mel))
        _write_wav(args.out_wav, np.asarray(audio)[0, :, 0])
        return 0


if __name__ == "__main__":
    sys.exit(main())
