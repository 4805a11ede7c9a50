"""Experiments driver: JSON experiment file -> seeded runs with auto-resume.

Contract-parity with reference src/experiments/experiments.py:42-160 and
src/experiments/experiment.py:36-122:

* the experiments JSON holds {experiments_path, results_path,
  configuration_path, seed | [seeds], experiments: {name: overrides}},
* a seed list fans out one run per (name, seed) named ``{name}-seed{seed}``,
* per-experiment config = YAML base deep-copied + overrides of existing keys,
  frozen to ``{name}_configuration.yaml``,
* if the frozen config already exists the run AUTO-RESUMES from the latest
  ``{name}_{epoch}_checkpoint.pkl`` (start_epoch bumped, optimizer state
  restored — reference pipeline_factory.py:80-126).

Determinism: the reference seeds torch/numpy/random globally
(experiments.py:118-124); the JAX-native equivalent is explicit
``jax.random.PRNGKey(seed)`` threading — init and training keys both derive
from the experiment seed.
"""
import json
import os

import jax

from vqvae_speech_tpu.train.config import (
    load_configuration,
    merge_experiment_configuration,
    freeze_configuration,
    frozen_configuration_path,
)
from vqvae_speech_tpu.train.checkpoint import (
    latest_checkpoint_epoch,
    load_checkpoint,
)
from vqvae_speech_tpu.train.trainer import ConvolutionalTrainer
from vqvae_speech_tpu.models import conv_vqvae_init
from vqvae_speech_tpu.parallel.mesh import MeshConfiguration
from vqvae_speech_tpu.utils.logger import ConsoleLogger


def _as_jax_tree(tree):
    import jax.numpy as jnp
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


class Experiment:
    def __init__(self, name, experiments_path, results_path,
                 global_configuration, experiment_configuration, seed,
                 data_root=None):
        self.name = name
        self.experiments_path = experiments_path
        self.results_path = results_path
        self.seed = seed
        self._experiment_configuration = experiment_configuration
        self._data_root = data_root

        os.makedirs(results_path, exist_ok=True)
        os.makedirs(experiments_path, exist_ok=True)

        frozen_path = frozen_configuration_path(experiments_path, name)
        self.resumed = os.path.isfile(frozen_path)
        if self.resumed:
            self.configuration = load_configuration(frozen_path)
        else:
            self.configuration = merge_experiment_configuration(
                global_configuration, experiment_configuration)
            freeze_configuration(self.configuration, experiments_path, name)

        self.mesh_configuration = MeshConfiguration.load_from_configuration(
            self.configuration)

    # ---------------- pipeline build/load ----------------

    def _build_loader(self):
        from vqvae_speech_tpu.data import FeatureStore, FeatureLoader, load_normalizer

        cfg = self.configuration
        root = self._data_root or os.path.join(
            cfg.get("data_root", "."), cfg.get("features_path", "features"))
        store = FeatureStore(root)
        normalizer = None
        if cfg.get("normalize"):
            normalizer = load_normalizer(cfg["normalizer_path"])
        return FeatureLoader(store, "train", cfg["batch_size"],
                             normalizer=normalizer, seed=self.seed)

    def build_trainer(self, training_loader=None):
        cfg = self.configuration
        decoder_type = cfg.get("decoder_type", "deconvolutional")
        if decoder_type == "wavenet":
            # extension beyond the reference (whose PipelineFactory raises
            # for any non-deconvolutional decoder, pipeline_factory.py:52-53)
            from vqvae_speech_tpu.train.wavenet_trainer import WaveNetTrainer

            if training_loader is None:
                training_loader = self._build_loader()
            return WaveNetTrainer(
                cfg, training_loader, self.experiments_path, self.name,
                num_speakers=cfg.get("num_speakers", 128), seed=self.seed)
        if decoder_type != "deconvolutional":
            raise NotImplementedError(
                f"decoder_type {cfg['decoder_type']!r} has no trainer pipeline")
        if training_loader is None:
            training_loader = self._build_loader()

        key = jax.random.PRNGKey(self.seed)
        params, model_state = conv_vqvae_init(key, cfg)
        start_epoch = 0
        opt_state = None

        epoch, ckpt_path = latest_checkpoint_epoch(self.experiments_path, self.name)
        if self.resumed and ckpt_path is not None:
            ConsoleLogger.status(
                f"Resuming '{self.name}' from checkpoint epoch {epoch}")
            ckpt = load_checkpoint(ckpt_path)
            params = _as_jax_tree(ckpt["params"])
            model_state = _as_jax_tree(ckpt["model_state"])
            opt_state = _as_jax_tree(ckpt["opt_state"])
            start_epoch = ckpt["epoch"]

        mesh = (self.mesh_configuration.mesh
                if self.mesh_configuration.use_data_parallel else None)
        return ConvolutionalTrainer(
            cfg, params, model_state, training_loader,
            self.experiments_path, self.name, seed=self.seed, mesh=mesh,
            start_epoch=start_epoch, opt_state=opt_state)

    def train(self, training_loader=None):
        ConsoleLogger.status(f"Running the experiment called '{self.name}'")
        trainer = self.build_trainer(training_loader)
        state = trainer.train()
        ConsoleLogger.success(f"Experiment '{self.name}' done")
        return state

    def evaluate(self, evaluation_options, data_root=None):
        from vqvae_speech_tpu.eval.evaluator import Evaluator

        ConsoleLogger.status(f"Evaluating the experiment called '{self.name}'")
        ev = Evaluator(self, data_root=data_root or self._data_root)
        return ev.evaluate(evaluation_options)


class Experiments:
    def __init__(self, experiments):
        self.experiments = experiments

    def train(self):
        for experiment in self.experiments:
            experiment.train()

    def evaluate(self, evaluation_options):
        results = {}
        for experiment in self.experiments:
            results[experiment.name] = experiment.evaluate(evaluation_options)
        # cross-experiment aggregations (reference experiments.py:69-116)
        if self.experiments:
            names = [e.name for e in self.experiments]
            result_path = self.experiments[0].results_path
            if evaluation_options.get("plot_clustering_metrics_evolution"):
                from vqvae_speech_tpu.eval.alignment_stats import (
                    compute_clustering_metrics_evolution)

                results["clustering_metrics_evolution"] = \
                    compute_clustering_metrics_evolution(names, result_path)
            if evaluation_options.get(
                    "check_clustering_metrics_stability_over_seeds"):
                from vqvae_speech_tpu.eval.alignment_stats import (
                    check_clustering_metrics_stability_over_seeds)

                results["clustering_metrics_stability"] = \
                    check_clustering_metrics_stability_over_seeds(
                        names, result_path)
        return results

    @staticmethod
    def load(experiments_path: str, data_root=None) -> "Experiments":
        with open(experiments_path, "r") as f:
            spec = json.load(f)
        configuration = load_configuration(spec["configuration_path"])
        seeds = spec["seed"] if isinstance(spec["seed"], list) else [spec["seed"]]
        fan_out = isinstance(spec["seed"], list)
        experiments = []
        for seed in seeds:
            for name, overrides in spec["experiments"].items():
                experiments.append(Experiment(
                    name=f"{name}-seed{seed}" if fan_out else name,
                    experiments_path=spec["experiments_path"],
                    results_path=spec["results_path"],
                    global_configuration=configuration,
                    experiment_configuration=overrides,
                    seed=seed,
                    data_root=data_root,
                ))
        return Experiments(experiments)
