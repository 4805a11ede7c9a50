"""CLI: train / export features / dataset stats / evaluate / plots.

Flag-parity with reference src/main.py:68-146.  Default mode (no action flag)
trains every experiment in the experiments JSON.
"""
import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from vqvae_speech_tpu.utils.logger import ConsoleLogger


def build_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--summary", nargs="?", default=None, type=str,
                   help="Print a parameter summary of the model from a configuration file")
    p.add_argument("--export_to_features", action="store_true",
                   help="Export the VCTK dataset files to features")
    p.add_argument("--compute_dataset_stats", action="store_true",
                   help="Compute the mean and the std of the VCTK dataset")
    p.add_argument("--experiments_configuration_path", nargs="?",
                   default=os.path.join("configurations",
                                        "experiments_vq44-mfcc39.json"),
                   type=str, help="Path of the experiments configuration file")
    p.add_argument("--experiments_path", nargs="?", default="experiments",
                   type=str, help="Path of the experiments output directory")
    p.add_argument("--dataset_path", nargs="?",
                   default=os.path.join("data", "vctk"), type=str,
                   help="Path of the VCTK dataset root")
    p.add_argument("--plot_experiments_losses", action="store_true",
                   help="Plot the losses of the experiments")
    p.add_argument("--evaluate", action="store_true", help="Evaluate the model")
    p.add_argument("--plot_comparaison_plot", action="store_true")
    p.add_argument("--plot_quantized_embedding_spaces", action="store_true")
    p.add_argument("--compute_quantized_embedding_spaces_animation",
                   action="store_true")
    p.add_argument("--plot_distances_histogram", action="store_true")
    p.add_argument("--compute_many_to_one_mapping", action="store_true")
    p.add_argument("--compute_alignments", action="store_true")
    p.add_argument("--alignment_subset", action="store", type=str,
                   default="val")
    p.add_argument("--compute_clustering_metrics", action="store_true")
    p.add_argument("--per_frame_alignments", action="store_true",
                   help="also compute the corrected per-frame empirical "
                        "alignments and clustering metrics (X extension; "
                        "the default keeps the reference's scrambled "
                        "(C,T,B)-flatten pairing for parity)")
    p.add_argument("--compute_groundtruth_average_phonemes_number",
                   action="store_true")
    p.add_argument("--plot_clustering_metrics_evolution", action="store_true")
    p.add_argument("--check_clustering_metrics_stability_over_seeds",
                   action="store_true")
    p.add_argument("--plot_gradient_stats", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from vqvae_speech_tpu.train import (
        Experiments, load_configuration, update_configuration_from_experiments)

    evaluation_options = {
        k: getattr(args, k) for k in (
            "plot_comparaison_plot", "plot_quantized_embedding_spaces",
            "compute_quantized_embedding_spaces_animation",
            "plot_distances_histogram", "compute_many_to_one_mapping",
            "compute_alignments", "alignment_subset",
            "compute_clustering_metrics", "per_frame_alignments",
            "compute_groundtruth_average_phonemes_number",
            "plot_clustering_metrics_evolution",
            "check_clustering_metrics_stability_over_seeds",
            "plot_gradient_stats")}

    if args.summary:
        import jax
        from vqvae_speech_tpu.models import conv_vqvae_init

        configuration = load_configuration(args.summary)
        params, state = conv_vqvae_init(jax.random.PRNGKey(0), configuration)
        leaves = jax.tree_util.tree_leaves(params)
        total = sum(l.size for l in leaves)
        ConsoleLogger.status(
            f"ConvolutionalVQVAE: {len(leaves)} tensors, {total:,} parameters")
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            print(f"  {jax.tree_util.keystr(path)}: {tuple(leaf.shape)}")
        return 0

    if args.plot_experiments_losses:
        from vqvae_speech_tpu.eval.losses_plotter import plot_training_losses

        exps = Experiments.load(args.experiments_configuration_path)
        plot_training_losses(exps.experiments, args.experiments_path)
        return 0

    if args.export_to_features:
        from vqvae_speech_tpu.data.vctk import VCTK
        from vqvae_speech_tpu.data.export import export_to_features

        base = os.path.join("configurations", "vctk_features.yaml")
        configuration = load_configuration(base)
        configuration = update_configuration_from_experiments(
            args.experiments_configuration_path, configuration)
        vctk = VCTK(args.dataset_path, ratio=configuration["train_val_split"])
        features_root = os.path.join(args.dataset_path,
                                     configuration["features_path"])
        export_to_features(vctk, features_root, configuration)
        return 0

    if args.compute_dataset_stats:
        from vqvae_speech_tpu.data import FeatureStore, compute_dataset_stats

        base = os.path.join("configurations", "vctk_features.yaml")
        configuration = load_configuration(base)
        configuration = update_configuration_from_experiments(
            args.experiments_configuration_path, configuration)
        features_root = os.path.join(args.dataset_path,
                                     configuration["features_path"])
        compute_dataset_stats(FeatureStore(features_root),
                              configuration["normalizer_path"])
        ConsoleLogger.success("Dataset stats computed")
        return 0

    if args.evaluate:
        Experiments.load(args.experiments_configuration_path).evaluate(
            evaluation_options)
        ConsoleLogger.success("All evaluating experiments done")
        return 0

    Experiments.load(args.experiments_configuration_path).train()
    ConsoleLogger.success("All training experiments done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
