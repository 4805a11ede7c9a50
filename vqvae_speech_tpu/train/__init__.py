from vqvae_speech_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    find_checkpoints,
    latest_checkpoint_epoch,
    merge_checkpoint_losses,
)
from vqvae_speech_tpu.train.trainer import ConvolutionalTrainer, TrainState
from vqvae_speech_tpu.train.experiment import Experiment, Experiments
from vqvae_speech_tpu.train.config import (
    load_configuration,
    update_configuration_from_experiments,
    merge_experiment_configuration,
)
