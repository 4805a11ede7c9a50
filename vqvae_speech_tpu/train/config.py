"""Three-tier configuration: YAML base + JSON experiment overrides + CLI.

Contract-parity with the reference:
* `load_configuration` — YAML base config (reference src/main.py:42-46).
* `update_configuration_from_experiments` — top-level JSON keys override
  matching YAML keys (reference src/main.py:48-57).
* `merge_experiment_configuration` — per-experiment override of keys already
  present in the base config; the merged dict is frozen to
  ``{name}_configuration.yaml`` (reference src/experiments/experiment.py:67-75).
"""
import copy
import json
import os

import yaml


def load_configuration(configuration_path: str) -> dict:
    with open(configuration_path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def update_configuration_from_experiments(experiments_configuration_path: str,
                                          configuration: dict) -> dict:
    with open(experiments_configuration_path, "r") as f:
        experiment_configuration = json.load(f)
    for entry in experiment_configuration:
        if entry == "experiments":
            continue
        if entry in configuration:
            configuration[entry] = experiment_configuration[entry]
    return configuration


def merge_experiment_configuration(global_configuration: dict,
                                   experiment_configuration: dict) -> dict:
    """Deep-copy the base, then apply experiment keys that exist in the base."""
    merged = copy.deepcopy(global_configuration)
    for key, value in experiment_configuration.items():
        if key in merged:
            merged[key] = value
    return merged


def freeze_configuration(configuration: dict, experiments_path: str,
                         name: str) -> str:
    os.makedirs(experiments_path, exist_ok=True)
    path = os.path.join(experiments_path, f"{name}_configuration.yaml")
    with open(path, "w") as f:
        yaml.dump(configuration, f)
    return path


def frozen_configuration_path(experiments_path: str, name: str) -> str:
    return os.path.join(experiments_path, f"{name}_configuration.yaml")
