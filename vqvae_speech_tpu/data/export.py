"""Feature export: VCTK corpus -> columnar FeatureStore.

Replaces the reference's export_to_features
(reference src/dataset/vctk_speech_stream.py:91-240 — per-utterance
python_speech_features on DataLoader workers, one pickle per utterance, a
10-attempt retry loop around loader crashes) with:

* host-parallel ingest (thread pool for wav read/trim/mu-law),
* ONE batched XLA feature computation per chunk (MFCC+deltas on device),
* a per-split columnar store + metadata sidecar,
* per-utterance fault tolerance (a failed file is logged and skipped, the
  export completes — same resilience contract, no retry loop needed since
  there is no crashing worker process),
* resume: an existing split file is kept unless ``overwrite=True``.
"""
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax.numpy as jnp

from vqvae_speech_tpu.data.feature_store import FeatureStore
from vqvae_speech_tpu.data.vctk import preprocess_utterance
from vqvae_speech_tpu.ops import speech_features, num_frames
from vqvae_speech_tpu.utils.logger import ConsoleLogger


def export_split_to_features(files, speaker_dic, store: FeatureStore,
                             split: str, configuration: dict,
                             overwrite: bool = False, chunk_size: int = 256,
                             num_workers: int = 8, seed: int = 0):
    cfg = configuration
    if store.exists(split) and not overwrite:
        ConsoleLogger.status(
            f"Features for split '{split}' already exported; skipping")
        return store

    rate = cfg["sampling_rate"]
    length = cfg["length"]
    in_name, out_name = cfg["input_features_type"], cfg["output_features_type"]
    in_filters = cfg["input_features_filters"]
    out_filters = cfg["output_features_filters"]
    frames = num_frames(length, round(0.025 * rate), round(0.01 * rate))
    in_dim = in_filters * 3  # input features are always delta-augmented
    target_shape = (cfg["input_features_dim"], in_dim)

    def load_one(job):
        index, path = job
        try:
            # per-file rng keyed by (seed, index): the random crop is
            # deterministic regardless of thread scheduling (the reference's
            # DataLoader workers draw from unseeded per-process state,
            # vctk_dataset.py:64)
            rng = np.random.default_rng((seed, index))
            return preprocess_utterance(
                path, speaker_dic, rate, cfg["top_db"], length,
                cfg["quantize"], rng)
        except Exception as e:  # per-file fault tolerance
            ConsoleLogger.warn(f"skipping '{path}': {e}")
            return None

    all_inputs, all_outputs, all_speakers, all_audio = [], [], [], []
    meta = {"wav_filenames": [], "shifting_times": [],
            "random_starting_indices": [], "top_db": cfg["top_db"],
            "sampling_rate": rate, "length": length}

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, len(files), chunk_size):
            chunk_files = list(enumerate(files[start:start + chunk_size],
                                         start=start))
            items = [it for it in pool.map(load_one, chunk_files)
                     if it is not None]
            if not items:
                continue
            # the reference featurizes the full preprocessed_audio (length+1
            # samples, vctk_speech_stream.py:145-150) -> 47 frames @ 7680
            waves = np.stack([it["preprocessed_audio"] for it in items])
            inp = np.asarray(speech_features(
                in_name, jnp.asarray(waves), rate, in_filters, True),
                np.float32)
            outp = np.asarray(speech_features(
                out_name, jnp.asarray(waves), rate, out_filters,
                cfg["augment_output_features"]), np.float32)
            keep = [i for i in range(len(items))
                    if inp[i].shape == target_shape]
            for i in range(len(items)):
                if i not in keep:
                    ConsoleLogger.warn(
                        f"features with invalid dimension {inp[i].shape} "
                        f"will not be saved (target {target_shape})")
            all_inputs.append(inp[keep])
            all_outputs.append(outp[keep])
            all_audio.append(waves[keep])
            all_speakers.extend(int(items[i]["speaker_id"]) for i in keep)
            for i in keep:
                meta["wav_filenames"].append(items[i]["wav_filename"])
                meta["shifting_times"].append(float(items[i]["shifting_time"]))
                meta["random_starting_indices"].append(
                    int(items[i]["random_starting_index"]))
            ConsoleLogger.status(
                f"[{split}] exported {start + len(chunk_files)}/{len(files)}")

    store.write(split,
                np.concatenate(all_inputs) if all_inputs else
                np.zeros((0, frames, in_dim), np.float32),
                np.concatenate(all_outputs) if all_outputs else
                np.zeros((0, frames, out_filters * 3), np.float32),
                np.asarray(all_speakers, np.int32), metadata=meta,
                preprocessed_audio=(
                    np.concatenate(all_audio).astype(np.float32) if all_audio
                    else np.zeros((0, length + 1), np.float32)))
    return store


def export_to_features(vctk, features_root: str, configuration: dict,
                       overwrite: bool = False, num_workers: int = 8):
    """Both splits -> FeatureStore (reference vctk_speech_stream.py:91-240)."""
    store = FeatureStore(features_root)
    export_split_to_features(vctk.audios_train, vctk.speaker_dic, store,
                             "train", configuration, overwrite,
                             num_workers=num_workers)
    export_split_to_features(vctk.audios_val, vctk.speaker_dic, store,
                             "val", configuration, overwrite,
                             num_workers=num_workers)
    ConsoleLogger.success(f"VCTK exported to feature store at: '{features_root}'")
    return store
