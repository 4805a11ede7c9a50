from vqvae_speech_tpu.data.feature_store import (
    FeatureStore,
    FeatureLoader,
    compute_dataset_stats,
    load_normalizer,
)
