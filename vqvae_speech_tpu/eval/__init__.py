from vqvae_speech_tpu.eval.evaluator import Evaluator
