from vqvae_speech_tpu.utils.logger import ConsoleLogger, create_file_logger
