"""sopro_tpu: a TPU-native (JAX/XLA/Pallas) text-to-speech framework with the
capabilities of Sopro v1.5 (reference: src/sopro/__init__.py): streaming
zero-shot voice cloning TTS with an on-device autoregressive codec-token
generator, NAR refiner and Mimi neural codec."""

from sopro_tpu.config import RuntimeConfig, SoproTTSConfig
from sopro_tpu.tts import SoproTTS

__version__ = "1.5.0"

__all__ = ["SoproTTS", "SoproTTSConfig", "RuntimeConfig", "__version__"]
