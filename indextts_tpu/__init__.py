"""IndexTTS-TPU: a TPU-native (JAX/XLA/Pallas) zero-shot TTS framework.

Ground-up rebuild of the capabilities of IndexTTS-LoRA (reference repo
CreateIntelligens/index-tts-lora) designed for TPU hardware: one jitted
functional core, params as pytrees, `Mesh` + `NamedSharding` for scale,
Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from indextts_tpu.config import Config  # noqa: F401
