"""unitspeech_tpu — a TPU-native (JAX/XLA/Pallas) speaker-adaptive diffusion
TTS / voice-conversion framework with the capabilities of UnitSpeech.

Capability parity target: the reference implementation at
adrianstanea/UnitSpeech (Grad-TTS-style diffusion decoder, text/unit/contentvec
encoders, duration predictor, BigVGAN vocoder, speaker-adaptive fine-tuning,
STEP1/STEP2 training, unit-based voice conversion, evaluation harness).

Design stance (TPU-first, not a port):
  * pure-function flax.linen modules, explicit PRNG threading
  * jit-compiled `lax.scan` reverse-diffusion sampler with dual
    classifier-free guidance folded into one 3x-batched estimator call
  * `jax.sharding.Mesh` + NamedSharding for data/sequence parallelism
  * bucketed static shapes everywhere (XLA-friendly)
  * Pallas kernels for the hot fused ops
  * optax optimizers, orbax checkpoints, one dataclass config system
"""

__version__ = "0.1.0"

from unitspeech_tpu import config as config  # noqa: F401
