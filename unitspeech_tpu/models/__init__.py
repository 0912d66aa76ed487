from unitspeech_tpu.models.encoder import Encoder  # noqa: F401
from unitspeech_tpu.models.duration import DurationPredictor  # noqa: F401
