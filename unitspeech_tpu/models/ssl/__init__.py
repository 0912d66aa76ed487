from unitspeech_tpu.models.ssl.hubert import HubertModel, mhubert_base_config  # noqa: F401
from unitspeech_tpu.models.ssl.wavlm import WavLMModel, wavlm_large_config  # noqa: F401
from unitspeech_tpu.models.ssl.kmeans import KMeansQuantizer  # noqa: F401
from unitspeech_tpu.models.ssl.cpc import CpcFeatureReader, CpcModel  # noqa: F401
