from unitspeech_tpu.ops.masking import (  # noqa: F401
    fix_len_compatibility,
    generate_path,
    intersperse,
    sequence_mask,
)
from unitspeech_tpu.ops.schedule import (  # noqa: F401
    NoiseSchedule,
    ReverseSchedule,
    forward_diffusion_coefficients,
    get_noise,
    make_reverse_schedule,
)
