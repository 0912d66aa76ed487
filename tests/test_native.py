"""Native C++ kernels vs their Python/JAX counterparts."""

import numpy as np
import pytest

from unitspeech_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ build unavailable"
)


def test_native_mas_matches_device_mas():
    import jax.numpy as jnp

    from unitspeech_tpu.ops.mas import maximum_path

    rng = np.random.default_rng(0)
    b, t_x, t_y = 3, 7, 18
    lp = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    mask = np.zeros((b, t_x, t_y), np.float32)
    for i, (tx, ty) in enumerate([(7, 18), (5, 12), (2, 4)]):
        mask[i, :tx, :ty] = 1.0
    got = native.maximum_path_cpu(lp, mask)
    want = np.asarray(maximum_path(jnp.asarray(lp), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_native_sv56_matches_python():
    from unitspeech_tpu.ops.sv56 import active_speech_level

    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)
    wav[sr // 2 :] = 0.0  # half silence -> activity < 1
    lvl_c, act_c = native.active_speech_level_cpu(wav, sr)
    lvl_py, act_py = active_speech_level(wav, sr)
    assert abs(lvl_c - lvl_py) < 0.05, (lvl_c, lvl_py)
    assert abs(act_c - act_py) < 0.02, (act_c, act_py)


def test_native_sv56_silence():
    lvl, act = native.active_speech_level_cpu(np.zeros(1000, np.float32), 16000)
    assert lvl == -100.0 and act == 0.0
