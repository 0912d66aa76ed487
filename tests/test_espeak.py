"""Espeak phonemizer wrapper driven against a stub espeak-ng binary
(the real binary is absent in CI; the wrapper's CLI contract is what's
under test — reference util.py:154-172 + text/__init__.py:11-16)."""

import os
import stat

import pytest

from unitspeech_tpu import text as text_frontend


@pytest.fixture
def stub_espeak(tmp_path, monkeypatch):
    stub = tmp_path / "espeak-ng"
    # echoes fixed IPA (with a tie character that must be stripped) and
    # records its args
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        f"open({str(repr(str(tmp_path / 'args.txt')))}, 'w').write(' '.join(sys.argv[1:]))\n"
        "print('h\\u0259lo\\u028a t\\u0361\\u0283')\n"
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    return tmp_path


def test_espeak_wrapper_with_stub(stub_espeak):
    ph = text_frontend.get_phonemizer("en-us")
    assert ph is not None
    out = text_frontend.phonemize("Hello CH", ph)
    # tie character U+0361 stripped; whitespace collapsed
    assert "͡" not in out
    assert out == "həloʊ tʃ"
    args = (stub_espeak / "args.txt").read_text()
    assert "--ipa" in args and "-v en-us" in args
    # lowercasing happens before espeak (reference text/__init__.py:12)
    assert "hello ch" in args

    ids = text_frontend.text_to_sequence("Hello CH", ph)
    from unitspeech_tpu.text.symbols import BLANK_ID

    assert ids[0] == BLANK_ID and ids[-1] == BLANK_ID
    assert len(ids) == 2 * len("həloʊ tʃ") + 1


def test_espeak_unsupported_language(stub_espeak):
    with pytest.raises(ValueError):
        text_frontend.EspeakPhonemizer("de")
