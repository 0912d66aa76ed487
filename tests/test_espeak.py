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


@pytest.fixture
def echo_espeak(tmp_path, monkeypatch):
    """Stub that echoes the input text back as its 'IPA' (letters are valid
    symbols), so punctuation re-attachment is directly observable."""
    stub = tmp_path / "espeak-ng"
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "print(sys.argv[-1])\n"
    )
    import stat as _stat

    stub.chmod(stub.stat().st_mode | _stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    return tmp_path


def test_punctuation_preserved(echo_espeak):
    """preserve_punctuation=True parity (reference util.py:154-172): marks are
    split out, chunks phonemized separately, marks re-attached in place."""
    ph = text_frontend.get_phonemizer("en-us")
    out = text_frontend.phonemize("Hello, world. Bye!", ph)
    assert out == "hello, world. bye!"

    # punctuation maps to real symbol IDs (text/symbols.py punctuation block)
    ids = text_frontend.cleaned_text_to_sequence(out)
    from unitspeech_tpu.text.symbols import symbols

    assert symbols.index(",") in ids and symbols.index("!") in ids
    # every char survived the ID round trip (no skipped symbols)
    assert len(ids) == len(out)


def test_punctuation_edge_cases(echo_espeak):
    ph = text_frontend.get_phonemizer("en-us")
    # leading + trailing + consecutive marks, quotes
    assert text_frontend.phonemize('«Wait...» really?', ph) == "«wait...» really?"
    # all-punctuation input
    assert text_frontend.phonemize("...", ph) == "..."


@pytest.fixture
def flagged_espeak(tmp_path, monkeypatch):
    """Stub emitting a language-switch flag, as espeak does on mixed-language
    text; language_switch="remove-flags" must strip it (util.py:160)."""
    stub = tmp_path / "espeak-ng"
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "print('h\\u0259lo\\u028a (en)w\\u025c\\u02d0ld')\n"
    )
    import stat as _stat

    stub.chmod(stub.stat().st_mode | _stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    return tmp_path


def test_language_switch_flags_removed(flagged_espeak):
    ph = text_frontend.get_phonemizer("en-us")
    out = text_frontend.phonemize("hello world", ph)
    assert "(" not in out and ")" not in out
    assert out == "həloʊ wɜːld"
