"""Tests for the pure-Python rule-G2P fallback (text/g2p.py).

The fallback replaces the espeak-ng binary (which the reference shells
into, /root/reference/unitspeech/util.py:154-172) on air-gapped hosts; it
must emit only symbols the model vocabulary knows and honor the same
.phonemize contract as the espeak wrapper.
"""

import pytest

from unitspeech_tpu.text import (
    get_phonemizer,
    phonemize_chunks,
    text_to_sequence,
)
from unitspeech_tpu.text.g2p import (
    RuleG2P,
    _ARPA_TO_IPA,
    _LEXICON,
    expand_numbers,
    word_to_arpabet,
    word_to_ipa,
)
from unitspeech_tpu.text.symbols import BLANK_ID, symbols

_SYMBOL_SET = frozenset(symbols)


def test_output_alphabet_is_symbol_subset():
    """Every IPA character the module can ever emit has a symbol ID —
    otherwise text_to_sequence would KeyError at runtime."""
    for phone, ipa in _ARPA_TO_IPA.items():
        for ch in ipa:
            assert ch in _SYMBOL_SET, (phone, ch)
    for word, ipa in _LEXICON.items():
        for ch in ipa:
            assert ch in _SYMBOL_SET, (word, ch)
    assert "ˈ" in _SYMBOL_SET and "ˌ" in _SYMBOL_SET


@pytest.mark.parametrize(
    "word,ipa",
    [
        # lexicon hits
        ("women", "wˈɪmᵻn"),
        ("sure", "ʃˈʊɹ"),
        # rule-derived words locking the matcher semantics:
        ("people", "pˈiːpəl"),   # '#^:' left context needs backtracking
        ("table", "tˈeɪbəl"),    # 'ABLE' after consonant cluster
        ("little", "lˈɪtəl"),    # doubled-consonant collapse
        ("judge", "dʒˈʌdʒ"),     # DG -> affricate
        ("station", "stˈeɪʃən"),  # TI+O -> SH
        ("speech", "spˈiːtʃ"),
        ("walked", "wˈɔːkt"),    # '#^:E'D -> T devoicing
        ("wanted", "wˈæntɪd"),   # '#:'TED -> T IH D
        ("lazy", "lˈeɪzi"),      # final -y is short i, like espeak
        ("around", "əɹˈaʊnd"),   # stress skips the initial schwa
        ("light", "lˈaɪt"),      # IGH -> AY
        ("quick", "kwˈɪk"),
        ("king", "kˈɪŋ"),
        ("chair", "tʃˈɛɹ"),
    ],
)
def test_word_pronunciations(word, ipa):
    assert word_to_ipa(word) == ipa


def test_every_letter_produces_output():
    """The per-letter default rules guarantee the scanner always advances
    and any letters-only word yields phones."""
    import string

    for ch in string.ascii_lowercase:
        word_to_arpabet(ch)  # must not raise or loop
    assert word_to_arpabet("zzyzx")  # pathological but terminates


def test_stress_rules():
    assert "ˈ" not in word_to_ipa("the")  # function word: unstressed
    assert "ˈ" in word_to_ipa("table")
    assert word_to_ipa("table", stress=False) == "teɪbəl"
    # lexicon entries also honor stress=False
    assert "ˈ" not in word_to_ipa("women", stress=False)


def test_expand_numbers():
    assert expand_numbers("42") == "forty two"
    assert expand_numbers("1,234") == "one thousand two hundred thirty four"
    assert expand_numbers("3rd") == "third"
    assert expand_numbers("21st") == "twenty first"
    assert expand_numbers("2.5") == "two point five"
    assert expand_numbers("-7") == "minus seven"
    assert (
        expand_numbers("1900")
        == "one thousand nine hundred"
    )
    # embedded in text, punctuation untouched
    assert expand_numbers("buy 2, get 1!") == "buy two, get one!"


def test_phonemize_contract_matches_espeak_wrapper():
    """Same list-in/list-out + punctuation-preserved-in-place contract as
    EspeakPhonemizer (both route through phonemize_chunks)."""
    g2p = RuleG2P("en-us")
    out = g2p.phonemize(["Hello, world!", "One."])
    assert len(out) == 2
    assert "," in out[0] and out[0].endswith("!")
    assert out[1].endswith(".")
    # strip=True trims outer whitespace
    assert out[0] == out[0].strip()
    # the IPA between marks contains only known symbols
    for ph in out:
        for ch in ph:
            assert ch in _SYMBOL_SET, ch


def test_text_to_sequence_integration():
    """Raw text -> IDs through the standard frontend path with the G2P as
    the phonemizer (the exact call the CLI makes with fallback=True)."""
    g2p = RuleG2P("en-us")
    ids = text_to_sequence("Speak 2 me, friend!", g2p)
    assert len(ids) > 0
    # interspersed blanks: odd positions are BLANK_ID
    assert ids[0] == BLANK_ID and ids[-1] == BLANK_ID
    assert all(i == BLANK_ID for i in ids[::2])


def test_non_english_raises():
    with pytest.raises(ValueError):
        RuleG2P("ro")
    from unitspeech_tpu.text.g2p_ro import RomanianG2P

    with pytest.raises(ValueError):
        RomanianG2P("en-us")


def test_get_phonemizer_fallback(monkeypatch):
    """Without an espeak binary on PATH: default None, fallback=True gives
    the English rule G2P for en-us and the Romanian one for ro."""
    import shutil as _shutil

    from unitspeech_tpu.text.g2p_ro import RomanianG2P

    monkeypatch.setattr(_shutil, "which", lambda *_a, **_k: None)
    assert get_phonemizer("en-us") is None
    ph = get_phonemizer("en-us", fallback=True)
    assert isinstance(ph, RuleG2P)
    assert isinstance(get_phonemizer("ro", fallback=True), RomanianG2P)


# --- Romanian (text/g2p_ro.py) ----------------------------------------------


@pytest.mark.parametrize(
    "word,ipa",
    [
        ("bună", "bˈunə"),
        ("mulțumesc", "multsumˈesk"),   # final c stays /k/ (no '' in 'ei' bug)
        ("cinci", "tʃˈintʃʲ"),          # ce/ci palatalization + final -i -> ʲ
        ("unchi", "ˈunkʲ"),             # chi -> /k/
        ("gheață", "ɡeˈatsə"),          # ghe -> /ɡ/, ț -> ts
        ("iarnă", "jˈarnə"),            # initial i glide
        ("mai", "maj"),                 # post-vocalic i glide (function word)
        ("copii", "kopˈij"),
        ("codri", "kˈodri"),            # muta-cum-liquida keeps -i syllabic
        ("lupi", "lˈupʲ"),
        ("ziua", "zˈiwa"),              # intervocalic u glides, i stays
        ("și", "ʃi"),                   # vowel-less stem keeps -i syllabic
        ("este", "jˈeste"),             # iotized initial e
        ("românia", "romˈɨnja"),        # â/î -> ɨ
        ("vorbește", "vorbˈeʃte"),      # ș -> ʃ; penultimate stress
    ],
)
def test_romanian_pronunciations(word, ipa):
    from unitspeech_tpu.text.g2p_ro import word_to_ipa_ro

    assert word_to_ipa_ro(word) == ipa


def test_romanian_output_alphabet_is_symbol_subset():
    from unitspeech_tpu.text.g2p_ro import _MAP, word_to_ipa_ro

    for ipa in _MAP.values():
        for ch in ipa:
            assert ch in _SYMBOL_SET, ch
    for w in ["gheorghe", "știință", "douăzeci", "mâine", "țățică"]:
        for ch in word_to_ipa_ro(w):
            assert ch in _SYMBOL_SET, (w, ch)


def test_romanian_numbers():
    from unitspeech_tpu.text.g2p_ro import expand_numbers_ro

    assert expand_numbers_ro("21") == "douăzeci și unu"
    assert expand_numbers_ro("100") == "o sută"
    assert expand_numbers_ro("235") == "două sute treizeci și cinci"
    assert expand_numbers_ro("1.234") == "o mie două sute treizeci și patru"
    assert expand_numbers_ro("20000") == "douăzeci de mii"
    assert expand_numbers_ro("2,5") == "doi virgulă cinci"
    assert expand_numbers_ro("1000000") == "un milion"
    assert expand_numbers_ro("2000000") == "două milioane"


def test_romanian_phonemize_contract():
    from unitspeech_tpu.text.g2p_ro import RomanianG2P

    g = RomanianG2P("ro")
    out = g.phonemize(["Bună ziua, ce mai faci?"])
    assert len(out) == 1
    assert "," in out[0] and out[0].endswith("?")
    for ch in out[0]:
        assert ch in _SYMBOL_SET, ch


def test_phonemize_chunks_no_preserve():
    seen = []

    def fake_ipa(chunk):
        seen.append(chunk)
        return "X"

    out = phonemize_chunks(fake_ipa, "a, b! c", preserve_punctuation=False)
    assert out == "X" and seen == ["a, b! c"]


def test_numbers_survive_punctuation_chunking():
    """'.'/',' are punctuation marks, so expansion must run BEFORE the
    chunk split — '1,000' must not become 'one, zero zero zero'."""
    g2p = RuleG2P("en-us", with_stress=False)
    out = g2p.phonemize(["it costs 1,000 dollars"])[0]
    assert "wʌn θaʊz" in out and "," not in out
    out = g2p.phonemize(["pi is 3.14, roughly."])[0]
    # 'three point one four' — the decimal point is consumed, the clause
    # comma and final period are preserved
    assert "θɹiː pɔɪnt wʌn fɔːɹ" in out
    assert out.count(",") == 1 and out.endswith(".")

    from unitspeech_tpu.text.g2p_ro import RomanianG2P

    ro = RomanianG2P("ro", with_stress=False)
    out = ro.phonemize(["am 1.000 de lei, mersi"])[0]
    assert "o mje" in out  # "o mie" phonemized, not split at the '.'
    assert out.count(",") == 1 and "." not in out


def test_huge_integers_read_digit_by_digit():
    from unitspeech_tpu.text.g2p import _int_to_words

    assert _int_to_words(10**15) == ("one " + "zero " * 15).strip()
    assert _int_to_words(999 * 10**12).startswith("nine hundred ninety nine")


def test_get_phonemizer_unsupported_language(monkeypatch):
    """Languages with no espeak support and no rule set: ValueError when
    strict (fallback=False, reference dispatch behavior), warning + None
    with fallback=True."""
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda *_a, **_k: None)
    with pytest.raises(ValueError):
        get_phonemizer("de")
    assert get_phonemizer("de", fallback=True) is None
