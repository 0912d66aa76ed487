"""Text frontend: grapheme -> IPA phonemes -> interleaved symbol IDs.

Host-side (CPU) by design — phonemization is a string operation, not a tensor
op (SURVEY.md §2.4). Pipeline parity with the reference
(/root/reference/unitspeech/text/__init__.py:11-26 and util.py:154-172):

    lowercase -> espeak IPA (en-us / ro) -> symbol-ID lookup -> intersperse
    blank (BLANK_ID) between every token.

espeak-ng is an optional system dependency. When it is unavailable, the
frontend still accepts pre-phonemized IPA strings via `phonemes_to_sequence`,
so every downstream component remains testable and usable.
"""

from __future__ import annotations

import re
import shutil
import subprocess
from typing import List, Optional, Sequence

from unitspeech_tpu.ops.masking import intersperse
from unitspeech_tpu.text.symbols import BLANK_ID, symbols

_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = {i: s for i, s in enumerate(symbols)}
_whitespace_re = re.compile(r"\s+")

SUPPORTED_LANGUAGES = ("en-us", "ro")


def lowercase(text: str) -> str:
    return text.lower()


def collapse_whitespace(text: str) -> str:
    return re.sub(_whitespace_re, " ", text)


# the `phonemizer` package's Punctuation._DEFAULT_MARKS — the same set the
# reference preserves (preserve_punctuation=True, util.py:154-172); every one
# of these has a symbol ID in text/symbols.py:7
PUNCTUATION_MARKS = ';:,.!?¡¿—…"«»“”'
_marks_re = re.compile(rf"(\s*[{re.escape(PUNCTUATION_MARKS)}]+\s*)+")
# espeak emits "(en)"-style flags when it switches language mid-text;
# language_switch="remove-flags" strips them (reference util.py:160)
_lang_flag_re = re.compile(r"\([a-z]{2,5}(?:-[a-z0-9-]+)?\)")
_stress_re = re.compile(r"[ˈˌ]")


class EspeakPhonemizer:
    """Grapheme->IPA via the espeak-ng CLI with the reference's phonemizer
    flags reproduced (util.py:154-172): preserve_punctuation=True (marks are
    split out, the text between them is phonemized, and the marks re-attached
    in place — the `phonemizer` package's Punctuation.preserve/restore
    contract), with_stress=True, language_switch="remove-flags"."""

    def __init__(self, language: str = "en-us", with_stress: bool = True,
                 preserve_punctuation: bool = True):
        if language not in SUPPORTED_LANGUAGES:
            raise ValueError(f"Language {language} not supported.")
        self.language = language
        self.with_stress = with_stress
        self.preserve_punctuation = preserve_punctuation
        self._binary = shutil.which("espeak-ng") or shutil.which("espeak")
        if self._binary is None:
            raise RuntimeError(
                "espeak-ng not found on PATH; install it or pass pre-phonemized "
                "IPA text to phonemes_to_sequence()."
            )

    def _espeak_ipa(self, text: str) -> str:
        """One espeak call: raw IPA for a punctuation-free chunk."""
        args = [self._binary, "-q", "--ipa", "-v", self.language]
        proc = subprocess.run(
            args + ["--", text], capture_output=True, text=True, check=True
        )
        ph = proc.stdout.replace("\n", " ")
        # espeak ties multi-char phones with U+0361; the symbol table has
        # none, drop them like the phonemizer package's default.
        ph = ph.replace("͡", "").replace("‍", "")
        ph = _lang_flag_re.sub("", ph)
        if not self.with_stress:
            ph = _stress_re.sub("", ph)
        return ph.strip()

    def phonemize(self, texts: Sequence[str], strip: bool = True) -> List[str]:
        return [
            phonemize_chunks(self._espeak_ipa, t, self.preserve_punctuation,
                             strip=strip)
            for t in texts
        ]


def phonemize_chunks(ipa_fn, text: str, preserve_punctuation: bool = True,
                     strip: bool = True) -> str:
    """Apply a chunk IPA function with punctuation preserved in place: marks
    keep their surrounding whitespace and the text between them is
    phonemized separately (the `phonemizer` package's Punctuation
    preserve/restore contract the reference relies on, util.py:154-172).
    Shared by the espeak backend and the rule-G2P fallback (text/g2p.py)."""
    if not preserve_punctuation:
        ph = ipa_fn(text)
    else:
        parts: List[str] = []
        pos = 0
        for m in _marks_re.finditer(text):
            chunk = text[pos:m.start()]
            if chunk.strip():
                parts.append(ipa_fn(chunk))
            parts.append(m.group())
            pos = m.end()
        tail = text[pos:]
        if tail.strip():
            parts.append(ipa_fn(tail))
        ph = "".join(parts)
    return ph.strip() if strip else ph


def get_phonemizer(language: str, fallback: bool = False):
    """Returns an espeak-backed phonemizer; when espeak is absent, either
    None (default — callers then require pre-phonemized IPA) or, with
    `fallback=True`, the pure-Python English rule G2P (text/g2p.py) so raw
    text stays usable on air-gapped hosts. The fallback raises ValueError
    for non-English languages (no rule set)."""
    try:
        return EspeakPhonemizer(language)
    # ValueError = unsupported language (raised before the binary check);
    # with fallback=False it propagates like the reference's strict dispatch,
    # with fallback=True it routes to the same no-rule-set warning + None
    except (RuntimeError, ValueError) as espeak_err:
        if isinstance(espeak_err, ValueError) and not fallback:
            raise
        if fallback:
            import logging

            from unitspeech_tpu.text.g2p import RuleG2P
            from unitspeech_tpu.text.g2p_ro import RomanianG2P

            try:
                g2p = (RomanianG2P(language) if language.startswith("ro")
                       else RuleG2P(language))
            except ValueError as e:  # no rule set for this language
                logging.getLogger(__name__).warning(
                    "espeak-ng not found and no G2P fallback: %s", e
                )
                return None
            logging.getLogger(__name__).warning(
                "espeak-ng not found: falling back to the built-in rule "
                "G2P (text/g2p%s.py) — best-effort phonemization; install "
                "espeak-ng for reference-parity output",
                "_ro" if language.startswith("ro") else "",
            )
            return g2p
        return None


def phonemize(text: str, phonemizer: EspeakPhonemizer) -> str:
    """Reference text/__init__.py:11-16."""
    text = lowercase(text)
    ph = phonemizer.phonemize([text], strip=True)[0]
    return collapse_whitespace(ph)


def cleaned_text_to_sequence(cleaned_text: str) -> List[int]:
    """IPA string -> symbol IDs (reference text/__init__.py:19-26).
    Unknown symbols are skipped rather than raising (robustness to espeak
    version drift); the reference raises KeyError."""
    return [_symbol_to_id[s] for s in cleaned_text if s in _symbol_to_id]


def phonemes_to_sequence(cleaned_text: str, add_blank: bool = True) -> List[int]:
    """IPA string -> interleaved ID sequence ready for the text encoder."""
    seq = cleaned_text_to_sequence(cleaned_text)
    if add_blank:
        seq = intersperse(seq, BLANK_ID)
    return seq


def text_to_sequence(
    text: str, phonemizer: EspeakPhonemizer, add_blank: bool = True
) -> List[int]:
    """Full frontend: graphemes -> IDs (reference inference.py:117-122)."""
    return phonemes_to_sequence(phonemize(text, phonemizer), add_blank=add_blank)


def sequence_to_text(seq: Sequence[int]) -> str:
    return "".join(_id_to_symbol.get(i, "") for i in seq)


_sentence_split_re = re.compile(r"(?<=[.!?…])\s+")


def split_sentences(text: str, max_words: int = 60) -> List[str]:
    """Split raw text into synthesizable sentence chunks for long-text
    synthesis (beyond the reference, whose inference.py is one-shot and
    bounded by a single frame bucket).

    Splits after sentence-final punctuation; abbreviation oversplits
    (a chunk ending in a 1-2 letter word + period, like "U." / "Mr.")
    merge into the following text, and run-on sentences longer than
    `max_words` split again at clause commas so no chunk exceeds a frame
    bucket. Heuristic by design — chunk boundaries only affect prosody at
    the joins, never correctness."""

    def _ends_with_abbrev(chunk: str) -> bool:
        last = chunk.rsplit(None, 1)[-1]
        return last.endswith(".") and len(last.rstrip(".")) <= 2

    parts = [p.strip() for p in _sentence_split_re.split(text.strip())
             if p.strip()]
    merged: List[str] = []
    for p in parts:
        if merged and _ends_with_abbrev(merged[-1]):
            merged[-1] += " " + p
        else:
            merged.append(p)
    out: List[str] = []
    for p in merged:
        words = p.split()
        while len(words) > max_words:
            # prefer a comma near the budget, else a hard word split
            cut = max_words
            for k in range(max_words, max_words // 2, -1):
                if words[k - 1].endswith((",", ";", ":")):
                    cut = k
                    break
            out.append(" ".join(words[:cut]))
            words = words[cut:]
        if words:
            out.append(" ".join(words))
    return out or ([text.strip()] if text.strip() else [])
