"""Symbol inventory for text input.

This is the standard 179-symbol table used by VITS/Grad-TTS-family models
(pad + punctuation + Latin letters + IPA); ID-compatible with the reference
(/root/reference/unitspeech/text/symbols.py) — it must be, or converted
text-encoder embeddings would be permuted.
"""

PAD = "_"
PUNCTUATION = ';:,.!?¡¿—…"«»“” '
LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
LETTERS_IPA = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ̃"
)

symbols = [PAD] + list(PUNCTUATION) + list(LETTERS) + list(LETTERS_IPA)

SPACE_ID = symbols.index(" ")
BLANK_ID = len(symbols)  # interspersed blank token (= n_vocab - 1)
N_VOCAB = len(symbols) + 1
