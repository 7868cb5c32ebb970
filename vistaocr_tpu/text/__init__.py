from .uxxxx import utf8_to_uxxxx, uxxxx_to_utf8
from .alphabet import Alphabet
from .error_rates import levenshtein, cer, wer, cer_wer
from .align import align, align_tokens, error_report

__all__ = [
    "utf8_to_uxxxx",
    "uxxxx_to_utf8",
    "Alphabet",
    "levenshtein",
    "cer",
    "wer",
    "cer_wer",
    "align",
    "align_tokens",
    "error_report",
]
