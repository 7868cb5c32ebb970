from .greedy import greedy_decode, greedy_frames, collapse_frames
from .beam import BeamConfig, beam_decode, beam_topk, load_lm, prefix_beam_search
from .device_beam import beam_scan, beam_scan_collapsed, device_beam_decode
from .lexicon import Lexicon
from .lm import ArpaLM, train_char_lm
from .offline import decode_posteriors, greedy_decode_np

__all__ = [
    "decode_posteriors",
    "greedy_decode_np",
    "greedy_decode",
    "greedy_frames",
    "collapse_frames",
    "BeamConfig",
    "beam_decode",
    "beam_topk",
    "beam_scan",
    "beam_scan_collapsed",
    "device_beam_decode",
    "load_lm",
    "prefix_beam_search",
    "ArpaLM",
    "Lexicon",
    "train_char_lm",
]
