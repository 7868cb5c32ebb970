from .greedy import greedy_decode, greedy_frames, collapse_frames
from .beam import BeamConfig, beam_decode, beam_topk, load_lm, prefix_beam_search
from .device_beam import beam_scan, beam_scan_collapsed, device_beam_decode
from .lm import ArpaLM, train_char_lm

__all__ = [
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
    "train_char_lm",
]
