from .greedy import greedy_decode, greedy_frames, collapse_frames

__all__ = ["greedy_decode", "greedy_frames", "collapse_frames"]
