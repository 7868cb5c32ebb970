"""Sharded line-image store — the LMDB replacement (component C6).

The reference stores PNG-encoded line crops in LMDB keyed by line id
(SURVEY.md C6 [M]). The rebuild's store is designed for a zero-copy host
pipeline feeding a TPU:

- Images are height-normalized at PREP time (fixed ``height`` rows,
  grayscale uint8), so the online path is a pure memcpy: no decode, no
  resize, no PIL in the hot loop.
- Each shard is a flat binary file of concatenated row-major [H, W_i]
  uint8 images, memory-mapped at read time; an index JSON carries
  (id, offset, width, transcript) per line.
- Transcripts are uxxxx strings (C1), so the store is
  alphabet-independent; alphabets are built over manifests.

Layout::

    dataset_dir/
      manifest.json                  # height, splits -> shard lists
      shards/<split>-00000.bin       # concatenated uint8 line images
      shards/<split>-00000.idx.json  # per-line index entries

Reference parity: replaces src/ocr_dataset.py's LMDB env + JSON split
descriptor (SURVEY.md C6) with an equivalent self-describing artifact.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclass
class LineRecord:
    """One text line: pixels + transcript + identity."""

    id: str
    image: np.ndarray  # [H, W] uint8, H == dataset height
    transcript: str  # uxxxx string
    width: int

    @property
    def text(self) -> str:
        from ..text import uxxxx_to_utf8

        return uxxxx_to_utf8(self.transcript)


class ShardWriter:
    """Writes one split's shards. Images must already be height-normalized
    [H, W] uint8 arrays (use data.transforms.normalize_line)."""

    def __init__(
        self,
        dataset_dir: str,
        split: str,
        height: int,
        max_shard_bytes: int = 512 * 1024 * 1024,
    ):
        self.dataset_dir = dataset_dir
        self.split = split
        self.height = height
        self.max_shard_bytes = max_shard_bytes
        self._shard_idx = -1
        self._bin = None
        self._offset = 0
        self._entries: List[dict] = []
        self._shards: List[str] = []
        os.makedirs(os.path.join(dataset_dir, "shards"), exist_ok=True)

    def _roll(self):
        self._flush_index()
        self._shard_idx += 1
        name = f"{self.split}-{self._shard_idx:05d}"
        self._shards.append(name)
        path = os.path.join(self.dataset_dir, "shards", name + ".bin")
        if self._bin:
            self._bin.close()
        self._bin = open(path, "wb")
        self._offset = 0
        self._entries = []

    def _flush_index(self):
        if self._shard_idx >= 0 and self._entries:
            name = self._shards[self._shard_idx]
            path = os.path.join(self.dataset_dir, "shards", name + ".idx.json")
            with open(path, "w") as f:
                json.dump(self._entries, f, ensure_ascii=False)

    def add(self, line_id: str, image: np.ndarray, transcript_uxxxx: str):
        if image.dtype != np.uint8 or image.ndim != 2 or image.shape[0] != self.height:
            raise ValueError(
                f"image must be [height={self.height}, W] uint8, got "
                f"{image.shape} {image.dtype}"
            )
        if self._bin is None or self._offset >= self.max_shard_bytes:
            self._roll()
        data = np.ascontiguousarray(image).tobytes()
        self._bin.write(data)
        self._entries.append(
            {
                "id": line_id,
                "offset": self._offset,
                "width": int(image.shape[1]),
                "transcript": transcript_uxxxx,
            }
        )
        self._offset += len(data)

    def close(self) -> List[str]:
        self._flush_index()
        if self._bin:
            self._bin.close()
            self._bin = None
        return list(self._shards)


def write_manifest(
    dataset_dir: str,
    height: int,
    splits: Dict[str, List[str]],
    extra: Optional[dict] = None,
):
    manifest = {"version": 1, "height": height, "splits": splits}
    if extra:
        manifest.update(extra)
    with open(os.path.join(dataset_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, ensure_ascii=False)


class ShardedLineDataset:
    """Memory-mapped reader over one split. Random access by index; the
    mmap makes repeated epoch sweeps hit the page cache, not disk."""

    def __init__(self, dataset_dir: str, split: str):
        self.dataset_dir = dataset_dir
        self.split = split
        with open(os.path.join(dataset_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.height = int(self.manifest["height"])
        if split not in self.manifest["splits"]:
            raise KeyError(
                f"split {split!r} not in manifest (has {list(self.manifest['splits'])})"
            )
        self._mmaps: List[np.memmap] = []
        self._index: List[tuple] = []  # (shard_no, offset, width, id, transcript)
        for shard_name in self.manifest["splits"][split]:
            base = os.path.join(dataset_dir, "shards", shard_name)
            mm = np.memmap(base + ".bin", dtype=np.uint8, mode="r")
            shard_no = len(self._mmaps)
            self._mmaps.append(mm)
            with open(base + ".idx.json") as f:
                for e in json.load(f):
                    self._index.append(
                        (shard_no, e["offset"], e["width"], e["id"], e["transcript"])
                    )

    def __len__(self) -> int:
        return len(self._index)

    @property
    def widths(self) -> np.ndarray:
        return np.array([e[2] for e in self._index], dtype=np.int32)

    def transcript(self, i: int) -> str:
        return self._index[i][4]

    def ids(self) -> List[str]:
        return [e[3] for e in self._index]

    def id(self, i: int) -> str:
        return self._index[i][3]

    def transcripts(self) -> Iterator[str]:
        for e in self._index:
            yield e[4]

    def __getitem__(self, i: int) -> LineRecord:
        shard_no, offset, width, line_id, transcript = self._index[i]
        nbytes = self.height * width
        flat = self._mmaps[shard_no][offset : offset + nbytes]
        image = np.asarray(flat).reshape(self.height, width)
        return LineRecord(id=line_id, image=image, transcript=transcript, width=width)

    def read_into(self, i: int, out: np.ndarray) -> int:
        """Copy line ``i``'s pixels into ``out[:, :width]`` (a [H, Wb] uint8
        batch slot). Returns the true width. The single memcpy per line is
        the entire online decode path."""
        shard_no, offset, width, _, _ = self._index[i]
        w = min(width, out.shape[1])
        nbytes = self.height * width
        img = np.asarray(self._mmaps[shard_no][offset : offset + nbytes]).reshape(
            self.height, width
        )
        out[:, :w] = img[:, :w]
        return w
