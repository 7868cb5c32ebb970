"""Bucketed host pipeline: sampling, batch assembly, device prefetch.

Components C6 + C7 (SURVEY.md §2). Replaces the reference's
GroupedSampler + pad-to-max-width collate + torch DataLoader workers with
a TPU-shaped design:

- every batch has one of a FIXED set of shapes (bucket ladder from
  ``ShapeContract``), so each bucket's train/eval step compiles once;
- per-bucket batch sizes follow a pixel budget (wider lines -> smaller
  batches) so step memory/latency is roughly uniform across buckets;
- images travel to the device as uint8 (4x fewer H2D bytes than f32;
  normalization happens on device, ops/preprocess.py);
- a background thread keeps ``prefetch`` batches in flight
  (``jax.device_put`` with an optional NamedSharding for DP), so the TPU
  never waits on host assembly — the reference's documented stall
  (SURVEY.md §3.1 hot loops).

Bucket assignment accounts for BOTH width and label length: CTC has no
valid alignment unless label_len <= frame count, so a sample is placed in
the narrowest bucket satisfying both, and samples that fit no bucket are
dropped with a counter (never silently).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..text import Alphabet
from .buckets import BucketSpec, ShapeContract
from .shards import ShardedLineDataset


@dataclass
class Batch:
    """One static-shape batch. ``images`` is [B, H, W] uint8; the channel
    axis is added on device. ``widths`` are true pixel widths (<= W);
    ``valid`` marks real samples (False = padding duplicate, eval only)."""

    images: "np.ndarray"
    widths: "np.ndarray"  # [B] int32
    labels: "np.ndarray"  # [B, L] int32, 0-padded
    label_lengths: "np.ndarray"  # [B] int32
    valid: "np.ndarray"  # [B] bool
    bucket: BucketSpec
    indices: "np.ndarray"  # [B] int64 dataset indices (host-side bookkeeping)

    @property
    def size(self) -> int:
        return int(self.images.shape[0])


class BatchPipeline:
    """Iterable over bucketed batches for one split.

    Parameters
    ----------
    dataset : ShardedLineDataset
    alphabet : Alphabet
    contract : ShapeContract
    batch_pixels : int
        Pixel budget per batch: bucket b gets batch size
        ``max(1, batch_pixels // (H * Wb))`` rounded down to a multiple of
        ``batch_multiple`` (the DP mesh size), static across epochs.
    batch_multiple : int
        Every batch size is a multiple of this (data-axis divisibility).
    drop_remainder : bool
        True for training (partial tail batches are dropped); False for
        eval (tails are padded by repeating samples, flagged via
        ``valid``).
    """

    def __init__(
        self,
        dataset: ShardedLineDataset,
        alphabet: Alphabet,
        contract: ShapeContract,
        *,
        batch_pixels: int = 2**21,  # ~2M pixels ≈ 64 lines of 32x1024
        batch_multiple: int = 1,
        min_batch: int = 1,
        drop_remainder: bool = True,
        shuffle: bool = True,
        seed: int = 0,
    ):
        if dataset.height != contract.height:
            raise ValueError(
                f"dataset height {dataset.height} != contract height {contract.height}"
            )
        self.dataset = dataset
        self.alphabet = alphabet
        self.contract = contract
        self.drop_remainder = drop_remainder
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

        # --- static per-bucket batch sizes -----------------------------------
        # Rounded to a multiple of lcm(8, batch_multiple): 8 keeps the batch
        # axis sublane-aligned for f32 tiles in Pallas kernels; batch_multiple
        # keeps it divisible across the data mesh axis.
        import math as _math

        align = 8 * batch_multiple // _math.gcd(8, batch_multiple)
        self.batch_sizes: List[int] = []
        for bw in contract.bucket_widths:
            b = max(min_batch, batch_pixels // (contract.height * bw))
            b = max(align, (b // align) * align)
            self.batch_sizes.append(b)

        # --- bucket assignment (width AND label length) ----------------------
        self.bucket_members: List[List[int]] = [[] for _ in contract.bucket_widths]
        self.encoded: List[np.ndarray] = []
        self.dropped = 0
        widths = dataset.widths
        max_label = [0] * len(contract.bucket_widths)
        for i in range(len(dataset)):
            ids = np.asarray(alphabet.encode(dataset.transcript(i)), dtype=np.int32)
            self.encoded.append(ids)
            placed = False
            for b, bw in enumerate(contract.bucket_widths):
                if widths[i] <= bw and len(ids) <= contract.label_cap(bw):
                    self.bucket_members[b].append(i)
                    max_label[b] = max(max_label[b], len(ids))
                    placed = True
                    break
            if not placed:
                self.dropped += 1

        # Data-driven per-bucket label caps: the contract cap (= frame count)
        # is a worst case; real transcripts are much shorter, and CTC cost
        # scales with the extended-state count S = 2L+1. Caps snap to the
        # (64k - 1) ladder so S lands exactly on a 128-lane boundary.
        self.label_caps: List[int] = []
        for b, bw in enumerate(contract.bucket_widths):
            hard = contract.label_cap(bw)
            need = max(max_label[b], 1)
            cap = next(
                (c for c in (15, 31, 63, 127, 191, 255, 383, 511) if c >= need),
                need,
            )
            self.label_caps.append(min(cap, hard))

    def spec_for(self, bucket_idx: int) -> BucketSpec:
        """BucketSpec with the data-driven label cap (use instead of
        BucketSpec.of inside the pipeline/cache hot paths)."""
        spec = BucketSpec.of(self.contract, bucket_idx)
        return BucketSpec(
            width=spec.width,
            height=spec.height,
            frames=spec.frames,
            label_len=self.label_caps[bucket_idx],
        )

    def __len__(self) -> int:
        total = 0
        for members, bsz in zip(self.bucket_members, self.batch_sizes):
            if self.drop_remainder:
                total += len(members) // bsz
            else:
                total += -(-len(members) // bsz) if members else 0
        return total

    def batch_shapes(self) -> List[tuple]:
        """All (B, H, W, L) shapes this pipeline can emit — the compile set.
        With drop_remainder, a bucket with fewer members than its batch size
        emits nothing and is excluded."""
        shapes = []
        for b, (members, bsz) in enumerate(zip(self.bucket_members, self.batch_sizes)):
            n = len(members)
            if n and (not self.drop_remainder or n >= bsz):
                spec = self.spec_for(b)
                shapes.append((bsz, spec.height, spec.width, spec.label_len))
        return shapes

    # ---- batch assembly -----------------------------------------------------
    def _assemble(self, bucket_idx: int, idxs: Sequence[int], bsz: int) -> Batch:
        spec = self.spec_for(bucket_idx)
        n = len(idxs)
        images = np.full((bsz, spec.height, spec.width), 255, dtype=np.uint8)
        widths = np.zeros((bsz,), dtype=np.int32)
        labels = np.zeros((bsz, spec.label_len), dtype=np.int32)
        label_lengths = np.zeros((bsz,), dtype=np.int32)
        valid = np.zeros((bsz,), dtype=bool)
        out_indices = np.zeros((bsz,), dtype=np.int64)

        # Pixel copies go through the C++ assembler when built (GIL released
        # -> the producer thread truly overlaps the main thread); metadata
        # stays in Python either way.
        from ..decode import native_binding as nb

        use_native = nb.available()
        srcs = [] if use_native else None
        for slot in range(bsz):
            i = idxs[slot] if slot < n else idxs[slot % n]  # pad tail by repeat
            if use_native:
                img = self.dataset[i].image
                srcs.append(np.ascontiguousarray(img))
                widths[slot] = min(img.shape[1], spec.width)
            else:
                widths[slot] = self.dataset.read_into(i, images[slot])
            ids = self.encoded[i]
            labels[slot, : len(ids)] = ids
            label_lengths[slot] = len(ids)
            valid[slot] = slot < n
            out_indices[slot] = i
        if use_native:
            nb.assemble_native(srcs, images)
        return Batch(
            images=images,
            widths=widths,
            labels=labels,
            label_lengths=label_lengths,
            valid=valid,
            bucket=spec,
            indices=out_indices,
        )

    def plan(self, epoch: int) -> List[tuple]:
        """The exact (bucket_idx, [dataset indices]) batch plan for one
        epoch — deterministic in (seed, epoch, dataset order), which is
        what makes multi-host training correct: every process derives the
        same plan and ships the same global batches."""
        rng = np.random.default_rng((self.seed, epoch))
        plan: List[tuple] = []
        for b, members in enumerate(self.bucket_members):
            if not members:
                continue
            order = np.array(members)
            if self.shuffle:
                rng.shuffle(order)
            bsz = self.batch_sizes[b]
            n_full = len(order) // bsz
            for k in range(n_full):
                plan.append((b, order[k * bsz : (k + 1) * bsz].tolist()))
            tail = order[n_full * bsz :]
            if len(tail) and not self.drop_remainder:
                plan.append((b, tail.tolist()))
        if self.shuffle:
            rng.shuffle(plan)
        return plan

    def plan_fingerprint(self, epoch: int = 0) -> int:
        """CRC32 over the epoch plan + batch sizes. Equal across processes
        iff they will feed identical global batches (train.fit compares
        fingerprints across the cluster before multi-host training)."""
        import zlib

        h = zlib.crc32(np.asarray(self.batch_sizes, np.int64).tobytes())
        for b, idxs in self.plan(epoch):
            h = zlib.crc32(np.int64(b).tobytes(), h)
            h = zlib.crc32(np.asarray(idxs, np.int64).tobytes(), h)
        return h

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Batch]:
        """Yield all batches for one epoch in shuffled inter-bucket order."""
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        for b, idxs in self.plan(epoch):
            yield self._assemble(b, idxs, self.batch_sizes[b])

    # ---- device prefetch ------------------------------------------------------
    def device_epoch(
        self,
        epoch: Optional[int] = None,
        *,
        sharding=None,
        prefetch: int = 2,
    ) -> Iterator[Batch]:
        """Like :meth:`epoch` but with batches asynchronously assembled and
        ``device_put`` ahead of consumption (double-buffered by default).

        ``sharding``: optional dict {field: jax.sharding.Sharding} or a
        single Sharding applied to all array fields (DP batch sharding).
        """
        import jax

        def put(batch: Batch) -> Batch:
            def sh(name):
                if sharding is None:
                    return None
                if isinstance(sharding, dict):
                    return sharding.get(name)
                return sharding

            return Batch(
                images=jax.device_put(batch.images, sh("images")),
                widths=jax.device_put(batch.widths, sh("widths")),
                labels=jax.device_put(batch.labels, sh("labels")),
                label_lengths=jax.device_put(batch.label_lengths, sh("label_lengths")),
                valid=batch.valid,
                bucket=batch.bucket,
                indices=batch.indices,
            )

        if jax.process_count() > 1:
            # Multi-host: device_put with a cross-process sharding behaves
            # like a collective-ordered transfer — every process must issue
            # the same transfers in the same order. A background producer
            # thread interleaves nondeterministically with OTHER pipelines'
            # producers (train + val both streaming), which deadlocks
            # (observed: 2-process fit() hang with all producers blocked
            # inside device_put). Synchronous iteration keeps each
            # process's transfer order identical; prefetch overlap is a
            # single-host luxury.
            for batch in self.epoch(epoch):
                yield put(batch)
            return

        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        sentinel = object()
        err: List[BaseException] = []

        def producer():
            try:
                for batch in self.epoch(epoch):
                    q.put(put(batch))
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
