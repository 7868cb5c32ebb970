"""Batched inference service — BASELINE.json config #5.

Width-routed, dynamically batched line OCR on one process's devices:

    submit(image) -> Future
        │ height-normalize (host, cheap)          [transforms]
        │ route to bucket by width                [ShapeContract]
        │ enqueue; flush on max_batch or deadline
        ▼
    per-bucket compiled graph: preprocess+CNN+BLSTM+head (device)
        ▼
    greedy collapse (device) or prefix-beam+LM (host, top-k fed)
        ▼
    future.set_result(LineResult)

Every bucket's graph is compiled exactly once (static shapes); a batch
that isn't full is padded with repeats and masked by ``valid`` — the
latency/throughput tradeoff lives entirely in (max_batch, max_wait_ms).

The reference has no serving stack (SURVEY.md §1); this is the idiomatic
equivalent BASELINE.json demands, built on the same primitives as
training (no separate inference codepath to drift).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_model
from ..data.buckets import BucketSpec, ShapeContract
from ..data.transforms import normalize_line
from ..decode import BeamConfig, beam_decode, greedy_decode, load_lm
from ..text import uxxxx_to_utf8
from ..train import make_eval_step


@dataclasses.dataclass
class ServiceConfig:
    max_batch: int = 32
    max_wait_ms: float = 5.0
    decoder: str = "greedy"  # greedy | beam
    beam: BeamConfig = dataclasses.field(default_factory=BeamConfig)
    lm_path: Optional[str] = None
    warmup: bool = True


@dataclasses.dataclass
class LineResult:
    text: str
    uxxxx: str
    latency_ms: float
    bucket_width: int


@dataclasses.dataclass
class _Pending:
    image: np.ndarray  # height-normalized [H, W] uint8
    width: int
    future: Future
    t_submit: float


class OcrService:
    """In-process batched OCR service over a self-describing snapshot."""

    def __init__(self, snapshot: str, config: ServiceConfig = ServiceConfig()):
        self.config = config
        self.model, self.variables, self.alphabet, self.contract = load_model(
            snapshot
        )
        self._eval_step = make_eval_step(self.model)
        self._lm = (
            load_lm(config.lm_path, self.alphabet) if config.lm_path else None
        )
        self._queues: List[queue.Queue] = [
            queue.Queue() for _ in self.contract.bucket_widths
        ]
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._bucket_loop, args=(i,), daemon=True)
            for i in range(len(self.contract.bucket_widths))
        ]
        self._lock = threading.Lock()  # one device computation at a time
        self.stats = {"lines": 0, "batches": 0, "pad_waste": 0}
        for t in self._threads:
            t.start()
        if config.warmup:
            self._warmup()

    # ---- client API ---------------------------------------------------------
    def submit(self, image) -> Future:
        """image: [H,W]/[H,W,C] uint8 array or PIL image, any height.
        Returns a Future[LineResult]."""
        t0 = time.time()
        norm = normalize_line(
            image,
            self.contract.height,
            max_width=self.contract.bucket_widths[-1],
        )
        b = self.contract.bucket_for_width(norm.shape[1])
        fut: Future = Future()
        self._queues[b].put(_Pending(norm, norm.shape[1], fut, t0))
        return fut

    def ocr_lines(self, images: Sequence) -> List[LineResult]:
        futs = [self.submit(img) for img in images]
        return [f.result() for f in futs]

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)

    # ---- internals ----------------------------------------------------------
    def _warmup(self):
        """Compile every bucket graph up front so first requests aren't
        paying compile latency."""
        for i, bw in enumerate(self.contract.bucket_widths):
            spec = BucketSpec.of(self.contract, i)
            images = jnp.zeros(
                (self.config.max_batch, spec.height, spec.width), jnp.uint8
            )
            widths = jnp.full((self.config.max_batch,), spec.width, jnp.int32)
            out = self._eval_step(
                self.variables["params"], self.variables["batch_stats"],
                images, widths,
            )
            jax.block_until_ready(out[0])

    def _bucket_loop(self, bucket_idx: int):
        q = self._queues[bucket_idx]
        cfg = self.config
        while not self._stop.is_set():
            try:
                first = q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + cfg.max_wait_ms / 1000.0
            while len(batch) < cfg.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(q.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run_batch(bucket_idx, batch)

    def _run_batch(self, bucket_idx: int, pendings: List[_Pending]):
        spec = BucketSpec.of(self.contract, bucket_idx)
        n = len(pendings)
        B = self.config.max_batch
        images = np.full((B, spec.height, spec.width), 255, np.uint8)
        widths = np.zeros((B,), np.int32)
        for i, p in enumerate(pendings):
            images[i, :, : p.width] = p.image
            widths[i] = p.width
        widths[n:] = spec.width  # pad slots: full-width dummies
        valid = np.arange(B) < n

        try:
            with self._lock:
                log_probs, frame_mask = self._eval_step(
                    self.variables["params"], self.variables["batch_stats"],
                    jnp.asarray(images), jnp.asarray(widths),
                )
                if self.config.decoder == "beam":
                    hyps = beam_decode(
                        log_probs, frame_mask, self.alphabet,
                        self.config.beam, lm=self._lm, valid=valid,
                    )
                else:
                    hyps = greedy_decode(
                        log_probs, frame_mask, self.alphabet, valid=valid
                    )
        except Exception as e:  # resolve futures with the error, don't hang
            for p in pendings:
                p.future.set_exception(e)
            return

        now = time.time()
        for p, hyp in zip(pendings, hyps):
            p.future.set_result(
                LineResult(
                    text=uxxxx_to_utf8(hyp),
                    uxxxx=hyp,
                    latency_ms=(now - p.t_submit) * 1000.0,
                    bucket_width=spec.width,
                )
            )
        self.stats["lines"] += n
        self.stats["batches"] += 1
        self.stats["pad_waste"] += B - n
