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
from ..decode.greedy import collapse_frames, greedy_frames
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
    # Serving re-buckets the snapshot's ladder onto serve_align-multiples.
    # Training wants a FINE ladder (padding waste = wasted FLOPs on the
    # hot path; fit/bench tune align=32), but a fine ladder is wrong for
    # serving: requests fragment across many rungs, so batches run mostly
    # padded and every rung is one more compiled graph. 0 keeps the
    # snapshot's ladder as-is.
    serve_align: int = 128


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
        from ..runtime import enable_compile_cache

        enable_compile_cache()
        self.config = config
        self.model, self.variables, self.alphabet, self.contract = load_model(
            snapshot
        )
        if config.serve_align:
            a = config.serve_align
            coarse = tuple(sorted({
                -(-w // a) * a for w in self.contract.bucket_widths
            }))
            self.contract = dataclasses.replace(
                self.contract, bucket_widths=coarse
            )
        # Snapshots deserialize to HOST numpy arrays; pin them on device
        # once, or every request re-uploads all weights (measured: 6x the
        # whole service pass on the relay-attached chip).
        self.variables = jax.device_put(self.variables)
        self._eval_step = make_eval_step(self.model)
        # Greedy path runs as ONE device program (forward + collapse):
        # on relay-attached TPUs every program call pays a fixed round-trip
        # ack, so fusing halves the per-batch fixed cost.
        model = self.model

        def _fused(params, batch_stats, images, widths):
            lp, fm = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, widths, train=False,
            )
            return greedy_frames(lp, fm)

        self._eval_greedy = jax.jit(_fused)
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
        self._stats_lock = threading.Lock()  # per-bucket threads increment
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
        """Bulk OCR: route everything up front, dispatch every batch's
        device graphs back-to-back (dispatch is async, so H2D/compute/D2H
        pipeline over the interconnect), then finalize host-side.

        This bypasses the online queues on purpose: dripping a large job
        through submit() fragments batches at the max_wait_ms deadline and
        serializes on per-batch round-trip latency (measured 9.8s for 512
        lines vs ~1s on this path). submit() remains the latency-shaped
        online entry."""
        t0 = time.time()
        pendings = []
        buckets: dict = {}
        for i, img in enumerate(images):
            norm = normalize_line(
                img, self.contract.height,
                max_width=self.contract.bucket_widths[-1],
            )
            p = _Pending(norm, norm.shape[1], Future(), t0)
            pendings.append(p)
            b = self.contract.bucket_for_width(norm.shape[1])
            buckets.setdefault(b, []).append(p)

        # Phase 1: dispatch all device work. Greedy mode is one fused
        # program per batch (forward + collapse).
        beam_mode = self.config.decoder == "beam"
        inflight = []
        for b, plist in buckets.items():
            for k in range(0, len(plist), self.config.max_batch):
                chunk = plist[k : k + self.config.max_batch]
                images_np, widths_np, valid = self._assemble(b, chunk)
                with self._lock:
                    if beam_mode:
                        log_probs, frame_mask = self._eval_step(
                            self.variables["params"],
                            self.variables["batch_stats"],
                            jnp.asarray(images_np), jnp.asarray(widths_np),
                        )
                        pre = None
                    else:
                        log_probs = frame_mask = None
                        pre = self._eval_greedy(
                            self.variables["params"],
                            self.variables["batch_stats"],
                            jnp.asarray(images_np), jnp.asarray(widths_np),
                        )
                inflight.append((b, chunk, log_probs, frame_mask, pre, valid))

        # Phase 2: host finalize in dispatch order.
        for b, chunk, log_probs, frame_mask, pre, valid in inflight:
            if self.config.decoder == "beam":
                hyps = beam_decode(
                    log_probs, frame_mask, self.alphabet, self.config.beam,
                    lm=self._lm, valid=valid,
                )
            else:
                frames = np.asarray(pre)
                hyps = [
                    collapse_frames(frames[i], self.alphabet)
                    for i in range(len(chunk))
                ]
            self._resolve(b, chunk, hyps)
            with self._stats_lock:
                self.stats["lines"] += len(chunk)
                self.stats["batches"] += 1
                self.stats["pad_waste"] += self.config.max_batch - len(chunk)
        return [p.future.result() for p in pendings]

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)

    # ---- internals ----------------------------------------------------------
    def _warmup(self):
        """Compile every bucket graph up front so first requests aren't
        paying compile latency — the WHOLE path including the decoder's
        device graphs (greedy collapse / beam top-k), which otherwise
        compile inside the first real request per bucket."""
        for i, bw in enumerate(self.contract.bucket_widths):
            spec = BucketSpec.of(self.contract, i)
            images = jnp.zeros(
                (self.config.max_batch, spec.height, spec.width), jnp.uint8
            )
            widths = jnp.full((self.config.max_batch,), spec.width, jnp.int32)
            # Host expansion on one sample is enough — the device graphs
            # (the compile cost) cover the full batch shape either way.
            valid = np.arange(self.config.max_batch) < 1
            if self.config.decoder == "beam":
                log_probs, frame_mask = self._eval_step(
                    self.variables["params"], self.variables["batch_stats"],
                    images, widths,
                )
                beam_decode(log_probs, frame_mask, self.alphabet,
                            self.config.beam, lm=self._lm, valid=valid)
            else:
                pre = self._eval_greedy(
                    self.variables["params"], self.variables["batch_stats"],
                    images, widths,
                )
                collapse_frames(np.asarray(pre)[0], self.alphabet)

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

    def _assemble(self, bucket_idx: int, pendings: List[_Pending]):
        """Pad a pending list into the bucket's static batch shape."""
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
        return images, widths, valid

    def _resolve(self, bucket_idx: int, pendings: List[_Pending],
                 hyps: List[str]):
        spec = BucketSpec.of(self.contract, bucket_idx)
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

    def _run_batch(self, bucket_idx: int, pendings: List[_Pending]):
        n = len(pendings)
        B = self.config.max_batch
        images, widths, valid = self._assemble(bucket_idx, pendings)

        try:
            # Only graph DISPATCH needs the device lock (execution is
            # stream-ordered); decode — host-heavy for beam — runs outside
            # so it never serializes other buckets' device work.
            if self.config.decoder == "beam":
                with self._lock:
                    log_probs, frame_mask = self._eval_step(
                        self.variables["params"],
                        self.variables["batch_stats"],
                        jnp.asarray(images), jnp.asarray(widths),
                    )
                hyps = beam_decode(
                    log_probs, frame_mask, self.alphabet,
                    self.config.beam, lm=self._lm, valid=valid,
                )
            else:
                with self._lock:
                    pre = self._eval_greedy(
                        self.variables["params"],
                        self.variables["batch_stats"],
                        jnp.asarray(images), jnp.asarray(widths),
                    )
                frames = np.asarray(pre)
                hyps = [
                    collapse_frames(frames[i], self.alphabet)
                    for i in range(n)
                ]
        except Exception as e:  # resolve futures with the error, don't hang
            for p in pendings:
                p.future.set_exception(e)
            return

        self._resolve(bucket_idx, pendings, hyps)
        with self._stats_lock:
            self.stats["lines"] += n
            self.stats["batches"] += 1
            self.stats["pad_waste"] += B - n
