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
from collections import deque
from concurrent.futures import Future
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_model
from ..data.buckets import BucketSpec, ShapeContract
from ..data.transforms import maybe_invert, normalize_line, to_grayscale
from ..decode import BeamConfig, beam_decode, greedy_decode, load_lm
from ..decode.device_beam import beam_scan_collapsed, device_beam_decode
from ..decode.greedy import SCORE_SCALE, greedy_frames_packed
from ..ops.resize import MAX_SCALE, host_pool, resize_lines, resized_to_uint8
from ..text import uxxxx_to_utf8
from ..train import make_eval_step


@dataclasses.dataclass
class ServiceConfig:
    max_batch: int = 32
    max_wait_ms: float = 5.0
    decoder: str = "greedy"  # greedy | beam
    beam: BeamConfig = dataclasses.field(default_factory=BeamConfig)
    # "device" runs the vectorized beam search INSIDE the fused per-bucket
    # graph (decode/device_beam.py; the whole batch decodes in parallel on
    # the TPU, host does an O(T) backtrace + optional two-pass LM
    # rescoring). "host" is the single-line C++/Python oracle expansion —
    # interleaved LM fusion, but bound by the one host core (measured 150
    # vs 1132 greedy lines/s/chip in round 2).
    beam_impl: str = "device"  # device | host
    # Batches a bucket worker keeps in flight on the device before it
    # blocks on the oldest one's readback. Depth 1 = round-trip-bound
    # (measured 455 lines/s at max_batch=32: 32 lines per ~70 ms relay
    # round trip); depth 2+ hides each batch's D2H behind the next
    # batch's host assembly + dispatch. Latency cap ≈ depth batch-times.
    pipeline_depth: int = 2
    # Compiled batch sizes per bucket. A partial flush (deadline hit with
    # n < max_batch lines) runs the SMALLEST compiled size >= n instead of
    # the full max_batch graph — at max_batch=128 an 8-line flush
    # otherwise burns 16x its compute on pad slots (measured 104 lines/s
    # under an 8-client flood). () derives a x4 ladder: 8, 32, 128, ...
    # capped at max_batch. Every size is a separate compiled graph per
    # bucket (warmed up front; the persistent compile cache makes that a
    # one-time cost per machine).
    batch_sizes: Sequence[int] = ()
    # Data-parallel serving: shard every batch's leading axis over a
    # ('data',) mesh of local devices — per-bucket graphs compile once
    # with GSPMD shardings and each chip runs batch/n lines (ICI
    # collectives only; there are none in the forward, so scaling is
    # embarrassingly parallel). 0/1 = single-device serving (default);
    # -1 = all local devices; n = first n. The greedy and device-beam
    # graphs shard; the host-beam oracle path stays single-device.
    mesh_data: int = 0
    lm_path: Optional[str] = None
    # Interleaved ON-DEVICE LM fusion for the device beam: when the ARPA
    # LM's order is <= 3, densify it (decode/lm.dense_logp_table) and fuse
    # scoring INSIDE the search — exact oracle math, no two-pass rescoring
    # host work, and only the winning beam's packed row leaves the device
    # (vs [B, W, T] finals for rescoring). False, or order > 3, keeps the
    # two-pass path.
    device_lm: bool = True
    # Lexicon-constrained serving: a word list (one per line, utf8)
    # restricts hypotheses to concatenations of lexicon words. With the
    # device beam the trie runs INSIDE the search (Lexicon.dense_tables);
    # with beam_impl="host" the Python expansion applies it.
    lexicon_path: Optional[str] = None
    # Word-level ARPA LM fused at word boundaries (weights in
    # beam.word_lm_alpha/word_lm_beta). Device impl needs lexicon_path
    # and a bigram (the dense [Vw+1, Vw] table); host impl takes any
    # order. The full Kaldi-era L∘G stack.
    word_lm_path: Optional[str] = None
    # On-device deskew (ops/deskew.py): estimate + correct line skew
    # INSIDE the per-bucket graph (projection-profile fan, vertical-shear
    # correction) — completing the north-star preprocess chain on
    # device. Off by default, like prep-time deskew (do_deskew) on the
    # host path.
    device_deskew: bool = False
    # On-device height normalization (ops/resize.py): requests at
    # non-contract heights are resized INSIDE the per-bucket graph; the
    # host does only grayscale/polarity (and integer pre-pooling for
    # lines taller than MAX_SCALE x the contract height — rare). The
    # north-star preprocess chain (grayscale -> polarity, height-norm,
    # pad, normalize) then runs entirely in the jitted graph. False =
    # PIL resize on the host per request (round-2 behavior).
    device_resize: bool = True
    # int8 serving (models/quant.py): replace the conv feature extractor
    # in EVERY per-bucket graph with the snapshot's shipped quantized
    # stack (BN folded into per-channel int8 weights, frozen activation
    # scales; fenced 1.29x conv fwd on v5e — the eval step is ~75% conv).
    # Requires qstack.msgpack in the snapshot dir (write it once with
    # ``python -m vistaocr_tpu.models.quant``): serving never calibrates,
    # so the self-describing-snapshot invariant holds and results are
    # deterministic across service restarts. bridge/BLSTM/head keep the
    # model dtype; logits stay f32. "none" | "int8".
    quantize: str = "none"
    # Mixed-precision int8: keep the first N convs in float (folded
    # kernels) and quantize the rest. The activation round/clip is most
    # expensive at full resolution where the MXU int8 win is smallest,
    # so a float stage-0 prefix can beat all-int8 at service batch
    # shapes (see models/quant.quantized_conv_features). 0 = all int8.
    quantize_float_prefix: int = 0
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
    # Per-frame geometric-mean probability of the decode, in (0, 1]:
    # exp(best-path (greedy) or winning-beam CTC (device beam) log-prob /
    # valid frames). None on the host-beam oracle path (the C++ engine
    # reports hypotheses only). Costs no extra device->host fetch: greedy
    # packs the score into its int32 wire row, beam reads the totals it
    # already downloads.
    confidence: Optional[float] = None

    @property
    def logical_text(self) -> str:
        """Reading-order text. Models trained on RTL corpora emit
        scan-order (display-order) transcripts (text/bidi.py, round 5);
        this converts back for human-facing use. LTR output passes
        through unchanged, so it is always safe to read."""
        from ..text.bidi import display_order

        return display_order(self.text)


@dataclasses.dataclass
class _Pending:
    image: np.ndarray  # [H, W] uint8 grayscale: contract-height, or a raw
    #                    crop when ``raw`` (device-resize path)
    width: int  # normalized width (the routing key; = image width if !raw)
    future: Future
    t_submit: float
    raw: bool = False


# Raw-buffer slack columns beyond bucket_width * MAX_SCALE: width rounding
# (new_w = round(w*H/h)) can leave the raw width up to MAX_SCALE/2 px past
# the nominal bound.
_RAW_SLACK = 8


class OcrService:
    """In-process batched OCR service over a self-describing snapshot."""

    def __init__(self, snapshot: str, config: ServiceConfig = ServiceConfig()):
        from ..runtime import enable_compile_cache

        enable_compile_cache()
        _t_init = time.time()
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
        # Data-parallel serving mesh (see ServiceConfig.mesh_data).
        self._mesh = None
        self._nshard = 1
        if config.mesh_data not in (0, 1):
            from ..parallel.mesh import MeshConfig, make_mesh

            self._mesh = make_mesh(MeshConfig(data=config.mesh_data,
                                              model=1))
            self._nshard = self._mesh.shape["data"]
        # Snapshots deserialize to HOST numpy arrays; pin them on device
        # once, or every request re-uploads all weights (measured: 6x the
        # whole service pass on the relay-attached chip).
        if self._mesh is not None:
            from ..parallel.mesh import replicated

            self.variables = jax.device_put(
                self.variables, replicated(self._mesh)
            )
        else:
            self.variables = jax.device_put(self.variables)
        # int8 serving: the snapshot must ship its qstack (no calibration
        # data exists at serve time; see ServiceConfig.quantize).
        self._qstack = None
        if config.quantize == "int8":
            from ..models.quant import load_qstack

            qs = load_qstack(snapshot)
            if qs is None:
                raise ValueError(
                    "quantize='int8' needs qstack.msgpack in the snapshot "
                    "dir; create it once with `python -m "
                    "vistaocr_tpu.models.quant --snapshot ... --data ...`"
                )
            if config.quantize_float_prefix and "fkernels" not in qs:
                raise ValueError(
                    "quantize_float_prefix needs a qstack with folded "
                    "float kernels — re-create qstack.msgpack (pre-"
                    "round-5 artifacts lack 'fkernels')"
                )
            if self._mesh is not None:
                from ..parallel.mesh import replicated

                self._qstack = jax.device_put(qs, replicated(self._mesh))
            else:
                self._qstack = jax.device_put(qs)
        elif config.quantize != "none":
            raise ValueError(f"unknown quantize mode {config.quantize!r}")
        if self._qstack is None:
            self._eval_step = make_eval_step(self.model)
        else:
            from ..models.quant import make_quantized_eval_step

            self._eval_step = make_quantized_eval_step(
                self.model, self._qstack,
                float_prefix=config.quantize_float_prefix)
        # Greedy path runs as ONE device program (forward + collapse):
        # on relay-attached TPUs every program call pays a fixed round-trip
        # ack, so fusing halves the per-batch fixed cost.
        model = self.model

        # Under a serving mesh, jit each graph with GSPMD shardings:
        # params replicated, every batch array split on its leading axis.
        if self._mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            rep, bsh = replicated(self._mesh), batch_sharding(self._mesh)

            def _jit(fn, n_batch_args):
                return jax.jit(
                    fn,
                    in_shardings=(rep, rep) + (bsh,) * n_batch_args,
                    out_shardings=bsh,
                )
        else:
            def _jit(fn, n_batch_args):
                return jax.jit(fn)

        def _maybe_deskew(images, widths):
            if not self.config.device_deskew:
                return images
            from ..ops.deskew import device_deskew

            return device_deskew(images, widths)[0]

        qstack = self._qstack

        def _forward(params, batch_stats, images, widths):
            """Model forward for one assembled batch: the float model, or
            the int8 conv stack + float bridge/BLSTM/head (batch_stats is
            already folded into the int8 kernels)."""
            if qstack is None:
                return model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images, widths, train=False,
                )
            from ..models.quant import (
                quantized_conv_features,
                sequence_head_apply,
            )

            feats = quantized_conv_features(
                qstack, images, widths, model.config,
                float_prefix=self.config.quantize_float_prefix)
            return sequence_head_apply(model.config, params, feats, widths)

        def _fused(params, batch_stats, images, widths):
            lp, fm = _forward(
                params, batch_stats, _maybe_deskew(images, widths), widths)
            return greedy_frames_packed(lp, fm)

        self._eval_greedy = _jit(_fused, 2)
        # Beam path, same shape: ONE device program per batch running
        # preprocess + model + the vectorized beam search + backtrace
        # (BASELINE.json config #5's "fused preprocess + model + beam
        # decode"). Without an LM only the winning beam's [B, T] token
        # rows leave the device — the relay D2H round trip on the full
        # [T, B, W] trellis measured 69% of the beam service time.
        bc = config.beam
        want_lm = bool(config.lm_path) and bc.lm_alpha != 0.0
        # lexicon constraint: trie for the host path, dense tables for
        # the device search
        self._lexicon = None
        self._lex_kw = {}
        if config.lexicon_path and config.decoder != "beam":
            raise ValueError(
                "lexicon_path needs decoder='beam' (the constraint lives "
                "in the beam search)"
            )
        if config.word_lm_path and config.decoder != "beam":
            raise ValueError(
                "word_lm_path needs decoder='beam' (word-LM fusion lives "
                "in the beam search)"
            )

        # Decode tables must live where the graph runs: replicated over
        # the serving mesh when one is active (a bare device_put commits
        # to one device and breaks GSPMD composition; ADVICE r3 low).
        def _put_table(x):
            if self._mesh is not None:
                from ..parallel.mesh import replicated

                return jax.device_put(x, replicated(self._mesh))
            return jax.device_put(x)

        _t_tables = time.time()
        use_unk = (config.lexicon_path is not None
                   and getattr(config.beam, "lex_unk_logp", 0.0) != 0.0)
        if config.lexicon_path and config.decoder == "beam":
            from ..decode.lexicon import Lexicon

            self._lexicon = Lexicon.read_words(
                self.alphabet, config.lexicon_path)
            if config.beam_impl == "device":
                next_tbl, boundary = self._lexicon.dense_tables(
                    unk=use_unk)
                self._lex_kw = dict(
                    lex_next=_put_table(next_tbl),
                    lex_boundary=_put_table(boundary),
                )
                if use_unk:
                    self._lex_kw.update(
                        lex_unk_logp=float(config.beam.lex_unk_logp),
                        space_id=self._lexicon.space_id,
                    )
        self._word_lm = None
        if config.word_lm_path and config.decoder == "beam":
            from ..decode.lm import (
                ArpaLM,
                device_word_tables,
                word_unk_logp,
            )

            self._word_lm = ArpaLM.read_arpa(config.word_lm_path)
            if config.beam_impl == "device":
                if self._lexicon is None or self._word_lm.order > 3:
                    raise ValueError(
                        "device word fusion needs lexicon_path and a "
                        "word LM of order <= 3; use beam_impl='host' "
                        "otherwise"
                    )
                # dense [V+1, V] table up to 8k words, hashed Katz form
                # beyond, hashed trigram tables for an order-3 G (exact
                # in every shape; decode/lm.device_word_tables)
                wt = device_word_tables(self._word_lm, self._lexicon.words)
                self._lex_kw.update(
                    {k: (v if isinstance(v, int) else _put_table(v))
                     for k, v in wt.items()},
                    word_ids=_put_table(
                        self._lexicon.word_id_table(unk=use_unk)),
                    space_id=self._lexicon.space_id,
                    word_alpha=float(config.beam.word_lm_alpha),
                    word_beta=float(config.beam.word_lm_beta),
                )
                if use_unk:
                    self._lex_kw["word_unk_logp"] = float(
                        word_unk_logp(self._word_lm))
        # densify an order-<=3 LM (or hash an order-4 one) for
        # interleaved on-device fusion
        self._lm_table = None
        self._lm_hash_kw = {}
        if want_lm and config.device_lm and config.beam_impl == "device":
            from ..decode.lm import (
                ArpaLM,
                dense_logp_table,
                hashed_logp_table,
            )

            py_lm = ArpaLM.read_arpa(config.lm_path)
            if 2 <= py_lm.order <= 3:
                self._lm_table = _put_table(
                    np.asarray(dense_logp_table(py_lm, self.alphabet)))
            elif py_lm.order == 4:
                tabs = hashed_logp_table(py_lm, self.alphabet)
                self._lm_table = _put_table(np.asarray(tabs["t3"]))
                self._lm_hash_kw = dict(
                    lm_hash_keys=_put_table(tabs["keys"]),
                    lm_hash_vals=_put_table(tabs["vals"]),
                    lm_rows=_put_table(tabs["rows"]),
                    lm_probes=int(tabs["probes"]),
                )
        _tables_s = time.time() - _t_tables
        self._beam_all = want_lm and self._lm_table is None
        if self._lex_kw and want_lm and self._lm_table is None:
            raise ValueError(
                "device lexicon serving with an LM needs order <= 4 "
                "(fused); use beam_impl='host' for higher orders"
            )

        def _beam_tail(lp, fm):
            """Device beam search after a forward pass. In the fused
            LM/lexicon mode only the packed [B, T+1] winner row is
            returned — the totals never reach the host, so the relay's
            fixed ~75 ms per-array D2H cost is paid once, not twice."""
            if self._lm_table is not None or self._lex_kw:
                kw = dict(self._lex_kw)
                if self._lm_table is not None:
                    kw.update(lm_table=self._lm_table,
                              lm_alpha=float(bc.lm_alpha),
                              lm_beta=float(bc.lm_beta),
                              **self._lm_hash_kw)
                _, packed = beam_scan_collapsed(
                    lp, fm, beam_width=bc.beam_width, topk=bc.topk,
                    prune_logp=float(bc.prune_logp), **kw,
                )
                return packed
            return beam_scan_collapsed(
                lp, fm, beam_width=bc.beam_width, topk=bc.topk,
                prune_logp=float(bc.prune_logp), all_beams=self._beam_all,
            )

        def _fused_beam(params, batch_stats, images, widths):
            lp, fm = _forward(
                params, batch_stats, _maybe_deskew(images, widths), widths)
            return _beam_tail(lp, fm)

        self._eval_beam = _jit(_fused_beam, 2)

        # Raw-input variants: on-device height normalization fused in
        # front of the model (requests at non-contract heights). Per-bucket
        # raw buffer is [B, MAX_SCALE*H, MAX_SCALE*bucket_w + _RAW_SLACK];
        # the out-width is recovered from the static buffer shape.
        H = self.contract.height

        def _forward_raw(params, batch_stats, raw, heights, widths,
                         new_widths):
            out_w = (raw.shape[2] - _RAW_SLACK) // MAX_SCALE
            img = resized_to_uint8(resize_lines(
                raw, heights, widths, new_widths, out_h=H, out_w=out_w,
            ))
            return _forward(
                params, batch_stats, _maybe_deskew(img, new_widths),
                new_widths)

        def _raw_greedy(params, batch_stats, raw, heights, widths,
                        new_widths):
            lp, fm = _forward_raw(params, batch_stats, raw, heights, widths,
                                  new_widths)
            return greedy_frames_packed(lp, fm)

        def _raw_beam(params, batch_stats, raw, heights, widths, new_widths):
            lp, fm = _forward_raw(params, batch_stats, raw, heights, widths,
                                  new_widths)
            return _beam_tail(lp, fm)

        self._eval_raw = _jit(_forward_raw, 4)
        self._eval_raw_greedy = _jit(_raw_greedy, 4)
        self._eval_raw_beam = _jit(_raw_beam, 4)
        # load_lm serves both host engines: C++ fuses NativeLM with the
        # lexicon via dense tables; the Python fallback gets an ArpaLM
        self._lm = (
            load_lm(config.lm_path, self.alphabet)
            if config.lm_path else None
        )
        # uxxxx -> utf8 via a per-alphabet table: re-parsing each hex token
        # per line measured ~45% of the host finalize cost.
        self._char_of = {
            t: uxxxx_to_utf8(t) for t in self.alphabet.tokens
        }
        # id-indexed tables (0 = blank = empty): the greedy finalize builds
        # text/uxxxx straight from the device's id rows (ids.tolist() +
        # two list-comprehension joins), skipping the decode -> " ".join
        # -> .split() -> dict-lookup chain (measured 12.1 -> 4.2 ms per
        # 512 lines host-side).
        self._tok_list = [""] + self.alphabet.tokens
        self._chr_list = [""] + [
            self._char_of[t] for t in self.alphabet.tokens
        ]
        if config.batch_sizes:
            sizes = sorted({min(int(s), config.max_batch)
                            for s in config.batch_sizes})
        else:
            sizes, s = [], 8
            while s < config.max_batch:
                sizes.append(s)
                s *= 4
            sizes.append(config.max_batch)
        # every compiled size must divide over the serving mesh
        ns = self._nshard
        self._batch_sizes = tuple(sorted({-(-s // ns) * ns for s in sizes}))
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
        _t_warm = time.time()
        if config.warmup:
            self._warmup()
        # Init-cost breakdown (ledger evidence: the big-lexicon service's
        # startup is warmup compiles/dispatches, NOT host table building
        # — a 50k-word trie + hashed Katz tables build in <1 s on host).
        self.init_timings = {
            "load_s": round(_t_tables - _t_init, 3),
            "tables_s": round(_tables_s, 3),
            "warmup_s": round(time.time() - _t_warm, 3),
            "warmup_graphs": (len(self.contract.bucket_widths)
                              * len(self._batch_sizes)),
        }

    # ---- client API ---------------------------------------------------------
    def _prep(self, image) -> _Pending:
        """Host-side request prep. With device_resize, only grayscale +
        polarity (+ rare integer pre-pooling) happen here; the geometric
        resize runs on device inside the bucket graph."""
        H = self.contract.height
        max_w = self.contract.bucket_widths[-1]
        if not self.config.device_resize:
            norm = normalize_line(image, H, max_width=max_w)
            return _Pending(norm, norm.shape[1], Future(), time.time())
        arr = maybe_invert(to_grayscale(image))
        h, w = arr.shape
        cap = MAX_SCALE * H
        if h > cap:
            arr = host_pool(arr, cap)
            h, w = arr.shape
        if h == H and w <= max_w:
            return _Pending(arr, w, Future(), time.time())
        # normalized width: the parity-pinned host formula (round half to
        # even, as data/transforms.height_normalize)
        new_w = min(max(1, round(w * H / h)), max_w)
        return _Pending(arr, new_w, Future(), time.time(), raw=True)

    def submit(self, image) -> Future:
        """image: [H,W]/[H,W,C] uint8 array or PIL image, any height.
        Returns a Future[LineResult]."""
        p = self._prep(image)
        b = self.contract.bucket_for_width(p.width)
        self._queues[b].put(p)
        return p.future

    def ocr_lines(self, images: Sequence) -> List[LineResult]:
        """Bulk OCR: route everything up front, dispatch every batch's
        device graphs back-to-back (dispatch is async, so H2D/compute/D2H
        pipeline over the interconnect), then finalize host-side.

        This bypasses the online queues on purpose: dripping a large job
        through submit() fragments batches at the max_wait_ms deadline and
        serializes on per-batch round-trip latency (measured 9.8s for 512
        lines vs ~1s on this path). submit() remains the latency-shaped
        online entry."""
        pendings = []
        buckets: dict = {}  # (bucket_idx, raw) -> [pendings]
        for img in images:
            p = self._prep(img)
            pendings.append(p)
            b = self.contract.bucket_for_width(p.width)
            buckets.setdefault((b, p.raw), []).append(p)

        # Phase 1: dispatch all device work — one fused program per batch
        # (forward + greedy collapse, or forward + device beam search;
        # raw batches additionally resize on device).
        inflight = []
        for (b, raw), plist in buckets.items():
            for k in range(0, len(plist), self.config.max_batch):
                chunk = plist[k : k + self.config.max_batch]
                assembled = self._assemble_chunk(b, chunk, raw)
                with self._lock:
                    handle = self._dispatch_assembled(assembled, raw)
                inflight.append((b, chunk, handle, assembled[0].shape[0]))

        # Phase 2: start EVERY batch's device->host copy before touching
        # any result: np.asarray on this relay pays a ~75 ms round trip
        # per array, and serializing it per batch was the dominant greedy
        # service cost (7 batches = ~525 ms of pure latency). Async copies
        # overlap to ~one round trip total.
        for _, _, handle, _ in inflight:
            self._prefetch_handle(handle)
        for b, chunk, handle, B in inflight:
            n = len(chunk)
            valid = np.arange(B) < n
            hyps = self._finalize(handle, valid, n)
            self._resolve(b, chunk, hyps)
            with self._stats_lock:
                self.stats["lines"] += n
                self.stats["batches"] += 1
                self.stats["pad_waste"] += B - n
        return [p.future.result() for p in pendings]

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)

    # ---- internals ----------------------------------------------------------
    def _dispatch(self, images_np, widths_np):
        """Device-side work for one assembled contract-height batch (call
        under the dispatch lock). Returns an opaque handle for
        ``_finalize``."""
        if self._mesh is not None:
            # numpy straight into the sharded jit: GSPMD splits the H2D
            # across the mesh; a jnp.asarray here would commit to one
            # device and force a resharding copy.
            imgs, wids = images_np, widths_np
        else:
            imgs, wids = jnp.asarray(images_np), jnp.asarray(widths_np)
        args = (
            self.variables["params"], self.variables["batch_stats"],
            imgs, wids,
        )
        if self.config.decoder == "beam":
            if self.config.beam_impl == "device":
                kind = ("beam_fused"
                        if self._lm_table is not None or self._lex_kw
                        else "beam_dev")
                return (kind, self._eval_beam(*args))
            return ("beam_host", self._eval_step(*args))
        return ("greedy", self._eval_greedy(*args))

    def _dispatch_raw(self, raw, heights, widths, new_widths):
        """Device-side work for a raw batch: on-device resize fused in
        front of the model (call under the dispatch lock)."""
        if self._mesh is not None:
            batch_args = (raw, heights, widths, new_widths)
        else:
            batch_args = (jnp.asarray(raw), jnp.asarray(heights),
                          jnp.asarray(widths), jnp.asarray(new_widths))
        args = (
            self.variables["params"], self.variables["batch_stats"],
            *batch_args,
        )
        if self.config.decoder == "beam":
            if self.config.beam_impl == "device":
                kind = ("beam_fused"
                        if self._lm_table is not None or self._lex_kw
                        else "beam_dev")
                return (kind, self._eval_raw_beam(*args))
            return ("beam_host", self._eval_raw(*args))
        return ("greedy", self._eval_raw_greedy(*args))

    def _assemble_chunk(self, bucket_idx: int, chunk: List[_Pending],
                        raw: bool):
        if raw:
            return self._assemble_raw(bucket_idx, chunk)
        images, widths, _ = self._assemble(bucket_idx, chunk)
        return images, widths

    def _dispatch_assembled(self, assembled, raw: bool):
        return (self._dispatch_raw(*assembled) if raw
                else self._dispatch(*assembled))

    @staticmethod
    def _prefetch_handle(handle):
        """Kick off async device->host copies for a dispatched batch's
        result arrays (jax Array.copy_to_host_async)."""
        _, data = handle
        for a in data if isinstance(data, tuple) else (data,):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def _finalize(self, handle, valid, n):
        """Host-side decode of a dispatched batch -> n uxxxx hypotheses."""
        kind, data = handle
        if kind == "beam_fused":
            # packed [B, T+1] — winner selected by the FUSED score on
            # device; same wire as greedy, same finalize (the totals
            # array never leaves the device)
            kind = "greedy"
        if kind == "greedy":
            packed = np.asarray(data)  # [B, T+1]: id rows + score column
            # raw id rows; _resolve maps ids -> text/uxxxx via the
            # id-indexed tables (measurably cheaper than building and
            # re-splitting uxxxx strings here)
            return [
                (row[:-1][row[:-1] != 0], row[-1] / SCORE_SCALE)
                for row in packed[:n]
            ]
        if kind == "beam_dev":
            return device_beam_decode(
                None, None, self.alphabet, self.config.beam,
                lm=self._lm, valid=valid, precomputed=data,
                return_scores=True,
            )
        log_probs, frame_mask = data
        return beam_decode(
            log_probs, frame_mask, self.alphabet, self.config.beam,
            lm=self._lm, valid=valid, lexicon=self._lexicon,
            word_lm=self._word_lm,
        )

    def _warmup(self):
        """Compile every bucket graph up front so first requests aren't
        paying compile latency — the WHOLE path including the decoder's
        device graphs (greedy collapse / device beam scan / beam top-k),
        which otherwise compile inside the first real request per bucket.

        The per-(bucket, rung) graphs warm from a thread pool: the
        per-graph wall time is compile/cache-load wait on the relay's
        far side, not client CPU, so overlapping them wins big —
        measured on the 50,127-word L∘G service (24 graphs, single
        v5e, warm persistent cache): 291 s serial → 46 s with 6
        threads (6.3x). jit first-call compilation is thread-safe;
        executions serialize on the backend as usual."""
        jobs = [(i, B) for i in range(len(self.contract.bucket_widths))
                for B in self._batch_sizes]

        def _warm_one(job):
            i, B = job
            spec = BucketSpec.of(self.contract, i)
            images = np.zeros((B, spec.height, spec.width), np.uint8)
            widths = np.full((B,), spec.width, np.int32)
            # Host finalize on one sample is enough — the device
            # graphs (the compile cost) cover the batch shape anyway.
            valid = np.arange(B) < 1
            self._finalize(self._dispatch(images, widths), valid, 1)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(6, len(jobs))) as ex:
            # list() so the first compile failure raises here, not on a
            # live request
            list(ex.map(_warm_one, jobs))

    def _bucket_loop(self, bucket_idx: int):
        """Online worker: assemble → dispatch up to ``pipeline_depth``
        batches before blocking on the oldest readback, so the relay's
        per-batch D2H round trip overlaps the next batch's host assembly
        and device compute instead of serializing the bucket. With work
        in flight the queue poll shortens to 1 ms so an idle queue drains
        results promptly (low-load latency stays ~one batch time)."""
        q = self._queues[bucket_idx]
        cfg = self.config
        depth = max(1, cfg.pipeline_depth)
        inflight: deque = deque()  # dispatched, not yet finalized
        while not self._stop.is_set():
            try:
                first = q.get(timeout=0.001 if inflight else 0.05)
            except queue.Empty:
                while inflight:
                    self._complete_batch(inflight.popleft())
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
            # contract-height and raw requests run different graphs
            norm = [p for p in batch if not p.raw]
            rawl = [p for p in batch if p.raw]
            for plist, is_raw in ((norm, False), (rawl, True)):
                if plist:
                    ctx = self._start_batch(bucket_idx, plist, raw=is_raw)
                    if ctx is not None:
                        inflight.append(ctx)
            while len(inflight) > depth:
                self._complete_batch(inflight.popleft())
        while inflight:
            self._complete_batch(inflight.popleft())

    def _bsize_for(self, n: int) -> int:
        """Smallest compiled batch size that fits n lines."""
        for s in self._batch_sizes:
            if s >= n:
                return s
        return self._batch_sizes[-1]

    def _assemble(self, bucket_idx: int, pendings: List[_Pending]):
        """Pad a pending list into the smallest compiled batch shape."""
        spec = BucketSpec.of(self.contract, bucket_idx)
        n = len(pendings)
        B = self._bsize_for(n)
        images = np.full((B, spec.height, spec.width), 255, np.uint8)
        widths = np.zeros((B,), np.int32)
        for i, p in enumerate(pendings):
            images[i, :, : p.width] = p.image
            widths[i] = p.width
        widths[n:] = spec.width  # pad slots: full-width dummies
        valid = np.arange(B) < n
        return images, widths, valid

    def _assemble_raw(self, bucket_idx: int, pendings: List[_Pending]):
        """Pad raw crops into the bucket's static RAW batch shape
        [B, MAX_SCALE*H, MAX_SCALE*bucket_w + _RAW_SLACK] + per-sample
        (height, raw width, normalized width)."""
        spec = BucketSpec.of(self.contract, bucket_idx)
        B = self._bsize_for(len(pendings))
        cap = MAX_SCALE * spec.height
        wraw = MAX_SCALE * spec.width + _RAW_SLACK
        raw = np.full((B, cap, wraw), 255, np.uint8)
        heights = np.full((B,), spec.height, np.int32)
        widths = np.full((B,), spec.width, np.int32)
        new_widths = np.full((B,), spec.width, np.int32)
        for i, p in enumerate(pendings):
            h, w = p.image.shape
            w = min(w, wraw)
            raw[i, :h, :w] = p.image[:, :w]
            heights[i] = h
            widths[i] = w
            new_widths[i] = p.width
        return raw, heights, widths, new_widths

    def _resolve(self, bucket_idx: int, pendings: List[_Pending],
                 hyps: List[str]):
        spec = BucketSpec.of(self.contract, bucket_idx)
        now = time.time()
        char_of = self._char_of
        for p, hyp in zip(pendings, hyps):
            conf = None
            if isinstance(hyp, tuple):  # (payload, log-prob) scored paths
                hyp, logp = hyp
                # normalize by the line's frame count — deterministic from
                # its routed width, so the device never ships it
                frames = self.contract.frames_for_width(p.width)
                conf = float(np.exp(min(logp / max(frames, 1), 0.0)))
            if isinstance(hyp, np.ndarray):  # greedy: raw id row
                ids = hyp.tolist()
                text = "".join([self._chr_list[j] for j in ids])
                hyp = " ".join([self._tok_list[j] for j in ids])
            else:
                try:
                    text = "".join(char_of[t] for t in hyp.split())
                except KeyError:  # token outside the alphabet table
                    text = uxxxx_to_utf8(hyp)
            p.future.set_result(
                LineResult(
                    text=text,
                    uxxxx=hyp,
                    latency_ms=(now - p.t_submit) * 1000.0,
                    bucket_width=spec.width,
                    confidence=conf,
                )
            )

    def _start_batch(self, bucket_idx: int, pendings: List[_Pending],
                     raw: bool = False):
        """Assemble + dispatch one batch (device work starts now) and kick
        off its async D2H copy. Returns a context for ``_complete_batch``,
        or None if dispatch failed (futures already resolved with the
        error). Only graph DISPATCH holds the device lock (execution is
        stream-ordered); host assembly runs outside so it never
        serializes other buckets' device work."""
        n = len(pendings)
        try:
            assembled = self._assemble_chunk(bucket_idx, pendings, raw)
            valid = np.arange(assembled[0].shape[0]) < n
            with self._lock:
                handle = self._dispatch_assembled(assembled, raw)
            self._prefetch_handle(handle)
        except Exception as e:  # resolve futures with the error, don't hang
            for p in pendings:
                p.future.set_exception(e)
            return None
        return (bucket_idx, pendings, handle, valid, n)

    def _complete_batch(self, ctx) -> None:
        """Finalize a dispatched batch (blocks on its readback) and
        resolve its futures."""
        bucket_idx, pendings, handle, valid, n = ctx
        try:
            hyps = self._finalize(handle, valid, n)
        except Exception as e:
            for p in pendings:
                p.future.set_exception(e)
            return
        self._resolve(bucket_idx, pendings, hyps)
        with self._stats_lock:
            self.stats["lines"] += n
            self.stats["batches"] += 1
            self.stats["pad_waste"] += len(valid) - n
