"""Vectorized ON-DEVICE CTC prefix beam search — the batched-service half
of component C14 (SURVEY.md §2 C14 rebuild column: "vectorized on-device
beam pruning for the batched service"; BASELINE.json config #5: fused
preprocess + model + beam decode).

The host prefix beam (decode/beam.py + the C++ twin) expands beams one
line at a time on the single host core — measured 150 lines/s/chip in
the round-2 service bench vs 1132 greedy. Here the ENTIRE search runs as
one ``lax.scan`` over frames on ``[B, W]``-shaped beam state, so every
line in the batch decodes in parallel on the TPU and the host does only
an O(T) numpy backtrace per line.

Algorithm (same math as decode/beam.prefix_beam_search, vectorized):

- beam state per line = W slots of (prefix-hash pair, last token,
  log P(ends-in-blank), log P(ends-in-non-blank));
- per frame, each slot emits 1 "stay" candidate (blank extension + the
  same-symbol repeat mass) and k "extend" candidates (the frame's
  device top-k symbols, pruned by ``prune_logp`` against the frame
  best) — a [B, W*(k+1)] candidate pool;
- candidates with EQUAL PREFIXES must merge (log-sum-exp) exactly as the
  oracle's dict merge does. Two structural facts make this cheap: beam
  slots hold DISTINCT prefixes (the merge invariant), so (1) two stay
  candidates never merge, and (2) two extend candidates never merge
  either — equal-length distinct prefixes stay distinct under extension,
  and different-length extensions have different lengths. The only merge
  is extend(p, c) onto a beam already holding p+c: a [W*k, W] hash-pair
  comparison (at most one match per side), folded with log-add-exp — no
  sort, no segment ops. Prefix identity is a pair of independent 32-bit
  rolling hashes (collision odds ~1e-15 per frame);
- ``top_k`` by total probability keeps W slots; the per-frame
  (parent slot, emitted token) pair is recorded so the host can
  reconstruct prefixes by backtracking — the device never materializes
  variable-length prefixes.

Hash-collision risk: two 32-bit hashes over a ≤200-candidate pool give a
per-frame false-merge probability of ~200²/2⁶⁴ ≈ 2e-15 — irrelevant.

LM fusion, two ways:

- **Interleaved ON-DEVICE (order <= 3)**: the ARPA LM is densified into
  a [K+1, (K+1,)? K] log-prob table (decode/lm.dense_logp_table) and
  scored INSIDE the search — each slot carries its last two emitted
  class ids as context and a running alpha*lm_logp + beta*len bonus;
  ranking/pruning uses the fused score exactly as the host oracle does
  (tests/test_device_beam.py::TestFusedDeviceLM pins string-exact
  parity). No host rescoring work, and only the winner's packed [B, T+1]
  row leaves the device.
- **Two-pass (order > 3, or opting out)**: the device beam returns the
  top-W finals per line with exact CTC scores and the host rescores
  those W prefixes (W·L queries per line instead of the interleaved
  search's T·W·k). Two-pass can in principle lose an LM-favored prefix
  that CTC alone prunes below rank W — which is why the dense path
  exists; the corpus-scale Farsi run measured the gap as CER-neutral at
  the service's beam width (docs/design.md).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..text import Alphabet
from .beam import BeamConfig

# Independent odd multipliers for the two rolling prefix hashes.
_M1 = np.uint32(1000003)
_M2 = np.uint32(2654435761)
_SEED1 = np.uint32(0x9E3779B9)
_SEED2 = np.uint32(0x85EBCA6B)


def _word_logp_gather(
    wprev, wid, *,
    word_table=None,      # dense [Vw+1, Vw] f32 (V <= DENSE_WORD_CAP)
    word_uni=None,        # hashed form: [Vw] f32 unigram logp
    word_bo=None,         # [Vw+1] f32 Katz backoff weight per context
    word_hash_keys=None,  # [S] uint32 packed (prev * Vw + word) keys
    word_hash_vals=None,  # [S] f32 exact observed-bigram logp
    word_probes=0,        # static max probe length
    wprev2=None,          # [.,.] int32 prev-prev word (Vw+1 = none)
    word_ctx_keys=None,   # [Sc] uint32 packed (prev2*(Vw+1)+prev1) keys
    word_ctx_ids=None,    # [Sc] int32 trigram context id (-1 = bo only)
    word_ctx_bo=None,     # [Sc] f32 Katz bo(prev2, prev1)
    word_ctx_probes=0,    # static probe length, context table
    word_tri_keys=None,   # [St] uint32 packed (ctx_id * Vw + word) keys
    word_tri_vals=None,   # [St] f32 exact observed-trigram logp
    word_tri_probes=0,    # static probe length, trigram table
):
    """log P(word wid | word context) for equal-shaped int32 arrays,
    from any on-device representation (decode/lm.device_word_tables):
    one gather from the dense bigram table, an open-addressed bigram
    probe with the exact Katz fallback ``bo[prev] + uni[word]``, or —
    when the ``word_ctx_*``/``word_tri_*`` tables and ``wprev2`` are
    present — the order-3 refinement ``ctx hit ? (tri hit ? tri_val :
    ctx_bo + s2) : s2`` over the bigram score s2. Every shape replays
    ``ArpaLM.logp`` exactly (a NONE/short history misses the context
    table by construction), so the 50k-word and trigram paths inherit
    the dense path's oracle parity. ``wid`` must already be clamped to
    >= 0."""
    if word_table is not None:
        Vw = word_table.shape[1]
        return jnp.take(word_table.reshape(-1), wprev * Vw + wid)
    Vw = word_uni.shape[0]
    key = (wprev.astype(jnp.uint32) * jnp.uint32(Vw)
           + wid.astype(jnp.uint32))
    S = word_hash_keys.shape[0]
    shift = 32 - (S.bit_length() - 1)
    idx = ((key * jnp.uint32(2654435761)) >> shift).astype(jnp.int32)
    val = jnp.take(word_bo, wprev) + jnp.take(word_uni, wid)
    found = jnp.zeros(key.shape, bool)
    for j in range(word_probes):
        slot = (idx + j) & (S - 1)
        kj = jnp.take(word_hash_keys, slot)
        hit = (kj == key) & ~found
        val = jnp.where(hit, jnp.take(word_hash_vals, slot), val)
        found = found | hit
    if word_ctx_keys is None or wprev2 is None:
        return val
    # trigram refinement: a valid 2-word history probes the context
    # table; the NONE sentinel (Vw + 1) is clamped for the key compute
    # but gates every hit, so short histories stay on the bigram score.
    valid2 = wprev2 <= Vw
    ckey = (jnp.minimum(wprev2, Vw).astype(jnp.uint32)
            * jnp.uint32(Vw + 1) + wprev.astype(jnp.uint32))
    Sc = word_ctx_keys.shape[0]
    cshift = 32 - (Sc.bit_length() - 1)
    cidx = ((ckey * jnp.uint32(2654435761)) >> cshift).astype(jnp.int32)
    cid = jnp.full(ckey.shape, -1, jnp.int32)
    cbo = jnp.zeros(ckey.shape, jnp.float32)
    cfound = jnp.zeros(ckey.shape, bool)
    for j in range(word_ctx_probes):
        slot = (cidx + j) & (Sc - 1)
        kj = jnp.take(word_ctx_keys, slot)
        hit = (kj == ckey) & ~cfound & valid2
        cid = jnp.where(hit, jnp.take(word_ctx_ids, slot), cid)
        cbo = jnp.where(hit, jnp.take(word_ctx_bo, slot), cbo)
        cfound = cfound | hit
    tkey = (jnp.maximum(cid, 0).astype(jnp.uint32) * jnp.uint32(Vw)
            + wid.astype(jnp.uint32))
    St = word_tri_keys.shape[0]
    tshift = 32 - (St.bit_length() - 1)
    tidx = ((tkey * jnp.uint32(2654435761)) >> tshift).astype(jnp.int32)
    tval = jnp.zeros(tkey.shape, jnp.float32)
    tfound = jnp.zeros(tkey.shape, bool)
    for j in range(word_tri_probes):
        slot = (tidx + j) & (St - 1)
        kj = jnp.take(word_tri_keys, slot)
        hit = (kj == tkey) & ~tfound & (cid >= 0)
        tval = jnp.where(hit, jnp.take(word_tri_vals, slot), tval)
        tfound = tfound | hit
    # miss everywhere: cbo = 0, tfound = False -> exactly s2
    return jnp.where(tfound, tval, cbo + val)


def beam_scan(
    log_probs: jax.Array,  # [B, T, K] f32
    frame_mask: jax.Array,  # [B, T] bool
    *,
    beam_width: int,
    topk: int,
    prune_logp: float,
    lm_table: Optional[jax.Array] = None,  # [K+1, K] or [K+1, K+1, K]
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    lm_hash_keys: Optional[jax.Array] = None,  # [S] int32 (order-4 fusion)
    lm_hash_vals: Optional[jax.Array] = None,  # [S] int32 row indices
    lm_rows: Optional[jax.Array] = None,  # [R, K] f32 context rows
    lm_probes: int = 0,  # static max probe length for the hash table
    lex_next: Optional[jax.Array] = None,  # [N, K] int32 trie transitions
    lex_unk_logp: float = 0.0,  # per-char unk-bypass penalty (0 = hard)
    word_unk_logp: float = 0.0,  # word-LM <unk> completion constant
    word_table: Optional[jax.Array] = None,  # [Vw+1, Vw] word-bigram logp
    word_uni: Optional[jax.Array] = None,  # hashed bigram: [Vw] unigrams
    word_bo: Optional[jax.Array] = None,  # [Vw+1] Katz backoff weights
    word_hash_keys: Optional[jax.Array] = None,  # [S] uint32 packed keys
    word_hash_vals: Optional[jax.Array] = None,  # [S] f32 bigram logp
    word_probes: int = 0,  # static probe length for the word hash table
    word_ctx_keys: Optional[jax.Array] = None,  # trigram G: ctx keys
    word_ctx_ids: Optional[jax.Array] = None,  # [Sc] int32 ctx id / -1
    word_ctx_bo: Optional[jax.Array] = None,  # [Sc] f32 bo(prev2, prev1)
    word_ctx_probes: int = 0,
    word_tri_keys: Optional[jax.Array] = None,  # [St] uint32 packed keys
    word_tri_vals: Optional[jax.Array] = None,  # [St] f32 trigram logp
    word_tri_probes: int = 0,
    word_ids: Optional[jax.Array] = None,  # [N] int32 word id at finals
    space_id: int = -1,
    word_alpha: float = 0.0,
    word_beta: float = 0.0,
):
    """Traceable device beam search (compose under jit with the forward
    pass). Returns (totals [B, W] f32 final log P per beam slot,
    parents [T, B, W] int32, tokens [T, B, W] int32; token 0 = none).

    With ``lm_table`` (decode/lm.dense_logp_table), the n-gram LM is
    fused INTERLEAVED, exactly as the host oracle does it: each slot
    carries its last one or two emitted class ids as LM context plus a
    running ``bonus = lm_alpha * lm_logp + lm_beta * len``; extend
    candidates gather log P(c | context) from the dense table and beams
    are ranked/pruned by the FUSED score (CTC + bonus) while (p_b, p_nb)
    stay pure CTC. Returns (totals, bonus, parents, tokens) — a 4-tuple —
    in that mode. This removes the two-pass compromise for order <= 3
    LMs (an LM-favored prefix can no longer be pruned below rank W by
    CTC alone) and the host rescoring work with it.

    With ``lex_next`` (Lexicon.dense_tables), the vocabulary constraint
    also runs on device: each slot carries its trie node, extensions
    whose transition is -1 score -inf (the space rule is folded into the
    table host-side, so the kernel stays branch-free). Returns
    (totals, extras, parents, tokens) whenever LM or lexicon is active,
    where extras is a dict with optional "bonus" [B, W] and "lex" [B, W]
    final trie nodes.

    ``word_table``/``word_ids`` (dense_word_logp_table +
    Lexicon.word_id_table; requires ``lex_next`` and ``space_id``) fuse a
    WORD-level bigram on device: a space emitted at a word-final node
    completes word ``word_ids[node]``, adds ``word_alpha * log P(word |
    prev) + word_beta`` to the slot bonus, and shifts the carried
    prev-word id — the Kaldi-era L∘G composition inside one scan. The
    trailing (un-spaced) final word is NOT scored here; the caller adds
    it at selection (beam_scan_collapsed does). extras gains "wprev"."""
    B, T, K = log_probs.shape
    W = beam_width
    k = min(topk, K - 1)
    neg = jnp.float32(-jnp.inf)
    use_lm = lm_table is not None
    use_lex = lex_next is not None
    use_wlm = word_table is not None or word_uni is not None
    # Order-4 fusion (decode/lm.hashed_logp_table): slots carry THREE
    # context ids; observed 3-token contexts resolve through the hash
    # table, everything else through the exact trigram fallback table.
    use_lm4 = lm_hash_keys is not None
    if use_lm4:
        if not use_lm or lm_table.ndim != 3:
            raise ValueError(
                "order-4 hashed fusion needs the order-3 dense table as "
                "lm_table (the fallback); pass hashed_logp_table()['t3']"
            )
        if lm_hash_vals is None or lm_rows is None or lm_probes < 1:
            raise ValueError(
                "order-4 fusion needs lm_hash_keys + lm_hash_vals + "
                "lm_rows + lm_probes >= 1"
            )
        S_hash = lm_hash_keys.shape[0]
        hash_shift = 32 - (S_hash.bit_length() - 1)
    if use_wlm:
        if not use_lex or word_ids is None or space_id < 0:
            raise ValueError(
                "device word fusion needs lex_next + word_ids + space_id"
            )
        Vw = (word_table.shape[1] if word_table is not None
              else word_uni.shape[0])
        word_kw = dict(
            word_table=word_table, word_uni=word_uni, word_bo=word_bo,
            word_hash_keys=word_hash_keys, word_hash_vals=word_hash_vals,
            word_probes=word_probes,
            word_ctx_keys=word_ctx_keys, word_ctx_ids=word_ctx_ids,
            word_ctx_bo=word_ctx_bo, word_ctx_probes=word_ctx_probes,
            word_tri_keys=word_tri_keys, word_tri_vals=word_tri_vals,
            word_tri_probes=word_tri_probes,
        )
    # Order-3 G (decode/lm.hashed_word_trigram_tables): slots also carry
    # their prev-prev word id; Vw + 1 is the NONE sentinel (sentence
    # start: the host oracle's (<s>,) length-1 history).
    use_wlm3 = use_wlm and word_ctx_keys is not None
    # Character-bypass (<unk>) escape: lex_next must carry the appended
    # unk row (Lexicon.dense_tables(unk=True)); its index is N-1.
    use_unk = use_lex and lex_unk_logp != 0.0
    if lex_unk_logp > 0.0:  # a positive value would be an OOV *bonus*
        raise ValueError(
            f"lex_unk_logp must be <= 0; got {lex_unk_logp}")
    if use_unk:
        U_NODE = lex_next.shape[0] - 1
        UNKP = jnp.float32(lex_unk_logp)
        WUNK = jnp.float32(word_unk_logp)
    if use_lex:
        lex_flat = lex_next.reshape(-1)
        NLEX_K = lex_next.shape[1]
    trigram = use_lm and lm_table.ndim == 3
    if use_lm:
        # context axis size K+1: 0 = none, K = <s>, symbols at class ids
        lm_flat = (lm_table.reshape((K + 1) * (K + 1), K) if trigram
                   else lm_table)
        alpha = jnp.float32(lm_alpha)
        beta = jnp.float32(lm_beta)

    # Per-frame symbol candidates: top-k over NON-blank classes (ids >= 1),
    # matching the oracle's candidate set; blank handled separately.
    vals, ids = jax.lax.top_k(log_probs[..., 1:], k)
    ids = (ids + 1).astype(jnp.int32)
    # time-major scan inputs
    vals_t = jnp.swapaxes(vals, 0, 1)  # [T, B, k]
    ids_t = jnp.swapaxes(ids, 0, 1)  # [T, B, k]
    pblank_t = jnp.swapaxes(log_probs[..., 0], 0, 1)  # [T, B]
    mask_t = jnp.swapaxes(frame_mask, 0, 1)  # [T, B]

    iota_w = jnp.arange(W, dtype=jnp.int32)
    # Slot 0 = empty prefix (P(blank-ending) = 1); slots 1.. inactive with
    # distinct hash pairs so they can never merge with live prefixes.
    h1_0 = jnp.broadcast_to(
        jnp.where(iota_w == 0, _SEED1, iota_w.astype(jnp.uint32)), (B, W))
    h2_0 = jnp.broadcast_to(
        jnp.where(iota_w == 0, _SEED2, iota_w.astype(jnp.uint32) + 7777),
        (B, W))
    last_0 = jnp.full((B, W), -1, jnp.int32)
    p_b0 = jnp.broadcast_to(jnp.where(iota_w == 0, 0.0, neg), (B, W))
    p_nb0 = jnp.full((B, W), neg)
    # LM context: (lmp2, lmp, lml) = class ids of the three most recent
    # emitted symbols (0 = none, K = <s>); start state is the oracle's
    # (<s>,). lmp2 rides along only when order-4 fusion is active.
    lmp2_0 = jnp.zeros((B, W), jnp.int32)
    lmp_0 = jnp.zeros((B, W), jnp.int32)
    lml_0 = jnp.full((B, W), K, jnp.int32)
    bonus_0 = jnp.zeros((B, W), jnp.float32)
    lex_0 = jnp.zeros((B, W), jnp.int32)  # trie root
    wlen_0 = jnp.zeros((B, W), jnp.int32)  # chars in current word (unk)
    wprev_0 = jnp.full((B, W), Vw if use_wlm else 0, jnp.int32)  # <s>
    wprev2_0 = jnp.full((B, W), Vw + 1 if use_wlm3 else 0, jnp.int32)

    def body(carry, inp):
        (h1, h2, last, p_b, p_nb, lmp2, lmp, lml, bonus, lex, wlen,
         wprev, wprev2) = carry
        v, i, pb, m = inp  # [B,k] [B,k] [B] [B]
        p_tot = jnp.logaddexp(p_b, p_nb)  # [B, W]
        frame_best = jnp.maximum(v[:, 0], pb)  # [B]
        allowed = v >= frame_best[:, None] + prune_logp  # [B, k]

        # stay candidates: blank extension + same-symbol repeat mass.
        stay_pb = p_tot + pb[:, None]  # blank is never pruned
        match = (i[:, None, :] == last[:, :, None]) & allowed[:, None, :]
        rep = jnp.where(match, v[:, None, :], neg).max(axis=-1)  # [B, W]
        stay_pnb = p_nb + rep

        # extend candidates [B, W, k]: prefix + c. A repeat symbol extends
        # from the blank-ending mass only (blank-separated repeat).
        c = jnp.broadcast_to(i[:, None, :], (B, W, k))
        pc = jnp.broadcast_to(v[:, None, :], (B, W, k))
        is_rep = c == last[:, :, None]
        src = jnp.where(is_rep, p_b[:, :, None], p_tot[:, :, None])
        ext_pnb = jnp.where(allowed[:, None, :], src + pc, neg)
        cu = c.astype(jnp.uint32) + 1
        ext_h1 = h1[:, :, None] * _M1 + cu
        ext_h2 = h2[:, :, None] * _M2 + cu * jnp.uint32(0x27D4EB2F)
        if use_lm:
            # log P(c | slot context) for every candidate: one row gather
            # per slot from the dense table, then pick the k candidates
            if trigram:
                rows = jnp.take(lm_flat, lmp * (K + 1) + lml, axis=0)
            else:
                rows = jnp.take(lm_flat, lml, axis=0)  # [B, W, K]
            if use_lm4:
                # one probe sequence per SLOT (contexts live on slots,
                # not candidates): packed key -> open-addressed lookup;
                # misses (incl. short histories, whose keys are never
                # stored) keep the exact trigram fallback row.
                key = (lmp2 * (K + 1) + lmp) * (K + 1) + lml  # [B, W]
                hh = key.astype(jnp.uint32) * jnp.uint32(2654435761)
                idx = (hh >> hash_shift).astype(jnp.int32)
                row = jnp.full((B, W), -1, jnp.int32)
                for j in range(lm_probes):
                    slot = (idx + j) & (S_hash - 1)
                    kj = jnp.take(lm_hash_keys, slot)
                    hit = (kj == key) & (row < 0)
                    row = jnp.where(hit, jnp.take(lm_hash_vals, slot), row)
                rows4 = jnp.take(lm_rows, jnp.maximum(row, 0), axis=0)
                rows = jnp.where((row >= 0)[:, :, None], rows4, rows)
            q = jnp.take_along_axis(rows, c, axis=2)  # [B, W, k]
            ext_bonus = bonus[:, :, None] + alpha * q + beta
        if use_lex:
            # trie transition per candidate: -1 kills the extension
            # (hard mode) or reroutes through the unk row (bypass mode)
            nxt = jnp.take(
                lex_flat, lex[:, :, None] * NLEX_K + c
            )  # [B, W, k]
            if use_unk:
                is_space = c == space_id  # [B, W, k]
                dead = nxt < 0
                from_unk = (lex == U_NODE)[:, :, None]
                wl = wlen[:, :, None].astype(jnp.float32)
                # chars: free on the trie; UNKP from the unk row; the
                # fall-off retroactively charges the whole fragment.
                # space: free at boundaries/unk; mid-word reparses the
                # fragment as an unk word (UNKP * wlen).
                pen_char = jnp.where(
                    from_unk, UNKP,
                    jnp.where(dead, UNKP * (wl + 1.0), 0.0))
                lex_pen = jnp.where(
                    is_space,
                    jnp.where(dead, UNKP * wl, 0.0),
                    pen_char)
                completes_unk = is_space & (from_unk | dead)
                nxt = jnp.where(
                    dead, jnp.where(is_space, 0, U_NODE), nxt)
            else:
                ext_pnb = jnp.where(nxt >= 0, ext_pnb, neg)
                nxt = jnp.maximum(nxt, 0)  # node moot once mass = -inf
        if use_unk:
            # unk penalties rank beams even without a char LM
            if use_lm:
                ext_bonus = ext_bonus + lex_pen
            else:
                ext_bonus = bonus[:, :, None] + lex_pen
        have_bonus = use_lm or use_unk
        if use_wlm:
            # a space from a word-final node completes word_ids[node]
            wid = jnp.take(word_ids, lex)  # [B, W]
            completes = (c == space_id) & (wid[:, :, None] >= 0)
            wlp = _word_logp_gather(
                wprev, jnp.maximum(wid, 0),
                wprev2=wprev2 if use_wlm3 else None, **word_kw)  # [B, W]
            w_add = jnp.where(
                completes,
                jnp.float32(word_alpha) * wlp[:, :, None]
                + jnp.float32(word_beta),
                0.0,
            )
            if use_unk:
                # unk completions score the shared <unk> constant; the
                # bigram context stays unmoved (unk words transparent)
                w_add = w_add + jnp.where(
                    completes_unk,
                    jnp.float32(word_alpha) * WUNK
                    + jnp.float32(word_beta),
                    0.0,
                )
            if have_bonus:
                ext_bonus = ext_bonus + w_add
            else:
                ext_bonus = (jnp.zeros((B, W, 1)) + bonus[:, :, None]
                             + w_add)
            ext_wprev = jnp.where(
                completes, jnp.maximum(wid, 0)[:, :, None],
                wprev[:, :, None],
            )  # [B, W, k]
            if use_wlm3:
                # completion shifts (prev2, prev1) <- (prev1, word);
                # unk completions leave BOTH unmoved (transparent)
                ext_wprev2 = jnp.where(
                    completes, wprev[:, :, None], wprev2[:, :, None],
                )  # [B, W, k]

        # merge: an extend candidate ext(p, c) coincides with a beam slot
        # already holding p+c (and with nothing else — see module doc).
        # Compare every extend hash against every stay hash: at most one
        # match per side, so the merge is a masked max + one log-add-exp.
        def flat(a):
            return a.reshape(B, W * k)

        eh1, eh2, epnb = flat(ext_h1), flat(ext_h2), flat(ext_pnb)
        m_ext = (
            (eh1[:, :, None] == h1[:, None, :])
            & (eh2[:, :, None] == h2[:, None, :])
        )  # [B, W*k, W]: ext e coincides with stay slot w'
        into_stay = jnp.where(
            m_ext, epnb[:, :, None], neg
        ).max(axis=1)  # [B, W] (<=1 contributor)
        stay_pnb = jnp.logaddexp(stay_pnb, into_stay)
        dead = m_ext.any(axis=2)  # [B, W*k] ext candidates absorbed
        epnb = jnp.where(dead, neg, epnb)

        pool_pb = jnp.concatenate([stay_pb, jnp.full((B, W * k), neg)], axis=1)
        pool_pnb = jnp.concatenate([stay_pnb, epnb], axis=1)
        total = jnp.logaddexp(pool_pb, pool_pnb)
        if use_lm or use_wlm or use_unk:
            # rank/prune by the FUSED score; CTC masses stay pure
            pool_bonus = jnp.concatenate(
                [bonus, flat(jnp.broadcast_to(ext_bonus, (B, W, k)))],
                axis=1)
            total = total + pool_bonus

        _, sel = jax.lax.top_k(total, W)  # [B, W] pool positions
        take = functools.partial(jnp.take_along_axis, indices=sel, axis=1)

        parent_w = jnp.broadcast_to(iota_w[None, :, None], (B, W, k))
        pool_h1 = jnp.concatenate([h1, eh1], axis=1)
        pool_h2 = jnp.concatenate([h2, eh2], axis=1)
        pool_last = jnp.concatenate([last, flat(c)], axis=1)
        pool_parent = jnp.concatenate(
            [jnp.broadcast_to(iota_w[None, :], (B, W)), flat(parent_w)], axis=1)
        pool_token = jnp.concatenate(
            [jnp.zeros((B, W), jnp.int32), flat(c)], axis=1)

        n_h1, n_h2 = take(pool_h1), take(pool_h2)
        n_last = take(pool_last)
        n_pb, n_pnb = take(pool_pb), take(pool_pnb)
        n_parent, n_token = take(pool_parent), take(pool_token)
        if use_lm:
            # stay keeps its context; extend shifts
            # (lmp2, lmp, lml) <- (lmp, lml, c)
            pool_lmp = jnp.concatenate(
                [lmp, flat(jnp.broadcast_to(lml[:, :, None], (B, W, k)))],
                axis=1)
            pool_lml = jnp.concatenate([lml, flat(c)], axis=1)
            pool_bon = jnp.concatenate([bonus, flat(ext_bonus)], axis=1)
            n_lmp, n_lml = take(pool_lmp), take(pool_lml)
            n_bon = take(pool_bon)
            if use_lm4:
                pool_lmp2 = jnp.concatenate(
                    [lmp2,
                     flat(jnp.broadcast_to(lmp[:, :, None], (B, W, k)))],
                    axis=1)
                n_lmp2 = take(pool_lmp2)
            else:
                n_lmp2 = lmp2
        else:
            n_lmp2, n_lmp, n_lml, n_bon = lmp2, lmp, lml, bonus
        if use_lex:
            pool_lex = jnp.concatenate([lex, flat(nxt)], axis=1)
            n_lex = take(pool_lex)
        else:
            n_lex = lex
        if use_unk:
            ext_wlen = jnp.where(is_space, 0, wlen[:, :, None] + 1)
            pool_wlen = jnp.concatenate(
                [wlen, flat(jnp.broadcast_to(ext_wlen, (B, W, k)))],
                axis=1)
            n_wlen = take(pool_wlen)
        else:
            n_wlen = wlen
        if use_wlm:
            pool_wprev = jnp.concatenate(
                [wprev, flat(jnp.broadcast_to(ext_wprev, (B, W, k)))],
                axis=1)
            n_wprev = take(pool_wprev)
        else:
            n_wprev = wprev
        if use_wlm3:
            pool_wprev2 = jnp.concatenate(
                [wprev2, flat(jnp.broadcast_to(ext_wprev2, (B, W, k)))],
                axis=1)
            n_wprev2 = take(pool_wprev2)
        else:
            n_wprev2 = wprev2
        if (use_wlm or use_unk) and not use_lm:
            pool_bon = jnp.concatenate(
                [bonus, flat(jnp.broadcast_to(ext_bonus, (B, W, k)))],
                axis=1)
            n_bon = take(pool_bon)

        # invalid frames are identity: state passes through, nothing emits
        mw = m[:, None]
        h1 = jnp.where(mw, n_h1, h1)
        h2 = jnp.where(mw, n_h2, h2)
        last = jnp.where(mw, n_last, last)
        p_b = jnp.where(mw, n_pb, p_b)
        p_nb = jnp.where(mw, n_pnb, p_nb)
        lmp2 = jnp.where(mw, n_lmp2, lmp2)
        lmp = jnp.where(mw, n_lmp, lmp)
        lml = jnp.where(mw, n_lml, lml)
        bonus = jnp.where(mw, n_bon, bonus)
        lex = jnp.where(mw, n_lex, lex)
        wlen = jnp.where(mw, n_wlen, wlen)
        wprev = jnp.where(mw, n_wprev, wprev)
        wprev2 = jnp.where(mw, n_wprev2, wprev2)
        parent = jnp.where(mw, n_parent, jnp.broadcast_to(iota_w[None], (B, W)))
        token = jnp.where(mw, n_token, 0)
        return (h1, h2, last, p_b, p_nb, lmp2, lmp, lml, bonus, lex,
                wlen, wprev, wprev2), (parent, token)

    carry, (parents, tokens) = jax.lax.scan(
        body, (h1_0, h2_0, last_0, p_b0, p_nb0, lmp2_0, lmp_0, lml_0,
               bonus_0, lex_0, wlen_0, wprev_0, wprev2_0),
        (vals_t, ids_t, pblank_t, mask_t),
    )
    (_, _, _, p_b, p_nb, _, _, _, bonus, lex, wlen, wprev,
     wprev2) = carry
    totals = jnp.logaddexp(p_b, p_nb)
    if use_lm or use_lex or use_wlm:
        extras = {}
        if use_lm or use_wlm or use_unk:
            extras["bonus"] = bonus
        if use_lex:
            extras["lex"] = lex
        if use_unk:
            extras["wlen"] = wlen
        if use_wlm:
            extras["wprev"] = wprev
        if use_wlm3:
            extras["wprev2"] = wprev2
        return totals, extras, parents, tokens
    return totals, parents, tokens


@functools.lru_cache(maxsize=None)
def _beam_scan_jit(beam_width: int, topk: int, prune_logp: float,
                   all_beams: bool, fused_lm: bool, lm_alpha: float,
                   lm_beta: float):
    if fused_lm:
        # takes lm_table and/or lex_next+lex_boundary (+ word tables) as
        # call-time kwargs; space_id gates Python-level branches in the
        # trace and must stay static. all_beams=True returns the fused
        # per-slot finals for constrained n-best.
        return jax.jit(
            functools.partial(
                beam_scan_collapsed, beam_width=beam_width, topk=topk,
                prune_logp=prune_logp, lm_alpha=lm_alpha, lm_beta=lm_beta,
                all_beams=all_beams,
            ),
            static_argnames=("space_id", "word_alpha", "word_beta",
                             "lm_probes", "word_probes",
                             "word_ctx_probes", "word_tri_probes",
                             "lex_unk_logp", "word_unk_logp"),
        )
    return jax.jit(functools.partial(
        beam_scan_collapsed, beam_width=beam_width, topk=topk,
        prune_logp=prune_logp, all_beams=all_beams,
    ))


def beam_scan_program(config: BeamConfig, all_beams: bool = False,
                      fused_lm: bool = False):
    """Jitted ``beam_scan_collapsed`` for a config — for callers that
    dispatch the search separately from the forward pass (infer's
    two-phase loop). ``all_beams`` must be True when the finals will be
    two-pass LM-rescored; ``fused_lm`` returns a program taking
    ``(log_probs, frame_mask, lm_table=...)`` for interleaved on-device
    fusion (order <= 3)."""
    return _beam_scan_jit(config.beam_width, config.topk,
                          float(config.prune_logp), bool(all_beams),
                          bool(fused_lm), float(config.lm_alpha),
                          float(config.lm_beta))


def backtrace(
    parents: np.ndarray,  # [T, B, W]
    tokens: np.ndarray,  # [T, B, W]
) -> np.ndarray:
    """Reconstruct every beam slot's emitted-token sequence: [T, B, W]
    int32 where entry t is the token slot w's prefix gained at frame t
    (0 = none). numpy-vectorized over (B, W); O(T) python steps.
    (Oracle for ``device_backtrace``; the production path backtracks on
    device — downloading the [T,B,W] trellis costs ~2 relay round trips
    per batch, 69% of the measured beam service time.)"""
    T, B, W = parents.shape
    emitted = np.zeros((T, B, W), np.int32)
    cur = np.broadcast_to(np.arange(W, dtype=np.int64), (B, W)).copy()
    rows = np.arange(B)[:, None]
    for t in range(T - 1, -1, -1):
        emitted[t] = tokens[t][rows, cur]
        cur = parents[t][rows, cur]
    return emitted


def device_backtrace(parents: jax.Array, tokens: jax.Array) -> jax.Array:
    """Traceable backtrace: [T, B, W] parents/tokens -> emitted [T, B, W]
    (reverse lax.scan carrying each slot's current ancestor index)."""
    T, B, W = parents.shape
    cur0 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None], (B, W))

    def body(cur, pt):
        par_t, tok_t = pt  # [B, W]
        emit = jnp.take_along_axis(tok_t, cur, axis=1)
        return jnp.take_along_axis(par_t, cur, axis=1), emit

    _, emitted = jax.lax.scan(body, cur0, (parents, tokens), reverse=True)
    return emitted  # [T, B, W], time order preserved


def beam_scan_collapsed(
    log_probs: jax.Array,  # [B, T, K]
    frame_mask: jax.Array,  # [B, T]
    *,
    beam_width: int,
    topk: int,
    prune_logp: float,
    all_beams: bool = False,
    lm_table: Optional[jax.Array] = None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    lm_hash_keys: Optional[jax.Array] = None,
    lm_hash_vals: Optional[jax.Array] = None,
    lm_rows: Optional[jax.Array] = None,
    lm_probes: int = 0,
    lex_next: Optional[jax.Array] = None,
    lex_boundary: Optional[jax.Array] = None,  # [N] bool, with lex_next
    lex_unk_logp: float = 0.0,
    word_unk_logp: float = 0.0,
    word_table: Optional[jax.Array] = None,
    word_uni: Optional[jax.Array] = None,
    word_bo: Optional[jax.Array] = None,
    word_hash_keys: Optional[jax.Array] = None,
    word_hash_vals: Optional[jax.Array] = None,
    word_probes: int = 0,
    word_ctx_keys: Optional[jax.Array] = None,
    word_ctx_ids: Optional[jax.Array] = None,
    word_ctx_bo: Optional[jax.Array] = None,
    word_ctx_probes: int = 0,
    word_tri_keys: Optional[jax.Array] = None,
    word_tri_vals: Optional[jax.Array] = None,
    word_tri_probes: int = 0,
    word_ids: Optional[jax.Array] = None,
    space_id: int = -1,
    word_alpha: float = 0.0,
    word_beta: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """beam_scan + on-device backtrace. Returns (totals [B, W], emitted):
    emitted is [B, T] int32 for the BEST beam per line (token or 0 per
    frame — same wire format as greedy_frames, so the host collapse is
    shared), or [B, W, T] when ``all_beams`` (two-pass LM rescoring and
    n-best need every final; under fused LM/lexicon the return is the
    3-tuple (totals, fused [B, W], emitted [B, W, T]) with per-slot
    FUSED final scores). Keeps the host<->device transfer tiny: the
    [T, B, W] search trellis never leaves the device.

    With ``lm_table``, the LM is fused in the search (see beam_scan) and
    the winner is selected by the FUSED score; emitted comes back PACKED
    as [B, T+1] — the winning beam's token row plus one int32 column
    holding round(winner's pure-CTC total * 1000) for confidence, so LM
    fusion adds no extra device->host array. ``lex_next``/``lex_boundary``
    (Lexicon.dense_tables) additionally constrain the search on device;
    selection prefers beams ending at a word boundary (falling back to
    all beams when none does, matching the host oracle). One known
    divergence: in that no-boundary fallback the host oracle still
    word-scores the partial trailing word while the device skips it
    (word_ids is -1 mid-word) — reachable only when NO beam ends at a
    word boundary, i.e. pathological inputs."""
    use_wlm = word_table is not None or word_uni is not None
    if lm_table is not None or lex_next is not None:
        totals, extras, parents, tokens = beam_scan(
            log_probs, frame_mask, beam_width=beam_width, topk=topk,
            prune_logp=prune_logp, lm_table=lm_table, lm_alpha=lm_alpha,
            lm_beta=lm_beta, lm_hash_keys=lm_hash_keys,
            lm_hash_vals=lm_hash_vals, lm_rows=lm_rows,
            lm_probes=lm_probes, lex_next=lex_next,
            lex_unk_logp=lex_unk_logp, word_unk_logp=word_unk_logp,
            word_table=word_table, word_uni=word_uni, word_bo=word_bo,
            word_hash_keys=word_hash_keys, word_hash_vals=word_hash_vals,
            word_probes=word_probes,
            word_ctx_keys=word_ctx_keys, word_ctx_ids=word_ctx_ids,
            word_ctx_bo=word_ctx_bo, word_ctx_probes=word_ctx_probes,
            word_tri_keys=word_tri_keys, word_tri_vals=word_tri_vals,
            word_tri_probes=word_tri_probes,
            word_ids=word_ids, space_id=space_id, word_alpha=word_alpha,
            word_beta=word_beta,
        )
        emitted = device_backtrace(parents, tokens)  # [T, B, W]
        fused = totals + extras.get("bonus", 0.0)
        if use_wlm:
            # the trailing (un-spaced) word: score it at selection, as
            # the host oracle's final_score does — only word-final nodes
            # carry one (root = line ended on a space, nothing trailing)
            wid = jnp.take(word_ids, extras["lex"])  # [B, W]
            wlp = _word_logp_gather(
                extras["wprev"], jnp.maximum(wid, 0),
                word_table=word_table, word_uni=word_uni, word_bo=word_bo,
                word_hash_keys=word_hash_keys,
                word_hash_vals=word_hash_vals, word_probes=word_probes,
                wprev2=extras.get("wprev2"),
                word_ctx_keys=word_ctx_keys, word_ctx_ids=word_ctx_ids,
                word_ctx_bo=word_ctx_bo, word_ctx_probes=word_ctx_probes,
                word_tri_keys=word_tri_keys, word_tri_vals=word_tri_vals,
                word_tri_probes=word_tri_probes,
            )
            fused = fused + jnp.where(
                wid >= 0,
                jnp.float32(word_alpha) * wlp + jnp.float32(word_beta),
                0.0,
            )
        if lex_next is not None:
            ok = jnp.take(lex_boundary, extras["lex"])  # [B, W]
            if lex_unk_logp != 0.0:
                # unk bypass: no hard gating — a mid-word trie final
                # reparses its fragment as a penalized unk word, exactly
                # as the host oracle's final_score does
                wlen_f = extras["wlen"].astype(jnp.float32)
                fused = fused + jnp.where(
                    ok, 0.0, jnp.float32(lex_unk_logp) * wlen_f)
                if use_wlm:
                    at_unk = extras["lex"] == lex_next.shape[0] - 1
                    trailing_unk = at_unk | ~ok
                    fused = fused + jnp.where(
                        trailing_unk,
                        jnp.float32(word_alpha)
                        * jnp.float32(word_unk_logp)
                        + jnp.float32(word_beta),
                        0.0,
                    )
            else:
                gated = jnp.where(ok, fused, -jnp.inf)
                # a line with no boundary-ending beam falls back ungated
                fused = jnp.where(ok.any(axis=1)[:, None], gated, fused)
        if all_beams:
            # Constrained n-best: every slot's FUSED final score (LM
            # bonus + trailing word + boundary gating already applied)
            # plus its emitted rows — `--nbest` composes with the fused
            # LM/lexicon stack on device (VERDICT r3 task 8). Returns a
            # 3-tuple so callers can report both CTC and fused scores.
            return totals, fused, jnp.transpose(emitted, (1, 2, 0))
        best = jnp.argmax(fused, axis=1)  # fused selection
        picked = jnp.take_along_axis(
            emitted, best[None, :, None], axis=2
        )[..., 0]  # [T, B]
        sel_ctc = jnp.take_along_axis(totals, best[:, None], axis=1)[:, 0]
        col = jnp.round(
            jnp.clip(sel_ctc * 1000.0, -2.0e9, 0.0)
        ).astype(jnp.int32)
        return totals, jnp.concatenate(
            [jnp.swapaxes(picked, 0, 1), col[:, None]], axis=1)
    totals, parents, tokens = beam_scan(
        log_probs, frame_mask, beam_width=beam_width, topk=topk,
        prune_logp=prune_logp,
    )
    emitted = device_backtrace(parents, tokens)  # [T, B, W]
    if all_beams:
        return totals, jnp.transpose(emitted, (1, 2, 0))
    best = jnp.argmax(totals, axis=1)  # [B]
    picked = jnp.take_along_axis(
        emitted, best[None, :, None], axis=2
    )[..., 0]  # [T, B]
    return totals, jnp.swapaxes(picked, 0, 1)  # [B, T]


def lm_prefix_logp(lm, alphabet: Alphabet, ids: Sequence[int]) -> float:
    """Cumulative LM log-prob of a decoded prefix, with the same <s>-rooted
    history as the interleaved oracle scoring (decode/beam.py)."""
    if hasattr(lm, "score"):  # python ArpaLM
        state = lm.start_state()
        total = 0.0
        for i in ids:
            lp, state = lm.score(state, alphabet.token_of(int(i)))
            total += lp
        return total
    # NativeLM: stateless queries; -1 is the native <s> sentinel and the
    # C side truncates history to order-1.
    total = 0.0
    hist = [-1]
    for i in ids:
        total += lm.logp(hist, int(i))
        hist.append(int(i))
    return total


def device_beam_nbest(
    alphabet: Alphabet,
    config: BeamConfig,
    precomputed,  # (totals, emitted [B,W,T]) or (totals, fused, emitted)
    lm=None,
    valid: Optional[np.ndarray] = None,
    nbest: int = 8,
) -> List[List[Tuple[str, float]]]:
    """N-best lists from an all-beams device search: per valid line, up
    to ``nbest`` (uxxxx, score) ranked by the fused score. Two layouts:

    - 2-tuple ``(totals, emitted)``: pure-CTC finals; with ``lm`` the W
      finals are two-pass rescored host-side.
    - 3-tuple ``(totals, fused, emitted)`` from a FUSED all-beams scan
      (``beam_scan_collapsed(all_beams=True, lm_table=...)``): scores
      are already final (interleaved LM + lexicon gating + trailing
      word), so ``--nbest`` composes with the constrained device stack
      and no host rescoring runs.

    The export surface behind infer --nbest; the reference era's
    n-best/lattice dump for downstream rescoring."""
    if len(precomputed) == 3:
        totals, fused, emitted = precomputed
        rank_scores = np.asarray(fused)
        use_lm = False  # scores already fused on device
    else:
        totals, emitted = precomputed
        rank_scores = np.asarray(totals)
        use_lm = lm is not None and config.lm_alpha != 0.0
    totals = np.asarray(totals)
    emitted = np.asarray(emitted)
    if emitted.ndim != 3:
        raise ValueError("n-best needs all_beams=True beam_scan output")
    out: List[List[Tuple[str, float]]] = []
    for b in range(totals.shape[0]):
        if valid is not None and not valid[b]:
            continue
        ranked = []
        seen = set()
        for w in np.argsort(-rank_scores[b]):
            score = float(rank_scores[b, int(w)])
            if score == -np.inf or float(totals[b, int(w)]) == -np.inf:
                break
            row = emitted[b, int(w)]
            ids = row[row != 0].tolist()
            key = tuple(ids)
            if key in seen:  # distinct-prefix invariant, but be safe
                continue
            seen.add(key)
            if use_lm:
                score += (config.lm_alpha * lm_prefix_logp(lm, alphabet, ids)
                          + config.lm_beta * len(ids))
            ranked.append((alphabet.decode(ids), score))
        ranked.sort(key=lambda x: -x[1])
        out.append(ranked[:nbest])
    return out


def device_beam_decode(
    log_probs: Optional[jax.Array],  # [B, T, K]; None with precomputed
    frame_mask: Optional[jax.Array],  # [B, T]; None with precomputed
    alphabet: Alphabet,
    config: BeamConfig = BeamConfig(),
    lm=None,
    valid: Optional[np.ndarray] = None,
    precomputed=None,  # (totals, emitted) from beam_scan_collapsed
    return_scores: bool = False,
) -> List:
    """Batch beam decode via the device search -> best uxxxx per valid
    sample. With an LM, the device returns top-W finals and the host
    rescores them (two-pass fusion). ``precomputed`` lets a caller fuse
    ``beam_scan_collapsed`` into its own jitted program (serve) or
    dispatch many batches ahead (infer) — log_probs/frame_mask are unused
    then; its ``emitted`` arity (best-only [B,T] vs all-beams [B,W,T])
    must match whether an LM is in play. With ``return_scores`` each
    element is ``(uxxxx, ctc_total)`` — the winning beam's CTC log-prob
    (the confidence source; under an LM the winner is picked by the
    FUSED score but the reported total stays pure CTC so confidences are
    comparable across decoder configs)."""
    use_lm = lm is not None and config.lm_alpha != 0.0
    if precomputed is not None:
        totals, emitted = precomputed
    else:
        fn = _beam_scan_jit(config.beam_width, config.topk,
                            float(config.prune_logp), use_lm,
                            False, 0.0, 0.0)
        totals, emitted = fn(log_probs, frame_mask)
    totals = np.asarray(totals)  # [B, W]
    emitted = np.asarray(emitted)  # [B, T] or [B, W, T]

    B, W = totals.shape
    out: List[str] = []
    for b in range(B):
        if valid is not None and not valid[b]:
            continue
        if not use_lm:
            w_best = int(np.argmax(totals[b]))
            if emitted.ndim == 3:  # all-beams layout works for both modes
                col = emitted[b, w_best]
            else:
                col = emitted[b]
            hyp = alphabet.decode(col[col != 0].tolist())
            out.append((hyp, float(totals[b, w_best]))
                       if return_scores else hyp)
            continue
        if emitted.ndim != 3:
            raise ValueError(
                "LM rescoring needs all_beams=True beam_scan output"
            )
        best, best_score, best_ctc = "", -np.inf, -np.inf
        order = np.argsort(-totals[b])
        for w in order:
            ctc = float(totals[b, w])
            if ctc == -np.inf:
                break
            row = emitted[b, int(w)]
            ids = row[row != 0].tolist()
            score = (ctc + config.lm_alpha * lm_prefix_logp(lm, alphabet, ids)
                     + config.lm_beta * len(ids))
            if score > best_score:
                best_score, best, best_ctc = score, alphabet.decode(ids), ctc
        out.append((best, best_ctc) if return_scores else best)
    return out
