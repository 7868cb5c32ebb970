"""Device-resident dataset cache — the TPU-first answer to host-bound input.

Measured on this rig (single host core + tunneled v5e): the device can
train ~289k lines/s but the host path (batch assembly + H2D serialization)
caps end-to-end at ~33k. OCR corpora are tiny by accelerator standards —
height-normalized uint8 lines run ~4-16KB each, so IAM (~13k lines) is
~100MB and even MADCAT-scale sets fit HBM comfortably. So: ship each
bucket's lines to the device ONCE as a [N, H, Wb] uint8 mega-array, then
run every epoch's shuffling as an on-device gather by a permuted index
vector. Exact reference shuffle semantics (fresh membership every epoch),
zero steady-state H2M traffic, and the single host core drops out of the
hot loop entirely.

Falls back to streaming (BatchPipeline.device_epoch) when the store
exceeds ``max_bytes``.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .buckets import BucketSpec
from .pipeline import Batch, BatchPipeline


def _gather(imgs, w, lab, ll, idx):
    return imgs[idx], w[idx], lab[idx], ll[idx]


_gather_jit = jax.jit(_gather)


_FIELDS = ("images", "widths", "labels", "label_lengths")


def _gather_for(sharding):
    """Jitted gather whose outputs land batch-sharded on the data mesh.

    The resident arrays are replicated across the mesh, so constraining the
    gather's OUTPUT to NamedSharding(P('data')) makes each device
    materialize only its local batch slice — this is what keeps DP scaling
    alive on the cached path (the streaming path gets the same property
    from device_put in the prefetch thread)."""
    if sharding is None:
        return _gather_jit
    key = tuple(sharding[f] for f in _FIELDS)
    fn = _gather_cache.get(key)
    if fn is None:
        fn = jax.jit(_gather, out_shardings=key)
        _gather_cache[key] = fn
    return fn


_gather_cache: dict = {}


class DeviceCache:
    """Wraps a BatchPipeline; same epoch()/device_epoch() iteration contract,
    batches gathered on device from resident bucket arrays."""

    def __init__(
        self,
        pipe: BatchPipeline,
        *,
        sharding=None,  # optional NamedSharding for the resident arrays
        max_bytes: int = 4 * 2**30,
    ):
        self.pipe = pipe
        self.contract = pipe.contract
        total = 0
        for b, members in enumerate(pipe.bucket_members):
            spec = pipe.spec_for(b)
            total += len(members) * (spec.height * spec.width + 4 * spec.label_len)
        if total > max_bytes:
            raise MemoryError(
                f"dataset needs ~{total/2**20:.0f}MB on device > cap "
                f"{max_bytes/2**20:.0f}MB; use streaming"
            )
        self.resident = {}  # bucket_idx -> (imgs, widths, labels, lls) device arrays
        ds = pipe.dataset
        for b, members in enumerate(pipe.bucket_members):
            if not members:
                continue
            spec = pipe.spec_for(b)
            n = len(members)
            imgs = np.full((n, spec.height, spec.width), 255, np.uint8)
            widths = np.zeros((n,), np.int32)
            labels = np.zeros((n, spec.label_len), np.int32)
            lls = np.zeros((n,), np.int32)
            for slot, i in enumerate(members):
                widths[slot] = ds.read_into(i, imgs[slot])
                enc = pipe.encoded[i]
                labels[slot, : len(enc)] = enc
                lls[slot] = len(enc)
            self.resident[b] = tuple(
                jax.device_put(a, sharding) for a in (imgs, widths, labels, lls)
            )
        # local slot -> dataset index, for eval bookkeeping
        self.slot_to_index = {
            b: np.asarray(m, np.int64) for b, m in enumerate(pipe.bucket_members) if m
        }

    def epoch(
        self, epoch: Optional[int] = None, *, sharding=None
    ) -> Iterator[Batch]:
        pipe = self.pipe
        gather = _gather_for(sharding)
        if epoch is None:
            epoch = pipe._epoch
            pipe._epoch += 1
        rng = np.random.default_rng((pipe.seed, epoch))
        plan: List[tuple] = []
        for b in self.resident:
            n = len(pipe.bucket_members[b])
            order = np.arange(n)
            if pipe.shuffle:
                rng.shuffle(order)
            bsz = pipe.batch_sizes[b]
            n_full = n // bsz
            for k in range(n_full):
                plan.append((b, order[k * bsz : (k + 1) * bsz], bsz))
            tail = order[n_full * bsz :]
            if len(tail) and not pipe.drop_remainder:
                plan.append((b, tail, bsz))
        if pipe.shuffle:
            rng.shuffle(plan)
        for b, slots, bsz in plan:
            spec = pipe.spec_for(b)
            k = len(slots)
            if k < bsz:  # pad tail by cyclic repeat (eval only), flag via valid
                slots = np.resize(slots, bsz)
            idx = jnp.asarray(slots.astype(np.int32))
            imgs, w, lab, ll = gather(*self.resident[b], idx)
            valid = np.arange(bsz) < k
            yield Batch(
                images=imgs,
                widths=w,
                labels=lab,
                label_lengths=ll,
                valid=valid,
                bucket=spec,
                indices=self.slot_to_index[b][slots],
            )

    # device_epoch == epoch here (batches are already device-resident);
    # the sharding applies to the gather OUTPUT (batch-sharded on 'data').
    def device_epoch(self, epoch=None, *, sharding=None, prefetch=0):
        return self.epoch(epoch, sharding=sharding)

    def _epoch_plan_host(self, epoch: int):
        """One epoch's per-bucket index matrices, host-side: [(b, idx)]."""
        pipe = self.pipe
        rng = np.random.default_rng((pipe.seed, epoch))
        plans = []
        for b in self.resident:
            n = len(pipe.bucket_members[b])
            bsz = pipe.batch_sizes[b]
            nb = n // bsz
            if nb == 0:
                continue
            order = np.arange(n)
            if pipe.shuffle:
                rng.shuffle(order)
            plans.append((b, order[: nb * bsz].reshape(nb, bsz).astype(np.int32)))
        if pipe.shuffle:
            rng.shuffle(plans)
        return plans

    def epoch_plan(self, epoch: int, stack: int = 1):
        """Index-matrix form of ``stack`` consecutive epochs for the
        epoch-fused trainer (train.make_train_epoch): yields
        (bucket_idx, resident_arrays, idx [nb, B] int32, weights [nb, B]).

        ``stack > 1`` concatenates the epochs' rows per bucket into one
        plan — fewer, longer fused-scan dispatches. On the relay-attached
        rig each program call has a fixed ~8 ms cost, which is measurable
        when a corpus gives each bucket only a handful of rows per epoch
        (align=16's 47-rung ladder measured 17% SLOWER than align=32
        largely from this). stack=1 reproduces the old behavior exactly
        (same rng streams).

        Full batches only (scan needs a rectangular plan); remainder tails
        are dropped exactly as the streaming drop_remainder path does."""
        groups: dict = {}
        order = []
        for e in range(epoch, epoch + stack):
            for b, idx in self._epoch_plan_host(e):
                if b not in groups:
                    order.append(b)
                    groups[b] = []
                groups[b].append(idx)
        out = []
        for b in order:
            idx = np.concatenate(groups[b], axis=0)
            out.append((
                b, self.resident[b], jnp.asarray(idx),
                jnp.ones(idx.shape, np.float32),
            ))
        return out

    # surface the wrapped pipeline's metadata
    @property
    def dataset(self):
        return self.pipe.dataset

    @property
    def dropped(self):
        return self.pipe.dropped

    def batch_shapes(self):
        return self.pipe.batch_shapes()
