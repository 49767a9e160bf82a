"""Jitted, mesh-sharded training epochs.

This replaces the reference's per-batch Python train loops
(train_model_set.py:430-590, train_classifier_model.py:303-460) with a
single jitted function per epoch:

- the whole clade's features and true-distance matrix live in device memory,
- the epoch permutation is drawn on device (jax.random), batches are a
  lax.scan — zero host<->device traffic per step,
- the batch is sharded over the mesh 'data' axis (DataParallel equivalent,
  generalized to multi-host): each device embeds its shard, embeddings are
  all-gathered (they are tiny) to form the exact B x B pairwise-distance
  loss, and gradients are psum'd over 'data',
- the MLP hidden dimension may be sharded over 'model' (tensor parallel)
  via the apply functions' model_axis argument,
- partial batches are padded + masked, preserving the reference's
  mean-over-actual-elements loss semantics.

Optimizer: Adam with torch semantics (bias correction, eps added outside the
sqrt), with the learning rate passed in per epoch so the reference's step
schedule (train/schedule.py) traces as a scalar input.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import inspect

if hasattr(jax, "shard_map"):
    _raw_shard_map = jax.shard_map
else:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _raw_shard_map


def shard_map(f, *, mesh, in_specs, out_specs, **kw):
    # the replication-check kwarg was renamed check_rep -> check_vma
    params = inspect.signature(_raw_shard_map).parameters
    flag = "check_vma" if "check_vma" in params else "check_rep"
    kw.setdefault(flag, False)
    return _raw_shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)

from ..ops.losses import weighted_sqrt_mse
from ..ops.pairwise import pairwise_l2_exact
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


# -- torch-semantics Adam (speccable state: plain dict) ------------------------


def adam_init(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"count": jnp.zeros((), jnp.int32), "mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params)}


def adam_update(params, grads, state, lr, active=None):
    """Adam with torch semantics. `active` (traced bool) gates the whole
    update via scalar-blended coefficients — an inactive call is an exact
    no-op (state AND params unchanged) at the same FLOP/HBM cost, which is
    branch-free and therefore cheap to compile inside nested scans (used to
    skip all-fake bucket-padding batches)."""
    if active is None:
        inc = jnp.int32(1)
        c_keep1, c_g1 = ADAM_B1, 1 - ADAM_B1
        c_keep2, c_g2 = ADAM_B2, 1 - ADAM_B2
        lr_eff = lr
    else:
        a = active
        inc = a.astype(jnp.int32)
        af = a.astype(jnp.float32)
        c_keep1 = 1.0 - af * (1 - ADAM_B1)
        c_g1 = af * (1 - ADAM_B1)
        c_keep2 = 1.0 - af * (1 - ADAM_B2)
        c_g2 = af * (1 - ADAM_B2)
        lr_eff = lr * af
    count = state["count"] + inc
    t = jnp.maximum(count, 1).astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: c_keep1 * m + c_g1 * g, state["mu"], grads)
    nu = jax.tree.map(lambda v, g: c_keep2 * v + c_g2 * g * g, state["nu"], grads)
    bc1 = 1 - ADAM_B1**t
    bc2 = 1 - ADAM_B2**t
    new_params = jax.tree.map(
        lambda p, m, v: p - lr_eff * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS),
        params,
        mu,
        nu,
    )
    return new_params, {"count": count, "mu": mu, "nu": nu}


def adam_specs(param_specs):
    return {"count": P(), "mu": param_specs, "nu": param_specs}


def bucket_items(n_items: int, floor: int = 8) -> int:
    """Pad the item dimension to a geometric bucket (ratio 1.25, multiples
    of 8) so compiled programs depend only on the bucket, not the exact
    clade size — a library build over many subtrees then reuses a bounded
    set of XLA programs. The gentle ratio caps the all-fake padding-batch
    compute waste at ~25% (a power-of-2 ladder wastes up to 2x just above
    a bucket edge)."""
    b = floor
    while b < n_items:
        b = -(-int(b * 1.25) // 8) * 8
    return b


def _packed_perm(key, n_bucket: int, n_items):
    """Random permutation of the real items [0, n_items) packed into the
    first n_items slots (fake bucket slots follow). n_items may be traced:
    argsort of iid uniforms, with fake positions pushed past 1.0."""
    r = jax.random.uniform(key, (n_bucket,))
    r = jnp.where(jnp.arange(n_bucket) < n_items, r, r + 2.0)
    return jnp.argsort(r)


def _batch_index_plan_dyn(
    n_bucket: int, batch: int, batch_pad: int, n_batches: int, perm_packed, n_items
):
    """(n_batches, batch_pad) indices + mask from a packed permutation, with
    a TRACED n_items over a static bucket: because
    real items are packed first, the mask is simply position < n_items and
    every batch is either fully ahead of the tail or all-fake (except the one
    real tail batch) — matching the reference's batch compositions exactly."""
    flat = jnp.full((n_batches * batch,), n_bucket, dtype=jnp.int32)
    flat = flat.at[:n_bucket].set(perm_packed.astype(jnp.int32))
    pos = jnp.arange(n_batches * batch)
    mask_flat = pos < n_items
    idx = flat.reshape(n_batches, batch)
    mask = mask_flat.reshape(n_batches, batch)
    if batch_pad > batch:
        idx = jnp.pad(idx, ((0, 0), (0, batch_pad - batch)), constant_values=n_bucket)
        mask = jnp.pad(mask, ((0, 0), (0, batch_pad - batch)), constant_values=False)
    idx = jnp.minimum(jnp.where(mask, idx, 0), jnp.maximum(n_items - 1, 0))
    return idx, mask


def _mesh_axes(mesh):
    return mesh.shape[DATA_AXIS], mesh.shape.get(MODEL_AXIS, 1)


def pad_axis0(arr, n_bucket: int, value=0):
    """Pad axis 0 to the compile bucket (shared by both epoch runners)."""
    extra = n_bucket - arr.shape[0]
    if extra <= 0:
        return jnp.asarray(arr)
    widths = [(0, extra)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(jnp.asarray(arr), widths, constant_values=value)


def lr_schedule_args(lr0: float, lr_min: float, lr_decay: float):
    """The 5-tuple consumed by device_step_lr / the span runners."""
    from .. import defaults

    return (lr0, lr_min, lr_decay, defaults.LEARNING_RATE_BASE, defaults.LEARNING_RATE_UPDATE_FREQ)


def fold_best(better, best_params, params):
    """Device best-state select shared by all span runners."""
    return jax.tree.map(lambda b, p: jnp.where(better, p, b), best_params, params)


def device_step_lr(epoch, lr0, lr_min, decay, base, update_freq):
    """train/schedule.step_lr traced on device (epoch may be a traced int)."""
    last_update = ((epoch - 1) // update_freq) * update_freq
    lr = lr_min + lr0 * jnp.power(base, last_update.astype(jnp.float32) / decay)
    return jnp.where(epoch == 0, lr0, lr).astype(jnp.float32)


# span sizes for decomposing an epoch range into a handful of compiled
# multi-epoch programs: any gap uses at most ~4 distinct traces and
# len(gap)/512 + O(log) dispatches instead of one round trip per epoch
SPAN_SIZES = (512, 64, 8, 1)


def split_spans(start: int, end: int, boundaries: list[int]) -> list[tuple[int, int]]:
    """(epoch0, span) pieces covering [start, end) that never cross a
    boundary epoch and only use SPAN_SIZES lengths."""
    cuts = sorted({b for b in boundaries if start < b < end} | {end})
    pieces: list[tuple[int, int]] = []
    pos = start
    for cut in cuts:
        while pos < cut:
            for s in SPAN_SIZES:
                if pos + s <= cut:
                    pieces.append((pos, s))
                    pos += s
                    break
    return pieces


class DistanceEpochRunner:
    """One jitted epoch of the distance-embedding trainer.

    apply_fn(params, x, model_axis) -> (B_local, E) embeddings; features may
    be (N, V) dense vectors or (N, Nmax, k+1) FSW point sets.
    """

    def __init__(
        self,
        mesh,
        apply_fn: Callable,
        param_specs,
        n_items: int,
        batch_size: int,
        weight_offset: float = 1e-6,
        label_repeat: int = 1,
        donate: bool = False,
    ):
        self.mesh = mesh
        n_data, n_model = _mesh_axes(mesh)
        self.model_axis = MODEL_AXIS if n_model > 1 else None
        self.n_items = n_items
        # compiled programs depend on the BUCKET (callers pad features/dist
        # rows to n_bucket); the real n_items traces as a scalar, so a
        # many-subtree library build reuses a handful of XLA executables
        self.n_bucket = bucket_items(max(n_items, 1))
        self.batch = batch_size
        self.batch_pad = -(-batch_size // n_data) * n_data
        self.n_batches = max(1, -(-self.n_bucket // batch_size))
        self.local_b = self.batch_pad // n_data
        self.apply_fn = apply_fn
        self.weight_offset = weight_offset
        # chunked Siamese mode: each item expands into `label_repeat` rows
        # whose true-distance labels repeat (train_model_set_chunks.py:396-397)
        self.label_repeat = label_repeat

        in_specs = (
            param_specs,
            adam_specs(param_specs),
            P(),  # features
            P(),  # dist matrix
            P(),  # idx
            P(),  # mask
            P(),  # lr
        )
        out_specs = (param_specs, adam_specs(param_specs), P(), P())
        self._epoch_sharded = shard_map(
            self._epoch_core,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
        )
        # donate=True: params + Adam state are updated in place, removing
        # most of the optimizer's HBM traffic (~1.8x step throughput).
        # Callers must then not reuse the pytrees they pass in (the
        # trainers deep-copy best-so-far params).
        donate_args = (0, 1) if donate else ()
        self._run = jax.jit(self._run_impl, donate_argnums=donate_args)
        self._eval = jax.jit(self._eval_impl)
        # span runner: donate the whole carry (params/opt/best state)
        self._span = jax.jit(
            self._span_impl,
            static_argnums=(9,),
            donate_argnums=(0, 1, 2) if donate else (),
        )

    # -- core (runs per-device under shard_map) -------------------------------
    def _batch_loss(self, params, feats, dist, idx, mask):
        my_d = jax.lax.axis_index(DATA_AXIS)
        r = self.label_repeat
        lidx = jax.lax.dynamic_slice(idx, (my_d * self.local_b,), (self.local_b,))
        x = feats[lidx]  # (Bl, ...) gather from replicated features
        e_local = self.apply_fn(params, x, model_axis=MODEL_AXIS)  # (Bl * r, E)
        emb = jax.lax.all_gather(e_local, DATA_AXIS, axis=0, tiled=True)
        model_dist = pairwise_l2_exact(emb)  # (B_pad*r, B_pad*r)
        ridx = jnp.repeat(idx, r)
        rmask = jnp.repeat(mask, r)
        true_dist = dist[jnp.ix_(ridx, ridx)]
        pair_mask = rmask[:, None] & rmask[None, :]
        return weighted_sqrt_mse(model_dist, true_dist, pair_mask, self.weight_offset)

    def _epoch_core(self, params, opt, feats, dist, idx_all, mask_all, lr):
        def batch_step(carry, inp):
            params, opt = carry
            idx, mask = inp
            # real items are packed first, so a batch is live iff its first
            # slot is real; all-fake bucket-padding batches must be exact
            # Adam no-ops (optimizer count matches the reference)
            active = mask[0]
            loss, grads = jax.value_and_grad(
                lambda p: self._batch_loss(p, feats, dist, idx, mask)
            )(params)
            grads = jax.lax.psum(grads, DATA_AXIS)
            params, opt = adam_update(params, grads, opt, lr, active=active)
            count = jnp.sum(mask) * self.label_repeat
            return (params, opt), (jnp.where(active, loss, 0.0), count)

        (params, opt), (losses, counts) = jax.lax.scan(
            batch_step, (params, opt), (idx_all, mask_all)
        )
        epoch_loss = jnp.sum(losses * counts) / jnp.maximum(jnp.sum(counts), 1)
        return params, opt, epoch_loss, losses

    # -- public jitted entry points -------------------------------------------
    def _run_impl(self, params, opt, feats, dist, key, lr, n_items):
        perm = _packed_perm(key, self.n_bucket, n_items)
        idx, mask = _batch_index_plan_dyn(
            self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
        )
        return self._epoch_sharded(params, opt, feats, dist, idx, mask, lr)

    def pad_items(self, arr, value: float = 0.0):
        """Pad axis 0 from n_items to the compile bucket."""
        return pad_axis0(arr, self.n_bucket, value)

    def pad_dist(self, dist, value: float = 0.0):
        """Pad a square true-distance matrix to (bucket, bucket)."""
        extra = self.n_bucket - dist.shape[0]
        if extra <= 0:
            return jnp.asarray(dist)
        return jnp.pad(jnp.asarray(dist), ((0, extra), (0, extra)), constant_values=value)

    def run_epoch(self, params, opt, feats, dist, key, lr):
        params, opt, loss, _ = self._run(
            params, opt, feats, dist, key, jnp.float32(lr), jnp.int32(self.n_items)
        )
        return params, opt, loss

    # -- multi-epoch span: scan over epochs entirely on device ---------------
    def _span_impl(self, params, opt, best, feats, dist, base_key, epoch0, lr_args, n_items, span):
        lr0, lr_min, lr_decay, lr_base, lr_freq = lr_args

        def epoch_body(carry, e):
            params, opt, best_params, lowest, best_epoch = carry
            lr = device_step_lr(e, lr0, lr_min, lr_decay, lr_base, lr_freq)
            perm = _packed_perm(jax.random.fold_in(base_key, e), self.n_bucket, n_items)
            idx, mask = _batch_index_plan_dyn(
                self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
            )
            params, opt, eloss, _ = self._epoch_sharded(params, opt, feats, dist, idx, mask, lr)
            better = eloss < lowest
            best_params = fold_best(better, best_params, params)
            lowest = jnp.where(better, eloss, lowest)
            best_epoch = jnp.where(better, e, best_epoch)
            return (params, opt, best_params, lowest, best_epoch), eloss

        carry = (params, opt, best[0], best[1], best[2])
        (params, opt, bp, lo, be), losses = jax.lax.scan(
            epoch_body, carry, epoch0 + jnp.arange(span)
        )
        return params, opt, (bp, lo, be), losses

    def run_epoch_span(self, params, opt, best, feats, dist, base_key, epoch0, span, lr_args):
        """Run `span` consecutive epochs as ONE device program: the LR
        schedule, epoch permutations and best-(loss, params, epoch) tracking
        all happen on device, so a block costs one dispatch + one fetch
        instead of `span` round trips (which dominate wall clock for small
        models on remote/tunneled chips).

        best = (best_params, lowest f32, best_epoch i32); lr_args =
        (lr0, lr_min, lr_decay, base, update_freq). Returns
        (params, opt, best, per-epoch losses array)."""
        lr_args = tuple(jnp.float32(v) for v in lr_args[:4]) + (jnp.int32(lr_args[4]),)
        return self._span(
            params, opt, best, feats, dist, base_key, jnp.int32(epoch0), lr_args,
            jnp.int32(self.n_items), int(span),
        )

    def _eval_impl(self, params, feats, dist, idx, mask):
        def one(carry, inp):
            idx_b, mask_b = inp
            loss = self._batch_loss_replicated(params, feats, dist, idx_b, mask_b)
            return carry, (loss, jnp.sum(mask_b))

        _, (losses, counts) = jax.lax.scan(one, 0, (idx, mask))
        return jnp.sum(losses * counts) / jnp.maximum(jnp.sum(counts), 1)

    def _batch_loss_replicated(self, params, feats, dist, idx, mask):
        # single-device eval path (no collectives): used for test-set loss;
        # assumes params are not model-sharded (the realistic configuration
        # at these model sizes)
        x = feats[idx]
        emb = self.apply_fn(params, x, model_axis=None)
        model_dist = pairwise_l2_exact(emb)
        r = self.label_repeat
        ridx = jnp.repeat(idx, r)
        rmask = jnp.repeat(mask, r)
        true_dist = dist[jnp.ix_(ridx, ridx)]
        pair_mask = rmask[:, None] & rmask[None, :]
        return weighted_sqrt_mse(model_dist, true_dist, pair_mask, self.weight_offset)

    def eval_loss(self, params, feats, dist, indices):
        import numpy as np

        n = len(indices)
        if n == 0:
            return float("nan")
        n_batches = -(-n // self.batch)
        idx = np.full((n_batches * self.batch,), 0, dtype=np.int32)
        mask = np.zeros((n_batches * self.batch,), dtype=bool)
        idx[:n] = np.asarray(indices, dtype=np.int32)
        mask[:n] = True
        idx = idx.reshape(n_batches, self.batch)
        mask = mask.reshape(n_batches, self.batch)
        return float(self._eval(params, feats, dist, idx, mask))


class ClassifierEpochRunner:
    """One jitted epoch of the classifier trainer (NLL + accuracy)."""

    def __init__(self, mesh, apply_fn, param_specs, n_items: int, batch_size: int, donate: bool = False):
        self.mesh = mesh
        n_data, n_model = _mesh_axes(mesh)
        self.model_axis = MODEL_AXIS if n_model > 1 else None
        self.n_items = n_items
        self.n_bucket = bucket_items(max(n_items, 1))
        self.batch = batch_size
        self.batch_pad = -(-batch_size // n_data) * n_data
        self.n_batches = max(1, -(-self.n_bucket // batch_size))
        self.local_b = self.batch_pad // n_data
        self.apply_fn = apply_fn

        in_specs = (
            param_specs,
            adam_specs(param_specs),
            P(),
            P(),
            P(),
            P(),
            P(),
        )
        out_specs = (param_specs, adam_specs(param_specs), P(), P())
        self._epoch_sharded = shard_map(
            self._epoch_core,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
        )
        self._run = jax.jit(self._run_impl, donate_argnums=(0, 1) if donate else ())
        self._span = jax.jit(
            self._span_impl,
            static_argnums=(9,),
            donate_argnums=(0, 1, 2) if donate else (),
        )

    def _epoch_core(self, params, opt, feats, labels, idx_all, mask_all, lr):
        my_d = jax.lax.axis_index(DATA_AXIS)

        def batch_loss(params, idx, mask):
            lidx = jax.lax.dynamic_slice(idx, (my_d * self.local_b,), (self.local_b,))
            lmask = jax.lax.dynamic_slice(mask, (my_d * self.local_b,), (self.local_b,))
            x = feats[lidx]
            log_probs = self.apply_fn(params, x, model_axis=MODEL_AXIS)
            y = labels[lidx]
            picked = -jnp.take_along_axis(log_probs, y[:, None], axis=1)[:, 0]
            local_sum = jnp.sum(jnp.where(lmask, picked, 0.0))
            total = jax.lax.psum(local_sum, DATA_AXIS)
            count = jax.lax.psum(jnp.sum(lmask), DATA_AXIS)
            loss = total / jnp.maximum(count, 1)
            top1 = jnp.argmax(log_probs, axis=1)
            correct = jax.lax.psum(jnp.sum(jnp.where(lmask, top1 == y, False)), DATA_AXIS)
            return loss, correct

        def batch_step(carry, inp):
            params, opt = carry
            idx, mask = inp
            active = mask[0]
            (loss, correct), grads = jax.value_and_grad(
                lambda p: batch_loss(p, idx, mask), has_aux=True
            )(params)
            grads = jax.lax.psum(grads, DATA_AXIS)
            params, opt = adam_update(params, grads, opt, lr, active=active)
            return (params, opt), (jnp.where(active, loss, 0.0), correct, jnp.sum(mask))

        (params, opt), (losses, corrects, counts) = jax.lax.scan(
            batch_step, (params, opt), (idx_all, mask_all)
        )
        total = jnp.maximum(jnp.sum(counts), 1)
        epoch_loss = jnp.sum(losses * counts) / total
        epoch_acc = jnp.sum(corrects) / total
        return params, opt, epoch_loss, epoch_acc

    def _run_impl(self, params, opt, feats, labels, key, lr, n_items):
        perm = _packed_perm(key, self.n_bucket, n_items)
        idx, mask = _batch_index_plan_dyn(
            self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
        )
        return self._epoch_sharded(params, opt, feats, labels, idx, mask, lr)

    def pad_items(self, arr, value=0):
        return pad_axis0(arr, self.n_bucket, value)

    def run_epoch(self, params, opt, feats, labels, key, lr):
        params, opt, loss, acc = self._run(
            params, opt, feats, labels, key, jnp.float32(lr), jnp.int32(self.n_items)
        )
        return params, opt, loss, acc

    def _span_impl(self, params, opt, best, feats, labels, base_key, epoch0, lr_args, n_items, span):
        lr0, lr_min, lr_decay, lr_base, lr_freq = lr_args

        def epoch_body(carry, e):
            params, opt, best_params, lowest, best_acc, best_epoch = carry
            lr = device_step_lr(e, lr0, lr_min, lr_decay, lr_base, lr_freq)
            perm = _packed_perm(jax.random.fold_in(base_key, e), self.n_bucket, n_items)
            idx, mask = _batch_index_plan_dyn(
                self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
            )
            params, opt, eloss, eacc = self._epoch_sharded(
                params, opt, feats, labels, idx, mask, lr
            )
            better = eloss < lowest
            best_params = fold_best(better, best_params, params)
            lowest = jnp.where(better, eloss, lowest)
            best_acc = jnp.where(better, eacc, best_acc)
            best_epoch = jnp.where(better, e, best_epoch)
            return (params, opt, best_params, lowest, best_acc, best_epoch), (eloss, eacc)

        carry = (params, opt) + tuple(best)
        (params, opt, bp, lo, ba, be), (losses, accs) = jax.lax.scan(
            epoch_body, carry, epoch0 + jnp.arange(span)
        )
        return params, opt, (bp, lo, ba, be), losses, accs

    def run_epoch_span(self, params, opt, best, feats, labels, base_key, epoch0, span, lr_args):
        """Classifier analogue of DistanceEpochRunner.run_epoch_span; best =
        (best_params, lowest f32, best_acc f32, best_epoch i32)."""
        lr_args = tuple(jnp.float32(v) for v in lr_args[:4]) + (jnp.int32(lr_args[4]),)
        return self._span(
            params, opt, tuple(best), feats, labels, base_key, jnp.int32(epoch0), lr_args,
            jnp.int32(self.n_items), int(span),
        )
