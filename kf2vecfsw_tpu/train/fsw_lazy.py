"""Lazy-permutation FSW distance-trainer runner.

Drop-in sibling of DistanceEpochRunner for the shared-vocab FSW family
(models/fsw.py fsw_lazy_*): the per-step multi-operand sort + cumsum + trig
over (B, C, V) tensors is replaced by a periodic in-span "refresh" that
precomputes the per-item COMPACT coefficient plane S (n, C, k, 4) — the
quantile coefficients segment-summed over digit classes, V-independent —
plus the tiny refresh-point freqs-gradient matrix g2, leaving each training
step two tiny einsums (see the lazy-path comment in models/fsw.py).
Refreshes happen every `refresh_steps` batch steps inside the jitted span
(step counter starts at each span dispatch, so the first step of every span
always refreshes — resume-safe without state).

refresh_steps=1 refreshes before every step and is numerically the exact
shared path (summation order aside) — pinned by tests/test_fsw_lazy.py.
Larger values train on the exact FSW of a slightly stale sort order; the
gradient is exact for the stale objective and coincides with the exact
gradient at every refresh step.

The refresh runs per-slice-row, so under a model-axis-sharded mesh each
device refreshes only its local rows of (delta, gdelta) with no
collectives; the planes are sharded P(None, 'model', None).

Memory: the resident S plane is (n_bucket, C, k, 4) f32 — a few MB at any
k — so the binding constraint is the REFRESH's (group, C_local, V)-sized
sort transients. pick_refresh_group() shrinks the group until one group's
transients fit fsw_lazy_budget_bytes(); lazy_applicable() gates the path
off only when even group=1 does not fit per device (model-axis sharding
divides C_local, so a too-big single-device refresh re-fits on a sharded
mesh). Reference semantics: train_model_set.py:96 (same trainer surface);
this path is a TPU-first acceleration behind -fsw_lazy_refresh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.fsw import (
    fsw_lazy_apply,
    fsw_lazy_refresh,
    fsw_lazy_refresh_pergenome,
    make_fsw_shared_apply,
)
from ..ops.losses import weighted_sqrt_mse
from ..ops.pairwise import pairwise_l2_exact
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from .step import (
    DistanceEpochRunner,
    _batch_index_plan_dyn,
    _packed_perm,
    adam_specs,
    adam_update,
    device_step_lr,
    fold_best,
    shard_map,
)

# the refresh's per-group sort transients must fit under this for the lazy
# path. Derived per-device (3/8 of HBM = the 6 GiB this was tuned at on a
# 16 GiB v5e); resolved lazily so importing this module never initializes
# the backend. Tests override via KF2VEC_HBM_BYTES.
def fsw_lazy_budget_bytes() -> int:
    from ..utils.membudget import hbm_fraction

    return hbm_fraction(3, 8)

# max items per refresh sort group: the sort network's cost is payload-
# traffic bound (~45 GB/s measured), so larger groups only amortize the
# ~20% key overhead while multi-dozen-operand sorts can hang the compiler —
# 8 is the measured sweet spot (must divide every item bucket; buckets are
# multiples of 8, step.bucket_items). pick_refresh_group halves it until
# one group's transients fit the per-device budget.
REFRESH_GROUP = 8


def refresh_transient_bytes(d_local: int, vocab: int, group: int) -> int:
    """Worst-stage live set of one refresh group (models/fsw.py
    fsw_lazy_refresh): the (G+2)-operand sort's inputs+outputs overlap with
    the jvp's delta+gdelta and the (1+G)-operand unsort — budget ~(3G+4)
    f32 buffers of (d_local, vocab)."""
    return 4 * (3 * group + 4) * d_local * vocab


def pick_refresh_group(d_out: int, vocab: int, n_model: int = 1) -> int:
    """Largest refresh group (<= REFRESH_GROUP, halving) whose transients
    fit the per-device budget; 0 when even group=1 does not fit."""
    d_local = -(-d_out // max(n_model, 1))
    g = REFRESH_GROUP
    while g >= 1:
        if refresh_transient_bytes(d_local, vocab, g) <= fsw_lazy_budget_bytes():
            return g
        g //= 2
    return 0


def lazy_applicable(
    n_bucket: int,
    d_out: int,
    vocab: int,
    double_buffered: bool = False,
    n_model: int = 1,
) -> bool:
    """Budget check is PER DEVICE: slice rows (and so the refresh work and
    the S plane) are sharded over the model axis, so a refresh whose
    transients exceed one chip (e.g. giant-vocab regimes) re-fits on a
    sharded mesh. The resident S plane is (n_bucket, C, k, 4) — a few MB at
    any k — so the gate is ONLY the refresh transients now; n_bucket and
    double_buffered no longer bind (kept in the signature for the trainer's
    call shape)."""
    del n_bucket, double_buffered
    return pick_refresh_group(d_out, vocab, n_model) > 0


class FSWLazyEpochRunner(DistanceEpochRunner):
    """DistanceEpochRunner for shared-vocab FSW with lazily-refreshed sorts.

    Same public surface (run_epoch, run_epoch_span, eval_loss, pad_*);
    features are the (n, V) vocab-aligned weight rows of the shared path.
    Holdout evaluation (eval_loss) uses the EXACT shared forward — only the
    training steps use the lazy objective.
    """

    def __init__(
        self,
        mesh,
        k: int,
        param_specs,
        n_items: int,
        batch_size: int,
        refresh_steps: int = 32,
        weight_offset: float = 1e-6,
        donate: bool = False,
    ):
        self.refresh_steps = max(1, int(refresh_steps))
        self._k = k
        self._init_digits(k)
        super().__init__(
            mesh,
            self._exact_apply_fn(k),  # exact path: eval_loss only
            param_specs,
            n_items,
            batch_size,
            weight_offset=weight_offset,
            donate=donate,
        )
        dspec = P(None, MODEL_AXIS, None, None)
        self._dspec = dspec
        in_specs = (
            param_specs,
            adam_specs(param_specs),
            P(),  # W (n_bucket, V) vocab weights
            P(),  # dist
            P(),  # idx
            P(),  # mask
            P(),  # lr
            dspec,  # S (n_bucket, C, k, 4) compact plane
            P(None, MODEL_AXIS),  # g2 (refresh-point freqs gradient)
            P(),  # step0
        )
        out_specs = (
            param_specs, adam_specs(param_specs), dspec, P(None, MODEL_AXIS), P(), P()
        )
        # fine-grained core: refreshes under a per-step lax.cond — needed
        # when refresh_steps < steps-per-epoch, but the cond forces XLA to
        # copy the multi-GB planes through the scan carry every step
        self._lazy_epoch_sharded = shard_map(
            self._lazy_epoch_core,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
        )
        # cond-free core: the planes are scan-invariant closure inputs, so
        # epochs between refreshes never touch (let alone copy) them
        self._lazy_epoch_norefresh = shard_map(
            self._lazy_epoch_core_norefresh,
            mesh=self.mesh,
            in_specs=(in_specs[0], in_specs[1]) + in_specs[3:9],
            out_specs=(param_specs, adam_specs(param_specs), P(), P()),
        )
        self._refresh_sharded = shard_map(
            self._refresh_core,
            mesh=self.mesh,
            in_specs=(param_specs, P()),
            out_specs=(dspec, P(None, MODEL_AXIS)),
        )
        donate_args = (0, 1) if donate else ()
        self._run = jax.jit(self._lazy_run_impl, donate_argnums=donate_args)
        self._span = jax.jit(
            self._lazy_span_impl,
            static_argnums=(9,),
            donate_argnums=(0, 1, 2) if donate else (),
        )
        # per-epoch path (test-set runs drive run_epoch once per epoch): the
        # plane persists HERE between calls so the refresh keeps the
        # requested every-R-steps cadence instead of refreshing every epoch
        self._plane_cache = None
        self._plane_age = 0  # batch steps trained against the cached plane
        self._refresh_jit = jax.jit(self._refresh_sharded)
        self._run_cached = jax.jit(self._lazy_run_cached_impl, donate_argnums=donate_args)

    # -- refresh hooks (overridden by the per-genome subclass) ----------------
    def _init_digits(self, k: int) -> None:
        from ..models.fsw import _vocab_digits_dev

        self._digits = _vocab_digits_dev(k)  # (V, k) closure constant

    def _exact_apply_fn(self, k: int):
        return make_fsw_shared_apply(k)

    def _refresh_impl(self, params, feats):
        points = params["lookup"][self._digits].reshape(feats.shape[1], -1)
        # slices are already LOCAL rows under shard_map, so size the group
        # by the local shape directly (n_model=1)
        g = pick_refresh_group(params["fsw"]["slices"].shape[0], feats.shape[1]) or 1
        return fsw_lazy_refresh(params["fsw"], points, self._digits, feats, group=g)

    def _refresh_core(self, params, W):
        return self._refresh_impl(params, W)

    # -- lazy core (per-device under shard_map) -------------------------------
    @staticmethod
    def _take_planes(planes, lidx, n):
        """Batch-row gather planes[lidx] as n explicit dynamic slices.

        `planes[lidx]` (an XLA gather) lowers on TPU to a full sweep over
        the ENTIRE first-axis operand per step (measured 7.8 ms/step when
        the plane was the round-4 2.5 GB (n, C, V) one — the whole tensor is
        read to select 16 rows); per-row dynamic_slice_in_dim lowers to
        contiguous row copies. The compact (n, C, k, 4) plane makes either
        form cheap, but the slice form stays strictly better."""
        rows = [
            jax.lax.dynamic_slice_in_dim(planes, lidx[i], 1, axis=0)
            for i in range(n)
        ]
        return jnp.concatenate(rows, axis=0)

    def _plane_batch_step(self, params, opt, delta, g2, dist, idx, mask, lr):
        """One batch step against given (S, g2): shared by the cond and
        cond-free epoch cores."""
        my_d = jax.lax.axis_index(DATA_AXIS)
        lidx = jax.lax.dynamic_slice(idx, (my_d * self.local_b,), (self.local_b,))
        db = self._take_planes(delta, lidx, self.local_b)
        gb = g2[lidx]  # (Bl, C_local): tiny, plain gather is fine
        active = mask[0]
        loss, grads = jax.value_and_grad(
            lambda p: self._lazy_batch_loss(p, db, gb, dist, idx, mask)
        )(params)
        grads = jax.lax.psum(grads, DATA_AXIS)
        params, opt = adam_update(params, grads, opt, lr, active=active)
        return params, opt, jnp.where(active, loss, 0.0), jnp.sum(mask)

    def _lazy_batch_loss(self, params, db, gb, dist, idx, mask):
        # db: (Bl, C_local, k, 4) compact planes; gb: (Bl, C_local) g2 rows
        e_local = fsw_lazy_apply(params, db, gb, model_axis=MODEL_AXIS)
        emb = jax.lax.all_gather(e_local, DATA_AXIS, axis=0, tiled=True)
        model_dist = pairwise_l2_exact(emb)
        true_dist = dist[jnp.ix_(idx, idx)]
        pair_mask = mask[:, None] & mask[None, :]
        return weighted_sqrt_mse(model_dist, true_dist, pair_mask, self.weight_offset)

    def _lazy_epoch_core(self, params, opt, W, dist, idx_all, mask_all, lr, delta, gdelta, step0):
        R = self.refresh_steps

        def batch_step(carry, inp):
            params, opt, delta, gdelta, step = carry
            idx, mask = inp

            def do_refresh(p):
                return self._refresh_impl(p, W)

            delta, gdelta = jax.lax.cond(
                step % R == 0, do_refresh, lambda p: (delta, gdelta), params
            )
            params, opt, loss, count = self._plane_batch_step(
                params, opt, delta, gdelta, dist, idx, mask, lr
            )
            return (params, opt, delta, gdelta, step + 1), (loss, count)

        (params, opt, delta, gdelta, _), (losses, counts) = jax.lax.scan(
            batch_step, (params, opt, delta, gdelta, step0), (idx_all, mask_all)
        )
        epoch_loss = jnp.sum(losses * counts) / jnp.maximum(jnp.sum(counts), 1)
        return params, opt, delta, gdelta, epoch_loss, losses

    def _lazy_epoch_core_norefresh(
        self, params, opt, dist, idx_all, mask_all, lr, delta, gdelta
    ):
        """One epoch against a FIXED delta plane + g2 matrix: no cond, no
        plane carry — loop-invariant inputs, so XLA streams them read-only."""

        def batch_step(carry, inp):
            params, opt = carry
            idx, mask = inp
            params, opt, loss, count = self._plane_batch_step(
                params, opt, delta, gdelta, dist, idx, mask, lr
            )
            return (params, opt), (loss, count)

        (params, opt), (losses, counts) = jax.lax.scan(
            batch_step, (params, opt), (idx_all, mask_all)
        )
        epoch_loss = jnp.sum(losses * counts) / jnp.maximum(jnp.sum(counts), 1)
        return params, opt, epoch_loss, losses

    # -- jitted entry points ---------------------------------------------------
    def _zero_planes(self, params):
        d_out = params["fsw"]["slices"].shape[0]
        k = self._k
        delta = jax.lax.with_sharding_constraint(
            jnp.zeros((self.n_bucket, d_out, k, 4), jnp.float32),
            NamedSharding(self.mesh, self._dspec),
        )
        g2 = jax.lax.with_sharding_constraint(
            jnp.zeros((self.n_bucket, d_out), jnp.float32),
            NamedSharding(self.mesh, P(None, MODEL_AXIS)),
        )
        return delta, g2

    def _lazy_run_cached_impl(self, params, opt, delta, gdelta, dist, key, lr, n_items):
        """One epoch against caller-held planes (no refresh inside)."""
        perm = _packed_perm(key, self.n_bucket, n_items)
        idx, mask = _batch_index_plan_dyn(
            self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
        )
        params, opt, eloss, losses = self._lazy_epoch_norefresh(
            params, opt, dist, idx, mask, lr, delta, gdelta
        )
        return params, opt, eloss, losses

    def run_epoch(self, params, opt, feats, dist, key, lr):
        """Epoch-granular driver (test-set runs): refresh the plane only when
        `refresh_steps` training steps have elapsed since the last refresh,
        carrying the plane across calls. Sub-epoch refresh intervals keep the
        in-epoch cond core (refreshes within the epoch as requested)."""
        if self.refresh_steps < self.n_batches:
            return super().run_epoch(params, opt, feats, dist, key, lr)
        if self._plane_cache is None or self._plane_age >= self.refresh_steps:
            self._plane_cache = self._refresh_jit(params, feats)
            self._plane_age = 0
        delta, gdelta = self._plane_cache
        params, opt, loss, _ = self._run_cached(
            params, opt, delta, gdelta, dist, key, jnp.float32(lr),
            jnp.int32(self.n_items),
        )
        self._plane_age += self.n_batches
        return params, opt, loss

    def _lazy_run_impl(self, params, opt, feats, dist, key, lr, n_items):
        perm = _packed_perm(key, self.n_bucket, n_items)
        idx, mask = _batch_index_plan_dyn(
            self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
        )
        if self.refresh_steps >= self.n_batches:
            # one refresh covers the whole epoch: cond-free core (no plane
            # copies; matches the block-structured span path)
            delta, gdelta = self._refresh_sharded(params, feats)
            params, opt, eloss, losses = self._lazy_epoch_norefresh(
                params, opt, dist, idx, mask, lr, delta, gdelta
            )
            return params, opt, eloss, losses
        delta, gdelta = self._zero_planes(params)
        params, opt, _, _, eloss, losses = self._lazy_epoch_sharded(
            params, opt, feats, dist, idx, mask, lr, delta, gdelta, jnp.int32(0)
        )
        return params, opt, eloss, losses

    def _epoch_plan(self, base_key, e, n_items):
        perm = _packed_perm(jax.random.fold_in(base_key, e), self.n_bucket, n_items)
        return _batch_index_plan_dyn(
            self.n_bucket, self.batch, self.batch_pad, self.n_batches, perm, n_items
        )

    def _lazy_span_impl(
        self, params, opt, best, feats, dist, base_key, epoch0, lr_args, n_items, span
    ):
        lr0, lr_min, lr_decay, lr_base, lr_freq = lr_args

        if self.refresh_steps < self.n_batches:
            # fine-grained: refresh under a per-step cond inside the epoch
            # (pays a plane copy per step — only used for sub-epoch refresh)
            delta0, gdelta0 = self._zero_planes(params)

            def epoch_body(carry, e):
                params, opt, best_params, lowest, best_epoch, delta, gdelta = carry
                lr = device_step_lr(e, lr0, lr_min, lr_decay, lr_base, lr_freq)
                idx, mask = self._epoch_plan(base_key, e, n_items)
                # step counter from SPAN start: the first step always
                # refreshes, so the zero-initialized planes are never consumed
                step0 = (e - epoch0) * self.n_batches
                params, opt, delta, gdelta, eloss, _ = self._lazy_epoch_sharded(
                    params, opt, feats, dist, idx, mask, lr, delta, gdelta, step0
                )
                better = eloss < lowest
                best_params = fold_best(better, best_params, params)
                lowest = jnp.where(better, eloss, lowest)
                best_epoch = jnp.where(better, e, best_epoch)
                return (
                    params, opt, best_params, lowest, best_epoch, delta, gdelta
                ), eloss

            carry = (params, opt, best[0], best[1], best[2], delta0, gdelta0)
            (params, opt, bp, lo, be, _, _), losses = jax.lax.scan(
                epoch_body, carry, epoch0 + jnp.arange(span)
            )
            return params, opt, (bp, lo, be), losses

        # block-structured: refresh unconditionally every R_e epochs, then run
        # those epochs against the planes as loop-INVARIANT inputs — no cond,
        # no carry, so the multi-GB planes are never copied. R_e snaps to a
        # divisor of the span (span sizes are powers of two).
        R_e = max(1, min(self.refresh_steps // self.n_batches, span))
        while span % R_e:
            R_e -= 1
        n_blocks = span // R_e

        def block_body(carry, b):
            params, opt, best_params, lowest, best_epoch = carry
            delta, gdelta = self._refresh_sharded(params, feats)

            def epoch_body(carry2, e):
                params, opt, best_params, lowest, best_epoch = carry2
                lr = device_step_lr(e, lr0, lr_min, lr_decay, lr_base, lr_freq)
                idx, mask = self._epoch_plan(base_key, e, n_items)
                params, opt, eloss, _ = self._lazy_epoch_norefresh(
                    params, opt, dist, idx, mask, lr, delta, gdelta
                )
                better = eloss < lowest
                best_params = fold_best(better, best_params, params)
                lowest = jnp.where(better, eloss, lowest)
                best_epoch = jnp.where(better, e, best_epoch)
                return (params, opt, best_params, lowest, best_epoch), eloss

            e0 = epoch0 + b * R_e
            carry2, losses_b = jax.lax.scan(
                epoch_body, (params, opt, best_params, lowest, best_epoch),
                e0 + jnp.arange(R_e),
            )
            return carry2, losses_b

        carry = (params, opt, best[0], best[1], best[2])
        (params, opt, bp, lo, be), losses = jax.lax.scan(
            block_body, carry, jnp.arange(n_blocks)
        )
        return params, opt, (bp, lo, be), losses.reshape(span)


class FSWLazyPerGenomeRunner(FSWLazyEpochRunner):
    """Per-genome lazy FSW runner (VERDICT r4 item 8): the non-shared-vocab
    regime — short contigs, sparse clades, k > 9 — where each genome owns
    its point matrix and the trainer's features are the padded (n, N, k+1)
    tensors of models/fsw.py:fsw_dist_embed_apply.

    The refresh freezes each genome's OWN sort order
    (fsw_lazy_refresh_pergenome: one 3-operand (C, N) int-keyed sort per
    item instead of the shared path's one (B+2)-operand sort) and emits the
    SAME compact (n, C, k, 4) S plane, so every step core, span structure,
    cadence rule and sharding of the shared runner is inherited unchanged.
    Holdout evaluation uses the exact per-genome forward. refresh_steps=1
    equals the exact per-genome path (summation order aside) — pinned by
    tests/test_fsw_lazy.py."""

    def _init_digits(self, k: int) -> None:
        # no shared-vocab digit matrix: each item carries its own k-mer
        # codes inside the feature tensor (and at k > 9 the canonical
        # matrix would be GBs)
        self._digits = None

    def _exact_apply_fn(self, k: int):
        from ..models.fsw import fsw_dist_embed_apply

        return fsw_dist_embed_apply

    def _refresh_impl(self, params, X):
        g = pick_refresh_group(params["fsw"]["slices"].shape[0], X.shape[1]) or 1
        return fsw_lazy_refresh_pergenome(
            params["fsw"], params["lookup"], X, group=g
        )
