"""Unit tests for the multi-epoch span decomposition and bucketing helpers."""

import numpy as np

from kf2vecfsw_tpu.train.step import SPAN_SIZES, bucket_items, split_spans


def test_split_spans_covers_range_exactly():
    for start, end, boundaries in [
        (0, 2000, []),
        (0, 8000, list(range(500, 8000, 500))),
        (3, 17, [5, 11]),
        (0, 1, []),
        (5, 5, []),
        (0, 513, [512]),
    ]:
        pieces = split_spans(start, end, boundaries)
        pos = start
        for e0, span in pieces:
            assert e0 == pos
            assert span in SPAN_SIZES
            pos += span
            # never cross a boundary
            for b in boundaries:
                assert not (e0 < b < e0 + span), (e0, span, b)
        assert pos == end


def test_split_spans_boundary_epochs_end_pieces():
    # autosave at 500: some piece must END exactly at 500
    pieces = split_spans(0, 1000, [500])
    ends = {e0 + s for e0, s in pieces}
    assert 500 in ends and 1000 in ends


def test_bucket_items_monotone_and_bounded():
    prev = 0
    for n in range(1, 5000, 7):
        b = bucket_items(n)
        assert b >= n
        assert b % 8 == 0 or b == 8
        # waste bounded by the geometric ratio (plus rounding to 8)
        assert b <= max(8, int(n * 1.25) + 8), (n, b)
        assert b >= prev or n < prev  # monotone in n
    # identical inputs map to identical buckets (program reuse)
    assert bucket_items(850) == bucket_items(850)


def test_bucket_ladder_is_small():
    ladder = sorted({bucket_items(n) for n in range(1, 20000)})
    # bounded executable count for any realistic library build
    assert len(ladder) < 40, ladder


def test_gated_adam_inactive_is_exact_noop():
    """active=False must leave params AND optimizer state bit-identical
    (bucket-padding batches must not perturb Adam's trajectory)."""
    import jax
    import jax.numpy as jnp

    from kf2vecfsw_tpu.train.step import adam_init, adam_update

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)}
    opt = adam_init(params)
    # advance a few real steps so mu/nu/count are nontrivial
    g = {"w": jnp.ones((8, 4), jnp.float32) * 0.1}
    for _ in range(3):
        params, opt = adam_update(params, g, opt, jnp.float32(1e-3))

    p2, o2 = adam_update(params, g, opt, jnp.float32(1e-3), active=jnp.bool_(False))
    assert np.array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
    assert np.array_equal(np.asarray(o2["mu"]["w"]), np.asarray(opt["mu"]["w"]))
    assert np.array_equal(np.asarray(o2["nu"]["w"]), np.asarray(opt["nu"]["w"]))
    assert int(o2["count"]) == int(opt["count"])

    # active=True must match the ungated update exactly
    p3, o3 = adam_update(params, g, opt, jnp.float32(1e-3), active=jnp.bool_(True))
    p4, o4 = adam_update(params, g, opt, jnp.float32(1e-3))
    assert np.array_equal(np.asarray(p3["w"]), np.asarray(p4["w"]))
    assert int(o3["count"]) == int(o4["count"])


def test_device_step_lr_matches_host_schedule():
    import jax.numpy as jnp

    from kf2vecfsw_tpu import defaults
    from kf2vecfsw_tpu.train.schedule import step_lr
    from kf2vecfsw_tpu.train.step import device_step_lr

    lr0, lr_min, decay = 1e-5, 3e-6, 2000.0
    for epoch in [0, 1, 99, 100, 101, 250, 1999, 2000, 7999]:
        host = step_lr(epoch, lr0, lr_min, decay)
        dev = float(
            device_step_lr(
                jnp.int32(epoch), jnp.float32(lr0), jnp.float32(lr_min),
                jnp.float32(decay), jnp.float32(defaults.LEARNING_RATE_BASE),
                jnp.int32(defaults.LEARNING_RATE_UPDATE_FREQ),
            )
        )
        assert abs(dev - host) <= 1e-6 * max(host, 1e-9), (epoch, host, dev)
