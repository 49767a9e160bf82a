"""Device-derived HBM budgets.

Fixed byte constants tuned for one part silently misgate others: a 2 GiB
sort budget / 6 GiB lazy-plane budget picked on a 16 GiB v5e would gate the
lazy-FSW path off at k=9 on a 95 GiB v5p where the plane actually fits
single-chip. Derive the per-device HBM size at runtime instead:

1. ``KF2VEC_HBM_BYTES`` env override (also how tests fake device sizes),
2. ``device.memory_stats()['bytes_limit']`` where the runtime exposes it
   (not available through tunneled/axon backends),
3. a ``device_kind`` table of published per-chip HBM capacities,
4. a conservative 16 GiB fallback (the v5e figure the old constants assumed).

All consumers take a FRACTION of the derived size so the ratios tuned on
v5e scale with the part.
"""

from __future__ import annotations

import functools
import os

# Published per-chip HBM capacities by device_kind substring (first match
# wins, so longer/more specific names come first). Sources: TPU system
# architecture docs; v5e reports device_kind "TPU v5 lite", v5p "TPU v5p",
# v6e "TPU v6 lite".
_KIND_GIB: tuple[tuple[str, int], ...] = (
    ("TPU v5 lite", 16),
    ("TPU v5e", 16),
    ("TPU v5p", 95),
    ("TPU v6 lite", 32),
    ("TPU v6e", 32),
    ("TPU v7", 192),
    ("TPU v4", 32),
    ("TPU v3", 16),
    ("TPU v2", 8),
)

_FALLBACK_BYTES = 16 << 30


@functools.lru_cache(maxsize=8)
def _hbm_bytes_for_kind(kind: str, platform: str) -> int:
    for name, gib in _KIND_GIB:
        if name.lower() in kind.lower():
            return gib << 30
    if platform == "cpu":
        # virtual CPU meshes (tests, the driver's multichip dryrun) model a
        # v5e-sized part so gates behave like the hardware they stand in for
        return _FALLBACK_BYTES
    return _FALLBACK_BYTES


def device_hbm_bytes(device=None) -> int:
    """Per-device HBM capacity in bytes (see module docstring for the
    resolution order)."""
    env = os.environ.get("KF2VEC_HBM_BYTES")
    if env:
        return int(env)
    if device is None:
        device = _default_device()
        if device is None:
            return _FALLBACK_BYTES
    try:
        stats = device.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _hbm_bytes_for_kind(
        getattr(device, "device_kind", ""), getattr(device, "platform", "")
    )


@functools.lru_cache(maxsize=1)
def _default_device():
    try:
        import jax

        return jax.local_devices()[0]
    except Exception:
        return None


def hbm_fraction(num: int, den: int, device=None) -> int:
    """num/den of the device HBM, in bytes."""
    return device_hbm_bytes(device) * num // den
