"""Device-derived memory budgets (utils/membudget.py).

The round-3 verdict flagged the hardcoded 2 GiB / 6 GiB / 4 GiB budgets:
tuned on a 16 GiB v5e, they would gate the lazy-FSW path off at k=9 on a
95 GiB v5p where the plane fits. These tests parameterize the gates over
fake device sizes via the KF2VEC_HBM_BYTES override and a fake-device kind
table lookup.
"""

import pytest

from kf2vecfsw_tpu.utils import membudget


class _FakeDevice:
    def __init__(self, kind, platform="tpu", stats=None):
        self.device_kind = kind
        self.platform = platform
        self._stats = stats

    def memory_stats(self):
        if self._stats is None:
            raise RuntimeError("unsupported")
        return self._stats


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("KF2VEC_HBM_BYTES", str(123 << 30))
    assert membudget.device_hbm_bytes() == 123 << 30
    assert membudget.hbm_fraction(1, 4) == (123 << 30) // 4


def test_memory_stats_beats_kind_table(monkeypatch):
    monkeypatch.delenv("KF2VEC_HBM_BYTES", raising=False)
    d = _FakeDevice("TPU v5 lite", stats={"bytes_limit": 7 << 30})
    assert membudget.device_hbm_bytes(d) == 7 << 30


@pytest.mark.parametrize(
    "kind,gib",
    [("TPU v5 lite", 16), ("TPU v5p", 95), ("TPU v4", 32), ("TPU v6 lite", 32)],
)
def test_kind_table(monkeypatch, kind, gib):
    monkeypatch.delenv("KF2VEC_HBM_BYTES", raising=False)
    assert membudget.device_hbm_bytes(_FakeDevice(kind)) == gib << 30


def test_unknown_kind_falls_back_conservatively(monkeypatch):
    monkeypatch.delenv("KF2VEC_HBM_BYTES", raising=False)
    assert membudget.device_hbm_bytes(_FakeDevice("TPU v99 mega")) == 16 << 30
    assert membudget.device_hbm_bytes(_FakeDevice("", platform="cpu")) == 16 << 30


@pytest.mark.parametrize("gib,min_group", [(2, 0), (16, 2), (96, 8)])
def test_lazy_gate_scales_with_device(monkeypatch, gib, min_group):
    """Round 5's compact S plane is V-independent, so the k=9 regime
    (C=512, V=131072) fits a 16 GiB part single-chip — the gate scales the
    REFRESH group with the device instead: a bigger part sorts more items
    per refresh dispatch, a tiny mocked part gates the path off entirely."""
    from kf2vecfsw_tpu.train.fsw_lazy import lazy_applicable, pick_refresh_group

    monkeypatch.setenv("KF2VEC_HBM_BYTES", str(gib << 30))
    g = pick_refresh_group(512, 131072, n_model=1)
    if min_group == 0:
        assert g == 0
        assert lazy_applicable(32, 512, 131072, n_model=1) is False
    else:
        assert g >= min_group
        assert lazy_applicable(32, 512, 131072, n_model=1) is True


@pytest.mark.parametrize("gib", [16, 96])
def test_sort_chunk_scales_with_device(monkeypatch, gib):
    """_auto_slice_chunk must keep transients under 1/8 of the FAKE device's
    HBM — a larger part chunks less (or not at all)."""
    from kf2vecfsw_tpu.models import fsw as fswmod

    monkeypatch.setenv("KF2VEC_HBM_BYTES", str(gib << 30))
    budget = (gib << 30) // 8
    assert fswmod.fsw_sort_budget_bytes() == budget
    chunk = fswmod._auto_slice_chunk(16, 131072, 512)
    per_slice = 4 * 16 * 131072 * 4
    if chunk:
        assert chunk * per_slice <= budget
    else:  # unchunked: the full 512 slices fit the bigger part
        assert 512 * per_slice <= budget


def test_chunk_store_budget_env_still_wins(monkeypatch):
    from kf2vecfsw_tpu.train.chunks import _chunk_device_budget

    monkeypatch.setenv("KF2VEC_HBM_BYTES", str(64 << 30))
    assert _chunk_device_budget() == 16 << 30
