"""Beta-schedule unit tests (analytic identities + shipped-config shapes)."""
import numpy as np
import pytest

from phoregen_tpu.ops.schedules import (advance_schedule, get_beta_schedule,
                                        segment_schedule)

SHIPPED_POS = dict(beta_schedule="advance", scale_start=0.9999,
                   scale_end=0.0001, width=3)
SHIPPED_BOND = dict(
    beta_schedule="segment", time_segment=[600, 400],
    segment_diff=[
        dict(scale_start=0.9999, scale_end=0.001, width=3),
        dict(scale_start=0.001, scale_end=0.0001, width=2),
    ])


@pytest.mark.parametrize("name,kw", [
    ("quad", dict(beta_start=1e-7, beta_end=2e-3)),
    ("linear", dict(beta_start=1e-7, beta_end=2e-3)),
    ("const", dict(beta_end=1e-3)),
    ("jsd", dict()),
    ("sigmoid", dict(beta_start=1e-7, beta_end=2e-3)),
    ("cosine", dict()),
    ("advance", dict(scale_start=0.9999, scale_end=0.0001, width=3)),
    ("segment", dict(time_segment=[600, 400], segment_diff=[
        dict(scale_start=0.9999, scale_end=0.001, width=3),
        dict(scale_start=0.001, scale_end=0.0001, width=2)])),
])
def test_all_schedules_valid(name, kw):
    betas = get_beta_schedule(name, 1000, **kw)
    assert betas.shape == (1000,)
    assert np.all(betas >= 0) and np.all(betas <= 1)


def test_advance_alphas_bar_endpoints():
    # alpha-bar must run from scale_start down to scale_end.
    betas, ab = advance_schedule(1000, 0.9999, 0.0001, 3, return_alphas_bar=True)
    assert abs(ab[0] - 0.9999) < 1e-6
    assert abs(ab[-1] - 0.0001) < 1e-6
    # cumulative alpha consistency: cumprod(1-betas) scaled by ab[0] == ab
    rebuilt = ab[0] * np.cumprod((1 - betas))[1:] / (1 - betas[0])
    assert np.allclose(rebuilt, ab[1:], rtol=1e-8)


def test_segment_schedule_continuity():
    betas = segment_schedule(1000, **{k: SHIPPED_BOND[k]
                                      for k in ("time_segment", "segment_diff")})
    assert betas.shape == (1000,)
    ab = np.cumprod(1 - betas) * (1 - betas[0]) ** 0  # alpha-bar up to init
    # alpha-bar monotone non-increasing
    ab0 = betas[0]
    alphas = 1 - betas
    abar = np.cumprod(alphas)
    assert np.all(np.diff(abar) <= 1e-12)


def test_segment_sum_mismatch_raises():
    with pytest.raises(AssertionError):
        segment_schedule(999, [600, 400], SHIPPED_BOND["segment_diff"])
