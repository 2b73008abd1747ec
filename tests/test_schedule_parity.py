"""Beta-schedule parity vs the reference's own `get_beta_schedule`.

All schedule families the reference defines (`models/common.py:444-544`),
including the `advance`/`segment` pair the shipped configs use for the
asynchronous pos/atom vs bond noising, compared bit-for-bit (same float64
math) against `phoregen_tpu/ops/schedules.py`.
"""
import os

import numpy as np
import pytest

REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "models")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

pyg_shims.install(REFERENCE)


CASES = [
    dict(beta_schedule="quad", beta_start=1e-4, beta_end=0.02),
    dict(beta_schedule="linear", beta_start=1e-4, beta_end=0.02),
    dict(beta_schedule="const", beta_end=0.01),
    dict(beta_schedule="jsd"),
    dict(beta_schedule="sigmoid", beta_start=1e-4, beta_end=0.02),
    dict(beta_schedule="cosine", s=0.01),
    dict(beta_schedule="advance", scale_start=0.9999, scale_end=0.0001,
         width=3),
    dict(beta_schedule="segment",
         time_segment=[600, 400],
         segment_diff=[dict(scale_start=0.9999, scale_end=0.001, width=3),
                       dict(scale_start=0.001, scale_end=0.0001, width=2)]),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[c["beta_schedule"] for c in CASES])
def test_schedule_parity(case):
    from models.common import get_beta_schedule as ref_sched

    from phoregen_tpu.ops.schedules import get_beta_schedule as our_sched

    T = 1000
    ref = np.asarray(ref_sched(num_timesteps=T, **case), np.float64)
    ours = np.asarray(our_sched(num_timesteps=T, **case), np.float64)
    assert ref.shape == ours.shape == (T,)
    np.testing.assert_allclose(ref, ours, rtol=1e-12, atol=1e-12,
                               err_msg=case["beta_schedule"])
