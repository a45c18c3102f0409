"""Quality gate on the rectified approximation (VERDICT round-1 item 1).

The rectified construction is the DEFAULT inference path
(``construction="auto"``, pipeline/inference.py); it is an approximation of
the exact volume (ops/corr_rectified.py docstring).  This test bounds its
end-metric cost with the weight-free WTA probe of
``benchmarks/quality_harness.py``: winner-take-all plane-sweep depth from
the volume measures exactly what the approximation perturbs, in mm, against
analytic ground truth.  QUALITY.md records the production-scale numbers;
this gate keeps the bound enforced at a CPU-sized scale.

Measured envelope at the gate scale (384x512, DTU rig, CPU, 2026-08):
  plane  exact 5.6 mm / rectified 6.1 mm median GT error
  sphere exact 3.5 mm / rectified 4.0 mm
  step   exact 5.5 mm / rectified 8.1 mm (discontinuities hurt the warps
                                          most)
  stage-0 argmax within-1 agreement 0.90-0.92 everywhere
The WTA probe's own noise floor dominates below ~1 stage-1 quantum
(Z^2 * incre1 ~ 2.8 mm at Z = 600), so gates are set at the probe scale,
not at the reference's 0.332 mm scale (which only a trained update operator
reaches).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

pytestmark = pytest.mark.slow


def test_rectified_wta_close_to_exact_and_gt():
    """Gates: (1) probe sanity — exact-path WTA median within 3 stage-1
    quanta of GT; (2) the rectified path costs < 3 mm median over exact;
    (3) stage-0 volume peaks agree within 1 hypothesis for >= 85% of
    pixels."""
    from benchmarks.quality_harness import eval_scene

    res = eval_scene("plane", 384, 512, n_views=5, nf=4)
    assert "median_mm" in res.get("rectified", {}), (
        f"rectified plan rejected: {res.get('rectified')}")
    quantum = (600.0 ** 2) * (0.0025 / 320)
    assert res["exact"]["median_mm"] < 3 * quantum, res["exact"]
    # measured envelope: +0.5 mm construction delta on plane at this scale
    # (docstring table); gate at +1.2 mm (< 0.45 stage-1 quantum) so a
    # ~0.7 mm-class construction regression trips — NOT the round-2 +3 mm
    # band, which only caught quantum-scale breakage
    assert (res["rectified"]["median_mm"]
            < res["exact"]["median_mm"] + 1.2), (
        res["exact"], res["rectified"])
    assert res["agreement"]["s0_within1"] >= 0.85, res["agreement"]
    # the trained-regime 0.5 mm-sensitivity gate lives in
    # tests/test_quality_trained.py (quantum-relative, trained operator)
