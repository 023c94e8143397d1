"""Unit tests for the label-free cascade calibration metrics.

The per-group agreement math (scripts/calibrate_cascade.py:
containment_metrics) feeds the recommended-cap decision; pin it with
hand-computed cases. The script's end-to-end behavior is validated by
the committed runs (runs/cascade_calibration_{short,longdoc}.json
reproduce both labeled operating points).
"""

import importlib.util
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[2] / "scripts" / "calibrate_cascade.py"
spec = importlib.util.spec_from_file_location("calibrate_cascade", SCRIPT)
calibrate_cascade = importlib.util.module_from_spec(spec)
sys.modules["calibrate_cascade"] = calibrate_cascade
spec.loader.exec_module(calibrate_cascade)

containment_metrics = calibrate_cascade.containment_metrics


class TestContainmentMetrics:
    def test_perfect_agreement(self):
        full = [0.9, 0.8, 0.7, 0.6, 0.5]
        hit1, hit3, overlap = containment_metrics(full, list(full), keep=3)
        assert hit1 and hit3 and overlap == 1.0

    def test_top1_missed(self):
        # Full top-1 is index 0; prescreen ranks it dead last.
        full = [0.9, 0.8, 0.7, 0.6]
        cap = [0.0, 0.8, 0.7, 0.6]
        hit1, hit3, overlap = containment_metrics(full, cap, keep=2)
        assert not hit1
        assert not hit3  # top-3 {0,1,2} can't fit once 0 is lost
        # prescreen top-2 = {1, 2}; full top-2 = {0, 1} -> overlap 1/2
        assert overlap == 0.5

    def test_reordering_within_keep_is_fine(self):
        """The cascade rescores the kept set at full length, so prescreen
        ORDER inside top-keep is irrelevant — only membership counts."""
        full = [0.9, 0.8, 0.7, 0.1, 0.1]
        cap = [0.5, 0.6, 0.7, 0.0, 0.0]  # reversed order, same top-3 set
        hit1, hit3, overlap = containment_metrics(full, cap, keep=3)
        assert hit1 and hit3 and overlap == 1.0

    def test_short_group(self):
        # Groups smaller than 3 must not index out of range.
        hit1, hit3, overlap = containment_metrics([0.9, 0.1], [0.9, 0.1], keep=8)
        assert hit1 and hit3 and overlap == 2 / 8

    def test_recommendation_is_smallest_clearing_cap(self):
        caps = {8: 0.1, 24: 0.96, 32: 0.62, 128: 1.0}
        recommended = next(
            (c for c in sorted(caps) if caps[c] >= 0.95), None
        )
        assert recommended == 24
