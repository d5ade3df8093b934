"""Detection parity band gate: the SSD compression strip's checker must
pass the stored on-chip evidence and fail regressions (the detection-family
analogue of tests/test_parity_bands.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'experiments'))

import detection_parity  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'experiments', 'results',
    'detection_parity.json')


def test_band_checker_passes_stored_onchip_results():
    with open(RESULTS) as fin:
        results = json.load(fin)
    assert detection_parity.check_results(results) == []


def test_band_checker_fails_on_regressions():
    with open(RESULTS) as fin:
        healthy = json.load(fin)
    # a large compression-induced mAP drop must be caught
    bad = dict(healthy)
    bad['weight-sparse@50%_delta'] = healthy['weight-sparse@50%_delta'] + 0.2
    assert any('weight-sparse' in v
               for v in detection_parity.check_results(bad))
    # a vanished sweep point must be caught
    gone = {k: v for k, v in healthy.items() if not k.startswith('channel@')}
    assert any('channel@' in v for v in detection_parity.check_results(gone))
    # a broken baseline (task generator or eval regression) must be caught
    sat = dict(healthy, **{'full-prec_mAP': 0.05})
    assert any('full-prec' in v for v in detection_parity.check_results(sat))
