"""Faster-RCNN compression band gate: the FRCNN strip's checker must pass
the stored on-chip evidence and fail regressions (BASELINE.json config #5's
detection-compression coverage on the second detection model — the reference
runs its learners on BOTH ssd and fasterrcnn,
/root/reference/docs/docs/test_cases.md)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'experiments'))

import frcnn_compression_parity  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'experiments', 'results',
    'frcnn_compression_parity.json')


def _load():
    with open(RESULTS) as fin:
        return json.load(fin)


def test_band_checker_passes_stored_onchip_results():
    results = _load()
    assert frcnn_compression_parity.check_results(results) == []
    # the evidence must come from the calibrated NON-SATURATING regime —
    # the first (retracted) publish of this strip saturated at mAP 1.0
    # everywhere, which the baseline band now excludes
    assert results['full-prec_mAP'] <= \
        frcnn_compression_parity.BASELINE_BAND[1]


def test_band_checker_fails_on_regressions():
    healthy = _load()
    bad = dict(healthy)
    bad['channel@60%preserve_delta'] = \
        healthy['channel@60%preserve_delta'] + 0.3
    assert any('channel@60%preserve' in v
               for v in frcnn_compression_parity.check_results(bad))
    gone = {k: v for k, v in healthy.items()
            if not k.startswith('weight-sparse')}
    assert any('weight-sparse' in v
               for v in frcnn_compression_parity.check_results(gone))
    dead = dict(healthy, **{'full-prec_mAP': 0.05})
    assert any('full-prec' in v
               for v in frcnn_compression_parity.check_results(dead))
