"""AMC search-quality band gate: RL-searched per-layer ratios must beat
uniform pruning at equal preserved FLOPs on the stored on-chip evidence —
the rebuild's analogue of the reference's uniform-vs-RL performance columns
(/root/reference/docs/docs/performance.md:9-14)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'experiments'))

import amc_vs_uniform  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'experiments', 'results',
    'amc_vs_uniform.json')


def _load():
    with open(RESULTS) as fin:
        return json.load(fin)


def test_band_checker_passes_stored_onchip_results():
    assert amc_vs_uniform.check_results(_load()) == []


def test_stored_search_actually_searched():
    """The evidence must come from a real search, not a plumbing drill:
    enough roll-outs to exploit, and a reward trace that moved."""
    results = _load()
    assert results['nb_rlouts'] >= 50
    trace = results['reward_trace']
    assert len(trace) >= 50
    # the search explored: rewards are not all within eval noise of each
    # other (the r3 drill's failure mode — a flat trace proves nothing)
    assert max(trace) - min(trace) > 2 * amc_vs_uniform.NOISE


def test_band_checker_fails_on_regressions():
    healthy = _load()
    bad = dict(healthy, rl_accuracy=healthy['uniform_accuracy'] - 0.1)
    assert any('lost to uniform' in v
               for v in amc_vs_uniform.check_results(bad))
    off_point = dict(healthy, preserved_flops_frac=0.9)
    assert any('operating' in v
               for v in amc_vs_uniform.check_results(off_point))
    assert any('missing' in v for v in amc_vs_uniform.check_results({}))
