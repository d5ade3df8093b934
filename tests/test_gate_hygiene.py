"""Gate hygiene: every evidence file the test suite opens must be COMMITTED.

Round 3 shipped band tests whose results JSON was generated on-chip but
never `git add`-ed — the default gate went red on a missing file (VERDICT
r3, missing #1).  The reference's rule is absolute: "Any merge request
... should be able to pass all the test cases"
(/root/reference/docs/docs/test_cases.md:1-5), which implicitly requires
the evidence those cases read to travel with the code.  This test makes
the failure class structural: scan the test suite for references to
``experiments/results/*.json`` and assert each referenced file is tracked
by git (not merely present in a dirty working tree).
"""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, 'tests')
EXPERIMENTS = os.path.join(REPO, 'experiments')

# matches 'parity_hard.json' in "..., 'results', 'parity_hard.json')" and
# "experiments/results/parity_hard.json" spellings alike
_RESULTS_REF = re.compile(
    r"""results['"]?\s*[,/]\s*['"]([\w.-]+\.json)['"]""")


def _referenced_results_files():
    refs = {}
    for root in (TESTS, EXPERIMENTS):
        for name in sorted(os.listdir(root)):
            if not name.endswith('.py'):
                continue
            path = os.path.join(root, name)
            with open(path) as fin:
                text = fin.read()
            for m in _RESULTS_REF.finditer(text):
                refs.setdefault(m.group(1), []).append(
                    os.path.relpath(path, REPO))
    return refs


def _git_tracked():
    out = subprocess.run(
        ['git', 'ls-files', 'experiments/results'], cwd=REPO,
        capture_output=True, text=True, check=True).stdout
    return {os.path.basename(line) for line in out.splitlines() if line}


def test_every_referenced_results_file_is_committed():
    refs = _referenced_results_files()
    assert refs, 'scanner found no results references — regex rotted?'
    # files only ever referenced by the experiment that WRITES them are not
    # gate evidence; the gate is what the TEST files read
    test_refs = {name: sites for name, sites in refs.items()
                 if any(site.startswith('tests/') for site in sites)}
    assert test_refs, 'no test references results files — scanner rotted?'
    tracked = _git_tracked()
    missing = {name: sites for name, sites in test_refs.items()
               if name not in tracked}
    assert not missing, (
        'band tests read evidence files that are NOT committed (generate '
        'on-chip with --publish and `git add` them): %r' % missing)


def test_scanner_sees_the_known_band_evidence():
    # canary: if the regex or layout changes, this catches silent no-ops
    refs = _referenced_results_files()
    assert 'parity_hard.json' in refs
    assert 'detection_parity.json' in refs
