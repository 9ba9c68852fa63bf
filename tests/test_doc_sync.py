"""Doc/benchmark sync gate (VERDICT r4 task 7).

Three consecutive rounds shipped docs quoting stale performance
numbers. The mechanism that ends it: every full `python bench.py` run
rewrites BENCH_LATEST.json and regenerates the marker-delimited block
in README.md / PERF.md / BASELINE.md (tools/update_docs.py). These
fast tests fail whenever

1. any doc block differs from what BENCH_LATEST.json renders to
   (someone hand-edited a number or skipped the regeneration), or
2. BENCH_LATEST.json itself drifts >15% from the newest
   driver-recorded BENCH_r*.json artifact (the committed bench numbers
   went stale relative to the driver's own capture).
"""

import glob
import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import update_docs  # noqa: E402


@pytest.fixture(scope="module")
def artifact():
    path = os.path.join(REPO, "BENCH_LATEST.json")
    assert os.path.exists(path), (
        "BENCH_LATEST.json missing — run `python bench.py` (full matrix) "
        "to record it and sync the docs")
    return update_docs.load_artifact(path)


@pytest.mark.parametrize("doc", ["README.md", "PERF.md", "BASELINE.md"])
def test_doc_block_matches_artifact(artifact, doc):
    text = open(os.path.join(REPO, doc)).read()
    m = re.search(re.escape(update_docs.BEGIN) + r"(.*?)"
                  + re.escape(update_docs.END), text, re.DOTALL)
    assert m, f"{doc} lost its BENCH_SYNC block"
    expected = update_docs.render_block(artifact)
    got = update_docs.BEGIN + m.group(1) + update_docs.END
    assert got == expected, (
        f"{doc}'s benchmark block is out of sync with BENCH_LATEST.json — "
        "run `python tools/update_docs.py` (or a full `python bench.py`)")


def test_latest_tracks_driver_rounds(artifact):
    """BENCH_LATEST.json must not go stale relative to the newest
    driver-captured BENCH_r*.json (each round's end-of-round capture).

    Staleness is DIRECTIONAL: if BENCH_LATEST was generated with the
    newest driver round already on disk (``rounds_seen``), an in-round
    improvement is allowed to drift past 15% — only a bench that
    predates the newest driver capture must match it."""
    rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not rounds:
        pytest.skip("no driver bench artifacts")
    newest = rounds[-1]
    newest_round = int(re.search(r"BENCH_r(\d+)\.json$", newest).group(1))
    fresh = artifact.get("rounds_seen", 0) >= newest_round
    lines = {}
    for raw in json.load(open(newest)).get("tail", "").splitlines():
        if raw.startswith("{"):
            line = json.loads(raw)
            lines[line["metric"]] = line
    ours = {line["metric"]: line for line in artifact["lines"]}
    for metric, theirs in lines.items():
        assert metric in ours, f"{metric} missing from BENCH_LATEST.json"
        if fresh:
            continue
        # Compare on a jitter-tolerant basis: same benchmark, different
        # run. 15% catches a stale round (the r3->r4 staleness examples
        # were 23-26%) without flaking on run-to-run noise.
        a, b = float(ours[metric]["value"]), float(theirs["value"])
        rel = abs(a - b) / max(abs(b), 1e-9)
        assert rel < 0.15, (
            f"{metric}: BENCH_LATEST.json says {a} but the newest driver "
            f"capture {os.path.basename(newest)} says {b} ({rel:.0%} apart)"
            " — re-run `python bench.py` to refresh the committed numbers")
