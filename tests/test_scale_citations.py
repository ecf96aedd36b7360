"""Scale-evidence durability lint (VERDICT r9 items #1-#2).

Round 9 proved the failure mode this guards against: the 24-row
``scratch/SCALE_r9.json`` backing that round's headline 10x curves
(DSAR 0.79x, item-CF 1.98x, the graph-trio medians) was overwritten
mid-round -- scratch/ is gitignored scratch space -- and the numbers
survived only as prose. Every 10x-scale citation in COVERAGE.md must
therefore name a COMMITTED ``SCALE_r{NN}.json`` at the repo root that
actually contains a measurement for the operator cited on that line:
the claim and its artifact can no longer drift apart silently.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Non-per-op payload sections a citation may point at instead of an op
# key (the skew-slice harnesses write one dict per slice).
_SECTIONS = ("skew_postings", "skew_prefix", "skew_basket", "skew")


def _artifacts() -> dict[int, dict]:
    out = {}
    for path in glob.glob(os.path.join(REPO, "SCALE_r*.json")):
        m = re.search(r"SCALE_r(\d+)\.json$", path)
        if m:
            with open(path) as fh:
                out[int(m.group(1))] = json.load(fh)
    return out


def test_every_scale_citation_names_a_committed_artifact():
    artifacts = _artifacts()
    failures = []
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        for lineno, line in enumerate(fh, 1):
            rounds = {int(m) for m in re.findall(r"SCALE_r(\d+)", line)}
            for rnd in rounds:
                art = artifacts.get(rnd)
                if art is None:
                    failures.append(
                        (lineno, rnd, "no committed SCALE_r%02d.json" % rnd)
                    )
                    continue
                names = set(art.get("ops", {}))
                hit = any(n in line for n in names) or any(
                    s in line and s in art for s in _SECTIONS
                )
                if not hit:
                    failures.append(
                        (lineno, rnd, "no op on this line is in the artifact")
                    )
    assert not failures, (
        "COVERAGE.md scale citations without a committed artifact row "
        "(regenerate with tools/bench_scale.py --out SCALE_r{NN}.json at "
        f"the repo root): {failures}"
    )


def test_scale_artifacts_are_wellformed():
    artifacts = _artifacts()
    assert artifacts, "no committed SCALE_r*.json at the repo root"
    for rnd, art in artifacts.items():
        assert art.get("ops") or any(s in art for s in _SECTIONS), rnd
        for name, row in art.get("ops", {}).items():
            assert {"small_sec", "big_sec", "ratio"} <= set(row), (
                rnd,
                name,
            )


_CANON = re.compile(r"SCALE_r(\d+)(?:\.json)?\s+(\d+(?:\.\d+)?)[x×]")


def test_canonical_scale_citations_match_artifact_ratios():
    """Numeric-agreement ratchet (VERDICT r10 item #4): a canonical
    ``SCALE_rNN <ratio>x`` citation must quote the committed artifact's
    ratio for an operator named on the same line -- prose and artifact
    can no longer diverge (round 10's 1.0-claimed vs 2.41-committed
    class becomes a lint red, not a judge finding). Historical narrative
    ratios without the canonical form are out of scope: they describe
    superseded measurements, not the durable record."""
    artifacts = _artifacts()
    failures = []
    for doc in ("COVERAGE.md", "BASELINE.md"):
        with open(os.path.join(REPO, doc)) as fh:
            for lineno, line in enumerate(fh, 1):
                for m in _CANON.finditer(line):
                    rnd, claimed = int(m.group(1)), float(m.group(2))
                    art = artifacts.get(rnd)
                    if art is None:
                        failures.append((doc, lineno, rnd, "no artifact"))
                        continue
                    ops_on_line = [
                        n for n in art.get("ops", {}) if n in line
                    ]
                    if not ops_on_line:
                        # covered by the existence lint when COVERAGE
                        # cites per-op rows; skew-section cites carry
                        # multiple ratios per slice and are exempt here
                        continue
                    ok = any(
                        abs(claimed - float(art["ops"][n]["ratio"])) < 0.006
                        for n in ops_on_line
                        if art["ops"][n].get("ratio") is not None
                    )
                    if not ok:
                        failures.append(
                            (
                                doc,
                                lineno,
                                f"claims SCALE_r{rnd:02d} {claimed}x but "
                                f"artifact has "
                                + ", ".join(
                                    f"{n}={art['ops'][n].get('ratio')}"
                                    for n in ops_on_line
                                ),
                            )
                        )
    assert not failures, failures
