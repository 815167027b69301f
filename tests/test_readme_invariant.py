"""README scoreboard invariant (round-4 verdict item 8).

Every BOLDED number in README.md's performance section must appear in a
committed artifact of record (benchmarks/results/*, BENCH_r*.json,
checkpoints/*.json), rounded to the README token's own precision —
the mechanical guard against the doc drift that recurred in rounds 3
and 4 (README quoting numbers no capture contains).

Rules:
- only ``**bold**`` tokens between "## Performance" and the next "## "
  heading are checked (bold is the repo convention for headline claims);
- a number prefixed with ``~`` (inside the same bold token) is a declared
  approximation and exempt;
- a README value v with d decimal places matches if some artifact number
  x satisfies round(x, d) == v (comma separators stripped); integers may
  also match a whole-number artifact value exactly.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re

REPO = os.path.join(os.path.dirname(__file__), "..")
README = os.path.join(REPO, "README.md")

ARTIFACT_GLOBS = (
    "benchmarks/results/*.json",
    "benchmarks/results/*.jsonl",
    "BENCH_r*.json",
    "MULTICHIP_r*.json",
    "checkpoints/*.json",
    "BASELINE.json",
)

_NUM = re.compile(r"~?\d[\d,]*(?:\.\d+)?")


def _artifact_numbers() -> list[float]:
    nums: list[float] = []
    for pat in ARTIFACT_GLOBS:
        for path in glob.glob(os.path.join(REPO, pat)):
            with open(path) as f:
                text = f.read()
            for m in re.finditer(r"\d+(?:\.\d+)?(?:e[+-]?\d+)?", text):
                try:
                    nums.append(float(m.group()))
                except ValueError:
                    pass
    return nums


def _perf_section() -> str:
    with open(README) as f:
        text = f.read()
    m = re.search(r"## Performance.*?(?=\n## )", text, re.DOTALL)
    assert m, "README.md has no '## Performance' section"
    return m.group()


def test_readme_bold_numbers_have_artifacts():
    section = _perf_section()
    artifact_nums = _artifact_numbers()
    assert artifact_nums, "no committed artifacts found to check against"

    missing = []
    for bold in re.findall(r"\*\*(.+?)\*\*", section):
        # a ~ before a range marks BOTH endpoints approximate (~600–730×)
        bold = re.sub(r"(~[\d,.]+)[–-](\d)", r"\1–~\2", bold)
        for tok in _NUM.findall(bold):
            if tok.startswith("~"):
                continue  # declared approximation
            clean = tok.replace(",", "")
            val = float(clean)
            if val < 2:  # bare list indices / config ordinals, not claims
                continue
            decimals = len(clean.split(".")[1]) if "." in clean else 0
            ok = any(
                math.isclose(round(x, decimals), val, rel_tol=0, abs_tol=1e-9)
                for x in artifact_nums
            )
            if not ok:
                missing.append(f"{tok!r} (from bold token {bold!r})")
    assert not missing, (
        "README performance section quotes bolded numbers that appear in "
        "no committed artifact (prefix with ~ only for declared "
        "approximations):\n  " + "\n  ".join(missing)
    )
