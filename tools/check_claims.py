#!/usr/bin/env python3
"""Claims-vs-artifacts close-out check (VERDICT r3 Weak #1).

Round 2 and round 3 each shipped one doc line promising an artifact that
did not exist (r3: DESIGN.md promised `ours_vs_real_ft` rows that were
never written).  This script makes that failure mode a CI failure:

1. every `eval/<name>.json` path mentioned in the repo's markdown must
   exist on disk;
2. every (file, key-path) in PROMISED_RECORDS — the explicit register of
   doc claims about artifact *contents* — must resolve.

Run directly (`python tools/check_claims.py`) or via the default suite
(tests/test_cli.py::test_claims_vs_artifacts).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Explicit register of documented claims about artifact contents.
# Format: (json file, "dotted.key.path").  Update alongside the docs.
PROMISED_RECORDS = [
    ("eval/real_eval_r3.json", "records.ours_vs_real"),
    ("eval/real_eval_r3.json", "records.ours_int8_vs_real"),
    ("eval/ab_trajectory_r4.json", "d_health"),
    ("eval/synthetic_eval_r3.json", "context.validation_psnr_trajectory_db"),
    # round-4 promises (DESIGN.md "Test-time adaptation", README serving):
    ("eval/real_eval_r4.json", "records.ours_vs_real"),
    ("eval/real_eval_r4.json", "records.ours_zssr_vs_real"),
    ("eval/synthetic_eval_r4.json", "validation_psnr_trajectory_db"),
]

MD_EVAL_RE = re.compile(r"eval/[A-Za-z0-9_.-]+\.json")


def resolve(d, path):
    for part in path.split("."):
        if not isinstance(d, dict) or part not in d:
            return None
        d = d[part]
    return d


def main() -> int:
    failures = []

    # VERDICT/ADVICE are the judge's/advisor's documents (they reference
    # asks, not claims); everything else in-repo states our own claims.
    md_files = [f for f in glob.glob(os.path.join(ROOT, "**", "*.md"),
                                     recursive=True)
                if "/reference/" not in f and "/.git/" not in f
                and os.path.basename(f) not in ("VERDICT.md", "ADVICE.md")]
    mentioned = set()
    for md in md_files:
        with open(md, encoding="utf-8", errors="replace") as f:
            for m in MD_EVAL_RE.finditer(f.read()):
                mentioned.add((m.group(0), os.path.relpath(md, ROOT)))
    for path, src in sorted(mentioned):
        if not os.path.exists(os.path.join(ROOT, path)):
            failures.append(f"{src} mentions {path} which does not exist")

    for path, key in PROMISED_RECORDS:
        full = os.path.join(ROOT, path)
        if not os.path.exists(full):
            failures.append(f"promised artifact missing: {path}")
            continue
        with open(full) as f:
            data = json.load(f)
        if resolve(data, key) is None:
            failures.append(f"{path}: promised key '{key}' missing")

    for f_ in failures:
        print(f"CLAIM-CHECK FAIL: {f_}")
    if not failures:
        print(f"claims check ok: {len(mentioned)} doc references, "
              f"{len(PROMISED_RECORDS)} promised records")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
