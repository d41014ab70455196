#!/usr/bin/env python3
"""Claims-vs-artifacts close-out check (VERDICT r3 Weak #1, r4 Weak #1).

Rounds 2-4 each shipped a doc line promising an eval artifact or record
that did not exist.  Round 4's hand-maintained register missed the one
live drift (the `_ft` rows), so this version scans the docs for claimed
record keys AUTOMATICALLY:

1. every `eval/<name>.json` path mentioned in the repo's markdown must
   exist on disk;
2. every backtick-quoted record-key-looking token within 2 lines of an
   `eval/*.json` mention must resolve in that JSON: as a dotted path
   from the root, as a key anywhere in the tree, or (for `_suffix`
   tokens like `_ft`) as the suffix of some key in the tree.  There is
   no opt-out list of keys — a doc token that cannot resolve fails the
   suite, so a false positive must be fixed by rephrasing the doc or
   adding the artifact, never by editing this script's logic per-claim;
3. the explicit PROMISED_RECORDS register (belt and braces) must
   resolve.

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
    ("eval/real_eval_r4.json", "records.ours_vs_real"),
    ("eval/real_eval_r4.json", "records.ours_zssr_vs_real"),
    ("eval/synthetic_eval_r4.json", "validation_psnr_trajectory_db"),
    # round-5 promises (ROUND4/DESIGN few-shot rows; VERDICT r4 Missing #2):
    ("eval/real_eval_r5.json", "records.ours_vs_real_ft"),
    ("eval/real_eval_r5.json", "records.spider_ours_ft"),
]

MD_EVAL_RE = re.compile(r"eval/[A-Za-z0-9_.-]+\.json")
BACKTICK_RE = re.compile(r"`([^`]+)`")
# a record-key-looking token: snake_case (optionally dotted), must contain
# an underscore or a dot so plain words like `records` don't count
KEY_RE = re.compile(r"^[A-Za-z][A-Za-z0-9]*(?:[_.][A-Za-z0-9]+)+$|^_[a-z0-9_]+$")

# Docs that are not OUR claims: the judge's/advisor's documents and
# retrieved public content (SNIPPETS/PAPERS — untrusted, may quote
# arbitrary paths).
EXCLUDED_MD = ("VERDICT.md", "ADVICE.md", "SNIPPETS.md", "PAPERS.md")


def resolve(d, path):
    for part in path.split("."):
        if not isinstance(d, dict) or part not in d:
            return None
        d = d[part]
    return d


def all_keys(node, out=None):
    """Every dict key anywhere in a JSON tree (recursing through lists)."""
    if out is None:
        out = set()
    if isinstance(node, dict):
        for k, v in node.items():
            out.add(k)
            all_keys(v, out)
    elif isinstance(node, list):
        for v in node:
            all_keys(v, out)
    return out


def key_claims(md_path):
    """(json_path, token, lineno) for every record-key-looking backticked
    token within 2 lines of an eval/*.json mention."""
    with open(md_path, encoding="utf-8", errors="replace") as f:
        lines = f.read().splitlines()
    json_mentions = []  # (lineno, json_path)
    for i, line in enumerate(lines):
        for m in MD_EVAL_RE.finditer(line):
            json_mentions.append((i, m.group(0)))
    claims = []
    for i, jpath in json_mentions:
        lo, hi = max(0, i - 2), min(len(lines), i + 3)
        for li in range(lo, hi):
            for span in BACKTICK_RE.finditer(lines[li]):
                for tok in span.group(1).split():
                    if tok.startswith("-") or "/" in tok:
                        continue  # CLI flag / path
                    if re.search(r"\.(json|py|md|sh|gif|png|jpg|ckpt)$", tok):
                        continue  # file name
                    if KEY_RE.match(tok):
                        claims.append((jpath, tok, li + 1))
    return claims


def token_resolves(data, keys, tok):
    if tok in keys or resolve(data, tok) is not None:
        return True
    if tok.startswith(("_", ".")):  # suffix claim, e.g. `_ft`
        return any(k.endswith(tok) for k in keys)
    return False


def main() -> int:
    failures = []

    md_files = [f for f in glob.glob(os.path.join(ROOT, "**", "*.md"),
                                     recursive=True)
                if "/reference/" not in f and "/.git/" not in f
                and os.path.basename(f) not in EXCLUDED_MD]

    mentioned = set()
    claimed = []  # (json_path, token, src, lineno)
    for md in md_files:
        rel = os.path.relpath(md, ROOT)
        with open(md, encoding="utf-8", errors="replace") as f:
            for m in MD_EVAL_RE.finditer(f.read()):
                mentioned.add((m.group(0), rel))
        for jpath, tok, ln in key_claims(md):
            claimed.append((jpath, tok, rel, ln))

    for path, src in sorted(mentioned):
        if not os.path.exists(os.path.join(ROOT, path)):
            failures.append(f"{src} mentions {path} which does not exist")

    cache = {}
    for jpath, tok, src, ln in claimed:
        full = os.path.join(ROOT, jpath)
        if not os.path.exists(full):
            continue  # already reported above
        if jpath not in cache:
            with open(full) as f:
                data = json.load(f)
            cache[jpath] = (data, all_keys(data))
        data, keys = cache[jpath]
        if not token_resolves(data, keys, tok):
            failures.append(
                f"{src}:{ln} claims `{tok}` near {jpath} but no such key "
                f"resolves in it")

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
              f"{len(claimed)} scanned key claims, "
              f"{len(PROMISED_RECORDS)} promised records")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
