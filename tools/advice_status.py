#!/usr/bin/env python3
"""Mark each ADVICE.md finding FIXED/OPEN at the current HEAD.

The round-12 and round-13 verdicts both flagged ADVICE.md going stale
(items fixed in-round but still presented as open, inviting a wasted
session). This script makes the staleness check mechanical:

- each ADVICE bullet anchors to `src/...:<line>` and carries the
  offending construct in backticks and/or quoted strings;
- a finding is heuristically FIXED when its backticked code tokens no
  longer appear in the anchored file (or, for byte-level findings like
  the NUL sentinel, when the byte is gone);
- `--stamp` rewrites ADVICE.md in place, appending
  `_Status @ <short-sha>: FIXED/OPEN (reason)_` to each bullet.

Heuristics err toward OPEN: a finding whose tokens still appear is
left open for a human read. Usage:

    python3 tools/advice_status.py [--stamp]
"""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def head_sha():
    return subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()


def parse(advice_text):
    """Yield (bullet_text, file, line, code_tokens) per finding."""
    for bullet in re.findall(r"^- \*\*.+?(?=^- \*\*|\Z)", advice_text,
                             re.M | re.S):
        m = re.search(r"(src/[\w/]+\.scala):(\d+)", bullet)
        if not m:
            continue
        toks = re.findall(r"`([^`]{3,80})`", bullet)
        # drop the path itself and prose-like tokens
        # keep a token if it is path-free AND (a bare identifier, or
        # structural code with parens/braces/operators); the previous
        # `A and B or C` precedence kept prose containing "=" and
        # dropped slash-free identifiers next to structural ones
        toks = [t for t in toks if "/" not in t
                and (" " not in t.strip() or re.search(r"[(){}<>=.]", t))]
        yield bullet, m.group(1), int(m.group(2)), toks


def status(path, line, toks):
    f = REPO / path
    if not f.exists():
        return "FIXED", "file removed"
    data = f.read_bytes()
    if b"\x00" in data:
        return "OPEN", "file still contains a NUL byte"
    text = data.decode("utf-8", errors="replace")
    present = [t for t in toks
               if t not in ("", path) and t in text]
    # tokens that are pure identifiers may legitimately remain (the fix
    # can keep the name); only count tokens carrying structure
    structural = [t for t in present if re.search(r"[(){}=<>]", t)]
    if structural:
        return "OPEN", f"still matches: {structural[0][:50]}"
    if present:
        return "CHECK", f"identifier still present: {present[0][:40]}"
    return "FIXED", "anchored constructs no longer match"


def main():
    advice = REPO / "ADVICE.md"
    text = advice.read_text()
    sha = head_sha()
    stamped = text
    rows = []
    for bullet, path, line, toks in parse(text):
        st, why = status(path, line, toks)
        rows.append((st, path, line, why))
        if "--stamp" in sys.argv and f"_Status @" not in bullet:
            stamped = stamped.replace(
                bullet, bullet.rstrip("\n") +
                f"\n  _Status @ {sha}: {st} ({why})_\n", 1)
    for st, path, line, why in rows:
        print(f"{st:5s} {path}:{line} — {why}")
    if "--stamp" in sys.argv:
        advice.write_text(stamped)
        print(f"stamped ADVICE.md @ {sha}")


if __name__ == "__main__":
    main()
