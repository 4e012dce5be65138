"""Round-close commit lint (r7 VERDICT task #7): guard the round's commit
messages against the two ledger-integrity failures round 7 actually shipped —

1. TRUNCATION ARTIFACTS: commit 14341be (the r7 round's key fix) ended
   mid-sentence with "... wait", permanently recording a draft as history.
   The lint flags messages whose last non-trailer line ends in a dangling
   token ("wait", "TODO", "...", an unclosed paren, or a trailing comma/
   arrow) so a draft can't ship silently again.

2. STALE REGISTRY COUNTS: the r7 close message said "registry ... 341" when
   the final state was 343.  The lint extracts "registry ... N"/"N queries
   registered"-shaped claims from the round's commits and asserts the MOST
   RECENT claim equals ``len(queries_map())`` — earlier commits may
   legitimately state smaller intermediate counts.

Run from the repo root as part of the round-close checklist:

    python scripts/commit_lint.py              # lint commits since last round tag
    python scripts/commit_lint.py --since HEAD~20

Exit 0 = clean; exit 1 = findings (printed one per line).
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# last-line endings that read as an unfinished draft
_DANGLING = re.compile(
    r"(\.\.\.|\bwait\b|\bTODO\b|\bFIXME\b|\bWIP\b|,|->|\band\b|\bor\b|\bthe\b)\s*$",
    re.IGNORECASE,
)
_TRAILER = re.compile(r"^[A-Za-z-]+: ")
# Only REGISTRY-context claims count: "registry 343 -> 355", "registry 355",
# or "NNN registered (oracle-checked) queries".  A bare "NNN queries" is NOT
# a claim (e.g. "tail 188 s across 173 queries" describes a bench subset —
# the first false positive this regex produced, r8).
_COUNT_CLAIM = re.compile(
    r"(?:registry\s+(?:\d+\s*->\s*)?(\d{2,4})\b"
    r"|\b(\d{2,4})\s+registered(?:\s+oracle-checked)?\s+queries)",
    re.IGNORECASE,
)


def _commits(since: str) -> list[tuple[str, str]]:
    out = subprocess.run(
        ["git", "log", "--format=%H%x00%B%x01", f"{since}..HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    commits = []
    for chunk in out.split("\x01"):
        chunk = chunk.strip("\n")
        if not chunk.strip():
            continue
        sha, body = chunk.split("\x00", 1)
        commits.append((sha.strip()[:9], body.rstrip("\n")))
    return commits


def _default_since() -> str:
    """Default window: commits since the previous driver round file landed
    (the 'round N: verdict/...' commit the driver makes), else last 30."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s", "-200"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+: verdict", subject):
            return sha
    return "HEAD~30"


def lint(since: str) -> list[str]:
    findings: list[str] = []
    commits = _commits(since)
    # 1. truncation artifacts
    for sha, body in commits:
        lines = [ln for ln in body.splitlines() if ln.strip()]
        content = [ln for ln in lines if not _TRAILER.match(ln)]
        if not content:
            continue
        last = content[-1].strip()
        if _DANGLING.search(last) or last.count("(") > last.count(")"):
            findings.append(
                f"{sha}: message ends in a draft artifact: {last!r}"
            )
    # 2. registry-count claims vs the live registry (most recent claim wins)
    sys.path.insert(0, str(REPO))
    from e_commerce_streaming_datapipeline_spark.plans.registry import queries_map

    live = len(queries_map())
    for sha, body in commits:  # commits are newest-first
        m = _COUNT_CLAIM.search(body)
        if m:
            claimed = int(m.group(1) or m.group(2))
            if claimed != live:
                findings.append(
                    f"{sha}: most recent registry-count claim {claimed} != "
                    f"live registry {live}"
                )
            break  # only the newest claim must match the final state
    return findings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--since", default=None,
                    help="lint commits in <since>..HEAD (default: since the "
                         "previous driver-round commit)")
    args = ap.parse_args()
    since = args.since or _default_since()
    findings = lint(since)
    for f in findings:
        print(f"COMMIT-LINT: {f}")
    if findings:
        raise SystemExit(1)
    print(f"commit-lint clean ({since}..HEAD)")


if __name__ == "__main__":
    main()
