#!/usr/bin/env python3
"""Dev-side self-evidencing leak scan (VERDICT r7 item 6 / ADVICE r6).

Mirrors the driver's LEAKCHECK patterns but records *what* was scanned:
the git HEAD sha and the number of files, so a green result is auditable.
Writes LEAKCHECK_SELF.json in the repo root.

Usage: python3 tools/leakscan.py
"""
import json, os, re, subprocess, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    "internal-import": r"import\s+(com\.anthropic|ai\.anthropic)",
    "internal-url": r"https?://[a-z0-9.-]*\b(anthropic|ant-internal)\b",
    "internal-bucket": r"s3://(anthropic|ant-)",
    "slack-link": r"slack\.com/archives",
    "api-key": r"sk-ant-[A-Za-z0-9_-]{8,}",
}

def main():
    sha = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], cwd=ROOT).decode().strip()
    files = []
    for base in ("src", "tools", "build.sbt", "project"):
        p = os.path.join(ROOT, base)
        if os.path.isfile(p):
            files.append(p)
        else:
            for dirpath, _, names in os.walk(p):
                for n in names:
                    if n.endswith((".scala", ".sbt", ".py", ".md", ".json")):
                        files.append(os.path.join(dirpath, n))
    hits = {k: [] for k in PATTERNS}
    for f in files:
        try:
            text = open(f, errors="replace").read()
        except OSError:
            continue
        for key, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                hits[key].append({"file": os.path.relpath(f, ROOT),
                                  "match": m.group(0)[:80]})
    out = {
        "scanned_head_sha": sha,
        "n_files_scanned": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    path = os.path.join(ROOT, "LEAKCHECK_SELF.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({"sha": sha, "files": len(files), "hits": out["n_hits"]}))
    return 0 if out["n_hits"] == 0 else 1

if __name__ == "__main__":
    sys.exit(main())
