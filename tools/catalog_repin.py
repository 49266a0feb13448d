#!/usr/bin/env python3
"""Mechanical CATALOG.md repin — the pre-commit twin of
graft.tools.CatalogRepin (same rules, no JVM startup, <1 s).

The r16 AND r18 rounds both shipped a red CatalogSpec because a
src-touching commit landed AFTER the last repin/gate run. The Scala
tool remains the canonical repair; this script exists so a git
pre-commit hook (tools/hooks/pre-commit) can re-derive the line pins on
EVERY commit that touches src/main — making the failure class
structurally impossible instead of procedurally avoided.

Regenerates, in place:
  - each row's `file:line` -> the key's first `"key" ->` line;
  - each `## section (N)` header count;
  - the `**Total: N operators ...**` footer count.
Exits 1 (blocking the commit) if a row names a key with no
registration — a typo must not be silently "repinned".
"""
import re
import sys

ROW = re.compile(r"^(\| `([a-z0-9_]+)` \| .+ \| )([^|: ]+):(\d+)( \|)$")
HEADER = re.compile(r"^(## .+ )\((\d+)\)$")
TOTAL = re.compile(r"^(\*\*Total: )(\d+)( operators.*)$")
REG = re.compile(r'"([a-z0-9_]+)" -> ')


def registrations(path, cache={}):
    if path not in cache:
        regs = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f, 1):
                m = REG.search(line)
                if m and m.group(1) not in regs:
                    regs[m.group(1)] = i
        cache[path] = regs
    return cache[path]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "CATALOG.md"
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()

    missing = []
    repinned = []
    for line in lines:
        m = ROW.match(line)
        if not m:
            repinned.append(line)
            continue
        prefix, key, fname, _, suffix = m.groups()
        ln = registrations(fname).get(key)
        if ln is None:
            missing.append(f"{key} (no registration in {fname})")
        else:
            repinned.append(f"{prefix}{fname}:{ln}{suffix}")
    if missing:
        print(f"[repin] FAILED: {'; '.join(missing)}", file=sys.stderr)
        sys.exit(1)

    total = sum(1 for l in repinned if ROW.match(l))
    out = []
    for i, line in enumerate(repinned):
        h = HEADER.match(line)
        t = TOTAL.match(line)
        if h:
            n = 0
            for l in repinned[i + 1:]:
                if l.startswith("## "):
                    break
                if ROW.match(l):
                    n += 1
            out.append(f"{h.group(1)}({n})")
        elif t:
            out.append(f"{t.group(1)}{total}{t.group(3)}")
        else:
            out.append(line)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")
    print(f"[repin] {total} rows, refs + counts regenerated in {path}")


if __name__ == "__main__":
    main()
