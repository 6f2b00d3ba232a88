#!/usr/bin/env python3
"""Round-over-round physical-plan drift adjudicator (dev tooling).

Usage: python3 tools/plan_diff.py <plansDirA> <plansDirB>

Compares two `target/plans/` dumps (one per bench run) by plan SHAPE:
expression ids (#123), file paths and statistics vary run to run, so each
plan is normalized to its operator-tree skeleton (the indented node names
of the `== Physical Plan ==` header block) before hashing. Output: one
line per query whose skeleton changed, plus added/removed queries.

This is the adjudication rule from the round-7 drift finding: identical
skeletons + uniform timing inflation => session noise; a skeleton delta
=> a real plan regression with the culprit visible in the two files.
Exit 0 when nothing changed, 1 otherwise.
"""
import os
import re
import sys


def skeleton(path):
    """The operator-tree header block with per-node detail stripped."""
    lines = []
    in_tree = False
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("== Physical Plan =="):
                in_tree = True
                continue
            if in_tree:
                if not line.strip():
                    break
                # drop node ids and codegen-stage ids: "Sort (6)" -> "Sort",
                # "WholeStageCodegen (2)" -> "WholeStageCodegen"; drop AQE
                # runtime statistics ("ShuffleQueryStage (26), Statistics(
                # sizeInBytes=238.5 KiB, rowCount=...)") — row counts move
                # with every testdata regen and are not plan shape
                stripped = re.sub(r",\s*Statistics\(.*$", "", line.rstrip())
                lines.append(re.sub(r"\s*\(\d+\)\s*$", "", stripped))
    return "\n".join(lines)


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    a = {f[:-4]: skeleton(os.path.join(a_dir, f))
         for f in os.listdir(a_dir) if f.endswith(".txt")}
    b = {f[:-4]: skeleton(os.path.join(b_dir, f))
         for f in os.listdir(b_dir) if f.endswith(".txt")}
    changed = sorted(q for q in a.keys() & b.keys() if a[q] != b[q])
    added = sorted(b.keys() - a.keys())
    removed = sorted(a.keys() - b.keys())
    for q in changed:
        print(f"[plan-changed] {q}")
    for q in added:
        print(f"[added] {q}")
    for q in removed:
        print(f"[removed] {q}")
    same = len(a.keys() & b.keys()) - len(changed)
    print(f"== {same} unchanged, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed")
    sys.exit(1 if (changed or removed) else 0)


if __name__ == "__main__":
    main()
