#!/usr/bin/env python3
"""Round-over-round physical-plan drift adjudicator (dev tooling).

Usage: python3 tools/plan_diff.py <plansA> <plansB>
       python3 tools/plan_diff.py --snapshot <plansDir> <out.json>

Compares two plan surfaces (each either a `target/plans/` dump or a
`--snapshot` JSON of one) by plan SHAPE: expression ids (#123), file paths
and statistics vary run to run, so each plan is normalized to its
operator-tree skeleton (the indented node names of the `== Physical Plan ==`
header block) before hashing. Output: one line per query whose skeleton
changed, plus added/removed queries.

`--snapshot` writes {query: sha256(skeleton)} — small enough to COMMIT per
round (PLANS_r{N}.json), which is what makes the cross-round diff possible
at all: target/plans is overwritten by every bench run, so without a
committed snapshot a later round has nothing to adjudicate its movers
against (the r11→r12 lesson).

This is the adjudication rule from the round-7 drift finding: identical
skeletons + uniform timing inflation => session noise; a skeleton delta
=> a real plan regression with the culprit visible in the two files.
Exit 0 when nothing changed, 1 otherwise.
"""
import hashlib
import json
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


def sha(text):
    return hashlib.sha256(text.encode("utf-8")).hexdigest()[:16]


def surface(path):
    """{query: skeleton-hash} from a plans dir or a snapshot JSON."""
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return {f[:-4]: sha(skeleton(os.path.join(path, f)))
            for f in os.listdir(path) if f.endswith(".txt")}


def main():
    if sys.argv[1] == "--snapshot":
        plans_dir, out = sys.argv[2], sys.argv[3]
        s = surface(plans_dir)
        with open(out, "w", encoding="utf-8") as f:
            json.dump(s, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"wrote {out}: {len(s)} plan skeleton hashes")
        return
    a, b = surface(sys.argv[1]), surface(sys.argv[2])
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
