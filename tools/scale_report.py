#!/usr/bin/env python3
"""Assemble the BENCH10X scale-evidence artifact (dev tooling).

Usage: python3 tools/scale_report.py <bench_sf01.json> <bench_sf1.json> \
           <copies> <out.json> [plans_baseline.json] [plans_dir]

Joins two graft.Bench per-key maps measured on the base corpus and on the
Gen10x-amplified corpus (an isomorphic N-fold replication — see
Gen10x.scala), emits per-key {sf01, sf1, ratio} plus a per-family rollup,
and (when given a committed plan-skeleton baseline + the 10x run's
target/plans dump) the plan_diff verdict proving the skeletons did not
change with scale.

Interpretation: ratio ≈ N is linear scaling; ratio << N means the key is
stage-overhead-bound at base scale (expected for sub-second keys); ratio
substantially > N on a >1s key is a superlinearity flag to investigate.
Build/maintenance keys are one-time costs and judged by the same ratio.
"""
import json
import subprocess
import sys


FAMILIES = {
    "dedup": lambda k: k.startswith("dedup_") or k.startswith("corpus_"),
    "decontam": lambda k: k.startswith("decontam") or k == "text_decontam",
    "pipeline_curation": lambda k: k.startswith("pipeline_curate")
        or k.startswith("pipeline_audit"),
    "retrieval": lambda k: k in ("text_bm25", "retrieve_rrf", "knn_filtered"),
    "ann": lambda k: k.startswith("knn_") or k.startswith("ann_")
        or k.startswith("emb_"),
    "index_maintenance": lambda k: k.endswith("_index_build")
        or k.endswith("_probe") or k in ("maint_compact", "span_probe",
            "shingle_probe_fragmented", "shingle_probe_compacted"),
    "event_pipeline": lambda k: k.startswith("pipeline_ingest")
        or k.startswith("pipeline_replicate") or k.startswith("pipeline_consume"),
    # the pack/shuffle family rides the r17 auto-geometries
    # (CrossHash.shardsFor / GlobalCumsum.bucketsFor)
    "corpus_pack": lambda k: k.startswith("doc_"),
    "relational": lambda k: k.startswith("q") and k[1].isdigit(),
}


def family(k):
    for name, pred in FAMILIES.items():
        if pred(k):
            return name
    return "other"


def main():
    aj = json.load(open(sys.argv[1]))
    bj = json.load(open(sys.argv[2]))
    a, b = aj["queries"], bj["queries"]
    copies = float(sys.argv[3])
    out_path = sys.argv[4]
    keys = sorted(set(a) & set(b))
    per_key = {
        k: {"sf01": round(a[k], 3), "sf1": round(b[k], 3),
            "ratio": round(b[k] / a[k], 2), "family": family(k)}
        for k in keys
    }
    # family sums exclude the pipeline LEG keys (informational sub-timings
    # of the combined pipeline_ingest_replicate_consume key — counting
    # both double-counts the family ~2x; Bench.isLegKey is the Scala twin
    # of this rule, and Bench's own `families` block applies it too)
    LEGS = {"pipeline_ingest", "pipeline_replicate", "pipeline_consume"}
    fams = {}
    for k, v in per_key.items():
        if k in LEGS:
            continue
        f = fams.setdefault(v["family"], {"sf01": 0.0, "sf1": 0.0, "keys": 0})
        f["sf01"] += v["sf01"]
        f["sf1"] += v["sf1"]
        f["keys"] += 1
    for f in fams.values():
        f["ratio"] = round(f["sf1"] / f["sf01"], 2) if f["sf01"] else None
        f["sf01"] = round(f["sf01"], 2)
        f["sf1"] = round(f["sf1"], 2)
    plan_diff = None
    if len(sys.argv) > 6:
        r = subprocess.run(
            [sys.executable, "tools/plan_diff.py", sys.argv[5], sys.argv[6]],
            capture_output=True, text=True)
        plan_diff = {"exit": r.returncode,
                     "report": r.stdout.strip().splitlines()}
    # superlinear flags: only meaningful where the base time is real work.
    # FLOOR RULE (r17, closing the r16 verdict's mis-tuned-floor finding):
    # at copies >= 100 a 0.98s/137x key is a real signal, so the per-key
    # base-time floor drops from 1.0s to 0.5s for the second decade; and
    # FAMILY totals are flagged too (family sf01 >= 1.0s) so a family of
    # individually-sub-floor keys can't scale superlinearly unflagged.
    floor = 1.0 if copies < 100 else 0.5
    flags = [k for k, v in per_key.items()
             if v["sf01"] >= floor and v["ratio"] > copies * 1.3]
    family_flags = [f for f, v in fams.items()
                    if v["sf01"] >= 1.0 and v["ratio"] is not None
                    and v["ratio"] > copies * 1.3]
    artifact = {
        "copies": copies,
        "flag_floor_sec": floor,
        "families": fams,
        "superlinear_flags": flags,
        "family_flags": family_flags,
        # protocol self-description from the two bench runs (r17): the
        # scale protocol varies SPARK_GRAFT_SHUFFLE per decade, so the
        # artifact records what each side ran under
        "protocol": {"base": aj.get("protocol"), "scaled": bj.get("protocol"),
                     "load_avg": {"base": aj.get("load_avg"),
                                  "scaled": bj.get("load_avg")}},
        "per_key": per_key,
        "plan_diff": plan_diff,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}: {len(per_key)} keys, "
          f"{len(flags)} superlinear flags, {len(family_flags)} family flags")
    for name, f in sorted(fams.items()):
        print(f"  {name:20s} sf01={f['sf01']:>8.2f}s sf1={f['sf1']:>8.2f}s "
              f"ratio={f['ratio']}")


if __name__ == "__main__":
    main()
