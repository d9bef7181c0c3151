#!/usr/bin/env python3
"""Multi-process bench floors + like-for-like round comparison.

The r7 finding: identical code moved individual queries ±20-40% between
runs (box noise), so single-run per-query numbers cannot grade
round-over-round regressions. Protocol fix (VERDICT r7 #2):

  1. Run `graft.Bench` N>=3 times (separate JVMs, same box, back to
     back). Each run already interleaves its passes epoch-wise.
  2. Per query, take the FLOOR across processes (min of mins) and the
     cross-process spread (max of mins - min of mins).
  3. A round-over-round delta is a real regression ONLY if it exceeds
     the cross-process spread envelope of BOTH rounds; everything
     smaller is box noise by construction.

r9 addendum: the min-of-mins is itself a one-sided noisy statistic at
N=3 — r8's text_inverted_index floor (0.84s) was one lucky process
([1.51, 0.84, 1.39]), and r9's first compare flagged it +0.95s "REAL"
against unchanged code. Before believing a REAL flag, check whether
the new floor falls inside the OLD round's per-process min range
(per_process_mins in the artifact), and buy extra processes for the
movers (merge accepts any number of run files); r9's 10-process merge
cleared every flagged regression without a code change.

Usage:
    python3 scripts/bench_floor.py run  [N] [sfDir] [focusCSV] [focusN]
    python3 scripts/bench_floor.py merge f1.json f2.json ...
    python3 scripts/bench_floor.py compare floor.json BENCH_rXX.json

`focusCSV` names queries that get focusN (default 3) EXTRA dedicated
processes up front (SPARK_GRAFT_BENCH_ONLY, 3 passes each) before the
merge — the r9 adjudication follow-up: the two movers that flagged REAL
against unchanged code (text_inverted_index, dicom_partitioned_sql)
deserve their own multi-pass processes so their floors are not one
lucky (or unlucky) 182-query JVM.

`run` writes target/bench_run<i>.json per process and the merged
target/bench_floor.json. `compare` prints the like-for-like table:
per query, old min, new floor, delta, the noise envelope, and a REAL
flag only where |delta| > envelope.
"""
import json, os, subprocess, sys


def spread_of(passes):
    return (max(passes) - min(passes)) if passes else -1.0


# r15 promotion rule (VERDICT r14 #3): a valid-only floor within this
# envelope of the raw any-source floor becomes the HEADLINE floor.
# Three rounds of "[new floor from invalid run]" disclosures were stamp
# technicalities (warm-descent sweep processes self-stamped invalid by
# box load while dedicated valid processes bracketed the same value —
# the r14 stream_pq_index_refresh 0.01s flag tie the comic extreme),
# not measurement doubt. ε = max(2% relative, 0.05s absolute — the
# latter is compare()'s own noise cutoff, below which no delta is ever
# adjudicated anyway). The raw any-source floor is preserved per query
# in queries_any_source.
PROMOTE_EPS_REL = 0.02
PROMOTE_EPS_ABS = 0.05


def merge(files, out_path="target/bench_floor.json"):
    runs = [json.load(open(f)) for f in files]
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    floor, xspread, per_run = {}, {}, {}
    # r11 validity gate (VERDICT r10 "What's wrong" #2): a floor is only
    # as trustworthy as the process it came from — a loaded box
    # (valid:false self-stamp) can inflate a query's min exactly like a
    # code regression. Record, per query, whether its floor came from a
    # self-stamped-valid process, and the valid-only floor alongside, so
    # `compare` adjudicates movers against measurements, not load.
    floor_from_valid, floor_valid_only, any_source = {}, {}, {}
    promoted = []
    valids = [bool(r.get("valid")) for r in runs]
    for q in names:
        mins = [(r["queries"][q], valids[i]) for i, r in enumerate(runs)
                if r["queries"].get(q, -1) >= 0]
        if not mins:
            floor[q], xspread[q] = -1.0, -1.0
            continue
        vals = [m for m, _ in mins]
        raw = min(vals)
        xspread[q] = max(vals) - min(vals)
        per_run[q] = vals
        any_source[q] = raw
        # a floor counts as valid-sourced if ANY valid process achieved
        # it — min() over (value, valid) tuples would break ties toward
        # False (False < True) and mislabel a tie as invalid-sourced
        raw_is_valid = any(ok for m, ok in mins if m == raw)
        vmins = [m for m, ok in mins if ok]
        vfloor = min(vmins) if vmins else -1.0
        floor_valid_only[q] = vfloor
        promote = bool(not raw_is_valid and vmins and
                       (vfloor - raw) <= max(PROMOTE_EPS_REL * vfloor,
                                             PROMOTE_EPS_ABS))
        if promote:
            promoted.append(q)
        floor[q] = vfloor if promote else raw
        floor_from_valid[q] = raw_is_valid or promote
    merged = {
        "metric": "total_floor",
        "value": sum(v for v in floor.values() if v >= 0),
        "unit": "sec",
        "processes": len(runs),
        "queries": floor,
        "cross_process_spread": xspread,
        "per_process_mins": per_run,
        "floor_from_valid": floor_from_valid,
        "queries_valid_only": floor_valid_only,
        "queries_any_source": any_source,
        "promoted_to_valid": sorted(promoted),
        "sf": runs[0].get("sf", "?"),
        "valid_runs": valids,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    n_invalid_floor = sum(1 for q in floor_from_valid
                          if not floor_from_valid[q])
    print(f"wrote {out_path}: {len(names)} queries, "
          f"summed floor {merged['value']:.1f}s over {len(runs)} processes "
          f"({sum(valids)} valid); {n_invalid_floor} floors from "
          f"invalid-stamped processes; {len(promoted)} promoted to their "
          f"valid-only floor (within ε)")
    return merged


def run(n, sf_dir, focus=None, focus_n=3):
    files = []

    def one(out, extra_env):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_OUT=out, **extra_env)
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        files.append(out)

    if focus:
        for i in range(focus_n):
            print(f"[bench_floor] focus process {i + 1}/{focus_n} "
                  f"({focus}) ...", flush=True)
            one(f"target/bench_focus{i + 1}.json",
                {"SPARK_GRAFT_BENCH_ONLY": focus,
                 "SPARK_GRAFT_BENCH_RUNS": "3"})
    for i in range(n):
        print(f"[bench_floor] process {i + 1}/{n} ...", flush=True)
        one(f"target/bench_run{i + 1}.json", {})
    merge(files)


def compare(floor_file, baseline_file):
    new = json.load(open(floor_file))
    old = json.load(open(baseline_file))
    old_q = old["queries"]
    # baseline noise envelope: per-query spread if recorded, else from
    # its passes array, else 0 (older artifacts)
    old_spread = (old.get("spread_q") or old.get("cross_process_spread")
                  or {q: spread_of(p) for q, p in old.get("passes", {}).items()})
    both = sorted(set(new["queries"]) & set(old_q))
    real = []
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta':>8s} "
          f"{'envelope':>9s}  verdict")
    for q in both:
        o, nv = old_q[q], new["queries"][q]
        if o < 0 or nv < 0:
            continue
        delta = nv - o
        env = max(new["cross_process_spread"].get(q, 0.0),
                  old_spread.get(q, 0.0))
        verdict = "noise"
        # a floor sourced from an invalid-stamped (loaded-box) process
        # is flagged: its REAL verdict needs a valid-run re-measure.
        # The tags MUST land on verdict before real.append() captures the
        # string, so the final adjudication summary carries them too —
        # and the like-for-like rule needs BOTH sides valid-sourced, so
        # an invalid old-side baseline is tagged as well.
        tags = ""
        if not new.get("floor_from_valid", {}).get(q, True):
            tags += " [new floor from invalid run]"
        if old.get("floor_from_valid", {}).get(q, True) is False:
            tags += " [old floor from invalid run]"
        if abs(delta) > env and abs(delta) > 0.05:
            verdict = "REAL " + ("regression" if delta > 0 else "improvement")
            verdict += tags
            real.append((q, o, nv, delta, env, verdict))
        else:
            verdict += tags
        print(f"{q:34s} {o:8.2f} {nv:8.2f} {delta:+8.2f} {env:9.2f}  {verdict}")
    print(f"\nonly-new: {sorted(set(new['queries']) - set(old_q))}")
    print(f"only-old: {sorted(set(old_q) - set(new['queries']))}")
    print(f"\n{len(real)} deltas exceed the noise envelope:")
    for q, o, nv, d, e, v in sorted(real, key=lambda r: -abs(r[3])):
        print(f"  {q}: {o:.2f} -> {nv:.2f} ({d:+.2f}s, envelope {e:.2f}) {v}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "run":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        focus = sys.argv[4] if len(sys.argv) > 4 else None
        focus_n = int(sys.argv[5]) if len(sys.argv) > 5 else 3
        run(n, sf, focus, focus_n)
    elif cmd == "merge":
        merge(sys.argv[2:])
    elif cmd == "compare":
        compare(sys.argv[2], sys.argv[3])
    else:
        sys.exit(__doc__)
