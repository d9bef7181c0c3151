#!/usr/bin/env python3
"""Self-test for the three r12-fixed bench_floor.py protocol defects
(VERDICT r12 "What's wrong" #1-#3 / next-round #1a-c). Pure-python,
no Spark: feeds synthetic run artifacts through merge() + compare()
and asserts on the produced artifact and captured output.

  a) provenance tags land on the verdict string BEFORE real.append()
     captures it, so the final adjudication summary carries them;
  b) compare() consults the OLD round's floor_from_valid too — a mover
     whose old-side floor was invalid-sourced is tagged;
  c) a valid and an invalid process tying exactly on a query's floor
     labels the floor VALID-sourced (any valid process achieved it);

plus the r15 merge-rule change (VERDICT r14 #3):

  d) an invalid-sourced floor within ε (max of 2% relative, 0.05s
     absolute) of the valid-only floor PROMOTES: the valid-only value
     headlines, floor_from_valid flips true, the raw any-source floor
     stays recorded in queries_any_source;
  e) promotion honors the relative arm on slow queries and never fires
     without a valid process.

Run: python3 scripts/test_bench_floor.py
"""
import io, json, os, sys, tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_floor


def write(d, name, obj):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        json.dump(obj, f)
    return p


def run_pair(d, old, new):
    out = io.StringIO()
    with redirect_stdout(out):
        bench_floor.compare(write(d, "new.json", new), write(d, "old.json", old))
    return out.getvalue()


def main():
    # TemporaryDirectory (not mkdtemp): ci.sh runs this every gate pass —
    # an uncleaned scratch dir per run would accumulate under /tmp
    with tempfile.TemporaryDirectory(prefix="bftest") as d:
        run_all(d)
    print("bench_floor self-test: provenance fixes + valid-promotion rule hold")


def run_all(d):
    # --- (c) exact tie between a valid and an invalid process ---
    runs = [
        write(d, "r1.json", {"valid": False, "sf": "x",
                             "queries": {"q": 1.00, "r": 2.00}}),
        write(d, "r2.json", {"valid": True, "sf": "x",
                             "queries": {"q": 1.00, "r": 2.50}}),
    ]
    merged = bench_floor.merge(runs, out_path=os.path.join(d, "floor.json"))
    assert merged["floor_from_valid"]["q"] is True, \
        "tie between valid and invalid process must label the floor valid-sourced"
    assert merged["floor_from_valid"]["r"] is False, \
        "floor achieved only by an invalid process, with the valid floor" \
        " OUTSIDE the ε envelope (0.5s gap), must stay invalid-sourced"
    assert merged["queries"]["r"] == 2.00, \
        "an out-of-envelope valid floor must NOT replace the headline"
    assert merged["queries_valid_only"]["q"] == 1.00
    assert merged["queries_valid_only"]["r"] == 2.50
    assert merged["queries_any_source"] == {"q": 1.00, "r": 2.00}
    assert merged["promoted_to_valid"] == []

    # --- (d) r15 promotion rule (VERDICT r14 #3): an invalid-sourced
    # floor within ε of the valid-only floor HEADLINES the valid value —
    # the r14 stream_pq_index_refresh shape (7.64 invalid sweep vs 7.65
    # from seven dedicated valid processes) must merge valid-sourced.
    runs2 = [
        write(d, "p1.json", {"valid": False, "sf": "x",
                             "queries": {"s": 7.64, "t": 1.00}}),
        write(d, "p2.json", {"valid": True, "sf": "x",
                             "queries": {"s": 7.65, "t": 1.30}}),
    ]
    m2 = bench_floor.merge(runs2, out_path=os.path.join(d, "floor2.json"))
    assert m2["queries"]["s"] == 7.65 and m2["floor_from_valid"]["s"] is True, \
        "within-ε invalid floor must promote to the valid-only value"
    assert m2["queries_any_source"]["s"] == 7.64, \
        "the raw any-source floor must stay recorded"
    assert m2["promoted_to_valid"] == ["s"]
    # t: 0.30s gap on a 1.30s valid floor (23%) — outside both the 2%
    # relative and 0.05s absolute envelope, stays raw + invalid-sourced
    assert m2["queries"]["t"] == 1.00 and m2["floor_from_valid"]["t"] is False

    # --- (e) promotion honors the RELATIVE arm on slow queries: a 0.15s
    # gap is > 0.05s absolute but < 2% of a 10s floor → promotes
    runs3 = [
        write(d, "p3.json", {"valid": False, "sf": "x", "queries": {"u": 10.00}}),
        write(d, "p4.json", {"valid": True, "sf": "x", "queries": {"u": 10.15}}),
    ]
    m3 = bench_floor.merge(runs3, out_path=os.path.join(d, "floor3.json"))
    assert m3["queries"]["u"] == 10.15 and m3["floor_from_valid"]["u"] is True
    # no valid process at all → nothing to promote, floor stays honest
    runs4 = [write(d, "p5.json",
                   {"valid": False, "sf": "x", "queries": {"v": 1.00}})]
    m4 = bench_floor.merge(runs4, out_path=os.path.join(d, "floor4.json"))
    assert m4["queries"]["v"] == 1.00 and m4["floor_from_valid"]["v"] is False
    assert m4["queries_valid_only"]["v"] == -1.0

    # --- (a) tag lands before capture: the REAL summary line carries it ---
    new = {"queries": {"q": 2.0}, "cross_process_spread": {"q": 0.1},
           "floor_from_valid": {"q": False}}
    old = {"queries": {"q": 1.0}, "cross_process_spread": {"q": 0.1},
           "floor_from_valid": {"q": True}}
    text = run_pair(d, old, new)
    summary = text[text.index("deltas exceed"):]
    assert "[new floor from invalid run]" in summary, \
        "REAL summary must carry the new-side invalid-provenance tag:\n" + text

    # --- (b) old-side invalid provenance is tagged on movers too ---
    new_v = {"queries": {"q": 2.0}, "cross_process_spread": {"q": 0.1},
             "floor_from_valid": {"q": True}}
    old_iv = {"queries": {"q": 1.0}, "cross_process_spread": {"q": 0.1},
              "floor_from_valid": {"q": False}}
    text = run_pair(d, old_iv, new_v)
    summary = text[text.index("deltas exceed"):]
    assert "[old floor from invalid run]" in summary, \
        "REAL summary must carry the old-side invalid-provenance tag:\n" + text
    assert "[new floor from invalid run]" not in summary

    # old artifacts WITHOUT floor_from_valid (pre-r11) stay untagged
    old_legacy = {"queries": {"q": 1.0}, "cross_process_spread": {"q": 0.1}}
    text = run_pair(d, old_legacy, new_v)
    assert "from invalid run" not in text


if __name__ == "__main__":
    main()
