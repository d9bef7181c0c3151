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
     labels the floor VALID-sourced (any valid process achieved it).

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
    print("bench_floor self-test: all three protocol fixes hold")


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
        "floor achieved only by an invalid process must stay invalid-sourced"
    assert merged["queries_valid_only"]["q"] == 1.00
    assert merged["queries_valid_only"]["r"] == 2.50

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
