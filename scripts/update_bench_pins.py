"""Regenerate bench_pins.json from a bench.py output line.

Usage: python bench.py | tail -1 | python scripts/update_bench_pins.py
(or pass a file containing the JSON line as argv[1]).  Run after a
deliberate performance change so the committed pins track the new
steady state; the guard in bench.py flags anything 1.5x over a pin.
"""
import json
import os
import sys

raw = open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
line = [l for l in raw.strip().splitlines() if l.strip().startswith("{")][-1]
d = json.loads(line)
assert str(d.get("sf")) == "0.1", f"pins must come from sf0.1 (got {d.get('sf')})"
out = {
    "sf": d["sf"],
    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    "note": "steady-state best-of-2 per-query seconds at sf0.1 on local[32]; "
    "regenerate with scripts/update_bench_pins.py",
    "pins": {k: round(v, 3) for k, v in d["queries"].items()},
}
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_pins.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path} with {len(out['pins'])} pins")
