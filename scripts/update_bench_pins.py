"""Regenerate bench_pins.json from one or more bench.py output lines.

Usage: python bench.py | tail -1 | python scripts/update_bench_pins.py
(or pass one or more files each containing a bench JSON line).

POLICY: a pin is a BEST-KNOWN-GOOD, not a worst-observed.  The host
shows 20-40% run-to-run variance, so pins are the elementwise MIN over
(a) every run passed in and (b) the currently committed pins.  Taking
the max would launder a noise outlier into the guard and let a real
regression to 2x-the-outlier pass silently (round-4 postmortem: q72's
pin drifted 3.67 -> 9.94 that way).  Raising a pin by more than 1.5x
therefore requires --force (use it only after a deliberate trade that
made a query slower on purpose, and say why in the commit message).

The guard in bench.py flags anything 1.5x over a pin (bounded 2x and
+1.5s in bench.find_regressions).
"""
import json
import os
import sys

RAISE_GUARD = 1.5

args = [a for a in sys.argv[1:] if a != "--force" and not a.startswith("--raise=")]
force = "--force" in sys.argv[1:]
# targeted deliberate raises: --raise=<query> accepts the observed MIN
# for that query even above the old pin (a guard added on purpose, a
# knowingly slower-but-safer plan); repeatable
raises = {a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--raise=")}

raws = [open(p).read() for p in args] if args else [sys.stdin.read()]
runs = []
for raw in raws:
    # bench.py prints the full result AND a compact tail line (the
    # harness's 2000-byte stdout window); pin from the line carrying the
    # MOST per-query timings, never the truncated-subset tail
    cands = []
    for l in raw.strip().splitlines():
        if not l.strip().startswith("{"):
            continue
        try:
            cands.append(json.loads(l))
        except ValueError:
            continue
    d = max(cands, key=lambda c: len(c.get("queries", {})))
    assert str(d.get("sf")) == "0.1", f"pins must come from sf0.1 (got {d.get('sf')})"
    runs.append(d)

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_pins.json"
)
old_pins = {}
if os.path.exists(path):
    old_pins = json.load(open(path)).get("pins", {})

new_pins = {}
all_keys = set(old_pins)
for d in runs:
    all_keys |= set(d["queries"])
for k in sorted(all_keys):
    observed = [d["queries"][k] for d in runs if k in d["queries"]]
    best = min(observed) if observed else old_pins[k]
    if k in old_pins:
        if observed and k in raises and min(observed) > old_pins[k]:
            print(
                f"RAISED pin {k}: {old_pins[k]:.3f}s -> {min(observed):.3f}s "
                f"(--raise accepted as deliberate)"
            )
        else:
            over_guard = (
                observed and min(observed) > old_pins[k] * RAISE_GUARD
            )
            if over_guard and not force:
                # query got >1.5x slower than best-known-good: keep the
                # old pin so the bench guard keeps flagging it (use
                # --raise=<query> to accept a deliberate slowdown)
                print(
                    f"NOT raising pin {k}: best observed {min(observed):.3f}s "
                    f"> {RAISE_GUARD}x pin {old_pins[k]:.3f}s "
                    f"(pass --raise={k} to accept)"
                )
            best = min(best, old_pins[k])
    new_pins[k] = round(best, 3)

out = {
    "sf": runs[0]["sf"],
    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    "note": "per-query pins = elementwise MIN (best-known-good) over all "
    "recorded runs at sf0.1 on local[32]; host variance 20-40% between "
    "identical runs, so never pin a max. Regenerate with "
    "scripts/update_bench_pins.py (raising a pin >1.5x needs --force).",
    "pins": new_pins,
}
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path} with {len(new_pins)} pins")
