"""Aggregate a jax.profiler trace into per-kernel device-time totals.

Usage:
    python benchmarks/summarize_trace.py /tmp/phantom_trace_mxu [--top 30]

Reads the newest plugins/profile/*/..trace.json.gz under the logdir,
sums wall duration per event name on device tracks (pid whose track name
mentions TPU/device), and prints a sorted table — the poor man's xprof
op-profile, sufficient to rank the headline step's hot kernels.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(logdir: str) -> dict:
    pats = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not pats:
        sys.exit(f"no trace under {logdir}")
    path = pats[-1]
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--all-tracks", action="store_true",
                    help="include host-side tracks")
    args = ap.parse_args()

    trace = load_trace(args.logdir)
    events = trace.get("traceEvents", [])

    # map pid -> process name from metadata events
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")

    def is_device(pid):
        name = pnames.get(pid, "").lower()
        return ("tpu" in name or "device" in name or "/device" in name
                or "xla" in name)

    totals = collections.Counter()
    counts = collections.Counter()
    tracks = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        if not args.all_tracks and not is_device(pid):
            continue
        name = e["name"]
        totals[name] += e["dur"]
        counts[name] += 1
        tracks[pnames.get(pid, str(pid))] += e["dur"]

    if not totals:
        print("# no device events matched; tracks present:", file=sys.stderr)
        for pid, name in sorted(pnames.items()):
            print(f"#   pid={pid}: {name}", file=sys.stderr)
        return

    grand = sum(totals.values())
    print(f"{'us_total':>12} {'%':>6} {'count':>7}  name")
    for name, us in totals.most_common(args.top):
        print(f"{us:>12.0f} {100*us/grand:>6.2f} {counts[name]:>7}  "
              f"{name[:110]}")
    print(f"{grand:>12.0f} {100.0:>6.2f} {sum(counts.values()):>7}  TOTAL")
    print("\n# per-track totals:", file=sys.stderr)
    for name, us in tracks.most_common():
        print(f"#   {us:>12.0f} us  {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
