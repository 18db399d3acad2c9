"""Sum device-track op durations in a jax.profiler trace.

Usage: python benchmarks/parse_trace.py /tmp/trace_r04 [top_n]

Groups XLA op events by a coarse family (sort / fusion / custom-call /
dynamic-slice / ...) and prints total ms and counts, highest first —
enough to attribute the per-epoch XLA cost without TensorBoard.
"""

import collections
import gzip
import json
import pathlib
import re
import sys


def load_events(root):
    root = pathlib.Path(root)
    files = sorted(root.rglob("*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def family(name):
    n = name.lower()
    for pat, fam in [
        (r"sort", "sort"),
        (r"pallas|custom-call|mosaic", "pallas/custom-call"),
        (r"^copy|copy-start|copy-done", "copy"),
        (r"all-reduce|reduce-scatter|all-gather", "collective"),
        (r"gather", "gather"),
        (r"scatter", "scatter"),
        (r"dot|conv", "dot"),
        (r"dynamic-slice|dynamic_update", "dynamic-slice"),
        (r"fusion", "fusion"),
        (r"transpose|reshape|bitcast", "layout"),
        (r"infeed|outfeed|send|recv", "transfer"),
    ]:
        if re.search(pat, n):
            return fam
    return "other"


def main(root, top_n=25):
    events = load_events(root)
    # Device-track complete events: pid/tid metadata varies across
    # backends; keep every 'X' event that has an op-like name and a
    # duration, and skip python/host tracks by name heuristics.
    by_fam = collections.Counter()
    by_name = collections.Counter()
    n_by_name = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        hlo = args.get("long_name") or args.get("hlo_op") or name
        if name.startswith(("Thread", "python", "jit_", "$")):
            continue
        dur_ms = e["dur"] / 1e3
        by_fam[family(hlo)] += dur_ms
        key = re.sub(r"[.\d]+$", "", name)[:70]
        by_name[key] += dur_ms
        n_by_name[key] += 1
    total = sum(by_fam.values())
    print(f"total device-ish time: {total:.1f} ms")
    print("\n-- by family --")
    for fam, ms in by_fam.most_common():
        print(f"{ms:10.1f} ms  {fam}")
    print(f"\n-- top {top_n} op groups --")
    for key, ms in by_name.most_common(int(top_n)):
        print(f"{ms:10.1f} ms  x{n_by_name[key]:<6} {key}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
