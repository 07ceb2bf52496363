"""Summarize a jax profiler perfetto trace: top ops by total duration.

Usage: python tools/trace_summary.py /tmp/qagnn_prof_pallas [top_n]
"""

import collections
import glob
import gzip
import json
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{root}/**/*perfetto*", recursive=True))
    assert paths, f"no perfetto trace under {root}"
    path = paths[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)

    events = data["traceEvents"] if isinstance(data, dict) else data
    # keep complete events from device tracks (TPU lanes)
    by_name = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n.lower()}
    # host-side python/runtime rows that leak into traces without clear
    # device pids — never device op time
    host_prefixes = ("$", "np.", "np ", "PjitFunction", "ParseArguments",
                     "DevicePut", "jax.", "python")
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if not device_pids and name.startswith(host_prefixes):
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        by_name[name] += dur
        counts[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"total device op time: {total:.2f} ms (3 steps traced)")
    print(f"{'ms':>9}  {'%':>5}  {'n':>4}  op")
    for name, dur in by_name.most_common(top_n):
        print(f"{dur:9.2f}  {100 * dur / max(total, 1e-9):5.1f}  "
              f"{counts[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
