#!/usr/bin/env python
"""Open a jax.profiler xplane trace and print what matters (SURVEY.md §5
tracing; VERDICT r3 missing-4 "a profile has never been examined"): top
device ops by self time, total device busy time, and the FLOP/memory-bound
picture from the profiler's own op stats.

Usage:
    python bench.py --profile /tmp/vstab_trace        # writes the trace
    python benchmarks/trace_summary.py /tmp/vstab_trace

Parsing uses tensorboard_plugin_profile's converters on the .xplane.pb that
jax.profiler.trace writes.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys


def _find_xplane(root: str) -> str:
    hits = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {root}")
    return hits[-1]


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vstab_trace"
    path = _find_xplane(root)
    print(f"# trace: {path}\n")

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    try:
        stats = json.loads(data)
    except json.JSONDecodeError:
        stats = json.loads(gzip.decompress(data.encode("latin1")).decode())

    # framework_op_stats returns [metadata, *rows] gviz-style tables; pick
    # the device table.
    def rows_of(table):
        cols = [c["label"] for c in table["cols"]]
        for r in table["rows"]:
            yield dict(zip(cols, [c.get("v") for c in r["c"]]))

    tables = stats if isinstance(stats, list) else [stats]
    dev_rows = []
    for t in tables:
        if not isinstance(t, dict) or "cols" not in t:
            continue
        rws = list(rows_of(t))
        if rws and any(
            (r.get("Host/device") or r.get("Device")) == "Device" for r in rws
        ):
            dev_rows = [
                r for r in rws
                if (r.get("Host/device") or r.get("Device")) == "Device"
            ]
            break
    if not dev_rows:
        # fall back: dump whatever table labels exist so the reader can look
        print("could not isolate device rows; table labels:")
        for t in tables:
            if isinstance(t, dict) and "cols" in t:
                print([c["label"] for c in t["cols"]])
        return 1

    def f(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] is not None:
                return float(r[n])
        return default

    total = sum(f(r, "Total self-time (us)", "Total self time (us)")
                for r in dev_rows)
    dev_rows.sort(
        key=lambda r: -f(r, "Total self-time (us)", "Total self time (us)")
    )
    print(f"{'op':<48} {'self ms':>9} {'%dev':>6} {'GFLOP/s':>9} {'occ':>5}")
    for r in dev_rows[:25]:
        st = f(r, "Total self-time (us)", "Total self time (us)")
        gf = f(r, "GFLOPs/sec", "GFLOP/s", "Measured GFLOP/s")
        occ = r.get("Op occurrences") or r.get("#Occurrences") or ""
        name = str(r.get("Operation") or r.get("Op name") or "?")[:48]
        print(f"{name:<48} {st/1e3:>9.2f} {100*st/max(total,1e-9):>5.1f}% "
              f"{gf:>9.1f} {str(occ):>5}")
    print(f"\ntotal device self time: {total/1e3:.1f} ms across "
          f"{len(dev_rows)} ops")
    return 0


if __name__ == "__main__":
    sys.exit(main())
