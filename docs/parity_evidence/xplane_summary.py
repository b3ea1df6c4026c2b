"""Summarize a jax.profiler xplane trace: top TPU ops by total duration.

Usage: python docs/parity_evidence/xplane_summary.py <trace_dir> [top_n]

Parses the raw .xplane.pb with the TSL protobuf schema directly — the
tensorboard profile plugin's converter is broken in this venv (round-4
finding). Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set
below before the proto import)."""

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def summarize(trace_dir, top_n=25):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        totals = {}  # name -> [total_ps, count]
        for line in plane.lines:
            # XLA Ops lines carry per-op device events.
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                acc = totals.setdefault(name, [0, 0])
                acc[0] += ev.duration_ps
                acc[1] += 1
        if not totals:
            continue
        print(f"== plane: {plane.name} ==")
        ranked = sorted(totals.items(), key=lambda kv: -kv[1][0])
        grand = sum(v[0] for v in totals.values())
        for name, (ps, n) in ranked[:top_n]:
            print(
                f"{ps / 1e9:10.3f} ms  x{n:<6} {100 * ps / grand:5.1f}%  "
                f"{name[:110]}"
            )
        print(f"{grand / 1e9:10.3f} ms  TOTAL (sum over events; lines overlap)")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
