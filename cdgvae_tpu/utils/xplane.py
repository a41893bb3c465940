"""Parse jax.profiler xplane traces and rank XLA ops by device time.

The traces written by ``--profile DIR`` (any training CLI) or
``utils.profiling.trace`` are TensorBoard-loadable, but this environment's
tensorboard-plugin converter is incompatible with its TF build — so the
``.xplane.pb`` protobuf is parsed directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2; docs/PERF.md "How the 2× was
found").

CAVEATS on reading the output (docs/PERF.md measurement rules):
* Trace lines of a TPU plane NEST (module > while-loop > fused op), so the
  flat per-op totals double-count — use them to RANK ops; read absolute
  step time from the top-level while-loop rows.
* Async ``copy-start`` rows measure in-flight time that overlaps compute
  (e.g. per-dispatch param staging over the tunnel), not critical-path work.
"""
from __future__ import annotations

import glob


def load_xspace(trace_dir: str):
    """Load the newest ``.xplane.pb`` under ``trace_dir`` (recursive)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_totals(xspace, plane_filter: str = "TPU",
                     line_filter: str = "XLA Ops") -> dict[str, float]:
    """Sum event durations (ms) per op name over the device planes whose
    name contains ``plane_filter`` (case-insensitive), restricted to trace
    lines whose name contains ``line_filter``.

    The default keeps only the ``XLA Ops`` line: a TPU plane also carries
    ``Steps`` (step markers spanning host idle between dispatches — 100×
    the real device time on a tunnel backend) and ``Async XLA Ops``
    (in-flight copy spans that overlap compute); both would corrupt a flat
    sum. Pass ``line_filter="Async"`` to look at the async copies, or
    ``""`` for everything.
    """
    totals: dict[str, float] = {}
    needle = plane_filter.lower()
    line_needle = line_filter.lower()
    for plane in xspace.planes:
        if needle not in plane.name.lower():
            continue
        for line in plane.lines:
            if line_needle and line_needle not in line.name.lower():
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
    return totals


def plane_events(xspace, plane_filter: str = "TPU",
                 line_filter: str = "XLA Ops"):
    """Flat event list ``(name, line_name, start_ps, end_ps)`` over the
    device planes/lines matching the filters (same semantics as
    :func:`device_op_totals`). Offsets are line-local in the xplane format;
    lines of one plane share the plane's time base, so intervals from
    different nesting lines are comparable."""
    out = []
    needle = plane_filter.lower()
    line_needle = line_filter.lower()
    for plane in xspace.planes:
        if needle not in plane.name.lower():
            continue
        for line in plane.lines:
            if line_needle and line_needle not in line.name.lower():
                continue
            base = line.timestamp_ns * 1000
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                start = base + ev.offset_ps
                out.append((name, line.name, start,
                            start + ev.duration_ps))
    return out


def busy_breakdown(xspace, plane_filter: str = "TPU",
                   line_filter: str = "XLA Ops") -> dict:
    """Nesting-safe busy/idle decomposition of a device plane.

    The flat per-op totals double-count because trace lines nest
    (module > while-loop > fusion). This computes:

    * ``span_ms``   — first event start to last event end,
    * ``busy_ms``   — UNION of all event intervals (double-count-free:
      a nested fusion inside a while inside a module adds nothing),
    * ``idle_ms``   — span − busy: device time covered by NO op event —
      the per-op scheduling/sync gaps the round-4 MFU-residual theory
      attributes the CelebA plateau to (docs/PERF.md),
    * ``n_events``  — all events,
    * ``n_leaf_events`` — events containing no other event: the count of
      SEQUENTIAL device ops actually executed (the "~10³ ops/step"),
    * ``leaf_busy_ms`` / ``leaf_idle_ms`` — union/gap time over LEAF
      events only. On a real TPU trace a container event (the scan
      while-loop, the module) spans the whole execution, so the all-event
      union degenerates to the span; the leaf-level union is the actual
      op execution time, and ``leaf_idle_ms`` the inter-op gap total —
      the direct measurement of per-op scheduling overhead.
    """
    evs = sorted(plane_events(xspace, plane_filter, line_filter),
                 key=lambda e: (e[2], -e[3]))
    if not evs:
        return {"span_ms": 0.0, "busy_ms": 0.0, "idle_ms": 0.0,
                "n_events": 0, "n_leaf_events": 0,
                "leaf_busy_ms": 0.0, "leaf_idle_ms": 0.0}
    span = (max(e[3] for e in evs) - evs[0][2]) / 1e9
    busy = 0
    cur_s, cur_e = evs[0][2], evs[0][3]
    # leaf detection via a nesting sweep: pushing an event inside an open
    # interval marks the enclosing event as a parent
    stack: list[int] = []  # indices into evs of open intervals
    is_parent = [False] * len(evs)
    for i, (_, _, s, e) in enumerate(evs):
        if s > cur_e:  # union accumulation
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
        while stack and evs[stack[-1]][3] <= s:
            stack.pop()
        if stack:
            is_parent[stack[-1]] = True
        stack.append(i)
    busy += cur_e - cur_s
    leaves = [evs[i] for i, p in enumerate(is_parent) if not p]
    leaf_busy = 0
    if leaves:  # already start-sorted (subsequence of evs)
        ls, le = leaves[0][2], leaves[0][3]
        for _, _, s, e in leaves[1:]:
            if s > le:
                leaf_busy += le - ls
                ls, le = s, e
            else:
                le = max(le, e)
        leaf_busy += le - ls
    return {"span_ms": span,
            "busy_ms": busy / 1e9, "idle_ms": span - busy / 1e9,
            "n_events": len(evs), "n_leaf_events": len(leaves),
            "leaf_busy_ms": leaf_busy / 1e9,
            "leaf_idle_ms": span - leaf_busy / 1e9}


def module_spans(xspace, plane_filter: str = "TPU") -> list[tuple[str, float]]:
    """Per-execution device spans (name, ms) of the compiled XLA programs
    — one entry per launched module execution. These are the
    device-side per-call latencies a serving client observes once the
    dispatch reaches the chip (host/tunnel RTT excluded). Reads the
    ``XLA Modules`` trace line; falls back to the outermost events of the
    ``XLA Ops`` line when the backend emits no module line."""
    evs = plane_events(xspace, plane_filter, line_filter="Module")
    if not evs:
        all_ops = sorted(plane_events(xspace, plane_filter, "XLA Ops"),
                         key=lambda e: (e[2], -e[3]))
        out, open_end = [], -1
        for name, _, s, e in all_ops:  # outermost = not inside the
            if s >= open_end:          # previous outermost event
                out.append((name, (e - s) / 1e9))
                open_end = e
        return out
    return [(name, (e - s) / 1e9) for name, _, s, e in evs]


def rank_ops(trace_dir: str, top: int = 25, plane_filter: str = "TPU",
             line_filter: str = "XLA Ops") -> list[tuple[str, float]]:
    """Top device ops of a trace as (name, total ms), descending."""
    totals = device_op_totals(load_xspace(trace_dir), plane_filter,
                              line_filter)
    return sorted(totals.items(), key=lambda kv: -kv[1])[:top]


def print_ranking(trace_dir: str, top: int = 25, steps: int | None = None,
                  plane_filter: str = "TPU", line_filter: str = "XLA Ops"):
    """Human-readable ranking (the scripts/profile_step.py report)."""
    totals = device_op_totals(load_xspace(trace_dir), plane_filter,
                              line_filter)
    total_ms = sum(totals.values())
    head = f"total device time: {total_ms:.2f} ms"
    if steps:
        head += f" over {steps} steps ({total_ms / steps * 1e3:.1f} us/step)"
    print(head + " (nested lines double-count: RANK with this, read "
          "absolute step time from the top-level while-loop rows)")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f} ms  {100 * ms / max(total_ms, 1e-12):5.1f}%  "
              f"{name[:100]}")
    return totals


if __name__ == "__main__":  # python -m cdgvae_tpu.utils.xplane TRACE_DIR
    import sys

    print_ranking(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof",
                  top=int(sys.argv[2]) if len(sys.argv) > 2 else 25)
