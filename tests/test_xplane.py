"""utils/xplane: xplane trace parsing + op ranking (the --profile consumer)."""
import os

import pytest

pb2 = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")


def _write_trace(path):
    xs = pb2.XSpace()
    plane = xs.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "fusion.1"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "while"
    line = plane.lines.add(name="XLA Ops")
    e1 = line.events.add(metadata_id=1)
    e1.duration_ps = int(2e9)  # 2 ms
    e2 = line.events.add(metadata_id=2)
    e2.duration_ps = int(5e9)  # 5 ms
    # step markers span host idle between dispatches (measured 100x the
    # device time on the tunnel backend) — must NOT enter the op totals
    plane.event_metadata[3].id = 3
    plane.event_metadata[3].name = "0"
    steps = plane.lines.add(name="Steps")
    se = steps.events.add(metadata_id=3)
    se.duration_ps = int(1e12)
    host = xs.planes.add(name="/host:CPU")  # must be ignored
    host.event_metadata[1].id = 1
    host.event_metadata[1].name = "host_op"
    hline = host.lines.add(name="ops")
    he = hline.events.add(metadata_id=1)
    he.duration_ps = int(9e9)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(xs.SerializeToString())


def test_rank_ops_sums_and_orders(tmp_path):
    from cdgvae_tpu.utils.xplane import rank_ops
    _write_trace(str(tmp_path / "plugins" / "profile" / "x.xplane.pb"))
    ranked = rank_ops(str(tmp_path))
    assert ranked == [("while", 5.0), ("fusion.1", 2.0)]  # host plane dropped


def test_rank_ops_missing_dir(tmp_path):
    from cdgvae_tpu.utils.xplane import rank_ops
    with pytest.raises(FileNotFoundError):
        rank_ops(str(tmp_path / "empty"))


def _nested_plane_space():
    """One TPU plane with a module span [0,10ms] on an 'XLA Modules' line
    and nested ops on 'XLA Ops': while [1,9], fusions [1,4] and [5,8]."""
    ms = int(1e9)  # ps per ms
    xs = pb2.XSpace()
    plane = xs.planes.add(name="/device:TPU:0 (pid)")
    for mid, name in ((1, "main.42"), (2, "while"), (3, "fusion.1"),
                      (4, "fusion.2")):
        plane.event_metadata[mid].id = mid
        plane.event_metadata[mid].name = name
    mline = plane.lines.add(name="XLA Modules")
    me = mline.events.add(metadata_id=1)
    me.offset_ps, me.duration_ps = 0, 10 * ms
    oline = plane.lines.add(name="XLA Ops")
    for mid, off, dur in ((2, 1, 8), (3, 1, 3), (4, 5, 3)):
        ev = oline.events.add(metadata_id=mid)
        ev.offset_ps, ev.duration_ps = off * ms, dur * ms
    return xs


def test_busy_breakdown_union_and_leaves():
    from cdgvae_tpu.utils.xplane import busy_breakdown
    xs = _nested_plane_space()
    # ops line only: span [1,9]=8ms, union busy = while's 8ms (fusions
    # nest inside), idle 0; leaves = the 2 fusions (module line excluded)
    b = busy_breakdown(xs, line_filter="XLA Ops")
    assert b["span_ms"] == pytest.approx(8.0)
    assert b["busy_ms"] == pytest.approx(8.0)
    assert b["n_events"] == 3 and b["n_leaf_events"] == 2
    # all lines: module [0,10] wraps everything; busy = 10, leaves still 2
    b = busy_breakdown(xs, line_filter="")
    assert b["busy_ms"] == pytest.approx(10.0)
    assert b["idle_ms"] == pytest.approx(0.0)
    assert b["n_leaf_events"] == 2


def test_busy_breakdown_gaps_are_idle():
    from cdgvae_tpu.utils.xplane import busy_breakdown
    ms = int(1e9)
    xs = pb2.XSpace()
    plane = xs.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "fusion.9"
    line = plane.lines.add(name="XLA Ops")
    for off, dur in ((0, 2), (5, 2)):  # 3ms gap between two 2ms ops
        ev = line.events.add(metadata_id=1)
        ev.offset_ps, ev.duration_ps = off * ms, dur * ms
    b = busy_breakdown(xs)
    assert b["span_ms"] == pytest.approx(7.0)
    assert b["busy_ms"] == pytest.approx(4.0)
    assert b["idle_ms"] == pytest.approx(3.0)
    assert b["n_leaf_events"] == 2


def test_module_spans_prefers_module_line_with_ops_fallback():
    from cdgvae_tpu.utils.xplane import module_spans
    xs = _nested_plane_space()
    assert module_spans(xs) == [("main.42", pytest.approx(10.0))]
    # drop the module line -> fallback to outermost XLA Ops events
    del xs.planes[0].lines[0].events[:]
    assert module_spans(xs) == [("while", pytest.approx(8.0))]


def test_busy_breakdown_leaf_union_excludes_containers():
    from cdgvae_tpu.utils.xplane import busy_breakdown
    xs = _nested_plane_space()
    # while [1,9] is a container; leaf fusions cover [1,4]+[5,8] = 6ms,
    # so the leaf-level gap is 2ms even though the all-event union is
    # gapless — exactly the container-degeneracy the leaf view fixes
    b = busy_breakdown(xs, line_filter="XLA Ops")
    assert b["leaf_busy_ms"] == pytest.approx(6.0)
    assert b["leaf_idle_ms"] == pytest.approx(2.0)
    assert b["idle_ms"] == pytest.approx(0.0)
