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
