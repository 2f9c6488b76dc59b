"""XPlane trace parser (utils/xplane.py).

TPU device traces carry an "XLA Modules" line with one event per
executable dispatch; the parser turns that into {module: [device_sec]}.
No TPU in the test environment, so the proto is constructed synthetically
in the exact shape the real trace dump showed (plane '/device:TPU:0',
line 'XLA Modules', metadata name 'jit_f(fingerprint)').
"""

import os

import pytest

pb = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from tacotron2_tpu.utils.xplane import (min_module_time,  # noqa: E402
                                        module_device_times)


def _write_trace(tmp_path, planes):
    xspace = pb.XSpace()
    for plane_name, lines in planes.items():
        plane = xspace.planes.add()
        plane.name = plane_name
        next_meta = 1
        for line_name, events in lines.items():
            line = plane.lines.add()
            line.name = line_name
            for name, dur_ps in events:
                mid = next_meta
                next_meta += 1
                plane.event_metadata[mid].id = mid
                plane.event_metadata[mid].name = name
                ev = line.events.add()
                ev.metadata_id = mid
                ev.duration_ps = dur_ps
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    (d / "host.xplane.pb").write_bytes(xspace.SerializeToString())
    return str(tmp_path)


def test_module_times_from_tpu_plane(tmp_path):
    logdir = _write_trace(tmp_path, {
        "/device:TPU:0": {
            "XLA Modules": [("jit_train_step(12345)", int(0.25e12)),
                            ("jit_train_step(12345)", int(0.24e12)),
                            ("jit_synthesize_wav_fused(9)", int(0.08e12))],
            "XLA Ops": [("%fusion.1", 1000)],   # ignored
        },
        "#Chip0 Host Interface": {},
        "/host:CPU": {"python": [("jit_train_step(12345)", 10 ** 15)]},
    })
    times = module_device_times(logdir)
    assert times == {
        "jit_train_step": [0.25, 0.24],
        "jit_synthesize_wav_fused": [0.08],
    }
    assert min_module_time(times, "train_step") == 0.24
    assert min_module_time(times, "synthesize_wav_fused") == 0.08
    assert min_module_time(times, "nope") is None


def test_missing_trace_dir_degrades_to_empty(tmp_path):
    assert module_device_times(str(tmp_path)) == {}


def test_newest_trace_wins(tmp_path):
    import time as _time
    _write_trace(tmp_path, {
        "/device:TPU:0": {"XLA Modules": [("jit_old(1)", int(1e12))]}})
    _time.sleep(0.05)
    d2 = tmp_path / "plugins" / "profile" / "run2"
    os.makedirs(d2)
    xspace = pb.XSpace()
    plane = xspace.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "jit_new(2)"
    line = plane.lines.add()
    line.name = "XLA Modules"
    ev = line.events.add()
    ev.metadata_id = 1
    ev.duration_ps = int(2e12)
    (d2 / "host.xplane.pb").write_bytes(xspace.SerializeToString())
    assert module_device_times(str(tmp_path)) == {"jit_new": [2.0]}
