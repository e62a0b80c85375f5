"""Statsd metrics push (gush_ray/statsd.py) — the reference's
statsd_host config knob wired for real: line format, file and UDP
targets, end-to-end emission from a streaming run."""

import os
import socket

import pytest

from gush_ray.statsd import StatsdEmitter, epoch_lines, parse_target


def test_epoch_lines_format_and_determinism():
    parts = [
        {"rows_in": 10, "inserts": 4, "updates": 2, "late_rows": 1},
        {"rows_in": 5, "inserts": 1, "matches": 3, "snapshot_bytes": 99},
    ]
    lines = epoch_lines("gush.r1", 7, 1234567, parts,
                        {"map_sec": 0.25, "reduce_sec": None})
    assert lines[0] == "gush.r1.epoch:7|g"
    assert "gush.r1.watermark_us:1234567|g" in lines
    assert "gush.r1.rows_in:15|c" in lines
    assert "gush.r1.inserts:5|c" in lines
    assert "gush.r1.late:1|c" in lines
    assert "gush.r1.nfa_matches:3|c" in lines
    assert "gush.r1.snapshot_bytes:99|c" in lines
    assert "gush.r1.map_sec:250.0|ms" in lines
    # None timings and zero counters are omitted
    assert not any(l.startswith("gush.r1.reduce_sec") for l in lines)
    assert not any(l.startswith("gush.r1.ttl_evicted") for l in lines)
    assert lines == epoch_lines("gush.r1", 7, 1234567, parts,
                                {"map_sec": 0.25, "reduce_sec": None})


def test_file_target_appends(tmp_path):
    path = tmp_path / "metrics.txt"
    em = StatsdEmitter(f"file://{path}", prefix="gush.t")
    assert em.enabled
    em.emit_epoch(0, 100, [{"rows_in": 3}])
    em.emit_epoch(1, 200, [{"rows_in": 4}])
    got = path.read_text().splitlines()
    assert "gush.t.epoch:0|g" in got and "gush.t.epoch:1|g" in got
    assert "gush.t.rows_in:3|c" in got and "gush.t.rows_in:4|c" in got


def test_udp_target_sends_batched_datagram():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        rx.bind(("127.0.0.1", 0))
    except OSError:
        pytest.skip("no localhost UDP in this sandbox")
    rx.settimeout(5.0)
    port = rx.getsockname()[1]
    em = StatsdEmitter(f"127.0.0.1:{port}", prefix="gush.u")
    em.emit_epoch(2, None, [{"rows_in": 8, "updates": 1}])
    data = rx.recv(65536).decode()
    assert data.splitlines()[0] == "gush.u.epoch:2|g"
    assert "gush.u.rows_in:8|c" in data
    rx.close()


def test_disabled_and_unreachable_never_raise():
    off = StatsdEmitter(None)
    assert not off.enabled
    off.emit_epoch(0, 0, [{"rows_in": 1}])  # no-op
    # unreachable UDP target: fire-and-forget, never an error
    em = StatsdEmitter("127.0.0.1:1")
    em.emit_epoch(0, 0, [{"rows_in": 1}])
    em.close()
    em.emit_epoch(0, 0, [{"rows_in": 1}])  # closed == disabled, no-op
    # unwritable file target: swallowed
    bad = StatsdEmitter("file:///no/such/dir/metrics.txt")
    bad.emit_epoch(0, 0, [{"rows_in": 1}])
    assert parse_target("") is None
    # UNRESOLVABLE hostname disables metrics at setup (the never-stall
    # contract: resolution happens once here, never per datagram)
    assert parse_target("no-such-host.invalid:8125") is None


def test_malformed_targets_fail_loudly_at_construction():
    """A config typo must raise a CLEAR error at parse time, not a bare
    int() ValueError from inside job construction (review finding:
    'file:/path' single-slash parsed as host 'file', port '/path')."""
    for bad in ("file:/tmp/m.txt", "host:abc", "http://x:1", ":8125"):
        with pytest.raises(ValueError, match="statsd target"):
            parse_target(bad)


def test_streaming_job_pushes_per_epoch_metrics(ray_session, tmp_path):
    """End-to-end: a batch run with statsd configured emits one line
    group per committed epoch, counts matching the manifests."""
    from gush_ray.datagen import write_pages_dir
    from gush_ray.pipelines.epoch_loop import StreamingJob

    src = str(tmp_path / "pages")
    write_pages_dir(src, n_urls=200, seed=5, n_epochs=3)
    mpath = tmp_path / "metrics.txt"
    j = StreamingJob(src, str(tmp_path / "out"), run_id="sd1",
                     num_partitions=2, statsd=f"file://{mpath}")
    j.run()
    lines = mpath.read_text().splitlines()
    epochs = sorted(int(l.rsplit(":", 1)[1].split("|")[0])
                    for l in lines if l.startswith("gush.sd1.epoch:"))
    assert epochs == [0, 1, 2]
    pushed_rows = sum(int(l.rsplit(":", 1)[1].split("|")[0])
                      for l in lines if l.startswith("gush.sd1.rows_in:"))
    manifest_rows = sum(
        pm.get("rows_in", 0)
        for e in j.sink.committed_epochs()
        for pm in j.sink.read_manifest(e)["partitions"])
    assert pushed_rows == manifest_rows > 0
