"""Statsd metrics push — the config knob the reference samples but
never wires (gush.config.yml.sample:7 ``statsd_host: localhost``),
made real on the Ray engine.

The streaming job already commits rich per-epoch counters into the
lineage manifests (gush_ray/metrics.py reads them back); this module
pushes the same counters OUT as standard statsd lines the moment an
epoch commits, so a fleet dashboard sees progress without polling the
output directory.

Wire format (https://github.com/statsd/statsd — public spec):
``<name>:<value>|c`` counters, ``|g`` gauges, ``|ms`` timings. Targets:

* ``"host"`` or ``"host:port"`` — UDP datagrams, fire-and-forget:
  a statsd client must NEVER stall or fail the pipeline, so every
  socket error is swallowed (the standard client contract);
* ``"file:///path"`` — append lines to a file (sandbox/test target;
  also handy as a poor-man's metrics log on one node);
* ``None`` — disabled, zero overhead.

Emission happens on the committer thread (off the epoch loop's
critical path), one datagram per epoch with all lines batched
newline-separated — the multi-metric packet form every statsd daemon
accepts; well under the 1432-byte conventional MTU budget.
"""

from __future__ import annotations

import socket


def parse_target(target: str | None):
    """``None`` | ``file:///path`` | ``host[:port]`` → sender callable
    or None. The callable takes a list of statsd lines.

    A malformed target fails LOUDLY here, at job construction — it is
    a config error, not a runtime condition (review finding: the
    ``file:/path`` single-slash typo used to surface as a bare
    ``int('/path')`` ValueError deep inside ``__init__``)."""
    if not target:
        return None
    if target.startswith("file://"):
        path = target[len("file://"):]

        def send_file(lines: list[str]) -> None:
            try:
                with open(path, "a") as f:
                    f.write("\n".join(lines) + "\n")
            except OSError:
                pass  # metrics must never fail the pipeline

        return send_file
    host, _, port = target.partition(":")
    if (not host or "/" in target or "://" in target
            or (port and not port.isdigit())):
        raise ValueError(
            f"statsd target {target!r} is not 'host[:port]' or "
            f"'file:///path'")
    # Resolve ONCE at setup: sendto() with a hostname does a blocking
    # getaddrinfo per datagram — on a slow/down resolver that stalls
    # the committer thread and backs the epoch loop up through the
    # commit queue (review finding). connect() also pins the route, so
    # each send is a pure non-blocking syscall. Resolution failure at
    # setup disables metrics (the never-stall contract outranks them).
    try:
        infos = socket.getaddrinfo(host, int(port) if port else 8125,
                                   type=socket.SOCK_DGRAM)
        family, socktype, proto, _cname, addr = infos[0]
        sock = socket.socket(family, socktype, proto)
        sock.connect(addr)
        sock.setblocking(False)
    except OSError:
        return None

    def send_udp(lines: list[str]) -> None:
        try:
            sock.send("\n".join(lines).encode("utf-8"))
        except OSError:
            pass  # unreachable daemon == metrics dropped, never an error

    send_udp.close = sock.close  # deterministic cleanup (StatsdEmitter)
    return send_udp


# manifest partition-row counter keys → statsd counter names
_COUNTERS = (
    ("rows_in", "rows_in"),
    ("right_rows_in", "right_rows_in"),
    ("inserts", "inserts"),
    ("updates", "updates"),
    ("late_rows", "late"),
    ("replays_dropped", "replays_dropped"),
    ("stale_dropped", "stale_dropped"),
    ("matches", "nfa_matches"),
    ("joined_rows", "join_pairs"),
    ("ttl_evicted", "ttl_evicted"),
    ("nfa_truncated", "nfa_truncated"),
    ("snapshot_bytes", "snapshot_bytes"),
)


def epoch_lines(prefix: str, epoch: int, watermark_us, parts: list[dict],
                timings: dict | None = None) -> list[str]:
    """One epoch's manifest → statsd lines (deterministic order)."""
    lines = [f"{prefix}.epoch:{epoch}|g"]
    if watermark_us is not None:
        lines.append(f"{prefix}.watermark_us:{watermark_us}|g")
    for key, name in _COUNTERS:
        v = sum(int(p.get(key, 0) or 0) for p in parts)
        if v:
            lines.append(f"{prefix}.{name}:{v}|c")
    for tk, tv in sorted((timings or {}).items()):
        if tv is not None:
            # statsd timings are milliseconds
            lines.append(f"{prefix}.{tk}:{round(float(tv) * 1000.0, 3)}|ms")
    return lines


class StatsdEmitter:
    """Per-job emitter: resolves the target once, formats each
    committed epoch's manifest rows, never raises."""

    def __init__(self, target: str | None, prefix: str = "gush"):
        self._send = parse_target(target)
        self.prefix = prefix

    @property
    def enabled(self) -> bool:
        return self._send is not None

    def close(self) -> None:
        """Release the UDP socket (no-op for file/disabled targets);
        CPython's GC would close it anyway, this makes it
        deterministic for long-lived drivers constructing many jobs."""
        close = getattr(self._send, "close", None)
        if close is not None:
            close()
        self._send = None

    def emit_epoch(self, epoch: int, watermark_us, parts: list[dict],
                   extra: dict | None = None) -> None:
        if self._send is None:
            return
        timings = (extra or {}).get("timings")
        try:
            self._send(epoch_lines(self.prefix, epoch, watermark_us,
                                   parts, timings))
        except Exception:
            pass  # metrics must never fail the pipeline
