"""Run-metrics summary from lineage manifests (S5: log sinks → metrics).

The sink's epoch manifests already carry per-partition counters (rows
in/out, inserts/updates, replays/stale/late, NFA matches + truncation,
TTL evictions) and phase timings — this reads them back into one
operational summary without touching any data file:

* per-epoch: rows in, change rows out, late/replay/stale drops, matches,
  watermark, wall-clock phase costs (map / reduce-or-gather / commit);
* totals + derived rates (rows/s per epoch where timings exist);
* state health: snapshot bytes per epoch, cumulative TTL evictions,
  NFA partial truncation (oracle-divergence canary).

Run: ``python -m gush_ray.metrics OUT_DIR [--json]`` — table to stdout,
or one JSON line for machines.
"""

from __future__ import annotations

import json


def _sum(parts: list[dict], key: str) -> int:
    return int(sum(p.get(key, 0) or 0 for p in parts))


def summarize(out_dir: str) -> dict:
    """Aggregate every committed epoch's manifest into one report."""
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    sink = ExactlyOnceSink(out_dir)
    epochs = []
    for e in sink.committed_epochs():
        man = sink.read_manifest(e)
        parts = man.get("partitions", [])
        timings = man.get("timings", {}) or {}
        row = {
            "epoch": e,
            "rows_in": _sum(parts, "rows_in"),
            "changes": _sum(parts, "inserts") + _sum(parts, "updates"),
            "inserts": _sum(parts, "inserts"),
            "updates": _sum(parts, "updates"),
            "late": _sum(parts, "late_rows"),
            "replays_dropped": _sum(parts, "replays_dropped"),
            "stale_dropped": _sum(parts, "stale_dropped"),
            "matches": _sum(parts, "matches"),
            "snapshot_bytes": _sum(parts, "snapshot_bytes"),
            "watermark_us": man.get("watermark_us"),
            "map_sec": timings.get("map_sec"),
            "reduce_sec": timings.get(
                "reduce_sec", timings.get("reduce_gather_sec")),
            # cumulative counters: the LAST epoch's value is the total
            "ttl_evicted": _sum(parts, "ttl_evicted"),
            "nfa_truncated": _sum(parts, "nfa_truncated"),
            # partitions running in bounded-state mode (capacity-wall
            # escalation engaged — StateParams.state_keys_cap)
            "cap_engaged_partitions": _sum(parts, "state_cap_engaged"),
            "idle_partitions": sum(
                1 for p in parts if p.get("idle_epochs", 0) > 0),
            # hot-key skew: max/mean per-partition rows_in (1.0 =
            # balanced); recorded by commit_epoch
            "imbalance": (man.get("skew") or {}).get("imbalance"),
        }
        wall = (row["map_sec"] or 0) + (row["reduce_sec"] or 0)
        row["rows_per_sec"] = (
            round(row["rows_in"] / wall, 1) if wall else None)
        epochs.append(row)

    totals = {
        k: sum(r[k] for r in epochs)
        for k in ("rows_in", "changes", "inserts", "updates", "late",
                  "replays_dropped", "stale_dropped", "matches")
    }
    report = {
        "out_dir": out_dir,
        "epochs_committed": len(epochs),
        "final": sink.final_committed(),
        "totals": totals,
        # cumulative-by-design counters: read from the last epoch
        "ttl_evicted_total": epochs[-1]["ttl_evicted"] if epochs else 0,
        "cap_engaged_partitions": (epochs[-1]["cap_engaged_partitions"]
                                   if epochs else 0),
        "nfa_truncated_total": epochs[-1]["nfa_truncated"] if epochs else 0,
        "last_watermark_us": epochs[-1]["watermark_us"] if epochs else None,
        "max_imbalance": max(
            (r["imbalance"] for r in epochs
             if r.get("imbalance") is not None), default=None),
        "epochs": epochs,
    }
    return report


def _print_table(rep: dict) -> None:
    cols = ("epoch", "rows_in", "changes", "late", "matches",
            "rows_per_sec", "snapshot_bytes", "idle_partitions",
            "imbalance")
    widths = {c: max(len(c), 12) for c in cols}
    print("  ".join(c.rjust(widths[c]) for c in cols))
    for r in rep["epochs"]:
        print("  ".join(str(r.get(c, "")).rjust(widths[c]) for c in cols))
    t = rep["totals"]
    print(
        f"-- {rep['epochs_committed']} epochs"
        f"{' (finalized)' if rep['final'] else ''}: "
        f"{t['rows_in']} rows in -> {t['changes']} changes "
        f"({t['late']} late, {t['replays_dropped']} replays, "
        f"{t['stale_dropped']} stale), {t['matches']} matches; "
        f"ttl_evicted={rep['ttl_evicted_total']} "
        f"nfa_truncated={rep['nfa_truncated_total']} "
        f"cap_engaged={rep['cap_engaged_partitions']}"
    )


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="summarize a run's lineage-manifest metrics")
    ap.add_argument("out_dir")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    rep = summarize(args.out_dir)
    if args.json:
        print(json.dumps(rep))
    else:
        _print_table(rep)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
