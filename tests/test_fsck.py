"""Lineage audit (gush_ray.fsck): a clean run passes; every injected
corruption class is detected without loading data (footers only)."""

import os
import shutil

import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.fsck import audit
from gush_ray.pipelines.epoch_loop import StreamingJob


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    pages = str(tmp_path_factory.mktemp("fsck_pages"))
    write_pages_dir(pages, n_urls=200, seed=41, n_epochs=4)
    out = str(tmp_path_factory.mktemp("fsck_out"))
    # snapshot_full_every=4 → epochs 1..3 snapshot as DELTA frames, so
    # the resume point exercises the chain-integrity check
    job = StreamingJob(pages, out, run_id="fsck", num_partitions=4,
                       snapshot_full_every=4)
    job.run()
    return out


def test_clean_run_audits_ok(out_dir):
    rep = audit(out_dir)
    assert rep["ok"], rep["problems"]
    assert rep["epochs_committed"] == 4
    assert rep["resume_epoch"] == 3
    assert rep["final"]
    assert rep["files"] > 0


def corrupted_copy(out_dir, tmp_path, name) -> str:
    dst = str(tmp_path / name)
    shutil.copytree(out_dir, dst)
    return dst


def test_detects_missing_rows_and_unreadable_file(out_dir, tmp_path):
    bad = corrupted_copy(out_dir, tmp_path, "rows")
    victim_dir = os.path.join(bad, "changes", "epoch=00001")
    files = sorted(os.listdir(victim_dir))
    os.remove(os.path.join(victim_dir, files[0]))          # lost file
    with open(os.path.join(victim_dir, files[1]), "r+b") as f:
        f.truncate(10)                                     # torn file
    rep = audit(bad)
    assert not rep["ok"]
    assert any("rows on disk" in p for p in rep["problems"])
    assert any("unreadable parquet" in p for p in rep["problems"])


def test_detects_manifest_gap(out_dir, tmp_path):
    bad = corrupted_copy(out_dir, tmp_path, "gap")
    os.remove(os.path.join(bad, "_manifest", "epoch=00001.json"))
    rep = audit(bad)
    assert not rep["ok"]
    assert any("non-contiguous" in p for p in rep["problems"])
    assert rep["resume_epoch"] == 0


def test_detects_broken_snapshot_chain(out_dir, tmp_path):
    bad = corrupted_copy(out_dir, tmp_path, "chain")
    # resume epoch 3 is a delta with base 0: removing a mid-chain frame
    # (epoch 1) must be flagged
    frame = os.path.join(bad, "_state", "epoch=00001", "part-00000.pkl")
    assert os.path.exists(frame)
    os.remove(frame)
    rep = audit(bad)
    assert not rep["ok"]
    assert any("chain broken" in p for p in rep["problems"])


def test_detects_stray_temp_file(out_dir, tmp_path):
    bad = corrupted_copy(out_dir, tmp_path, "stray")
    d = os.path.join(bad, "changes", "epoch=00000")
    with open(os.path.join(d, "part-00000.parquet.inprogress-999"),
              "wb") as f:
        f.write(b"junk")
    rep = audit(bad)
    assert not rep["ok"]
    assert any("stray temp" in p for p in rep["problems"])


def test_cli_exit_codes(out_dir, tmp_path, capsys):
    from gush_ray.fsck import main

    assert main([out_dir]) == 0
    bad = corrupted_copy(out_dir, tmp_path, "cli")
    os.remove(os.path.join(bad, "_manifest", "epoch=00003.json"))
    assert main([bad]) == 1


def test_metrics_summary(out_dir):
    from gush_ray.metrics import summarize

    rep = summarize(out_dir)
    assert rep["epochs_committed"] == 4 and rep["final"]
    t = rep["totals"]
    # conservation: rows in = changes + late + replays + stale
    assert t["rows_in"] == (t["changes"] + t["late"]
                            + t["replays_dropped"] + t["stale_dropped"])
    assert t["changes"] == t["inserts"] + t["updates"]
    assert all(r["snapshot_bytes"] > 0 for r in rep["epochs"])
    assert rep["last_watermark_us"] is not None


def test_metrics_cli(out_dir, capsys):
    from gush_ray.metrics import main

    assert main([out_dir]) == 0
    txt = capsys.readouterr().out
    assert "4 epochs (finalized)" in txt
    assert main([out_dir, "--json"]) == 0
