"""Evolving dimension snapshots (SCD): per-epoch dim_dir joins, carry-
forward for missing epochs, resume parity, and loud epoch-0 requirement."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob


def _write_dim(dim_dir: str, epoch: int, category: str, n_sites: int = 32):
    d = os.path.join(dim_dir, f"epoch={epoch:04d}")
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "site": [f"site{i:04d}.example.org" for i in range(n_sites)],
        "category": [category] * n_sites,
    })
    pq.write_table(t, os.path.join(d, "dim.parquet"))


@pytest.fixture()
def pages(tmp_path):
    p = str(tmp_path / "pages")
    write_pages_dir(p, n_urls=200, seed=33, n_epochs=3)
    return p


def test_dim_refresh_and_carry_forward(tmp_path, pages):
    """Snapshot at epoch 0 ('old') and epoch 2 ('new'): epoch 0 AND the
    snapshot-less epoch 1 join 'old' (carry-forward); epoch 2 joins
    'new'. Verified per row via the arrival epoch."""
    dim_dir = str(tmp_path / "dims")
    _write_dim(dim_dir, 0, "old")
    _write_dim(dim_dir, 2, "new")
    job = StreamingJob(pages, str(tmp_path / "out"), run_id="scd",
                       num_partitions=4, dim_dir=dim_dir,
                       window_group_cols=("category", "change_kind"))
    job.run()
    changes = job.read_output("changes")
    assert set(changes["category"].unique()) == {"old", "new"}

    # map each row to its arrival epoch via the input slices
    by_epoch = {}
    for e in range(3):
        d = os.path.join(pages, f"epoch={e:04d}")
        for n in sorted(os.listdir(d)):
            t = pq.read_table(os.path.join(d, n), columns=["url", "warc_ts"])
            for u, ts in zip(t["url"].to_pylist(), t["warc_ts"].to_pylist()):
                by_epoch[(u, ts)] = e
    got_epochs = changes.apply(
        lambda r: by_epoch[(r["url"], r["warc_ts"])], axis=1)
    assert (changes.loc[got_epochs < 2, "category"] == "old").all()
    assert (changes.loc[got_epochs == 2, "category"] == "new").all()
    assert (got_epochs == 2).any() and (got_epochs < 2).any()


def test_dim_refresh_resume_parity(tmp_path, pages):
    dim_dir = str(tmp_path / "dims")
    _write_dim(dim_dir, 0, "old")
    _write_dim(dim_dir, 1, "mid")
    _write_dim(dim_dir, 2, "new")

    def job(out, run_id):
        return StreamingJob(pages, str(tmp_path / out), run_id=run_id,
                            num_partitions=4, dim_dir=dim_dir,
                            window_group_cols=("category", "change_kind"))

    ja = job("a", "scdA")
    ja.run()
    jb = job("b", "scdB1")
    jb.run(stop_after=1)          # kill mid-stream
    jb2 = job("b", "scdB2")
    jb2.run()                     # resume
    cols = ["url", "warc_ts", "category", "version", "change_kind"]
    a = ja.read_output("changes")[cols].sort_values(cols).reset_index(drop=True)
    b = jb2.read_output("changes")[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dim_dir_requires_epoch0_snapshot(tmp_path, pages):
    dim_dir = str(tmp_path / "dims")
    _write_dim(dim_dir, 1, "late")  # nothing at epoch 0
    job = StreamingJob(pages, str(tmp_path / "out"), run_id="scdE",
                       num_partitions=4, dim_dir=dim_dir,
                       window_group_cols=("category", "change_kind"))
    with pytest.raises(FileNotFoundError, match="epoch=0000"):
        job.run()


def test_dim_df_and_dim_dir_mutually_exclusive(tmp_path, pages):
    with pytest.raises(ValueError, match="not both"):
        StreamingJob(pages, str(tmp_path / "out"),
                     dim_df=pd.DataFrame({"site": []}),
                     dim_dir=str(tmp_path / "dims"))
