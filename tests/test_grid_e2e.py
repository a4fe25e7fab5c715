"""End-to-end grid-runner regression: mask build -> apply -> CSV row + resume.

Subprocess-based like the real pipeline (reference run_*_grid.py); tiny model
+ synthetic data keep it ~1 minute.
"""

import csv
import json
from pathlib import Path

import numpy as np
import pytest

from ssp_x_vit_tpu.cli.grid import run_grid, load_completed_ok


@pytest.fixture(scope="module")
def score_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("scores")
    files = []
    for name, seed in (("a", 1), ("b", 2)):
        rng = np.random.default_rng(seed)
        leaf = {f"{i}:{j}": float(rng.random()) for i in range(4) for j in range(128)}
        p = d / f"{name}.json"
        p.write_text(json.dumps({"ffn": leaf}))
        files.append(p)
    return files


def test_summation_grid_end_to_end(score_files, tmp_path):
    out = tmp_path / "grid"
    csv_path = run_grid(
        "summation", score_files, sizes={2}, prune_levels=[20], out_dir=out,
        apply_args=["--model", "tiny", "--dataset", "synthetic",
                    "--min-remaining", "32", "--eval-batches", "1",
                    "--backend", "cpu"],
    )
    rows = list(csv.DictReader(csv_path.open()))
    assert len(rows) == 1
    row = rows[0]
    assert row["status"] == "ok"
    assert row["methods"] == "a+b"
    assert float(row["stage1_reduction_percent"]) > 0
    # resume: nothing new on re-run
    assert ("a+b", 20) in load_completed_ok(csv_path)
    run_grid("summation", score_files, sizes={2}, prune_levels=[20], out_dir=out)
    assert len(list(csv.DictReader(csv_path.open()))) == 1


def test_grid_records_failures(score_files, tmp_path):
    out = tmp_path / "gridfail"
    csv_path = run_grid(
        "summation", score_files, sizes={2}, prune_levels=[10], out_dir=out,
        apply_args=["--model", "tiny", "--dataset", "synthetic",
                    "--backend", "cpu", "--nonexistent-flag"],
    )
    rows = list(csv.DictReader(csv_path.open()))
    assert len(rows) == 1
    assert rows[0]["status"].startswith("apply_failed_rc_")
    # failed rows are NOT treated as complete
    assert ("a+b", 10) not in load_completed_ok(csv_path)


def test_consensus_grid_end_to_end(score_files, tmp_path):
    out = tmp_path / "gridc"
    csv_path = run_grid(
        "consensus", score_files, sizes={2}, prune_levels=[20], out_dir=out,
        apply_args=["--model", "tiny", "--dataset", "synthetic",
                    "--min-remaining", "32", "--eval-batches", "1",
                    "--backend", "cpu"],
    )
    rows = list(csv.DictReader(csv_path.open()))
    assert len(rows) == 1 and rows[0]["status"] == "ok"
    assert (out / "mask_consensus.json").exists()
