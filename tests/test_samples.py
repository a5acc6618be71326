"""Smoke tests: every sample script runs end-to-end (tiny budgets).

The reference treats its samples as the de-facto test suite
(samples/torch/triangle.py is the documented install check); here we
execute each sample's main() with small iteration counts so a crash
anywhere in the script — including the final metric printing — fails CI.
"""

import runpy
import sys

import pytest


SAMPLES = {
    "triangle": ["--res", "32"],
    "cube": ["--resolution", "12", "--max-iter", "8", "--log-interval", "4"],
    "earth": ["--res", "32", "--max-iter", "6", "--log-interval", "3",
              "--max-mip-level", "3"],
    "envphong": ["--res", "32", "--env-res", "8", "--max-iter", "6",
                 "--log-interval", "3"],
    "pose": ["--resolution", "24", "--max-iter", "12", "--log-interval", "6"],
}


@pytest.mark.parametrize("name", sorted(SAMPLES))
def test_sample_runs(name, tmp_path, monkeypatch, repo_root):
    argv = [f"samples/{name}.py"] + SAMPLES[name]
    if name == "triangle":
        argv += ["--outdir", str(tmp_path)]
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(str(repo_root / "samples" / f"{name}.py"),
                   run_name="__main__")
