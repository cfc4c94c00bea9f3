"""End-to-end driver tests: invoke the real CLI mains in-process (CPU backend
via conftest) on the tiny config + synthetic data."""
import sys

import numpy as np
import pytest


def _run(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [f"{module.__name__}.py"] + argv)
    module.main()


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "run")


def test_train_driver_smoke(workdir, monkeypatch):
    import train
    _run(train, ["--py-config", "tiny", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "2", "--print-freq", "1"],
         monkeypatch)
    import os
    assert os.path.isdir(os.path.join(workdir, "ckpts"))
    assert os.path.exists(os.path.join(workdir, "scalars.jsonl"))


def test_train_resume(workdir, monkeypatch):
    import train
    _run(train, ["--py-config", "tiny", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "1"], monkeypatch)
    # resumes from the saved checkpoint without error
    _run(train, ["--py-config", "tiny", "--work-dir", workdir,
                 "--synthetic", "--max-steps", "1"], monkeypatch)


def test_eval_depth_driver(workdir, monkeypatch, capsys):
    import eval_depth
    _run(eval_depth, ["--py-config", "tiny", "--work-dir", workdir,
                      "--synthetic", "--num-samples", "1", "--batch", "64",
                      "--no-shard"], monkeypatch)


def test_eval_iou_driver(workdir, monkeypatch):
    import eval_iou
    _run(eval_iou, ["--py-config", "tiny", "--work-dir", workdir,
                    "--synthetic", "--num-samples", "1",
                    "--resolution", "1.0"], monkeypatch)


def test_eval_novel_depth_driver(workdir, monkeypatch):
    import eval_novel_depth
    _run(eval_novel_depth, ["--py-config", "tiny", "--work-dir", workdir,
                            "--synthetic", "--num-samples", "1",
                            "--batch", "64", "--offsets", "1.0"], monkeypatch)
