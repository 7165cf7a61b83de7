"""End-to-end integration: tiny train + eval on the synthetic dataset."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_synthetic_omni3d

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("omni3d_e2e"))
    make_synthetic_omni3d(root, "Synth_train", n_images=6)
    make_synthetic_omni3d(root, "Synth_test", n_images=4, seed=3)
    return root


OVERRIDES = [
    "DATASETS.TRAIN", "('Synth_train',)",
    "DATASETS.TEST", "('Synth_test',)",
    "DATASETS.CATEGORY_NAMES", "('chair', 'table', 'car')",
    "MODEL.ROI_HEADS.NUM_CLASSES", "3",
    "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "128",
    "MODEL.RPN.POST_NMS_TOPK_TRAIN", "64",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "128",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "64",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
    "MODEL.RPN.BATCH_SIZE_PER_IMAGE", "32",
    "SOLVER.IMS_PER_BATCH", "2",
    "SOLVER.BASE_LR", "0.001",
    "SOLVER.WARMUP_ITERS", "2",
    "SOLVER.CHECKPOINT_PERIOD", "4",
    "INPUT.MIN_SIZE_TRAIN", "(128,)",
    "INPUT.MIN_SIZE_TEST", "128",
    "TEST.EVAL_PERIOD", "100000",
    "TEST.DETECTIONS_PER_IMAGE", "20",
    "TPU.NMS_CANDIDATES", "128",
    "TPU.MAX_GT_BOXES", "16",
    "TPU.COMPUTE_DTYPE", "float32",
]


def run_cli(args, cwd=REPO, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
@pytest.mark.heavy
def test_train_then_eval_cli(synth_root, tmp_path):
    out_dir = str(tmp_path / "out")
    # 1) short training run through the real CLI
    r = run_cli([
        "tools/train_net.py", "--config-file", "configs/Base.yaml",
        "--datasets-root", os.path.join(synth_root, "Omni3D"),
        "--max-steps", "6",
    ] + OVERRIDES + ["OUTPUT_DIR", out_dir])
    assert r.returncode == 0, r.stderr[-4000:]
    assert os.path.exists(os.path.join(out_dir, "model_recent.ckpt"))
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        last = json.loads(f.readlines()[-1])
    assert np.isfinite(last["total_loss"])

    # 2) eval-only through the CLI with the trained checkpoint
    r = run_cli([
        "tools/train_net.py", "--config-file", "configs/Base.yaml",
        "--datasets-root", os.path.join(synth_root, "Omni3D"),
        "--eval-only", "--weights", os.path.join(out_dir, "model_recent.ckpt"),
    ] + OVERRIDES + ["OUTPUT_DIR", out_dir])
    assert r.returncode == 0, r.stderr[-4000:]
    assert "AP2D" in r.stdout and "AP3D" in r.stdout, r.stdout[-2000:]


@pytest.mark.slow
@pytest.mark.heavy
def test_demo_cli(synth_root, tmp_path):
    out_dir = str(tmp_path / "demo_out")
    img_folder = os.path.join(synth_root, "images", "Synth_test")
    r = run_cli([
        "demo/demo.py", "--config-file", "configs/Base.yaml",
        "--input-folder", img_folder, "--threshold", "0.0",
        "--output-dir", out_dir,
    ] + OVERRIDES)
    assert r.returncode == 0, r.stderr[-4000:]
    outs = os.listdir(out_dir)
    assert any(f.endswith("_boxes.jpg") for f in outs), outs
