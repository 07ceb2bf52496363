"""The accuracy-parity dress rehearsal must execute end-to-end in CI
(synthetic fallback): real loader -> pretrained HF checkpoint -> step-0
torch sent_vec parity -> step-0 loss/logits report."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_dress_rehearsal_synthetic_runs_and_matches_torch():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "--synthetic"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "HF_HUB_OFFLINE": "1",
             "TRANSFORMERS_OFFLINE": "1"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["status"] == "OK"
    # flax-vs-torch pooled sent_vecs on the shared checkpoint: tight f32 band
    assert report["sent_vec_max_rel"] < 2e-3
    assert "step0_loss" in report
