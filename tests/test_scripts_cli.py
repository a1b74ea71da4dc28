"""CLI smoke tests: every script parses --help (imports resolve, argparse
wiring intact) without touching jax or data."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = sorted(p.name for p in (REPO / "scripts").glob("*.py"))


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_help(script):
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()


def test_all_expected_scripts_present():
    assert set(SCRIPTS) >= {
        "train.py", "evaluate.py", "score.py", "train_osvos.py",
        "predict.py", "extract_for_davis_eval.py", "pretrain_maskrcnn.py",
    }
