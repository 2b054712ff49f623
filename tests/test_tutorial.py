"""The tutorial is executable documentation (reference notebooks/
tutorial.ipynb role): it must run end-to-end, including evolution,
champion re-evaluation, and gradient tuning."""

import os
import subprocess
import sys


def test_tutorial_runs_end_to_end():
    env = dict(os.environ)
    env["TUTORIAL_GENERATIONS"] = "2"
    env["TUTORIAL_MU"] = "3"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "docs/tutorial.py"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "tutorial complete" in out.stdout
    assert "champion re-evaluated" in out.stdout
