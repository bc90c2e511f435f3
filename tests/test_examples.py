"""Smoke coverage for the example harnesses (SURVEY C11-C13): each demo
must run end-to-end headless on the CPU backend. The reference's demos
were interactive-only and untestable; these are the pytest twins of the
'manual drive' rows in PARITY.md."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, timeout=900):
    # force the CPU backend inside the subprocess the same way
    # conftest.py does (the JAX_PLATFORMS env var is overridden by the
    # TPU site package, the config call is not)
    code = (
        "import jax, sys, runpy;"
        "jax.config.update('jax_platforms', 'cpu');"
        f"sys.argv = [{script!r}, *{args!r}];"
        f"runpy.run_path({script!r}, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_me_demo_runs_and_scores(tmp_path):
    r = _run(
        "examples/me_demo.py",
        ["--levels", "2", "--method", "fast", "--outdir", str(tmp_path)],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EPE" in r.stdout and "layer 1" in r.stdout
    assert (tmp_path / "layer0.flo").exists()


def test_histeq_demo_writes_panel(tmp_path):
    out = str(tmp_path / "panel.png")
    r = _run("examples/histeq_demo.py", ["--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
