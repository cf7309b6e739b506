"""cmd_run dispatcher (reference: cmd_run.py)."""

import subprocess
import sys

import pytest


def run(args):
    return subprocess.run(
        [sys.executable, "-m", "anime_illust_image_searcher_tpu.cli.cmd_run", *args],
        capture_output=True, text=True, timeout=120,
        env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/tmp"},
    )


def test_invalid_command():
    out = run(["frobnicate"])
    assert out.returncode == 1
    assert "Invalid command" in out.stdout


def test_no_command():
    out = run([])
    assert out.returncode == 1
    assert "usage" in out.stdout


def test_dispatch_reaches_subcommand_parser():
    # tagging without --dir must fail in tagging's own argparse, proving dispatch
    out = run(["tagging"])
    assert out.returncode == 2
    assert "--dir" in out.stderr
