"""Wiring smoke test for the one-command release checklist (VERDICT r2 #7):
every network-gated step's entry point must exist, import, and parse its CLI
in THIS environment, so the release machine never discovers broken plumbing."""

import subprocess
import sys


def test_check_wiring_passes():
    out = subprocess.run(
        [sys.executable, "tools/release_checklist.py", "--check-wiring"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "wiring: OK" in out.stdout
    # each declared step appears in the report
    for step in ("fetch-tagger", "convert-tagger", "tagger-parity",
                 "quant-report", "fetch-ccip", "convert-ccip",
                 "reference-run", "gensim-import", "pyinstaller-build",
                 "test-suite"):
        assert step in out.stdout, step
