"""Bit-level conformance against the compiled reference implementation.

Runs tools/parity/parity_check.py (g++ over the unmodified reference at
/root/reference + a dump harness) — nine configurations covering the
γ²/last/first collapse paths and merges must be bit-identical in bins,
counts, n, alpha, gamma, and all 11 quantile estimates.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECKER = os.path.join(REPO, "tools", "parity", "parity_check.py")


@pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.exists("/root/reference/ddsketch.cc"),
    reason="needs g++ and the reference sources",
)
def test_bit_level_reference_parity():
    out = subprocess.run(
        [sys.executable, CHECKER], capture_output=True, text=True, cwd=REPO, timeout=600
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PARITY: PASS" in out.stdout
    assert out.stdout.count("[IDENTICAL]") == 9
