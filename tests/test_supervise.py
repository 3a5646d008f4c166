"""Supervisor: restart-with-resume semantics and pid hygiene (scripts/supervise.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_supervisor_restarts_with_resume_and_cleans_pid(tmp_path):
    ck = tmp_path / "ck.npz"
    ck.write_bytes(b"x")            # checkpoint "exists"
    marker = tmp_path / "tries"
    # child: fail on the first attempt (no --resume yet), succeed once
    # restarted with --resume appended
    child = (
        "import sys, pathlib;"
        f"m = pathlib.Path({str(marker)!r});"
        "n = int(m.read_text()) if m.exists() else 0;"
        "m.write_text(str(n + 1));"
        "sys.exit(0 if '--resume' in sys.argv else 3)"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
         "--dir", str(tmp_path), "--checkpoint", str(ck),
         "--max-restarts", "2", "--backoff", "0.1", "--",
         sys.executable, "-c", child],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    assert marker.read_text() == "2"          # fresh attempt + one resume
    assert not (tmp_path / "run.pid").exists()   # no stale pid
    log = (tmp_path / "run.log").read_text()
    assert "attempt 0 (fresh)" in log and "attempt 1 (resume)" in log


def test_supervisor_gives_up(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "supervise.py"),
         "--dir", str(tmp_path), "--max-restarts", "1", "--backoff", "0.05",
         "--", sys.executable, "-c", "import sys; sys.exit(7)"],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 7
    assert not (tmp_path / "run.pid").exists()
