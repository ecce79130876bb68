"""Docs stay buildable: the offline validator must pass (sphinx itself
runs only in CI — this environment has no sphinx; see
docs/validate_docs.py for what is checked)."""

import pathlib
import subprocess
import sys


def test_docs_validate():
    script = (pathlib.Path(__file__).parent.parent / "docs"
              / "validate_docs.py")
    res = subprocess.run([sys.executable, str(script)],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
