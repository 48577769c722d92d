"""--py-files artifact (tools/package.py): the zip must be importable the
way an executor zipimports it."""

from __future__ import annotations

import subprocess
import sys


def test_pyfiles_zip_imports_cleanly(tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    try:
        import package as PKG
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "pyfiles.zip")
    path = PKG.build_zip(out)
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import autoextract, autoextract.operators.layout, "
        "autoextract.operators.dedup, autoextract.sources.pdf, "
        "autoextract.functions.text; "
        "print('zipimport-ok', autoextract.operators.layout.MAX_PAGES if "
        "hasattr(autoextract.operators.layout, 'MAX_PAGES') else 'x')"
    ) % path
    r = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, cwd=str(tmp_path),  # NOT the repo
    )
    assert r.returncode == 0, r.stderr
    assert "zipimport-ok" in r.stdout
    lo, hi = PKG.submit_commands(path, n=64)
    assert "--num-executors 64" in lo and "--num-executors 256" in hi
    assert f"--py-files {path}" in lo
