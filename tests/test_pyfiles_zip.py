"""The --py-files archive is importable and deterministic (no Spark needed)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_pyfiles_zip import PKG, build  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_importable_and_deterministic(tmp_path):
    z1 = str(tmp_path / "a.zip")
    z2 = str(tmp_path / "b.zip")
    members = build(REPO, z1)
    build(REPO, z2)
    assert f"{PKG}/__init__.py" in [m.replace(os.sep, "/") for m in members]
    assert any(m.endswith("plans/pregel.py") for m in members)
    assert not any("test" in m for m in members)
    with open(z1, "rb") as a, open(z2, "rb") as b:
        assert a.read() == b.read()  # reproducible deploy artifact
    # import from the archive alone, in a clean interpreter (executor model)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import %s.plans.pregel as p; print(p.PregelConfig().check_every)"
        % (z1, PKG)
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "1"
