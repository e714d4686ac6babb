"""spark-submit --py-files packaging (north_rule launch surface)."""

import importlib.util
import os
import zipfile


def _load_packager():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "package_pyfiles", os.path.join(root, "tools", "package_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pyfiles_zip_importable_and_deterministic(tmp_path):
    m = _load_packager()
    out1, out2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    names = m.build_zip(out1)
    m.build_zip(out2)
    # byte-identical across runs (fixed timestamps, sorted entries)
    assert open(out1, "rb").read() == open(out2, "rb").read()
    with zipfile.ZipFile(out1) as zf:
        entries = set(zf.namelist())
    # the zip is laid out for PYTHONPATH/--py-files: package modules at
    # goffish_v3_spark/...
    assert "goffish_v3_spark/__init__.py" in entries
    for sub in ("operators", "plans", "sources", "streaming"):
        assert f"goffish_v3_spark/{sub}/__init__.py" in entries
    assert all(n.startswith("goffish_v3_spark/") for n in names)
    assert not any("__pycache__" in n for n in entries)
