"""Package the engine for ``spark-submit --py-files`` (north_rule launch
surface): one deterministic zip of the ``goffish_v3_spark`` package.

    python tools/package_pyfiles.py [out.zip]      # default dist/goffish_v3_spark.zip

Deterministic (fixed timestamps, sorted entries, no __pycache__) so re-running
on an unchanged tree produces byte-identical artifacts — CI can cache/diff it.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "goffish_v3_spark"
FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build_zip(out_path: str) -> list[str]:
    """Write the package zip; returns the archived names (sorted)."""
    src_root = os.path.join(REPO_ROOT, PKG)
    names = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, f)
            names.append(os.path.relpath(full, REPO_ROOT))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in names:
            info = zipfile.ZipInfo(name, date_time=FIXED_DATE)
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO_ROOT, name), "rb") as fh:
                zf.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return names


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO_ROOT, "dist", "goffish_v3_spark.zip"
    )
    names = build_zip(out)
    print(f"wrote {out}: {len(names)} files")


if __name__ == "__main__":
    main()
