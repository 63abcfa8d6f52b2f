"""Build the ``--py-files`` archive for cluster deployment.

The north-rule deployment surface is ``spark-submit --py-files sdv_spark.zip
tools/submit_validate.py ...`` — this tool produces that zip from the
installed/checked-out package. The archive is DETERMINISTIC (sorted member
order, fixed timestamps, no .pyc) so a re-build from the same tree is
byte-identical and cacheable by content hash on the cluster side.

Usage:
    python tools/make_pyfiles.py [out.zip]        # default dist/sdv_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

#: fixed member timestamp (the zip format's epoch) — determinism over vanity
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_path: str, package_root: str | None = None) -> str:
    """Zip ``safedata_validator_spark/**/*.py`` into ``out_path``.

    ``package_root`` is the directory CONTAINING the package (defaults to the
    repo root inferred from this file). Returns the absolute output path.
    """
    if package_root is None:
        package_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(package_root, "safedata_validator_spark")
    if not os.path.isdir(pkg_dir):
        raise FileNotFoundError(f"package not found under {package_root}")

    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, package_root)
                members.append((full, arc))

    out_path = os.path.abspath(out_path)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc.replace(os.sep, "/"), date_time=_ZIP_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/sdv_spark.zip"
    print(build(out))
