#!/usr/bin/env python
"""Build dist/combblas_spark.zip for ``spark-submit --py-files``.

Pure stdlib; includes only the package's .py files (no tests, no
caches), so the artifact is what executors actually import.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "combblas_spark")
OUT = os.path.join(REPO, "dist", "combblas_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    n = 0
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    print(f"{OUT}: {n} files")


if __name__ == "__main__":
    main()
