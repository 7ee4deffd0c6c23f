#!/usr/bin/env python
"""Package markdown_lab_spark for ``spark-submit --py-files``.

Produces dist/markdown_lab_spark.zip containing the package tree; ship it
with:  spark-submit --py-files dist/markdown_lab_spark.zip scripts/run_crawl.py ...
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "markdown_lab_spark.zip")
    pkg = os.path.join(ROOT, "markdown_lab_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, ROOT)
                    zf.write(full, rel)
    print(out)
    return out


if __name__ == "__main__":
    main()
