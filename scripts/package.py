#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

Produces dist/r2rml_parser_spark.zip containing the package (pure
Python, no compiled deps) — importable via zipimport on every executor:

    python scripts/package.py
    spark-submit --py-files dist/r2rml_parser_spark.zip scripts/kg_job.py ...

The reference ships a shaded jar (r2rml-parser.sh); this is the Spark
equivalent.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "r2rml_parser_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "r2rml_parser_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out_path


if __name__ == "__main__":
    print(build_pyfiles_zip())
