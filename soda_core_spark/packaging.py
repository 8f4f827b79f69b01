"""Build the ``--py-files`` archive for cluster submission.

The deployment shape this engine targets is::

    spark-submit --master <cluster> \\
        --py-files soda_core_spark.zip \\
        cli.py --input s3://bucket/web_pages --output s3://bucket/kept ...

i.e. the whole engine ships to the driver and every executor as ONE
zip at the root of ``sys.path`` — the same operational shape as the
reference's pip-installed pure-python package (soda-core is shipped to
workers as a wheel; see reference ``soda-core/pyproject.toml`` — no
native extensions), which is what makes the single-archive deployment
complete: there is nothing to compile per-platform and no site-packages
to mirror on workers.

``build_pyfiles_zip`` is deterministic (fixed timestamps, sorted
entries) so the artifact hash is stable across builds — a requirement
for content-addressed artifact stores and for "did the code change?"
checks in scheduled-pipeline deployments.
"""

from __future__ import annotations

import os
import zipfile

#: Fixed zip entry timestamp (2020-01-01). Zip stores local mtimes; a
#: wall-clock stamp would make byte-identical source produce different
#: archives on every build.
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, package_dir: str | None = None) -> str:
    """Zip the ``soda_core_spark`` package (``.py`` sources only) into
    ``out_path``, suitable for ``spark-submit --py-files`` /
    ``SparkContext.addPyFile``. Returns ``out_path``.

    Entries are sorted and carry a fixed timestamp → byte-deterministic
    for identical sources. ``__pycache__`` and non-``.py`` files are
    excluded: executors import from the zip directly (zipimport), so
    bytecode caches would be dead weight shipped to every worker.
    """
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(package_dir.rstrip(os.sep))

    entries: list[tuple[str, str]] = []  # (absolute path, arcname)
    for root, dirs, files in os.walk(package_dir):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        rel_root = os.path.relpath(root, package_dir)
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            rel = fname if rel_root == "." else os.path.join(rel_root, fname)
            entries.append(
                (os.path.join(root, fname), os.path.join(pkg_name, rel))
            )

    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for path, arcname in entries:
            with open(path, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m soda_core_spark.packaging",
        description="Build the --py-files zip for spark-submit deployment",
    )
    p.add_argument("out", help="output zip path, e.g. dist/soda_core_spark.zip")
    args = p.parse_args(argv)
    path = build_pyfiles_zip(args.out)
    print(path)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
