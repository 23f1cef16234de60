"""Compile the Catalyst extension (jvm_ext/src) against the installed
pyspark's own jars and drop the result at
parquet_on_fhir_spark/jvm/pofs-catalyst-ext.jar (committed, so runtime
needs no JDK — only rebuilding does).

Usage: python tools/build_jvm_ext.py
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess
import sys
import tempfile

import pyspark

REPO = pathlib.Path(__file__).resolve().parent.parent
SRC = REPO / "jvm_ext" / "src"
OUT = REPO / "parquet_on_fhir_spark" / "jvm" / "pofs-catalyst-ext.jar"


def main() -> None:
    jars = pathlib.Path(pyspark.__file__).parent / "jars"
    sources = [str(p) for p in SRC.rglob("*.java")]
    if not sources:
        sys.exit("no java sources under jvm_ext/src")
    with tempfile.TemporaryDirectory() as build:
        subprocess.run(
            ["javac", "-classpath", f"{jars}/*", "-d", build, *sources],
            check=True,
        )
        OUT.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["jar", "cf", str(OUT), "-C", build, "."], check=True
        )
    print(f"built {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
