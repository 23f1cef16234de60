"""Driver-gate mimic for EXACTLY the 50-query window: runs
tools/selfcheck.py over suite.WINDOW in registration order (the set the
external correctness driver will hash-check this round).

Usage: python tools/verify_window.py [sf_dir]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_on_fhir_spark.suite import WINDOW  # noqa: E402

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(
        subprocess.run(
            [
                sys.executable,
                str(Path(__file__).parent / "selfcheck.py"),
                sf_dir,
                *WINDOW,
            ]
        ).returncode
    )
