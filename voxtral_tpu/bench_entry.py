"""Console entry for the stage-timed benchmark (`voxtral-bench`)."""

from __future__ import annotations

import sys
from pathlib import Path


def main() -> int:
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import runpy

    bench = Path(__file__).parent.parent / "benches" / "e2e_bench.py"
    if bench.exists():
        runpy.run_path(str(bench), run_name="__main__")
        return 0
    print("benches/e2e_bench.py not found (installed package: run from a "
          "source checkout)", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
