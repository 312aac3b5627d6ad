"""Package console entry point (`multicol-slam`): the
`multi_col_slam_lafida` executable equivalent. Delegates to the
repository CLI driver (tools/run_slam.py) when the repo layout is
present, else re-implements the thin argument glue inline is
unnecessary — the driver module is shipped logic-free of repo paths.
"""

from __future__ import annotations

import os
import sys


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tools = os.path.join(here, "tools")
    if os.path.isdir(tools):
        sys.path.insert(0, tools)
    import run_slam
    return run_slam.main()


if __name__ == "__main__":
    main()
