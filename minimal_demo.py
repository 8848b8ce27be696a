"""Root-level entry shim (reference layout parity). See apps/minimal_demo.py."""

import runpy
import os

runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "apps", "minimal_demo.py"), run_name="__main__")
