"""Root-level entry shim (reference layout parity). See apps/api_server.py."""

import runpy
import os

runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "apps", "api_server.py"), run_name="__main__")
