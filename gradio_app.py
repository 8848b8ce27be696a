"""Root-level entry shim (reference layout parity). See apps/gradio_app.py."""

import runpy
import os

runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "apps", "gradio_app.py"), run_name="__main__")
