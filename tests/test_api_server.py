"""API server integration test: boot with tiny random weights, exercise
/generate (sync GLB), /send + /status (async), /healthz — the same JSON
contracts the reference api_server.py exposes (and the Blender addon uses)."""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    env = dict(os.environ)
    env["HY3D_RANDOM_SIZE"] = "tiny"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    import tempfile

    # child output goes to a FILE: with stdout=PIPE the runtime's noisy
    # stderr (XLA AOT-loader warnings) fills the 64 KB pipe buffer and
    # blocks the server before it ever binds
    log = tempfile.NamedTemporaryFile("w+b", suffix=".log", delete=False)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "apps", "api_server.py"),
         "--host", "127.0.0.1", "--port", str(port), "--random-weights"],
        env=env, stdout=log, stderr=subprocess.STDOUT)
    base = f"http://127.0.0.1:{port}"
    for _ in range(180):
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=2) as r:
                if json.loads(r.read())["status"] == "ok":
                    break
        except Exception:
            time.sleep(1)
    else:
        proc.kill()
        log.flush()
        out = open(log.name, "rb").read().decode(errors="replace")
        pytest.fail(f"server did not come up:\n{out[-3000:]}")
    yield base
    proc.kill()


def _payload():
    img = np.zeros((64, 64, 4), np.uint8)
    img[16:48, 16:48] = [200, 60, 60, 255]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return {
        "image": base64.b64encode(buf.getvalue()).decode(),
        "octree_resolution": 32,
        "num_inference_steps": 2,
        "seed": 7,
    }


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_generate_sync(server):
    with _post(server + "/generate", _payload()) as resp:
        data = resp.read()
    assert data[:4] == b"glTF"


def test_send_and_status(server):
    with _post(server + "/send", _payload()) as resp:
        uid = json.loads(resp.read())["uid"]
    for _ in range(300):
        with urllib.request.urlopen(server + f"/status/{uid}", timeout=10) as r:
            st = json.loads(r.read())
        if st["status"] == "completed":
            glb = base64.b64decode(st["model_base64"])
            assert glb[:4] == b"glTF"
            return
        assert st["status"] in ("processing", "completed"), st
        time.sleep(1)
    pytest.fail("job did not complete")


def test_unknown_route(server):
    try:
        urllib.request.urlopen(server + "/nope", timeout=5)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_generate_from_text(server):
    """t23d route parity (reference api_server.py:192-194): a 'text' param
    runs the JAX-native HunyuanDiT t2i front-end, then shape gen."""
    payload = {"text": "一只可爱的猫",
               "octree_resolution": 32, "num_inference_steps": 2, "seed": 3}
    with _post(server + "/generate", payload, timeout=900) as resp:
        data = resp.read()
    assert data[:4] == b"glTF"
