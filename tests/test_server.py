"""Serving stub end-to-end: export → serve → HTTP raw-tensor infer →
native C++ client."""

import json
import os
import subprocess
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.deploy.export import export_model, save_exported
from mds_tpu.deploy.server import InferenceServer
from mds_tpu.models.bisenetv2 import BiSeNetV2

HW = 32
PORT = 18472


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    model = BiSeNetV2(n_classes=(5,), n_bn=1, aux=False)
    x = jnp.zeros((1, HW, HW, 3))
    v = jax.jit(lambda k: model.init({"params": k}, [x], train=False))(
        jax.random.PRNGKey(0)
    )
    path = str(tmp_path_factory.mktemp("srv") / "m.shlo")
    save_exported(export_model(model, v, (HW, HW)), path)
    srv = InferenceServer(path, name="test", instances=1)
    httpd = srv.serve_background(PORT)
    yield srv
    httpd.shutdown()


def test_health_and_metadata(served):
    with urllib.request.urlopen(f"http://127.0.0.1:{PORT}/v2/health/ready") as r:
        assert r.status == 200
    with urllib.request.urlopen(f"http://127.0.0.1:{PORT}/v2/models/test") as r:
        meta = json.loads(r.read())
    assert meta["inputs"][0]["shape"] == [1, HW, HW, 3]


def test_raw_tensor_infer(served):
    im = np.random.default_rng(0).integers(0, 256, (1, HW, HW, 3)).astype(np.uint8)
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/v2/models/test/infer", data=im.tobytes()
    )
    with urllib.request.urlopen(req) as r:
        shape = json.loads(r.headers["X-Shape"])
        out = np.frombuffer(r.read(), np.int32).reshape(shape)
    assert out.shape == (1, HW, HW)
    assert out.min() >= 0 and out.max() < 5


def test_cpp_client(served, tmp_path):
    cpp_dir = os.path.join(os.path.dirname(__file__), "..", "cpp")
    exe = os.path.join(cpp_dir, "tis_client")
    if not os.path.exists(exe):
        rc = subprocess.run(["make", "-C", cpp_dir, "tis_client"],
                            capture_output=True)
        if rc.returncode != 0:
            pytest.skip("no native toolchain")
    im = np.random.default_rng(1).integers(0, 256, (1, HW, HW, 3)).astype(np.uint8)
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    inp.write_bytes(im.tobytes())
    rc = subprocess.run(
        [exe, "127.0.0.1", str(PORT), "test", str(inp), str(outp), "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert rc.returncode == 0, rc.stderr
    out = np.frombuffer(outp.read_bytes(), np.int32)
    assert out.size == HW * HW
