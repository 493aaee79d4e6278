"""Standalone C++ PJRT runner (cpp/pjrt_runner.cpp): the native deploy CLI
covering the reference's tensorrt/segment.cpp compile|run|test role over the
PJRT C API. This machine's TPU sits behind a tunnel (no local PJRT device),
so the test gates: binary builds, CLI errors are clean, the artifact
exporter produces the expected layout, and the runner gets as far as
loading a real plugin's PJRT API table."""

import json
import os
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TF_INC = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    if shutil.which("g++") is None or not os.path.isdir(TF_INC):
        pytest.skip("g++ or pjrt_c_api.h unavailable")
    out = tmp_path_factory.mktemp("bin") / "pjrt_runner"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{TF_INC}",
         os.path.join(REPO, "cpp", "pjrt_runner.cpp"), "-ldl", "-o", str(out)],
        check=True, capture_output=True,
    )
    return str(out)


def test_export_pjrt_artifact(tmp_path):
    import jax

    from mds_tpu.deploy.export import export_pjrt_artifact
    from mds_tpu.models.bisenetv2 import BiSeNetV2

    model = BiSeNetV2(n_classes=(5,), n_bn=1, aux=False)
    x0 = jnp.zeros((1, 32, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, [x0], train=False)
    d = export_pjrt_artifact(model, v, (32, 64), str(tmp_path / "art"))
    mlir = open(os.path.join(d, "module.mlir")).read()
    assert "stablehlo" in mlir or "mhlo" in mlir or "func.func" in mlir
    assert os.path.getsize(os.path.join(d, "compile_options.pb")) > 0
    meta = json.load(open(os.path.join(d, "meta.json")))
    assert meta["input"]["shape"] == [1, 32, 64, 3]
    assert meta["output"]["shape"] == [1, 32, 64]


def test_runner_cli_and_plugin_load(runner, tmp_path):
    # no args → usage
    r = subprocess.run([runner], capture_output=True, text=True)
    assert r.returncode == 1 and "usage" in r.stderr
    # bad plugin → clean dlopen error
    r = subprocess.run(
        [runner, "test", str(tmp_path), "--plugin", "/nonexistent.so"],
        capture_output=True, text=True,
    )
    assert r.returncode == 2 and "dlopen" in r.stderr
    # real plugin (libtpu): loads the API table; client creation needs a TPU
    # VM, so accept either a version banner or a clean PJRT error
    libtpu = "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"
    if os.path.exists(libtpu):
        r = subprocess.run(
            [runner, "compile", str(tmp_path), "--plugin", libtpu],
            capture_output=True, text=True, timeout=120,
        )
        assert "PJRT API v" in r.stdout, r.stdout + r.stderr
