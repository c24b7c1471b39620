"""AOT serving export (tools/export.py): serialize -> deserialize -> call
round trip must reproduce the live predict exactly (same XLA program)."""
import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from srfdet3d_tpu.configs import tiny_test_config  # noqa: E402

import export as export_tool  # noqa: E402


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    cfg = tiny_test_config()
    fn, (variables, batch) = export_tool.build_predict(cfg)
    want = jax.jit(fn)(variables, batch)

    out = str(tmp_path / "tiny.jxp")
    export_tool.export_predict(cfg, out, variables=variables)
    assert os.path.getsize(out) > 0

    with open(out, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    got = exp.call(variables, batch)

    assert set(want.keys()) == set(got.keys())
    for k in want:
        np.testing.assert_allclose(np.asarray(want[k]), np.asarray(got[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_export_baked_params(tmp_path):
    cfg = tiny_test_config()
    fn, (variables, batch) = export_tool.build_predict(cfg)
    want = jax.jit(fn)(variables, batch)

    out = str(tmp_path / "tiny_baked.jxp")
    export_tool.export_predict(cfg, out, variables=variables,
                               bake_params=True)
    with open(out, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    # self-contained artifact: batch-only calling convention
    got = exp.call(batch)
    for k in want:
        np.testing.assert_allclose(np.asarray(want[k]), np.asarray(got[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
