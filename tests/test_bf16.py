"""bf16 compute path: finite outputs, fp32 box buffers, close to fp32."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.models.detector import SRFDet

import __graft_entry__ as graft


@pytest.mark.slow
def test_bf16_forward_close_to_fp32():
    cfg32 = tiny_test_config()
    cfg16 = tiny_test_config(compute_dtype="bfloat16")
    batch = graft._synthetic_batch(cfg32, 1)

    m32, m16 = SRFDet(cfg32), SRFDet(cfg16)
    v32 = m32.init(jax.random.PRNGKey(0), batch, train=False)
    lg32, bx32 = m32.apply(v32, batch, train=False)
    lg16, bx16 = m16.apply(v32, batch, train=False)

    assert bx16.dtype == jnp.float32          # boxes stay fp32
    assert np.isfinite(np.asarray(lg16)).all()
    assert np.isfinite(np.asarray(bx16)).all()
    # centers agree to decimeter scale on the tiny range
    err = np.abs(np.asarray(bx16[..., :3]) - np.asarray(bx32[..., :3]))
    assert float(err.mean()) < 0.5, float(err.mean())
