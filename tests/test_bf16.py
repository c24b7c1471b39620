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


import pytest as _pytest


@_pytest.mark.slow
def test_bf16_image_branch_close_to_fp32():
    """img.compute_dtype='bfloat16' runs only the image stack in bf16;
    outputs stay close to the fp32 branch and params/stats keep fp32."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from srfdet3d_tpu.config import ImgBranchConfig
    from srfdet3d_tpu.configs import tiny_test_config
    from srfdet3d_tpu.models.detector import SRFDet
    import __graft_entry__ as graft

    base = tiny_test_config(
        use_img=True,
        img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=1,
                            neck_out_channels=32))
    base = base.replace(
        head=dataclasses.replace(base.head, feat_channels_img=32))
    rng = np.random.default_rng(0)
    batch = graft._synthetic_batch(base, 1)
    batch["images"] = jnp.asarray(
        rng.normal(size=(1, 1, 32, 32, 3)).astype(np.float32))
    batch["lidar2img"] = jnp.broadcast_to(
        jnp.eye(4), (1, 1, 4, 4)).astype(jnp.float32)

    model32 = SRFDet(base)
    v = jax.jit(lambda r, b: model32.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    lg32, bx32 = jax.jit(lambda vv, b: model32.apply(vv, b, train=False))(
        v, batch)

    cfg16 = base.replace(
        img=dataclasses.replace(base.img, compute_dtype="bfloat16"))
    model16 = SRFDet(cfg16)
    lg16, bx16 = jax.jit(lambda vv, b: model16.apply(vv, b, train=False))(
        v, batch)                              # same params load unchanged
    assert np.all(np.isfinite(np.asarray(lg16)))
    np.testing.assert_allclose(np.asarray(bx16), np.asarray(bx32),
                               atol=0.15)
    np.testing.assert_allclose(np.asarray(lg16), np.asarray(lg32),
                               atol=0.5)
