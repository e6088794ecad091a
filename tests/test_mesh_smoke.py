"""Quick-suite mesh codec smoke test (VERDICT r4 #7): a dp=2 mesh
round-trip through the public API so mesh-path regressions surface
in-round, not only at the driver's end-of-round dryrun.  The deep
8-device sweep stays in tests/test_mesh_codec.py (excluded from the
quick run for time)."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh2():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    return pmesh.make_mesh(2, dp=2, sp=1)


def test_mesh2_codec_round_trip_bit_exact(rng, mesh2):
    arr = rng.integers(0, 256, (128, 128)).astype(np.int32)
    kw = dict(tile_size=(64, 64), numresolution=2)
    one = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                            CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                             CompressParams(mesh=mesh2, **kw))
    assert one == many
    out = grok_tpu.decompress(many, DecompressParams(mesh=mesh2))
    assert np.array_equal(out.comps[0].data, arr)
