"""Ray-sharded rendering: the query-ray axis is this workload's sequence
dimension (65,536 rays/image at eval).  Sharding it across the mesh must
produce bitwise-equivalent results to single-device rendering — XLA's SPMD
partitioner inserts the collectives."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coponerf_tpu.config import ModelConfig
from coponerf_tpu.data.synthetic import make_batch
from coponerf_tpu.models import CoPoNeRF
from coponerf_tpu.utils.fast_init import fast_init

pytestmark = pytest.mark.slow

IMG = 32
N_RAYS = 64


def test_ray_sharded_render_matches_single_device():
    cfg = ModelConfig(mask_upsample=IMG, npoints=8)
    model = CoPoNeRF(cfg)
    batch_np, _ = make_batch(batch_size=1, image_size=IMG, n_rays=N_RAYS, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)

    encode = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))
    render = jax.jit(lambda v, b, s: model.apply(v, b, s, val=True, method="render")["rgb"])

    state = encode(variables, batch)
    rgb_single = np.asarray(render(variables, batch, state))

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(8), ("rays",))
    repl = NamedSharding(mesh, P())
    ray_sh = NamedSharding(mesh, P(None, None, "rays"))

    def shard_leaf(path, x):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if "query/uv" in key or "query/rgb" in key:
            return jax.device_put(x, ray_sh)
        return jax.device_put(x, repl)

    sharded_batch = jax.tree_util.tree_map_with_path(shard_leaf, batch)
    variables_r = jax.device_put(variables, repl)
    state_r = jax.device_put(state, repl)

    rgb_sharded = np.asarray(render(variables_r, sharded_batch, state_r))
    np.testing.assert_allclose(rgb_sharded, rgb_single, atol=1e-5)
